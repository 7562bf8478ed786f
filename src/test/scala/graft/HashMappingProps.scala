package graft

import graft.functions.PortableHash
import graft.ingest.{FieldMap, Mapping, MappingSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the round-2 surfaces: the portable hash
  * (range/determinism/reference-equality against a JVM-side md5) and the
  * mapping DSL (compiled extraction == hand-written extraction on random
  * form-shaped JSON, including missing fields).
  */
object HashMappingProps extends Properties("graft.hash_mapping") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withWorkers(1)
      .withInitialSeed(org.scalacheck.rng.Seed(20260813L))

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val strGen: Gen[String] =
    Gen.listOf(Gen.alphaNumChar).map(_.mkString).suchThat(_.length <= 200)

  /** JVM reference implementation of the 60-bit portable hash. */
  private def refHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  property("portable_hash: 60-bit range + equals JVM md5 reference") =
    Prop.forAll(Gen.listOfN(12, strGen)) { ss =>
      val rows = ss.distinct
      rows.isEmpty || {
        val got = rows.toDF("t")
          .select(col("t"), PortableHash.pHash(col("t")).as("h"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        rows.forall { s =>
          val h = got(s)
          h >= 0L && h < (1L << 60) && h == refHash(s)
        }
      }
    }

  property("double-hash family: h1/h2 halves match md5 slices") =
    Prop.forAll(strGen) { s =>
      val (h1c, h2c) = PortableHash.pHash2(col("t"))
      val row = Seq(s).toDF("t").select(h1c.as("h1"), h2c.as("h2")).head()
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      row.getLong(0) == java.lang.Long.parseLong(hex.substring(0, 13), 16) &&
        row.getLong(1) == java.lang.Long.parseLong(hex.substring(13, 26), 16)
    }

  private val docGen: Gen[(Long, String)] = for {
    id <- Gen.choose(0L, 1000000L)
    name <- Gen.alphaStr.map(_.take(8))
    age <- Gen.option(Gen.choose(0, 120))
  } yield {
    val ageField = age.map(a => s""", "age": $a""").getOrElse("")
    (id, s"""{"form": {"name": "$name"$ageField}}""")
  }

  property("mapping DSL == hand-written extraction (incl. missing fields)") =
    Prop.forAll(Gen.listOfN(6, docGen)) { docs0 =>
      val docs = docs0.distinctBy(_._1)
      docs.isEmpty || {
        val df = docs.toDF("id", "doc")
        val spec = MappingSpec(Seq(
          FieldMap("$.form.name", "name"),
          FieldMap("$.form.age", "age", "long")))
        val got = Mapping.compile(df, "doc", spec)
          .select("id", "name", "age").collect()
          .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
          .sortBy(_._1)
        val want = df.select(col("id"),
            get_json_object(col("doc"), "$.form.name").as("name"),
            get_json_object(col("doc"), "$.form.age").cast("long").as("age"))
          .collect()
          .map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
          .sortBy(_._1)
        got.sameElements(want)
      }
    }
}
