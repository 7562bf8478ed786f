package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions.{cosineSim, vectorDot}
import org.scalatest.funsuite.AnyFunSuite

class VectorExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: (Array[Float], Array[Float])*) =
    rows.toSeq.toDF("a", "b")

  test("cosine matches reference formula (both eval paths)") {
    val a = Array(1f, 2f, 3f)
    val b = Array(4f, 5f, 6f)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    // codegen path
    val got = df((a, b)).select(cosineSim($"a", $"b")).as[Double].head()
    assert(math.abs(got - expected) < 1e-12)
    // interpreted path (codegen off) — exercises nullSafeEval
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val got2 = df((a, b)).select(cosineSim($"a", $"b")).as[Double].head()
      assert(math.abs(got2 - expected) < 1e-12)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("dot product") {
    val got = df((Array(1f, 2f), Array(3f, 4f)))
      .select(vectorDot($"a", $"b")).as[Double].head()
    assert(got == 11.0)
  }

  test("zero vector yields NULL cosine, not NaN") {
    val got = df((Array(0f, 0f), Array(1f, 2f)))
      .select(cosineSim($"a", $"b")).as[Option[Double]].head()
    assert(got.isEmpty)
  }

  test("length mismatch yields NULL") {
    val got = df((Array(1f, 2f, 3f), Array(1f, 2f)))
      .select(vectorDot($"a", $"b")).as[Option[Double]].head()
    assert(got.isEmpty)
  }

  test("null input propagates NULL") {
    val got = Seq((Some(Array(1f)), Option.empty[Array[Float]]))
      .toDF("a", "b").select(cosineSim($"a", $"b")).as[Option[Double]].head()
    assert(got.isEmpty)
  }

  test("identical vectors have cosine 1") {
    val v = Array.tabulate(64)(i => (i % 7 + 1).toFloat)
    val got = df((v, v)).select(cosineSim($"a", $"b")).as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("llm_embedding_drift matches a driver-side pinned-order replay") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("llm_embedding_drift")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val c = r.getAs[Double]("drift_cos"); c >= -1.0 && c <= 1.0
    })
    // replay with the SAME fold orders: per-(label, dim) vec_id-sorted
    // sums, label-sorted global sums, dim-ascending dot/norm folds
    val raw = Tables(spark, sf, "embeddings").collect().map(r =>
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    val labels = raw.map(_._2).distinct.sorted
    val comp = (for {
      l <- labels; i <- 0 until 64
    } yield {
      val xs = raw.filter(_._2 == l).sortBy(_._1).map(_._3(i).toDouble)
      ((l, i), (xs.foldLeft(0.0)(_ + _), xs.length))
    }).toMap
    val g = (0 until 64).map { i =>
      val sums = labels.map(l => comp((l, i))._1)
      val n = labels.map(l => comp((l, i))._2).sum
      sums.foldLeft(0.0)(_ + _) / n
    }
    rows.foreach { r =>
      val l = r.getAs[Int]("label")
      val c = (0 until 64).map(i => comp((l, i))._1 / comp((l, i))._2)
      def fold(xs: Seq[Double]) = xs.foldLeft(0.0)(_ + _)
      val cos = fold(c.zip(g).map { case (p, q) => p * q }) /
        math.sqrt(fold(c.map(p => p * p))) / math.sqrt(fold(g.map(p => p * p)))
      assert(r.getAs[Double]("drift_cos") == math.floor(cos * 1e6) / 1e6,
        s"label $l")
      assert(r.getAs[Long]("n_vecs") == raw.count(_._2 == l))
    }
  }

  test("JaroWinkler: edge cases, known values, codegen == eval, SQL surface") {
    import org.apache.spark.sql.graft.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(jw("", "") == 1.0)
    assert(jw("abc", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("abc", "xyz") == 0.0) // no matches
    // the textbook MARTHA/MARHTA value: jaro 0.944..., prefix 3 → 0.9611
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    // DuckDB agreement on the floor(half/2) transposition rule: 3
    // mismatched matched-positions score the same as 2 (t = 1 both)
    assert(jw("Customer#000000231", "Customer#000000123") ==
      jw("Customer#000000321", "Customer#000000123"))
    // symmetric
    assert(jw("DWAYNE", "DUANE") == jw("DUANE", "DWAYNE"))
    // codegen (declared plan) equals interpreted eval
    import org.apache.spark.sql.graft.JaroWinkler.jaroWinkler
    import org.apache.spark.sql.functions._
    val df = Tables(spark, "/root/testdata/sf0.001", "customer")
      .select(col("c_custkey"),
        jaroWinkler(col("c_name"), lit("Customer#000000042")).as("s"))
    val viaPlan = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaEval = Tables(spark, "/root/testdata/sf0.001", "customer")
      .collect().map(r => r.getLong(0) ->
        jw(r.getAs[String]("c_name"), "Customer#000000042")).toMap
    assert(viaPlan == viaEval)
    // SQL registration end-to-end
    Tables(spark, "/root/testdata/sf0.001", "customer")
      .createOrReplaceTempView("jw_cust")
    val sqlTop = spark.sql(
      """SELECT c_custkey FROM jw_cust
        |ORDER BY jaro_winkler(c_name, 'Customer#000000042') DESC, c_custkey
        |LIMIT 1""".stripMargin).head().getLong(0)
    assert(sqlTop == 42L)
  }
}
