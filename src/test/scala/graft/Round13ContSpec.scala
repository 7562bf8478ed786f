package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-13 continuation operators: each declared key's
  * DuckDB oracle pins VALUES; these pin the SEMANTIC guarantees the
  * values ride on — winnowing's window-coverage theorem, the skyline's
  * dominance definition against an O(n²) brute force, the band join's
  * bucketed plan against the naive range join, and the anisotropy
  * identity against the literal pairwise mean.
  */
class Round13ContSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("llm_winnowing: every 4-gram window contains a selected position" +
    " (the scheme's coverage theorem), and the inline selection matches" +
    " the declared per-source counts") {
    import graft.functions.PortableHash
    // inline replay of the selection rule (3-gram hashes, w=4 windows,
    // rightmost-min CASE ladder) keeping positions
    val g = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), col("source"), explode(expr(
        """transform(sequence(1, size(toks) - 2), j -> struct(
          |  j AS p,
          |  concat(element_at(toks, j), ' ', element_at(toks, j + 1),
          |         ' ', element_at(toks, j + 2)) AS gr))""".stripMargin))
        .as("x"))
      .select(col("doc_id"), col("source"), col("x.p").as("p"),
        PortableHash.pHash(col("x.gr")).as("h"))
    val win = Window.partitionBy("doc_id").orderBy("p")
    val w = g
      .withColumn("h1", lead(col("h"), 1).over(win))
      .withColumn("h2", lead(col("h"), 2).over(win))
      .withColumn("h3", lead(col("h"), 3).over(win))
      .withColumn("p3", lead(col("p"), 3).over(win))
    val spE = when(col("h3") <= col("h2") && col("h3") <= col("h1") &&
        col("h3") <= col("h"), col("p") + 3)
      .when(col("h2") <= col("h1") && col("h2") <= col("h"), col("p") + 2)
      .when(col("h1") <= col("h"), col("p") + 1)
      .otherwise(col("p"))
    val sel = w.where(col("p3").isNotNull)
      .select(col("doc_id"), col("source"), spE.as("sp"))
      .distinct()
    val selByDoc = sel.collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .map { case (d, rs) => d -> rs.map(_.getAs[Int]("sp")).toSet }
    val nGrams = g.groupBy("doc_id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n")).toMap

    // coverage theorem: every window [i, i+3] of a doc with >= 4 grams
    // contains at least one selected position
    var windows = 0
    nGrams.foreach { case (d, n) =>
      if (n >= 4) {
        val s = selByDoc.getOrElse(d, Set.empty[Int])
        (1 to (n - 3).toInt).foreach { i =>
          windows += 1
          assert((i to i + 3).exists(s.contains),
            s"doc $d window [$i, ${i + 3}] has no winnowing fingerprint")
        }
      }
    }
    assert(windows > 100, s"fixture exercised only $windows windows")

    // the declared key aggregates the SAME selection: per-source
    // n_selected must match the inline replay
    val declared = SparkEntry.queries("llm_winnowing")(spark, sf).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_selected"))
      .toMap
    val mine = sel.groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n")).toMap
    assert(declared == mine)
  }

  test("etl_skyline: equals the O(n²) dominance brute force") {
    val parts = Tables(spark, sf, "part")
      .select(col("p_brand"), col("p_partkey"),
        round(col("p_retailprice") * 100).cast("long").as("cents"),
        col("p_size").cast("long").as("sz"))
      .collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("p_partkey"),
        r.getAs[Long]("cents"), r.getAs[Long]("sz")))
    val brute = parts.filter { case (b, _, c, s) =>
      !parts.exists { case (b2, _, c2, s2) =>
        b2 == b && c2 <= c && s2 >= s && (c2 < c || s2 > s)
      }
    }.map(t => (t._1, t._2)).toSet
    val declared = SparkEntry.queries("etl_skyline")(spark, sf).collect()
      .map(r => (r.getAs[String]("p_brand"), r.getAs[Long]("p_partkey")))
      .toSet
    assert(declared == brute)
  }

  test("join_band: bucketed plan equals the naive per-user range join") {
    val ev = Tables(spark, sf, "events")
      .where(col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[String]("event_type")))
    val clicks = ev.filter(_._4 == "click")
    val naive = ev.filter(_._4 == "purchase").map { case (id, u, t, _) =>
      (id, clicks.count { case (_, cu, ct, _) =>
        cu == u && ct >= t - 600000L && ct < t
      }.toLong)
    }.toMap
    val declared = SparkEntry.queries("join_band")(spark, sf).collect()
      .map(r => r.getAs[Long]("purchase_id") -> r.getAs[Long]("n_clicks_10m"))
      .toMap
    assert(declared == naive)
  }

  test("llm_embedding_anisotropy: the ‖Σu‖² − Σ‖u‖² identity equals the" +
    " literal O(n²) pairwise mean on the same quantized grid") {
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    // replay the op's quantization: 1e7 ticks -> unit normalize -> 1e6 grid
    val q = vecs.flatMap { v =>
      val ticks = v.map(x => math.round(x * 1e7))
      val n2 = ticks.map(t => BigInt(t) * BigInt(t)).sum
      if (n2 > 0) {
        val nrm = math.sqrt(n2.toDouble)
        Some(ticks.map(t => math.round(t / nrm * 1e6)))
      } else None
    }
    val n = q.length
    var dot = BigInt(0)
    for (i <- q.indices; j <- q.indices if i != j)
      dot += q(i).zip(q(j)).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
    val brute =
      math.floor(dot.toDouble / (n.toDouble * (n - 1)) / 1e6) / 1e6
    val declared =
      SparkEntry.queries("llm_embedding_anisotropy")(spark, sf).collect()
    assert(declared.head.getAs[Long]("n_vecs") == n.toLong)
    assert(declared.head.getAs[Double]("mean_pairwise_cos") == brute)
  }

  test("clustering indices: silhouette bounded, DB/CH positive and" +
    " mutually consistent on the fixture") {
    val sil = SparkEntry.queries("llm_silhouette_simplified")(spark, sf)
      .collect()
    assert(sil.nonEmpty)
    assert(sil.forall { r =>
      val s = r.getAs[Double]("mean_silhouette"); s >= -1.0 && s <= 1.0
    })
    val db = SparkEntry.queries("llm_cluster_db_index")(spark, sf).collect()
    assert(db.forall(r => r.getAs[Double]("db_ratio") > 0 &&
      r.getAs[Double]("scatter") > 0))
    val ch = SparkEntry.queries("llm_calinski_harabasz")(spark, sf).collect()
    assert(ch.head.getAs[Double]("ch_index") > 0 &&
      ch.head.getAs[Double]("wcss") > 0 && ch.head.getAs[Double]("bcss") > 0)
  }
}
