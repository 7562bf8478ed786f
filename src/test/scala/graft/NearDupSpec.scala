package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Planted-duplicate validation for the hash-seeded near-dup operators
  * (SURVEY.md §7.3.7): these have no DuckDB oracle, so correctness is
  * established by planting known near-duplicates and checking detection.
  * The Llm query fns read `<dir>/documents.parquet` / `embeddings.parquet`,
  * so the fixtures are written as tiny parquet tables in a temp dir.
  */
class NearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_neardup").toString
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    val rnd = new scala.util.Random(3)
    def doc(seed: Int, n: Int) = {
      val r = new scala.util.Random(seed)
      Seq.fill(n)(words(r.nextInt(words.size))).mkString(" ")
    }
    val base = doc(100, 60)
    // doc 1 == doc 0 with one token changed (near-dup); docs 2..9 random
    val nearDup = base.split(" ").zipWithIndex
      .map { case (w, i) => if (i == 30) "CHANGED" else w }.mkString(" ")
    val docs = Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong)) ++
      (2L to 9L).map { i =>
        val t = doc(i.toInt, 60)
        (i, t, "en", "src0", t.length.toLong)
      }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")

    // embeddings: 3 tight clusters of 10 + noise; vec 0 and 1 near-identical
    val vecs = (0 until 30).map { i =>
      val c = i / 10
      val r = new scala.util.Random(c)
      val center = Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
      val jitter = new scala.util.Random(1000 + i)
      (i.toLong,
        center.map(x => x + (jitter.nextDouble() * 0.05).toFloat),
        c)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def queries = SparkEntry.queries

  test("minhash-LSH surfaces the planted near-dup pair first") {
    val rows = queries("llm_minhash_neardup")(spark, dir)
      .select("d1", "d2", "est_jaccard").collect()
    assert(rows.nonEmpty)
    val top = rows.head
    assert((top.getLong(0), top.getLong(1)) == (0L, 1L))
    assert(top.getDouble(2) > 0.8)
  }

  test("simhash: near-dups are close in Hamming distance, others far") {
    val sig = queries("llm_simhash")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val near = ham(sig(0L), sig(1L))
    val unrelated = for (i <- 2L to 9L) yield ham(sig(0L), sig(i))
    assert(near <= 6)
    assert(near < unrelated.min)
  }

  test("simhash Hamming join is complete for distance ≤ 3 (pigeonhole)") {
    import spark.implicits._
    val got = queries("llm_simhash_neardup")(spark, dir)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val sig = queries("llm_simhash")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- sig.keys; b <- sig.keys if a < b
      if java.lang.Long.bitCount(sig(a) ^ sig(b)) <= 3
    } yield (a, b)).toSet
    assert(got == brute, "segment join must reproduce brute-force Hamming≤3 exactly")
  }

  test("neardup_prune groups the planted pair and keeps the lower id") {
    val out = queries("llm_neardup_prune")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(0L) == ((0L, true)), "canonical doc must keep itself")
    assert(out(1L)._1 == 0L && !out(1L)._2, "near-dup must join group 0 and be pruned")
    assert(out(5L) == ((5L, true)), "unrelated doc must survive in its own group")
  }

  test("winnowing fingerprints overlap heavily for the planted pair") {
    val fp = queries("llm_fingerprint")(spark, dir)
      .select("doc_id", "fingerprint").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(',').filter(_.nonEmpty).map(_.toLong).toSet).toMap
    def jac(a: Set[Long], b: Set[Long]) =
      a.intersect(b).size.toDouble / a.union(b).size
    assert(jac(fp(0L), fp(1L)) > 0.5)
    assert(jac(fp(0L), fp(5L)) < 0.3)
  }

  test("LSH ANN finds the planted nearest neighbor with top-1 agreement") {
    val ann = queries("llm_ann_lsh")(spark, dir)
      .where($"rn" === 1).select("q_id", "n_id").as[(Long, Long)].collect().toMap
    // vec 0's true nearest is in its own cluster; check vs brute force
    val brute = queries("llm_knn_per_query")(spark, dir)
      .where($"rn" === 1).select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val common = ann.keySet.intersect(brute.keySet)
    assert(common.nonEmpty)
    val agree = common.count(q => ann(q) == brute(q))
    assert(agree.toDouble / common.size >= 0.8)
  }

  test("IVF ANN finds the planted nearest neighbor with top-1 agreement") {
    val ivf = queries("llm_ann_ivf")(spark, dir)
      .where($"rn" === 1).select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val brute = queries("llm_knn_per_query")(spark, dir)
      .where($"rn" === 1).select("q_id", "n_id").as[(Long, Long)].collect().toMap
    val common = ivf.keySet.intersect(brute.keySet)
    assert(common.nonEmpty)
    val agree = common.count(q => ivf(q) == brute(q))
    assert(agree.toDouble / common.size >= 0.8,
      s"IVF top-1 agreement ${agree.toDouble / common.size}")
  }

  test("dedup_groups recovers the three planted embedding clusters") {
    val groups = queries("llm_dedup_groups")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups.size == 30)
    // each tight cluster of 10 collapses to its min vec_id label
    for (c <- 0 until 3; i <- 0 until 10)
      assert(groups((c * 10 + i).toLong) == (c * 10).toLong,
        s"vec ${c * 10 + i} -> ${groups((c * 10 + i).toLong)}")
  }

  test("exact dedup groups identical normalized docs") {
    val d2 = Files.createTempDirectory("graft_exact").toString
    Seq(
      (0L, "Hello,   World!", "en", "s", 14L),
      (1L, "hello world", "en", "s", 11L),
      (2L, "other doc", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d2/documents.parquet")
    val groups = queries("llm_exact_dedup")(spark, d2).collect()
    assert(groups.length == 2)
    val dupGroup = groups.find(_.getLong(2) == 2L).get
    assert(dupGroup.getLong(1) == 0L) // keeps min doc_id
  }
}
