package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions.cosineSim
import org.scalatest.funsuite.AnyFunSuite

/** Validates the banded sign-LSH prefilter (llm_sim_join_lsh's candidate
  * stage) as the scale path for similarity joins: on a corpus with planted
  * near-dup clusters, the candidate set must contain EVERY brute-force pair
  * in the near-dup regime (recall 1.0) while staying far below the O(n²)
  * pair count the brute-force join would evaluate.
  *
  * Threshold-regime note (mirrored in SCALING.md): sign-LSH amplifies
  * selectivity around HIGH cosine similarity. At sim ≥ 0.8 the per-bit
  * agreement is ≥ 1 - acos(0.8)/π ≈ 0.80, so a 4-band × 4-bit scheme keeps
  * per-pair recall ≥ 1-(1-0.80⁴)⁴ ≈ 0.92 and near 1.0 at sim ≥ 0.95; at
  * moderate thresholds (τ ≈ 0.35) NO banding of 16 sign bits can separate
  * matches from non-matches (per-bit agreement 0.61 vs 0.5 baseline) — that
  * regime belongs to minhash banding on text shingles or brute force.
  */
class LshPrefilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 tight clusters of 10 vectors (within-cluster cosine ≥ ~0.95) + 20
  // isotropic noise vectors — same construction as NearDupSpec, plus noise
  // so candidate-set shrinkage is measurable.
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_lsh").toString
    val vecs = (0 until 30).map { i =>
      val c = i / 10
      val r = new scala.util.Random(c)
      val center = Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
      val jitter = new scala.util.Random(1000 + i)
      (i.toLong, center.map(x => x + (jitter.nextDouble() * 0.05).toFloat), c)
    } ++ (30 until 50).map { i =>
      val r = new scala.util.Random(5000 + i)
      (i.toLong, Array.fill(64)((r.nextDouble() * 2 - 1).toFloat), 9)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def brutePairs(tau: Double): Set[(Long, Long)] = {
    val e = Tables(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    a.join(b, col("a_id") < col("b_id"))
      .where(round(cosineSim(col("a_emb"), col("b_emb")), 6) >= tau)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
  }

  test("candidates ⊇ all brute-force near-dup pairs (recall = 1.0 at τ=0.8)") {
    val cand = operators.Llm.lshCandidatePairs(spark, dir, 4, 4)
      .as[(Long, Long)].collect().toSet
    val brute = brutePairs(0.8)
    assert(brute.nonEmpty, "fixture must contain near-dup pairs")
    val missed = brute -- cand
    assert(missed.isEmpty, s"LSH prefilter missed near-dup pairs: $missed")
  }

  test("candidate set is a small fraction of the O(n²) pair space") {
    val n = 50L
    val allPairs = n * (n - 1) / 2
    val cand = operators.Llm.lshCandidatePairs(spark, dir, 4, 4).count()
    assert(cand < allPairs / 2,
      s"prefilter kept $cand of $allPairs pairs — no pruning value")
  }

  test("prefilter + exact verify reproduces the brute-force join at τ=0.8") {
    val e = Tables(spark, dir, "embeddings")
    val a = e.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
    val b = e.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
    val viaLsh = operators.Llm.lshCandidatePairs(spark, dir, 4, 4)
      .join(a, Seq("a_id")).join(b, Seq("b_id"))
      .where(round(cosineSim(col("a_emb"), col("b_emb")), 6) >= 0.8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(viaLsh == brutePairs(0.8))
  }
}
