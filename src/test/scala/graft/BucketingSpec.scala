package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-elimination evidence for the 100 TB story (SCALING.md): two
  * tables bucketed on the join key join WITHOUT any Exchange — the plan
  * cluster-scale equivalent of co-locating the sessionize→monthly→join
  * chain on user_id.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("join of co-bucketed tables plans no shuffle Exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-BHJ
    try {
      val ev = Tables(spark, "/root/testdata/sf0.001", "events")
      ev.select("event_id", "user_id", "value")
        .write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .saveAsTable("ev_bucketed")
      ev.groupBy("user_id").agg(count(lit(1)).as("n"))
        .write.mode("overwrite")
        .bucketBy(8, "user_id").sortBy("user_id")
        .saveAsTable("usr_bucketed")
      val joined = spark.table("ev_bucketed")
        .join(spark.table("usr_bucketed"), "user_id")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free co-bucketed join, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      // same join without bucketing shuffles both sides
      val unbucketed = ev.select("event_id", "user_id", "value")
        .join(ev.groupBy("user_id").agg(count(lit(1)).as("n")), "user_id")
      unbucketed.collect()
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS usr_bucketed")
    }
  }

  test("LSH band signatures bucketed on the band key self-join shuffle-free") {
    // The dedup-at-100TB claim, end to end: if the banded signature table
    // is written bucketed by (band, band_key), the candidate self-join —
    // the ONLY shuffle in the LSH pipeline — needs no Exchange either.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      operators.Llm.lshBanded(
        operators.Llm.lshSig(
          Tables(spark, "/root/testdata/sf0.001", "embeddings")), 4, 4)
        .write.mode("overwrite")
        .bucketBy(8, "band", "band_key").sortBy("band", "band_key")
        .saveAsTable("bands_bucketed")
      val b = spark.table("bands_bucketed")
      val selfJoin = b.as("x").join(b.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.vec_id") < col("y.vec_id"))
      selfJoin.collect()
      val plan = selfJoin.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"expected shuffle-free bucketed band self-join, got:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bands_bucketed")
    }
  }
}
