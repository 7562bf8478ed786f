package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the R9 idempotent-reimport composites (SURVEY.md §5.2.3). */
class EtlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def dedupLatest(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("k").orderBy(col("v").desc, col("tb").desc)
    df.withColumn("rn", row_number().over(w)).where($"rn" === 1).drop("rn")
  }

  private def merge(base: DataFrame, batch: DataFrame): DataFrame =
    base.join(batch, Seq("k"), "left_anti").unionByName(batch)

  test("dedup_latest is idempotent and output is a subset of input") {
    val df = Seq((1L, 5L, 1L), (1L, 9L, 2L), (2L, 3L, 3L), (2L, 3L, 4L))
      .toDF("k", "v", "tb")
    val once = dedupLatest(df)
    val twice = dedupLatest(once)
    assert(once.orderBy("k").collect().toSeq == twice.orderBy("k").collect().toSeq)
    assert(once.except(df).count() == 0)
    // ties on v broken by tb desc
    assert(once.where($"k" === 2).select("tb").as[Long].head() == 4L)
  }

  test("incremental merge == full rebuild (batch wins on matched keys)") {
    val base = Seq((1L, "old"), (2L, "old"), (3L, "old")).toDF("k", "payload")
    val batch = Seq((2L, "new"), (4L, "new")).toDF("k", "payload")
    val merged = merge(base, batch).orderBy("k").collect().toSeq
    val expected = Seq((1L, "old"), (2L, "new"), (3L, "old"), (4L, "new"))
      .toDF("k", "payload").orderBy("k").collect().toSeq
    assert(merged == expected)
  }

  test("merge with empty batch is identity; merge with empty base is batch") {
    val base = Seq((1L, "a")).toDF("k", "p")
    val empty = Seq.empty[(Long, String)].toDF("k", "p")
    assert(merge(base, empty).collect().toSeq == base.collect().toSeq)
    assert(merge(empty, base).collect().toSeq == base.collect().toSeq)
  }

  test("exceptAll keeps multiset semantics") {
    val a = Seq(1, 1, 1, 2).toDF("x")
    val b = Seq(1, 2).toDF("x")
    assert(a.exceptAll(b).as[Int].collect().sorted.toSeq == Seq(1, 1))
  }
}
