package graft

import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("json ingest: explicit schema and inference agree on typed rows") {
    val d = Files.createTempDirectory("graft_src").toString
    val json = Seq(
      """{"id": 1, "name": "a", "score": 1.5}""",
      """{"id": 2, "name": "b", "score": 2.5}""")
    Files.write(java.nio.file.Paths.get(s"$d/in.json"),
      json.mkString("\n").getBytes)
    val typed = Sources.readJson(spark, s"$d/in.json", schema)
    assert(typed.schema == schema)
    assert(typed.count() == 2)
    val inferred = Sources.inferJson(spark, s"$d/in.json")
    assert(inferred.select("id", "name", "score").count() == 2)
  }

  test("csv ingest: header + typed casting") {
    val d = Files.createTempDirectory("graft_csv").toString
    Files.write(java.nio.file.Paths.get(s"$d/in.csv"),
      "id,name,score\n1,a,1.5\n2,b,2.5\n".getBytes)
    val df = Sources.readCsv(spark, s"$d/in.csv", schema)
    assert(df.schema == schema)
    assert(df.agg(sum("score")).as[Double].head() == 4.0)
  }

  test("partitioned sink lays out by event_date and prunes on read") {
    val d = Files.createTempDirectory("graft_lake").toString
    val df = Seq(
      (1L, TestSpark.ts("2024-01-01 10:00:00")),
      (2L, TestSpark.ts("2024-01-02 10:00:00")))
      .toDF("id", "ts")
    Sources.sinkPartitioned(df, "ts", s"$d/lake")
    assert(new java.io.File(s"$d/lake/event_date=2024-01-01").isDirectory)
    val pruned = spark.read.parquet(s"$d/lake")
      .where(col("event_date") === "2024-01-02")
    assert(pruned.count() == 1)
    // partition pruning visible in the scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"))
  }
}
