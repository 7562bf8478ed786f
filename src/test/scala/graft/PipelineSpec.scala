package graft

import graft.config.{Pipeline, RunConfig}
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end config-driven run: RunConfig window → aggregate DAG →
  * month-partitioned lake tables → pruned read-back.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("config-driven run publishes partitioned aggregates, idempotently") {
    val out = Files.createTempDirectory("graft_pipeline").toString
    val cfg = RunConfig(sf, Seq("events"),
      startDate = Some("2024-01-01"), endDate = Some("2024-02-01"))
    val results = Pipeline.run(spark, cfg, out)
    assert(results.map(_.table).toSet ==
      Set("sessions", "monthly_usage", "user_lifetime"))
    assert(results.forall(_.rows > 0))

    // published sessions must equal the declared operator over the same
    // window (the pipeline uses the skew-safe plan; equality is the law)
    val direct = operators.Etl.sessionized(cfg.table(spark, "events"))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"))
    val published = Pipeline.readTable(spark, out, "sessions")
    assert(published.count() == direct.count())
    assert(published.agg(sum("n_events")).head.getLong(0) ==
      direct.agg(sum("n_events")).head.getLong(0))

    // month partitioning is physical, and a month filter prunes at scan
    assert(new java.io.File(s"$out/monthly_usage").listFiles()
      .exists(_.getName.startsWith("month=")))
    val pruned = Pipeline.readTable(spark, out, "monthly_usage",
      month = Some("2024-01-01"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"))
    assert(pruned.count() > 0)

    // rerun = rebuild: same rows, no append-duplication
    val again = Pipeline.run(spark, cfg, out)
    assert(again.map(r => r.table -> r.rows).toMap ==
      results.map(r => r.table -> r.rows).toMap)
  }

  test("pipeline without the events table fails loudly") {
    val out = Files.createTempDirectory("graft_pipeline2").toString
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, RunConfig(sf, Seq("orders")), out)
    }
  }
}
