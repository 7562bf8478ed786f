package graft.config

import graft.operators.Etl
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** One config-driven ETL RUN — the reference platform's scheduled-pipeline
  * analog (R6–R9: fetch the configured window, rebuild the aggregate
  * tables, publish them to the warehouse/lake). `graft`'s run is:
  *
  *   RunConfig (table subset + date window + predicates, R12)
  *     → windowed `events` scan (filters pushed to parquet)
  *     → the standard aggregate DAG: sessions (R3) → monthly usage (R4)
  *       → user lifetime (R5)
  *     → month-partitioned parquet under `outDir/<table>/` (R2's
  *       warehouse-table analog; partition pruning serves month-range
  *       readers)
  *
  * Re-runs OVERWRITE each table dir — the reference rebuilds its aggregate
  * tables per run, and idempotent rebuild beats incremental mutation for
  * a lake (PipelineSpec pins rerun-idempotence). At 100 TB each stage is
  * the already-audited operator plan (one user_id exchange feeds both the
  * session and monthly aggregates); the sink adds only the partition
  * columns. Sessions use the skew-safe two-level plan: a config-selected
  * window over real traffic is exactly where Zipfian hot users live.
  */
object Pipeline {

  final case class TableResult(table: String, rows: Long, path: String)

  def run(spark: SparkSession, cfg: RunConfig, outDir: String): Seq[TableResult] = {
    require(cfg.tables.contains("events"),
      "Pipeline.run: the aggregate DAG is built from 'events'; select it in RunConfig")
    val ev = cfg.table(spark, "events")
      // one materialization feeds three aggregate builds
      .persist()
    try {
      val sessions = Etl.sessionizedScalable(ev)
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"))
      val monthly = Etl.monthlyUsage(ev)
      val lifetime = ev
        .groupBy(col("user_id"))
        .agg(
          min(col("ts")).as("first_ts"),
          max(col("ts")).as("last_ts"),
          count(lit(1)).as("n_events"))

      Seq(
        write(sessions.withColumn("month", date_trunc("month", col("session_start"))),
          Some("month"), s"$outDir/sessions"),
        write(monthly, Some("month"), s"$outDir/monthly_usage"),
        write(lifetime, None, s"$outDir/user_lifetime"))
    } finally ev.unpersist()
  }

  private def write(df: DataFrame, partitionCol: Option[String], path: String): TableResult = {
    val w = df.write.mode(SaveMode.Overwrite)
    partitionCol.fold(w)(c => w.partitionBy(c)).parquet(path)
    TableResult(path.split('/').last, df.sparkSession.read.parquet(path).count(), path)
  }

  /** Rehydrate a published table (month-pruned when `month` is given) —
    * what a downstream reader does; the month filter must prune partitions,
    * not scan them (Sources.sinkPartitioned posture, pinned in
    * PipelineSpec).
    */
  def readTable(spark: SparkSession, outDir: String, table: String,
      month: Option[String] = None): DataFrame = {
    val base = spark.read.parquet(s"$outDir/$table")
    month.fold(base)(m => base.where(col("month") === lit(m).cast("timestamp")))
  }
}
