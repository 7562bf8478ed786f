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

  /** Incremental maintenance of the published `monthly_usage` table for an
    * append-only event stream (R9: per-run delta loads) — recompute ONLY
    * the months the new batch touches and overwrite ONLY those partitions
    * (dynamic partition overwrite; untouched months keep their files).
    *
    * Exactness under the session gap rule: a month's `n_sessions` counts
    * sessions STARTING in it, and whether the month's first per-user event
    * starts a session depends on at most the previous
    * [[Etl.SessionGapMinutes]] of history — so recomputing from a window
    * that starts that far before the earliest affected month is EXACTLY
    * the full rebuild for those months (an event older than the gap
    * cannot suppress a start; appends cannot change earlier months at
    * all). PipelineSpec pins equality with a full rebuild around a random
    * split and that untouched partitions are physically untouched.
    *
    * The driver-side `collect` is the affected-MONTH list (bounded by the
    * calendar, not the data). At 100 TB this is the nightly delta-load
    * plan: one pushdown-filtered scan of [lookback, end), one shuffle per
    * aggregate, and a partition-scoped commit.
    */
  def runIncrementalMonthly(
      spark: SparkSession, cfg: RunConfig, outDir: String,
      batchStart: String): TableResult = {
    val path = s"$outDir/monthly_usage"
    // The cfg's startDate is STRIPPED for the recompute scan: a caller
    // passing startDate = batchStart (the natural delta-load config)
    // would otherwise clip the scan below the lookback and the affected
    // months would be rebuilt from batch-only events — silently wrong
    // counts. The batch boundary is `batchStart`; cfg.endDate still caps
    // the data end; exactness needs the scan to reach lookbackStart.
    val ev = cfg.copy(startDate = None).table(spark, "events")
    val affected = ev
      .where(col("ts") >= lit(batchStart).cast("timestamp"))
      .select(date_trunc("month", col("ts")).as("m")).distinct()
      .collect().map(_.getTimestamp(0))
    if (affected.isEmpty)
      return TableResult("monthly_usage", 0L, path)
    val lookbackStart = new java.sql.Timestamp(
      affected.map(_.getTime).min - Etl.SessionGapMinutes * 60L * 1000L)
    val recomputed = Etl.monthlyUsage(ev.where(col("ts") >= lit(lookbackStart)))
      .where(col("month").isin(affected.toSeq: _*))
    val prevMode = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try recomputed.write.mode(SaveMode.Overwrite).partitionBy("month").parquet(path)
    finally prevMode match {
      case Some(m) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", m)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    TableResult("monthly_usage",
      spark.read.parquet(path).count(), path)
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
