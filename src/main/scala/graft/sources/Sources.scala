package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** §2.A sources & sinks beyond the harness parquet tables (SURVEY.md).
  * These rows are declare=no (no file/DB fixture in the harness) but part
  * of the complete surface: a reference user ingests JSON/CSV exports and
  * reads/writes a PostgreSQL warehouse (R1/R2/R11).
  */
object Sources {

  /** Newline-delimited JSON ingest (HQ-export-API payload stand-in, R1).
    * With a schema the read is single-pass; `inferJson` double-reads (one
    * inference pass) — acceptable for small config-driven imports only.
    */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def inferJson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** CSV ingest with header + typed casting (R export interop, R11). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** Partition-parallel JDBC read (PostgreSQL warehouse interop, R1/R2).
    * `partitionColumn` splits the table into `numPartitions` range-bounded
    * queries so the read scales with executors instead of a single cursor.
    * Untestable in this harness (no DB); the option plumbing is the
    * documented Spark JDBC contract.
    */
  def readJdbc(
      spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, props: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
    props.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  /** Append to a warehouse table over JDBC (R2/R9). True upsert needs a
    * DB-side MERGE from a staging table; Spark's contract is append.
    */
  def writeJdbc(df: DataFrame, url: String, table: String,
      props: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc").mode(SaveMode.Append)
      .option("url", url).option("dbtable", table)
    props.foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }.save()
  }

  /** Date-partitioned lake layout (100 TB posture): partition pruning on
    * `event_date` is what turns full scans into day-range scans.
    */
  def sinkPartitioned(df: DataFrame, tsCol: String, outDir: String): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("event_date")
      .parquet(outDir)

  /** Plain parquet sink (what Verify does for every declared query). */
  def sinkParquet(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(outDir)
}
