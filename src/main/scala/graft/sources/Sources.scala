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

  /** ORC read/write (round 4): the other columnar warehouse interchange
    * format Spark ships natively — same vectorized reader, predicate
    * pushdown, and column pruning posture as parquet (SourcesSpec pins
    * the round-trip and the pushed filter), so a reference user with an
    * ORC-based Hive warehouse can ingest without conversion.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def sinkOrc(df: DataFrame, outDir: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(outDir)

  /** Binary-object ingest (R1 × the multimodal north star): every media
    * object lands as one row — (path, modificationTime, length, content)
    * — off Spark's native binaryFile source, the crawl-ingest entry that
    * feeds the multimodal column (attach a mime from the path, wrap as
    * the Media struct, header-decode batch-wise; SourcesSpec runs that
    * loop end-to-end on JDK-encoded bytes). Listing and reads are
    * partition-parallel across files, and `pathGlobFilter` prunes at
    * LISTING time — non-matching objects cost a directory entry, never a
    * byte fetch.
    */
  def readBinary(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile").option("pathGlobFilter", glob).load(dir)

  // ------------------------------------------------------------------
  // R2 schema evolution — a migration-managed lake without a table format.
  // The reference's warehouse survives schema drift via SQL migrations;
  // the lake analog is versioned parquet snapshots whose schema changed
  // over time. Two read paths cover the drift taxonomy:
  //  - ADDED columns           → readEvolved (mergeSchema; old files NULL)
  //  - RENAMED columns         → readEvolved (coalesce into canonical name)
  //  - WIDENED / retyped cols  → readVersioned (parquet footers with e.g.
  //    int32 vs int64 CANNOT schema-merge at scan time; read each snapshot
  //    with its own schema, normalize, then unionByName)
  // ------------------------------------------------------------------

  /** Read a multi-snapshot lake dir with schema merging, then apply a
    * migration spec: `renames` maps old column name → canonical name
    * (values from files that used the old name are coalesced under the
    * canonical one — parquet has no aliasing, so rename IS coalesce);
    * `casts` maps column → target type, applied last so every version
    * lands on one canonical type. At 100 TB `mergeSchema` reads ALL file
    * footers — on a big lake pass a summary schema instead; the coalesce
    * layer itself is a zero-shuffle projection.
    */
  def readEvolved(
      spark: SparkSession, lakeDir: String,
      renames: Map[String, String] = Map.empty,
      casts: Map[String, String] = Map.empty): DataFrame = {
    val raw = spark.read.option("mergeSchema", "true").parquet(lakeDir)
    val renamed = renames.foldLeft(raw) { case (df, (oldName, canon)) =>
      val has = df.columns.map(_.toLowerCase).toSet
      if (has(oldName.toLowerCase) && has(canon.toLowerCase))
        df.withColumn(canon, coalesce(col(canon), col(oldName))).drop(oldName)
      else if (has(oldName.toLowerCase)) df.withColumnRenamed(oldName, canon)
      else df
    }
    casts.foldLeft(renamed) { case (df, (c, t)) =>
      if (df.columns.map(_.toLowerCase).contains(c.toLowerCase))
        df.withColumn(c, col(c).cast(t))
      else df
    }
  }

  /** Read snapshot dirs whose file-level types DIVERGED (mergeSchema would
    * fail on e.g. int32 vs int64 footers): each version is read with its
    * own schema, normalized by `migrate(df, versionIndex)` (casts/renames
    * per version), and the results are unioned by NAME with missing
    * columns null-filled — old data stays queryable under the newest
    * schema. Union of parquet scans = no shuffle; version index doubles as
    * provenance if `migrate` wants to stamp it.
    */
  def readVersioned(
      spark: SparkSession, versionDirs: Seq[String],
      migrate: (DataFrame, Int) => DataFrame = (df, _) => df): DataFrame = {
    require(versionDirs.nonEmpty,
      "readVersioned: no snapshot dirs (an empty lake glob?)")
    versionDirs.zipWithIndex
      .map { case (dir, i) => migrate(spark.read.parquet(dir), i) }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Small-file compaction (lake maintenance, round 7): rewrite a parquet
    * directory into ceil(totalBytes / targetBytes) files. Streaming
    * ingest (one file per micro-batch per partition) and incremental
    * merges accumulate thousands of KB-sized files; at 100 TB that turns
    * every downstream scan into a listing + footer-read + task-scheduling
    * storm (one task per file, seconds of overhead each) long before a
    * byte of data is read — periodic compaction to ~128 MB files is the
    * standing fix, and 128 MB ≈ one HDFS/object-store block ≈ one healthy
    * scan task.
    *
    * Shape: ONE wide rewrite — a round-robin repartition (no key, so no
    * skew risk) sized off the LISTED bytes, not a collect. The rewrite
    * lands in a sibling temp dir first and swaps in via two renames, so a
    * concurrent reader sees the old files or the new files, never a
    * half-written mix. The swap is directory-level best-effort (object
    * stores have no atomic rename — there, this utility is exactly the
    * compaction loop a table format (Iceberg/Delta) runs under a real
    * commit protocol; the Spark-side plan is identical).
    *
    * @return (files before, files after)
    */
  def compactSmallFiles(
      spark: SparkSession, dir: String,
      targetBytes: Long = 128L << 20): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(path)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val tmp = new Path(path.getParent, path.getName + ".compacting")
    fs.delete(tmp, true)
    spark.read.parquet(dir)
      .repartition(nOut)
      .write.mode("overwrite").parquet(tmp.toString)
    val old = new Path(path.getParent, path.getName + ".compacted_old")
    fs.delete(old, true)
    require(fs.rename(path, old), s"compact: could not retire $path")
    require(fs.rename(tmp, path), s"compact: could not publish $tmp")
    fs.delete(old, true)
    (dataFiles.length, nOut)
  }
}
