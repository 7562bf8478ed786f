package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness testdata tables (schemas: FIXTURES.md).
  *
  * Design note (100 TB posture): every operator receives the table as a
  * lazily-planned DataFrame straight off the vectorized Parquet reader, so
  * Catalyst's column pruning / predicate pushdown reach the scan. Nothing is
  * cached or collected here; at cluster scale these reads become
  * partition-pruned object-store scans with no driver involvement.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is stored as parquet INT64 TIMESTAMP(NANOS), which Spark
      // has no native type for. Read it as raw nanos (legacy conf) and
      // truncate to microseconds with integer division — exactly what
      // DuckDB's TIMESTAMP_NS → TIMESTAMP cast does, so the oracle agrees.
      // The conf is deliberately NOT set/restored around this call: Spark
      // consults it again at physical-plan build time (i.e. at the first
      // action on the returned lazy DataFrame), so restoring it here would
      // break execution. It only affects TIMESTAMP(NANOS) parquet columns —
      // of the harness tables, only events.ts — so leaving it set cannot
      // change any other table's read.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts DIV 1000")))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}

/** One declared operator: the Spark implementation plus (when the semantics
  * are ANSI-SQL-expressible) the DuckDB oracle twin the driver hash-compares
  * against at sf0.01. Keeping both in one value is what keeps column names,
  * ordering, and rounding in sync (SURVEY.md §7.4 checklist).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Oracle-checked query. Since round 2 EVERY declared query has an
    * oracle (the driver treats oracle-less keys as failures, and
    * PortableHash made even the hash-seeded ops SQL-expressible), so this
    * is the only constructor.
    */
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
}
