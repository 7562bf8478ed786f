package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{SparkSession}
import org.apache.spark.sql.functions._

/** §2.A declared source keys (round 10): the CSV and JSON readers pushed
  * through the driver's DuckDB gate. The harness ships no csv/json
  * fixtures, so each key ROUND-TRIPS the parquet fact through the text
  * format inside the plan — write lineitem columns as csv/json lines,
  * read them back with an explicit schema, aggregate — while the oracle
  * computes the same aggregate straight off the parquet table: any
  * parse/typing/row-loss defect in the reader hash-mismatches. Columns
  * are integer keys + a flag string (text round-trip of integers and
  * plain strings is exact by construction; float text round-tripping is
  * the formatter's contract, not the reader's, so it stays out of the
  * gate). The write is a bounded temp-dir spill — the exact shape of a
  * staging export — and the read-back scan is schema-pinned
  * (inference is a separate, spec-level concern: SourcesSpec).
  */
object SourcesOps {

  /** ONE fixed spill dir per format, overwritten on every execution —
    * a fresh createTempDirectory per run accumulated ~600k-row text
    * exports across bench passes without bound (round-11 advice fix).
    * Single-process discipline matches the harness (bench/verify never
    * run this key concurrently); the write below is mode(overwrite). */
  private def roundTripDir(fmt: String): String =
    new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_src_roundtrip_$fmt").toString

  private val oracleSql =
    """SELECT l_returnflag,
      |       CAST(count(*) AS BIGINT) AS n_rows,
      |       CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
      |       CAST(sum(l_partkey) AS BIGINT) AS sum_pk,
      |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
      |FROM lineitem
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  private def roundTrip(
      s: SparkSession, d: String, fmt: String): org.apache.spark.sql.DataFrame = {
    val dir = roundTripDir(fmt)
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
    val src = Tables(s, d, "lineitem").select(cols.map(col): _*)
    src.write.mode("overwrite")
      .option("header", fmt == "csv").format(fmt).save(dir)
    val schema = "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT," +
      " l_returnflag STRING"
    val back = s.read.schema(schema)
      .option("header", fmt == "csv").format(fmt).load(dir)
    back.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_orderkey")).as("sum_ok"),
        sum(col("l_partkey")).as("sum_pk"),
        countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy("l_returnflag")
  }

  val qs: Seq[Q] = Seq(
    // src_csv through the driver gate: header-on write, schema-pinned
    // read-back, aggregate must hash-match the parquet truth.
    Q("src_csv_roundtrip", oracleSql)((s, d) => roundTrip(s, d, "csv")),
    // src_json (newline-delimited) through the same gate.
    Q("src_json_roundtrip", oracleSql)((s, d) => roundTrip(s, d, "json")),
    // src_orc through the same gate (round 12): the second COLUMNAR
    // lake format, previously spec-only — Spark's native ORC reader
    // (vectorized, predicate-pushdown-capable like the parquet path)
    // round-trips the fact columns and must hash-match the parquet
    // truth; any encoding/typing/row-loss defect in either direction
    // surfaces at the gate.
    Q("src_orc_roundtrip", oracleSql)((s, d) => roundTrip(s, d, "orc")),

    // src_parquet_partitioned (round 13, cont.): the LAKE LAYOUT gate —
    // write the fact hive-partitioned by l_returnflag, read it back
    // with a partition-column filter, aggregate. Beyond the format
    // round-trip the other src keys prove, this pins the two behaviors
    // a partitioned lake lives on: partition values round-trip through
    // directory names (typed back via the pinned schema), and the
    // filter lands as PartitionFilters in the scan — at 100 TB the
    // pruned partition is never listed, let alone read. The oracle
    // computes the same filtered aggregate off the unpartitioned
    // parquet truth; a value lost or retyped by the partition encoding
    // hash-mismatches.
    Q("src_parquet_partitioned",
      """SELECT l_returnflag,
        |       CAST(count(*) AS BIGINT) AS n_rows,
        |       CAST(sum(l_orderkey) AS BIGINT) AS sum_ok,
        |       CAST(sum(l_partkey) AS BIGINT) AS sum_pk,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
        |FROM lineitem WHERE l_returnflag IN ('A', 'R')
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
      (s, d) =>
      val dir = roundTripDir("parquet_part")
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag")
      Tables(s, d, "lineitem").select(cols.map(col): _*)
        .write.mode("overwrite").partitionBy("l_returnflag")
        .parquet(dir)
      val schema = "l_orderkey BIGINT, l_partkey BIGINT, l_suppkey BIGINT," +
        " l_returnflag STRING"
      s.read.schema(schema).parquet(dir)
        .where(col("l_returnflag").isin("A", "R"))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_orderkey")).as("sum_ok"),
          sum(col("l_partkey")).as("sum_pk"),
          countDistinct(col("l_suppkey")).as("n_supp"))
        .orderBy("l_returnflag")
    }
  )
}
