package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.D agg_approx_distinct (declare=no): HLL++ sketches differ from
  * DuckDB's, so the check is the documented rsd error bound vs exact
  * (SURVEY.md §2.D) — the 100 TB path for distinct counts.
  */
class ApproxSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct stays within the configured rsd of exact") {
    val ev = Tables(spark, "/root/testdata/sf0.01", "events")
    val exact = ev.agg(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.agg(approx_count_distinct(col("user_id"), 0.02))
      .head().getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.06, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("approx_percentile brackets the exact percentile") {
    val ev = Tables(spark, "/root/testdata/sf0.01", "events")
    val exact = ev.agg(percentile(col("value"), lit(0.5))).head().getDouble(0)
    val approx = ev.agg(percentile_approx(col("value"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    assert(math.abs(approx - exact) / math.abs(exact) < 0.05)
  }
}
