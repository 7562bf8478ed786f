package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the declared §2.D reports that have structure beyond a
  * plain hash aggregate (the DuckDB oracle pins values; these pin the
  * distribution-report semantics on the real fixtures).
  */
class AggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("agg_histogram: buckets cover every row, CDF is monotone and ends at 1") {
    val sf = "/root/testdata/sf0.001"
    val hist = SparkEntry.queries("agg_histogram")(spark, sf).collect()
    val events = Tables(spark, sf, "events").where(col("value").isNotNull)

    // the bucket counts partition the input: sum(n) == non-null row count
    assert(hist.map(_.getAs[Long]("n")).sum == events.count())
    assert(hist.forall(_.getAs[Long]("n") > 0))
    // buckets strictly increasing; bucket_lo is the bucket's left edge
    val buckets = hist.map(_.getAs[Long]("bucket"))
    assert(buckets.sorted.toSeq == buckets.toSeq && buckets.distinct.length == buckets.length)
    assert(hist.forall(r => r.getAs[Double]("bucket_lo") == r.getAs[Long]("bucket") * 100.0))
    // cum_n is the prefix sum of n; cdf monotone, final value exactly 1
    val cums = hist.map(_.getAs[Long]("cum_n"))
    assert(cums.toSeq == hist.map(_.getAs[Long]("n")).scanLeft(0L)(_ + _).tail.toSeq)
    val cdfs = hist.map(_.getAs[Double]("cdf"))
    assert(cdfs.zip(cdfs.tail).forall { case (a, b) => a <= b })
    assert(cdfs.last == 1.0)
  }
}
