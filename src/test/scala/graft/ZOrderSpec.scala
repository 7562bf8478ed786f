package graft

import graft.functions.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("column z-key == bit-loop reference on random grid points") {
    val rnd = new scala.util.Random(7)
    // the documented domain is a ≤31-bit grid per dimension
    val pts = Seq.fill(500)((rnd.nextInt() & 0x7fffffffL, rnd.nextInt() & 0x7fffffffL))
    val got = pts.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.key(col("a"), col("b")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ZOrder.keyRef(r.getLong(0), r.getLong(1)))
      // signed ordering == z-curve ordering requires a non-negative key —
      // the reason the grid caps at 31 bits per dimension
      assert(r.getLong(2) >= 0L)
    }
  }

  test("z-key top bits are the interleaved tile coordinates (locality law)") {
    // the property that makes z-sorted layouts skip on BOTH dimensions:
    // all points of a 2^s × 2^s tile share the same z-prefix, so the tile
    // is one contiguous key range — algebraically, z(a,b) >> 2s must
    // equal z(a >> s, b >> s)
    val rnd = new scala.util.Random(11)
    for (_ <- 0 until 200; s <- Seq(4, 8, 16)) {
      val a = rnd.nextInt() & 0x7fffffffL
      val b = rnd.nextInt() & 0x7fffffffL
      assert((ZOrder.keyRef(a, b) >>> (2 * s)) == ZOrder.keyRef(a >>> s, b >>> s))
    }
  }

  test("z-key stays inside whole-stage codegen (no UDF in the write path)") {
    val df = spark.range(10).select(
      ZOrder.key(col("id"), col("id") * 3).as("z"))
    // the "*(1)" prefix is the WholeStageCodegen stage marker — the whole
    // interleave collapses into one generated-code projection
    assert(df.queryExecution.executedPlan.toString.startsWith("*(1) Project"))
    // sanity: interleave of (1,0) is bit 0 set; of (0,1) is bit 1
    assert(ZOrder.keyRef(1, 0) == 1L && ZOrder.keyRef(0, 1) == 2L)
    // 31 bits spread over even positions 0..60; the max key stays positive
    assert(ZOrder.keyRef(0x7fffffffL, 0) == 0x1555555555555555L)
    assert(ZOrder.keyRef(0x7fffffffL, 0x7fffffffL) == 0x3fffffffffffffffL)
  }
}
