package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder, Encoders, functions => F}

/** Custom typed UDAFs (SURVEY.md §2.L, §4.3): element-wise vector math has
  * no built-in aggregate, so these are genuine `Aggregator` cases. Both are
  * associative/commutative with O(dim) buffers — they partial-aggregate
  * map-side, so at 100 TB the shuffle carries one buffer per (group ×
  * partition), not per row.
  */
object Aggregators {

  /** Element-wise mean of float vectors → Array[Double] (llm_centroid_udaf). */
  case class CentroidBuf(sum: Array[Double], n: Long)

  class CentroidAgg extends Aggregator[Array[Float], CentroidBuf, Array[Double]] {
    override def zero: CentroidBuf = CentroidBuf(Array.emptyDoubleArray, 0L)

    override def reduce(b: CentroidBuf, a: Array[Float]): CentroidBuf = {
      if (a == null) return b
      val s = if (b.sum.isEmpty) new Array[Double](a.length) else b.sum
      // Ragged input must FAIL, not silently truncate to the shorter vector
      // (which would diverge from the explode-based oracle semantics).
      require(s.length == a.length,
        s"CentroidAgg: vector length ${a.length} != expected ${s.length}")
      var i = 0
      while (i < a.length) { s(i) += a(i); i += 1 }
      CentroidBuf(s, b.n + 1)
    }

    override def merge(x: CentroidBuf, y: CentroidBuf): CentroidBuf = {
      if (x.sum.isEmpty) return y
      if (y.sum.isEmpty) return x
      require(x.sum.length == y.sum.length,
        s"CentroidAgg: partial length ${y.sum.length} != expected ${x.sum.length}")
      val s = x.sum.clone()
      var i = 0
      while (i < s.length) { s(i) += y.sum(i); i += 1 }
      CentroidBuf(s, x.n + y.n)
    }

    override def finish(b: CentroidBuf): Array[Double] =
      if (b.n == 0) Array.emptyDoubleArray else b.sum.map(_ / b.n)

    override def bufferEncoder: Encoder[CentroidBuf] = Encoders.product[CentroidBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      ExpressionEncoder[Array[Double]]()
  }

  /** 64-bit SimHash over pre-hashed tokens (llm_simhash): per bit, count
    * +1/-1 votes across token hashes; output sets bits with positive vote.
    */
  class SimHashAgg extends Aggregator[Long, Array[Long], Long] {
    override def zero: Array[Long] = new Array[Long](64)

    override def reduce(b: Array[Long], h: Long): Array[Long] = {
      var i = 0
      while (i < 64) {
        if (((h >>> i) & 1L) == 1L) b(i) += 1 else b(i) -= 1
        i += 1
      }
      b
    }

    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < 64) { x(i) += y(i); i += 1 }
      x
    }

    override def finish(b: Array[Long]): Long = {
      var out = 0L
      var i = 0
      while (i < 64) {
        if (b(i) > 0) out |= (1L << i)
        i += 1
      }
      out
    }

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  def centroid(c: Column): Column =
    F.udaf(new CentroidAgg, ExpressionEncoder[Array[Float]]()).apply(c)

  def simhash(c: Column): Column =
    F.udaf(new SimHashAgg, Encoders.scalaLong).apply(c)
}
