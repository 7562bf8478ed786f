package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Mergeable count-min sketch (Cormode & Muthukrishnan 2005) — the
  * frequency-domain sibling of [[Hll]]: persistable per-run sketches whose
  * merge (element-wise counter ADD) is exact, so heavy-hitter/frequency
  * state accumulates across append-only ingests without rescanning
  * history. Point queries overestimate only (min over d=4 rows), with
  * error ≤ e/w · N at confidence 1 - e^-4; w=2048 longs × 4 rows = 64 KB
  * per sketch. Same 100 TB posture as the HLL family: one hash per row
  * per input map-side, the shuffle carries one fixed-size buffer per
  * (group × partition).
  */
object Cms {

  val Depth = 4

  /** splitmix64 finalizer — a full-avalanche mix of the input hash. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Row buckets via Kirsch-Mitzenmacher double hashing: h_r = h1 + r·h2
    * with h2 a full-avalanche mix of h1. NOT a per-row XOR of constants —
    * for power-of-2 widths `(h ^ c) % w` permutes the same low bits in
    * every row, so two keys colliding in one row would collide in ALL of
    * them and the d rows would buy zero independence.
    */
  private[graft] def bucket(row: Int, hash: Long, w: Int): Int =
    java.lang.Math.floorMod(hash + row.toLong * (mix(hash) | 1L), w.toLong).toInt

  def counters(w: Int): Array[Long] = {
    require(w >= 16 && w <= (1 << 20), s"CMS width w=$w outside [16, 2^20]")
    new Array[Long](Depth * w)
  }

  def add(c: Array[Long], hash: Long): Unit = {
    val w = c.length / Depth
    var r = 0
    while (r < Depth) { c(r * w + bucket(r, hash, w)) += 1L; r += 1 }
  }

  /** Element-wise add, in place into `a` — exact (counters are linear). */
  def mergeInto(a: Array[Long], b: Array[Long]): Unit = {
    require(a.length == b.length,
      s"CMS merge: width mismatch (${a.length} vs ${b.length} counters)")
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
  }

  /** Point frequency estimate: min over rows — never underestimates.
    * An EMPTY sketch (cms_merge over an all-NULL group keeps its
    * zero-length init buffer) holds no observations, so every point
    * estimate is 0 — guarded here rather than crashing on width 0,
    * mirroring Hll.estimate's empty-case handling.
    */
  def query(c: Array[Long], hash: Long): Long = {
    if (c.isEmpty) return 0L
    val w = c.length / Depth
    var min = Long.MaxValue
    var r = 0
    while (r < Depth) {
      val v = c(r * w + bucket(r, hash, w))
      if (v < min) min = v
      r += 1
    }
    min
  }

  def serialize(c: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(c.length * 8)
    bb.asLongBuffer().put(c)
    bb.array()
  }

  def deserialize(b: Array[Byte]): Array[Long] = {
    val out = new Array[Long](b.length / 8)
    java.nio.ByteBuffer.wrap(b).asLongBuffer().get(out)
    out
  }
}

/** `cms_sketch(expr, w)` — aggregate any-typed column into a binary CMS. */
case class CmsSketchAgg(
    child: Expression,
    w: Int = 2048,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = Cms.counters(w)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Cms.add(buffer, XxHash64Function.hash(v, child.dataType, 42L))
    buffer
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    Cms.mergeInto(a, b); a
  }

  override def eval(buffer: Array[Long]): Any = Cms.serialize(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = Cms.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_sketch"
}

/** `cms_merge(sketch)` — aggregate persisted binary sketches (exact). */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val s = Cms.deserialize(v.asInstanceOf[Array[Byte]])
    if (buffer.isEmpty) s else { Cms.mergeInto(buffer, s); buffer }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else { Cms.mergeInto(a, b); a }

  override def eval(buffer: Array[Long]): Any = Cms.serialize(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] = Cms.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "cms_merge"
}

/** `cms_query(sketch, value)` — point frequency estimate (≥ true count).
  * The value's TYPE must match what was sketched (same hash contract as
  * the aggregate). CodegenFallback: runs on aggregate outputs, not in a
  * per-row hot path.
  */
case class CmsQuery(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(sketch: Any, value: Any): Any =
    Cms.query(Cms.deserialize(sketch.asInstanceOf[Array[Byte]]),
      XxHash64Function.hash(value, right.dataType, 42L))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cms_query"
}

object CmsFunctions {
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.StringType

  /** Aggregate a column into a persistable binary count-min sketch. Keys
    * are cast through STRING so sketch and query hash the same bytes
    * whatever each side's column type is — XxHash64 hashes INT and
    * BIGINT differently, and a build/query type mismatch would read
    * unrelated cells, silently UNDER-estimating and breaking the
    * never-underestimate guarantee llm_heavy_hitters' candidate pruning
    * rests on (same canonical-form contract as Mg/Bloom/portable_hash).
    */
  def cmsSketch(c: Column, w: Int = 2048): Column =
    ExpressionUtils.column(
      CmsSketchAgg(Cast(ExpressionUtils.expression(c), StringType), w)
        .toAggregateExpression())

  /** Aggregate (merge) persisted binary sketches — exact. */
  def cmsMerge(c: Column): Column =
    ExpressionUtils.column(
      CmsMergeAgg(ExpressionUtils.expression(c)).toAggregateExpression())

  /** Point frequency estimate of `value` in `sketch` (overestimate-only;
    * value string-cast — see [[cmsSketch]]). */
  def cmsQuery(sketch: Column, value: Column): Column =
    ExpressionUtils.column(CmsQuery(
      ExpressionUtils.expression(sketch),
      Cast(ExpressionUtils.expression(value), StringType)))
}
