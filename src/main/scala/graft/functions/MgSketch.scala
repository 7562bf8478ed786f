package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/** Mergeable Misra-Gries top-k summary (Misra & Gries 1982; merge rule
  * from Agarwal, Cormode, Huang, Phillips, Wei, Yi — "Mergeable
  * Summaries", PODS 2012). Completes the mergeable-aggregate quartet:
  * distinct (HLL), frequency-point (CMS), rank (KLL), and now TOP-K —
  * unlike CMS, the sketch carries the heavy items THEMSELVES, so a
  * "what are the top tokens" report needs no second pass over the
  * vocabulary to enumerate candidates.
  *
  * Guarantee (holds after any update/merge sequence): for every item,
  *   est(x) ≤ true(x) ≤ est(x) + (n − Σ counters) / (k + 1)
  * — each decrement step (update) or offset-subtract (merge) removes at
  * least k+1 units of total weight, so the data-dependent bound
  * [[Mg.maxUnderestimate]] never exceeds n/(k+1). Any item with true
  * frequency above n/(k+1) is therefore guaranteed present.
  *
  * 100 TB posture, same as the sibling families: one map-side summary
  * per (group × partition), the shuffle carries ≤ k entries per summary,
  * and persisted per-run sketches keep accumulating by `mg_merge` without
  * rescanning history. When the distinct-item count never exceeds k the
  * sketch is EXACT and the serialized form (entries sorted by item) is
  * bit-stable across partitionings.
  */
object Mg {

  val DefaultK = 64

  /** Aggregation state: item → surviving count, plus total mass seen.
    * k == 0 marks the "no sketch observed yet" state of a merge buffer
    * (the real k is adopted from the first incoming sketch).
    */
  final class Buf(var k: Int) {
    var n: Long = 0L
    val counts: mutable.HashMap[String, Long] = mutable.HashMap.empty
  }

  def add(b: Buf, item: String): Unit = {
    b.n += 1
    b.counts.get(item) match {
      case Some(c) => b.counts.update(item, c + 1)
      case None =>
        if (b.counts.size < b.k) b.counts.update(item, 1L)
        else {
          // classic MG step: the arriving item and every stored counter
          // each give up one unit (k+1 total weight retired)
          val dead = mutable.ArrayBuffer.empty[String]
          b.counts.mapValuesInPlace((_, c) => c - 1)
          for ((i, c) <- b.counts if c == 0L) dead += i
          dead.foreach(b.counts.remove)
        }
    }
  }

  /** Mergeable-summaries combine: sum counters, then if more than k
    * survive, subtract the (k+1)-th largest count from all (retiring
    * ≥ k+1 weight per unit subtracted — the same accounting as the
    * update-time decrement, so the error bound ADDS across merges).
    */
  def mergeInto(a: Buf, b: Buf): Unit = {
    require(a.k == b.k, s"MG merge: k mismatch (${a.k} vs ${b.k})")
    a.n += b.n
    for ((i, c) <- b.counts)
      a.counts.update(i, a.counts.getOrElse(i, 0L) + c)
    if (a.counts.size > a.k) {
      val cut = a.counts.values.toArray.sorted(Ordering[Long].reverse)(a.k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.counts.mapValuesInPlace((_, c) => c - cut)
      for ((i, c) <- a.counts if c <= 0L) dead += i
      dead.foreach(a.counts.remove)
    }
  }

  /** Data-dependent underestimate bound: (n − Σ counters)/(k+1), the
    * exact total weight retired by decrement/subtract steps ÷ the
    * minimum retired per unit of estimate lost. 0 ⇔ sketch is exact. */
  def maxUnderestimate(b: Buf): Long =
    if (b.k == 0) 0L else (b.n - b.counts.values.sum) / (b.k + 1)

  /** Entries sorted by (count desc, item asc) — a deterministic report
    * order regardless of hash-map iteration. */
  def top(b: Buf, m: Int): Seq[(String, Long)] =
    b.counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(m)

  /** Serialized form sorts entries by item so the bytes are independent
    * of hash-map iteration order — in the exact regime (distinct ≤ k,
    * no decrements) merged and one-pass sketches are bit-identical. */
  def serialize(b: Buf): Array[Byte] = {
    val entries = b.counts.toSeq.sortBy(_._1)
      .map { case (i, c) => (i.getBytes(UTF_8), c) }
    val bb = ByteBuffer.allocate(
      4 + 8 + 4 + entries.map(e => 4 + e._1.length + 8).sum)
    bb.putInt(b.k).putLong(b.n).putInt(entries.size)
    for ((bytes, c) <- entries) {
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Buf(bb.getInt)
    b.n = bb.getLong
    val size = bb.getInt
    var i = 0
    while (i < size) {
      val len = bb.getInt
      val s = new Array[Byte](len)
      bb.get(s)
      b.counts.update(new String(s, UTF_8), bb.getLong)
      i += 1
    }
    b
  }
}

/** `mg_sketch(expr[, k])` — aggregate a column into a binary MG top-k
  * summary (input is string-cast by the public wrappers, so any key type
  * sketches by its canonical string form — same contract as
  * portable_hash). */
case class MgSketchAgg(
    child: Expression,
    k: Int = Mg.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Mg.Buf] {

  require(k >= 1 && k <= (1 << 16), s"MG k=$k outside [1, 65536]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Mg.Buf = new Mg.Buf(k)

  override def update(buffer: Mg.Buf, input: InternalRow): Mg.Buf = {
    val v = child.eval(input)
    if (v != null) Mg.add(buffer, v.toString)
    buffer
  }

  override def merge(a: Mg.Buf, b: Mg.Buf): Mg.Buf = { Mg.mergeInto(a, b); a }

  override def eval(buffer: Mg.Buf): Any = Mg.serialize(buffer)
  override def serialize(buffer: Mg.Buf): Array[Byte] = Mg.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Mg.Buf = Mg.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_sketch"
}

/** `mg_merge(sketch)` — aggregate persisted binary MG summaries. */
case class MgMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Mg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Mg.Buf = new Mg.Buf(0)

  override def update(buffer: Mg.Buf, input: InternalRow): Mg.Buf = {
    val v = child.eval(input)
    if (v == null) return buffer
    val s = Mg.deserialize(v.asInstanceOf[Array[Byte]])
    // a persisted EMPTY summary (k=0, from mg_merge over an all-NULL
    // group) carries nothing — skip it, whatever order it arrives in
    // (same guard as merge(); KllMergeAgg.update set the pattern)
    if (s.k == 0) buffer
    else if (buffer.k == 0) s
    else { Mg.mergeInto(buffer, s); buffer }
  }

  override def merge(a: Mg.Buf, b: Mg.Buf): Mg.Buf =
    if (a.k == 0) b
    else if (b.k == 0) a
    else { Mg.mergeInto(a, b); a }

  override def eval(buffer: Mg.Buf): Any = Mg.serialize(buffer)
  override def serialize(buffer: Mg.Buf): Array[Byte] = Mg.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Mg.Buf = Mg.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "mg_merge"
}

/** `mg_topk(sketch, m)` — the summary's top-m entries as
  * ARRAY<STRUCT<item STRING, est BIGINT>>, ordered (est desc, item asc).
  * `est` is the surviving counter: never above the true count, below it
  * by at most (n − Σ counters)/(k+1). CodegenFallback: runs on aggregate
  * outputs, not in a per-row hot path. */
case class MgTopk(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(sketch: Any, m: Any): Any = {
    val b = Mg.deserialize(sketch.asInstanceOf[Array[Byte]])
    new GenericArrayData(Mg.top(b, m.asInstanceOf[Int]).map {
      case (item, est) => InternalRow(UTF8String.fromString(item), est)
    }.toArray[Any])
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "mg_topk"
}

object MgFunctions {
  import org.apache.spark.sql.types.{IntegerType, StringType}

  /** Aggregate a column into a persistable binary Misra-Gries summary.
    * Input is cast through STRING so any key type sketches by its
    * canonical form. */
  def mgSketch(c: Column, k: Int = Mg.DefaultK): Column =
    ExpressionUtils.column(
      MgSketchAgg(Cast(ExpressionUtils.expression(c), StringType), k)
        .toAggregateExpression())

  /** Aggregate (merge) persisted binary MG summaries. */
  def mgMerge(c: Column): Column =
    ExpressionUtils.column(
      MgMergeAgg(ExpressionUtils.expression(c)).toAggregateExpression())

  /** Top-m entries of a summary as an array of (item, est) structs. */
  def mgTopk(sketch: Column, m: Column): Column =
    ExpressionUtils.column(MgTopk(
      ExpressionUtils.expression(sketch),
      Cast(ExpressionUtils.expression(m), IntegerType)))
}
