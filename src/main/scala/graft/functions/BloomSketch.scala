package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Mergeable Bloom membership filter (Bloom 1970) — the SET-MEMBERSHIP
  * member of the sketch family (HLL=distinct, CMS=frequency, KLL=rank,
  * MG=top-k). The 100 TB use is join pruning: a bounded key set (e.g. a
  * benchmark-decontamination shingle list) compresses to a fixed-size
  * bit array that broadcasts for ~10× less than a hash relation, the
  * fact stream is pruned MAP-SIDE with zero shuffle, and only the
  * surviving sliver pays the exact verify join. One-sided error: false
  * positives only (bounded by the verify join), NEVER false negatives —
  * so prefilter + exact verify is result-identical to the unfiltered
  * plan. Merge is bitwise OR: exact, associative, commutative — per-run
  * filters accumulate across ingests like the other sketch families.
  *
  * Layout: [0..3] = numHashes (int, BE), [4..] = bit array. `contains`
  * indexes the BYTES of the serialized form directly — no per-row
  * deserialization (the heavy-hitters lesson: decoding a sketch per
  * evaluated row is a 20× tax).
  */
object Bloom {

  val DefaultBits = 1 << 20 // 128 KB — fpp ≈ 0.3% at 100k keys, k=6
  val DefaultHashes = 6

  /** splitmix64 finalizer (same mix as [[Cms]]). */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Kirsch-Mitzenmacher double hashing: bit_i = (h1 + i·h2) mod m. */
  private def bit(i: Int, hash: Long, m: Int): Int =
    java.lang.Math.floorMod(hash + i.toLong * (mix(hash) | 1L), m.toLong).toInt

  def empty(numBits: Int, numHashes: Int): Array[Byte] = {
    require(numBits >= 64 && numBits <= (1 << 30) && numBits % 8 == 0,
      s"Bloom numBits=$numBits outside [64, 2^30] or not byte-aligned")
    require(numHashes >= 1 && numHashes <= 16,
      s"Bloom numHashes=$numHashes outside [1, 16]")
    val b = new Array[Byte](4 + numBits / 8)
    b(0) = (numHashes >>> 24).toByte; b(1) = (numHashes >>> 16).toByte
    b(2) = (numHashes >>> 8).toByte; b(3) = numHashes.toByte
    b
  }

  private def numHashes(b: Array[Byte]): Int =
    ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) | ((b(2) & 0xff) << 8) | (b(3) & 0xff)

  def add(b: Array[Byte], hash: Long): Unit = {
    val m = (b.length - 4) * 8
    val k = numHashes(b)
    var i = 0
    while (i < k) {
      val bt = bit(i, hash, m)
      b(4 + (bt >>> 3)) = (b(4 + (bt >>> 3)) | (1 << (bt & 7))).toByte
      i += 1
    }
  }

  /** Bitwise OR, in place into `a` — exact (the filter of the union). */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Unit = {
    require(a.length == b.length && numHashes(a) == numHashes(b),
      s"Bloom merge: shape mismatch (${a.length}/${numHashes(a)} vs " +
        s"${b.length}/${numHashes(b)})")
    var i = 4
    while (i < a.length) { a(i) = (a(i) | b(i)).toByte; i += 1 }
  }

  /** Membership probe straight off the serialized bytes. An EMPTY sketch
    * (merge over an all-NULL group) holds nothing: false. */
  def contains(b: Array[Byte], hash: Long): Boolean = {
    if (b.isEmpty) return false
    val m = (b.length - 4) * 8
    val k = numHashes(b)
    var i = 0
    while (i < k) {
      val bt = bit(i, hash, m)
      if ((b(4 + (bt >>> 3)) & (1 << (bt & 7))) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_build(expr[, numBits[, numHashes]])` — aggregate a column into
  * a binary Bloom filter. */
case class BloomBuildAgg(
    child: Expression,
    numBits: Int = Bloom.DefaultBits,
    numHashes: Int = Bloom.DefaultHashes,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] =
    Bloom.empty(numBits, numHashes)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buffer, XxHash64Function.hash(v, child.dataType, 42L))
    buffer
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    Bloom.mergeInto(a, b); a
  }

  override def eval(buffer: Array[Byte]): Any = buffer.clone()
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_build"
}

/** `bloom_merge(filter)` — aggregate persisted filters (bitwise OR). */
case class BloomMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val s = v.asInstanceOf[Array[Byte]]
    // a persisted EMPTY filter (0 bytes, from bloom_merge over an
    // all-NULL group) matches nothing — skip it regardless of arrival
    // order (same guard as merge())
    if (s.isEmpty) buffer
    else if (buffer.isEmpty) s.clone()
    else { Bloom.mergeInto(buffer, s); buffer }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else { Bloom.mergeInto(a, b); a }

  override def eval(buffer: Array[Byte]): Any = buffer.clone()
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "bloom_merge"
}

/** `bloom_contains(filter, value)` — membership probe (false positives
  * possible, false negatives impossible). Probes the serialized bytes in
  * place, so it is safe in a per-row scan position — this is the hot-path
  * expression the map-side join pruning runs on every fact row.
  * CodegenFallback costs one virtual call per row; the probe itself does
  * no allocation. */
case class BloomContains(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(sketch: Any, value: Any): Any =
    Bloom.contains(sketch.asInstanceOf[Array[Byte]],
      XxHash64Function.hash(value, right.dataType, 42L))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_contains"
}

object BloomFunctions {
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.types.StringType

  /** Aggregate a column into a persistable binary Bloom filter. Keys are
    * cast through STRING so build and probe hash the same bytes whatever
    * each side's column type is — XxHash64 hashes INT and BIGINT
    * differently, and a build/probe type mismatch would otherwise turn
    * into SILENT false negatives, the one error class a Bloom filter
    * must never have (same canonical-form contract as MgFunctions and
    * portable_hash). */
  def bloomBuild(
      c: Column,
      numBits: Int = Bloom.DefaultBits,
      numHashes: Int = Bloom.DefaultHashes): Column =
    ExpressionUtils.column(
      BloomBuildAgg(Cast(ExpressionUtils.expression(c), StringType),
        numBits, numHashes).toAggregateExpression())

  /** Aggregate (merge) persisted filters — exact union. */
  def bloomMerge(c: Column): Column =
    ExpressionUtils.column(
      BloomMergeAgg(ExpressionUtils.expression(c)).toAggregateExpression())

  /** Membership probe of `value` against `filter` (value string-cast —
    * see [[bloomBuild]]). */
  def bloomContains(sketch: Column, value: Column): Column =
    ExpressionUtils.column(BloomContains(
      ExpressionUtils.expression(sketch),
      Cast(ExpressionUtils.expression(value), StringType)))
}
