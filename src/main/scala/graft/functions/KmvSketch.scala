package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.{ImperativeAggregate, TypedImperativeAggregate}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType, LongType}

/** KMV / theta distinct-count sketch (Bar-Yossef et al. 2002; the
  * Theta-sketch generalization of Dasgupta et al. 2016): keep the k
  * SMALLEST distinct hash values of a stream. θ = the k-th smallest value
  * normalized to [0,1); the estimator (k-1)/θ is unbiased with
  * rsd ≈ 1/√(k-2) (~6.3% at the default k=256, 2 KB per sketch).
  *
  * Why this exists next to [[Hll]]: HLL registers UNION losslessly but
  * cannot INTERSECT — `|A∩B|` via inclusion-exclusion inherits the union's
  * absolute error and collapses for small overlaps. A KMV sketch is a
  * uniform SAMPLE of the distinct domain below θ, so set algebra works
  * directly: the values common to two sketches below θ* = min(θ_a, θ_b)
  * are a uniform sample of the intersection, giving |A∩B| ≈ c/θ* — the
  * audience-overlap estimator HLL structurally cannot provide.
  *
  * Determinism contract: the aggregate consumes PRE-HASHED non-negative
  * LongType values (the caller picks the hash; [[graft.functions.PortableHash]]
  * makes every derived number replayable in DuckDB SQL — the declared
  * `agg_theta_overlap` key's oracle recomputes θ, the estimates, and the
  * intersection from `md5` with identical IEEE arithmetic). `bits` is the
  * hash-domain width: values are uniform in [0, 2^bits), and θ normalizes
  * by 2^bits (PortableHash → 60).
  *
  * At 100 TB: update is one comparison per row past warm-up (threshold
  * cached), map-side partial aggregation truncates to k values, and the
  * shuffle carries ≤ 2 KB per (group × partition); sketches persist to a
  * lake table and merge losslessly across runs (k-smallest-of-unions —
  * associative, commutative, idempotent), the same mergeable-state posture
  * as the HLL family.
  */
object Kmv {

  final class Buf(val k: Int, val bits: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()
    /** Largest retained value once full — the reject threshold. */
    private var thr: Long = Long.MaxValue

    def add(v: Long): Unit = {
      if (set.size < k) {
        set.add(v)
        if (set.size == k) thr = set.last()
      } else if (v < thr && set.add(v)) {
        set.pollLast()
        thr = set.last()
      }
    }

    def mergeFrom(other: Buf): Unit = {
      require(other.k == k && other.bits == bits,
        s"KMV merge: parameter mismatch (k=$k/${other.k}, bits=$bits/${other.bits})")
      val it = other.set.iterator()
      while (it.hasNext) add(it.next())
    }
  }

  def serialize(b: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(12 + 8 * b.set.size)
    bb.putInt(b.k).putInt(b.bits).putInt(b.set.size)
    val it = b.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Buf(bb.getInt, bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.add(bb.getLong); i += 1 }
    b
  }

  private def kOf(bytes: Array[Byte]): Int = ByteBuffer.wrap(bytes).getInt(0)
  private def bitsOf(bytes: Array[Byte]): Int = ByteBuffer.wrap(bytes).getInt(4)
  private def nOf(bytes: Array[Byte]): Int = ByteBuffer.wrap(bytes).getInt(8)
  private def valAt(bytes: Array[Byte], i: Int): Long =
    ByteBuffer.wrap(bytes).getLong(12 + 8 * i)

  /** A [[KmvMergeAgg]] group whose inputs were all NULL evals to its
    * empty-byte-array sentinel (k/bits unknowable before the first
    * sketch). Every decode entry point accepts that sentinel as the
    * empty sketch — n=0, θ=1 — instead of reading past the buffer. */
  private def isEmptySentinel(bytes: Array[Byte]): Boolean = bytes.length < 12

  /** θ ∈ (0,1]: k-th smallest normalized value when full, 1.0 in the
    * exact (n < k) regime. Same IEEE ops as the oracle's
    * `CAST(h AS DOUBLE) / 2^bits`. */
  def theta(bytes: Array[Byte]): Double = {
    if (isEmptySentinel(bytes)) return 1.0
    val n = nOf(bytes)
    if (n < kOf(bytes)) 1.0
    else valAt(bytes, n - 1).toDouble / java.lang.Math.scalb(1.0, bitsOf(bytes))
  }

  /** Distinct-count estimate: exact n below k, else (k-1)/θ. */
  def estimate(bytes: Array[Byte]): Double = {
    if (isEmptySentinel(bytes)) return 0.0
    val n = nOf(bytes)
    if (n < kOf(bytes)) n.toDouble
    else (kOf(bytes) - 1).toDouble / theta(bytes)
  }

  /** |A∩B| ≈ (common retained values strictly below θ*=min(θa,θb)) / θ*. */
  def intersectEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    if (isEmptySentinel(a) || isEmptySentinel(b)) return 0.0
    require(kOf(a) == kOf(b) && bitsOf(a) == bitsOf(b),
      "KMV intersect: parameter mismatch")
    val tStar = math.min(theta(a), theta(b))
    val norm = java.lang.Math.scalb(1.0, bitsOf(a))
    var c = 0L
    var i = 0
    var j = 0
    val na = nOf(a)
    val nb = nOf(b)
    while (i < na && j < nb) {
      val va = valAt(a, i)
      val vb = valAt(b, j)
      if (va < vb) i += 1
      else if (vb < va) j += 1
      else {
        if (va.toDouble / norm < tStar) c += 1
        i += 1; j += 1
      }
    }
    c.toDouble / tStar
  }

  /** Scalar (non-aggregate) union of two sketches — k smallest of the
    * union of retained sets, which equals the sketch of the set union. */
  def unionSketch(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (isEmptySentinel(a)) return b
    if (isEmptySentinel(b)) return a
    val ba = deserialize(a)
    ba.mergeFrom(deserialize(b))
    serialize(ba)
  }
}

/** `kmv_sketch(hash, k, bits)` — aggregate pre-hashed non-negative longs
  * into a binary KMV sketch. */
case class KmvSketchAgg(
    child: Expression,
    k: Int = 256,
    bits: Int = 60,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buf] with ExpectsInputTypes {

  require(k >= 2, s"kmv_sketch k=$k must be >= 2")
  require(bits >= 1 && bits <= 62, s"kmv_sketch bits=$bits outside [1,62]")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Kmv.Buf = new Kmv.Buf(k, bits)

  override def update(buffer: Kmv.Buf, input: InternalRow): Kmv.Buf = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      // Pre-hashed contract: θ arithmetic assumes uniform [0, 2^bits).
      // Out-of-range input would make θ negative or > 1 and silently
      // corrupt every downstream estimate — fail loudly instead.
      // 1L << 62 is representable (bits ≤ 62 by the constructor
      // require), so the upper-bound check is uniform for every legal
      // bits value — skipping it at bits == 62 would let a hash in
      // [2^62, 2^63) through, the exact silent corruption this guards.
      if (h < 0L || h >= (1L << bits))
        throw new IllegalArgumentException(
          s"kmv_sketch: hash value $h outside declared domain [0, 2^$bits)")
      buffer.add(h)
    }
    buffer
  }

  override def merge(a: Kmv.Buf, b: Kmv.Buf): Kmv.Buf = { a.mergeFrom(b); a }

  override def eval(buffer: Kmv.Buf): Any = Kmv.serialize(buffer)
  override def serialize(buffer: Kmv.Buf): Array[Byte] = Kmv.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Kmv.Buf = Kmv.deserialize(bytes)

  override def withNewMutableAggBufferOffset(n: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch"
}

/** `kmv_merge(sketch)` — aggregate persisted binary sketches into one. */
case class KmvMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  // empty sentinel: (k, bits) only known once the first sketch arrives
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val s = v.asInstanceOf[Array[Byte]]
    if (buffer.isEmpty) s.clone() else Kmv.unionSketch(buffer, s)
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b else if (b.isEmpty) a else Kmv.unionSketch(a, b)

  override def eval(buffer: Array[Byte]): Any = buffer
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(n: Int): ImperativeAggregate =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ImperativeAggregate =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_merge"
}

/** `kmv_estimate(sketch)` → DOUBLE. Per-group decode, not a hot path. */
case class KmvEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    Kmv.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "kmv_estimate"
}

/** `kmv_theta(sketch)` → DOUBLE — the sampling threshold readout. */
case class KmvTheta(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    Kmv.theta(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "kmv_theta"
}

/** `kmv_union_pair(a, b)` → BINARY — scalar two-sketch union. */
case class KmvUnionPair(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kmv.unionSketch(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kmv_union_pair"
}

/** `kmv_intersect_est(a, b)` → DOUBLE — theta-sketch overlap estimate. */
case class KmvIntersectEst(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    Kmv.intersectEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "kmv_intersect_est"
}

object KmvFunctions {
  /** Aggregate a pre-hashed LongType column into a binary KMV sketch. */
  def kmvSketch(c: Column, k: Int = 256, bits: Int = 60): Column =
    ExpressionUtils.column(
      KmvSketchAgg(ExpressionUtils.expression(c), k, bits)
        .toAggregateExpression())

  /** Aggregate (merge) persisted binary sketches into one sketch. */
  def kmvMerge(c: Column): Column =
    ExpressionUtils.column(
      KmvMergeAgg(ExpressionUtils.expression(c)).toAggregateExpression())

  def kmvEstimate(c: Column): Column =
    ExpressionUtils.column(KmvEstimate(ExpressionUtils.expression(c)))

  def kmvTheta(c: Column): Column =
    ExpressionUtils.column(KmvTheta(ExpressionUtils.expression(c)))

  def kmvUnionPair(a: Column, b: Column): Column =
    ExpressionUtils.column(
      KmvUnionPair(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def kmvIntersectEst(a: Column, b: Column): Column =
    ExpressionUtils.column(
      KmvIntersectEst(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
