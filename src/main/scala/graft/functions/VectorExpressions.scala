package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math (SURVEY.md §2.K,
  * §4.3 "Cosine similarity ... custom Expression with doGenCode").
  *
  * Rationale: the higher-order-function formulation
  * (`aggregate(zip_with(a,b,_*_),0d,_+_)`) allocates two intermediate
  * arrays per row and is interpreted per element. These expressions fuse
  * dot/norm accumulation into one whole-stage-codegen loop over the raw
  * `ArrayData` — no allocation, stays inside WholeStageCodegen — which is
  * what makes brute-force similarity joins (O(n²) rows) tractable.
  * Accumulation is sequential in index order, in DOUBLE, so results are
  * deterministic and match a DuckDB oracle computed on DOUBLE[].
  */
abstract class FloatVectorBinary extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
}

/** dot(a, b) in double precision; null if lengths differ. */
case class VectorDot(left: Expression, right: Expression) extends FloatVectorBinary {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot / (|a|·|b|) in double precision; null for zero-norm
  * inputs or length mismatch (mirrors SQL NULL propagation, no NaN leaks).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends FloatVectorBinary {

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      nx += xi * xi
      ny += yi * yi
      i += 1
    }
    val denom = math.sqrt(nx) * math.sqrt(ny)
    if (denom == 0.0) null else dot / denom
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val denom = ctx.freshName("denom")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final double $x = (double) $a.getFloat($i);
         |    final double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $nx += $x * $x; $ny += $y * $y;
         |  }
         |  final double $denom = java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny);
         |  if ($denom == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / $denom; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** PQ code assignment (round 10 — llm_pq_topk): argmin over a codebook
  * of integer-tick centroids by squared L2, first-min tie-break, code
  * ids read from the parallel `cs` array (codebooks may have holes, so
  * position ≠ code id). The higher-order-function formulation
  * (`transform(cents, c -> aggregate(zip_with(...)))`) evaluates ~2·k·d
  * boxed lambdas per row — this expression is one fused long-arithmetic
  * loop inside WholeStageCodegen, which is the difference between the
  * PQ training pass riding the scan and dominating it. All arithmetic
  * is exact BIGINT (ticks ≤ ~10⁶ → per-dim square ≤ 4·10¹², ×64 dims
  * far below 2⁶³), matching the oracle's integer replay bit-for-bit.
  */
case class PqArgminCode(sub: Expression, cents: Expression, cs: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {
  import org.apache.spark.sql.types.LongType
  override def first: Expression = sub
  override def second: Expression = cents
  override def third: Expression = cs
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(ArrayType(LongType)), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(s: Any, c: Any, ids: Any): Any = {
    val x = s.asInstanceOf[ArrayData]
    val cb = c.asInstanceOf[ArrayData]
    val code = ids.asInstanceOf[ArrayData]
    val d = x.numElements()
    val k = cb.numElements()
    if (k == 0 || k != code.numElements()) return null
    var best = 0
    var bestD = Long.MaxValue
    var ci = 0
    while (ci < k) {
      val cent = cb.getArray(ci)
      if (cent.numElements() == d) {
        var dist = 0L
        var i = 0
        while (i < d) {
          val diff = x.getLong(i) - cent.getLong(i)
          dist += diff * diff
          i += 1
        }
        if (dist < bestD) { bestD = dist; best = ci }
      }
      ci += 1
    }
    // no centroid of matching arity seen → a malformed codebook must
    // surface as null, not as a valid-looking first code (round-11
    // advice fix)
    if (bestD == Long.MaxValue) null else code.getLong(best)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, c, ids) => {
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val ci = ctx.freshName("ci")
      val i = ctx.freshName("i")
      val cent = ctx.freshName("cent")
      val dist = ctx.freshName("dist")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      s"""
         |final int $d = $s.numElements();
         |final int $k = $c.numElements();
         |if ($k == 0 || $k != $ids.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $best = 0;
         |  long $bestD = Long.MAX_VALUE;
         |  for (int $ci = 0; $ci < $k; $ci++) {
         |    final org.apache.spark.sql.catalyst.util.ArrayData $cent =
         |      $c.getArray($ci);
         |    if ($cent.numElements() == $d) {
         |      long $dist = 0L;
         |      for (int $i = 0; $i < $d; $i++) {
         |        final long $diff = $s.getLong($i) - $cent.getLong($i);
         |        $dist += $diff * $diff;
         |      }
         |      if ($dist < $bestD) { $bestD = $dist; $best = $ci; }
         |    }
         |  }
         |  if ($bestD == Long.MAX_VALUE) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $ids.getLong($best); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(sub = newFirst, cents = newSecond, cs = newThird)
}

/** Column-level entry points (bridge lives in this package to reach the
  * `private[sql]` classic Column constructor).
  */
object VectorFunctions {
  def cosineSim(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSimilarity(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def vectorDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      VectorDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def pqArgminCode(sub: Column, cents: Column, cs: Column): Column =
    ExpressionUtils.column(
      PqArgminCode(ExpressionUtils.expression(sub),
        ExpressionUtils.expression(cents), ExpressionUtils.expression(cs)))
}
