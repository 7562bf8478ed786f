package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Native gap-sessionization — the second §2.L preference-(c) operator
  * (after [[AsOfJoin]]): append a per-key `session_id` where a gap
  * greater than `gapMicros` between consecutive timestamps starts a new
  * session.
  *
  * Why a physical operator: the declarative compose (etl_sessionize,
  * §2.G) is lag → flag → running sum — TWO window functions over the same
  * `(key) ORDER BY (ts, tie…)` frame. Spark plans them into one Window
  * node, but a Window operator BUFFERS each partition group (spilling
  * past `spark.sql.windowExec.buffer.spill.threshold`) and evaluates two
  * frame computers per row. This operator declares the identical
  * distribution/ordering requirements — EnsureRequirements plans the same
  * single exchange + sort, AQE applies — and then streams each partition
  * in ONE forward pass with O(1) state (previous key, previous ts, a
  * counter): no group buffer, no spill threshold, no per-row frame
  * evaluation. The 100 TB upshot: a hot key's multi-GB event history
  * never needs to fit a window buffer.
  *
  * Semantics — EXACTLY the composed form's (shared oracle pins it):
  * ordering `(key, ts, tie…)` ascending nulls-first; a row starts a new
  * session iff it is the key's first row, or the previous row's ts is
  * NULL, or `ts > prev_ts + gap` (strict). NULL keys form one group,
  * like window partitioning. `session_id` starts at 1 per key.
  */
case class Sessionize(
    child: LogicalPlan,
    key: Attribute,
    ts: Attribute,
    tie: Seq[Attribute],
    gapMicros: Long,
    entity: Option[Attribute],
    sessionAttr: AttributeReference) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ sessionAttr
  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): Sessionize =
    copy(child = newChild)
}

/** Planner strategy: [[Sessionize]] → [[SessionizeExec]]. */
object SessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case Sessionize(c, k, t, tie, gap, ent, out) =>
      SessionizeExec(planLater(c), k, t, tie, gap, ent, out) :: Nil
    case _ => Nil
  }
}

/** Physical one-pass sessionizer. The child arrives hash-partitioned on
  * the key and sorted `(key, ts, tie…)` (declared requirements); each
  * partition streams through with constant state.
  */
case class SessionizeExec(
    child: SparkPlan,
    key: Attribute,
    ts: Attribute,
    tie: Seq[Attribute],
    gapMicros: Long,
    entity: Option[Attribute],
    sessionAttr: AttributeReference) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ sessionAttr
  override def producedAttributes: AttributeSet = AttributeSet(sessionAttr)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numSessions" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of sessions started"))

  // appending a derived column preserves the child's layout
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = child.outputOrdering

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(key)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    SortOrder(key, Ascending) +: SortOrder(ts, Ascending) +:
      tie.map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyIdx = child.output.indexWhere(_.exprId == key.exprId)
    val tsIdx = child.output.indexWhere(_.exprId == ts.exprId)
    val entIdx = entity.map(e =>
      child.output.indexWhere(_.exprId == e.exprId)).getOrElse(-1)
    val entType = entity.map(_.dataType).orNull
    val keyType = key.dataType
    val tsType = ts.dataType
    val outAttrs = output
    val gap = gapMicros
    val numOut = longMetric("numOutputRows")
    val numSessions = longMetric("numSessions")

    child.execute().mapPartitionsInternal { iter =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)
      val idRow = new GenericInternalRow(1)

      val entOrd = if (entIdx >= 0) TypeUtils.getInterpretedOrdering(entType)
        else null
      var hasPrev = false
      var prevKey: Any = null
      var prevTsNull = true
      var prevTs = 0L
      var prevEnt: Any = null
      var prevEntNull = true
      var counter = 0L

      iter.map { row =>
        val kNull = row.isNullAt(keyIdx)
        val k = if (kNull) null else row.get(keyIdx, keyType)
        val tNull = row.isNullAt(tsIdx)
        val t = if (tNull) 0L else row.get(tsIdx, tsType)
          .asInstanceOf[Number].longValue
        val sameKey = hasPrev &&
          (if (kNull || prevKey == null) kNull && prevKey == null
           else keyOrd.compare(k, prevKey) == 0)
        if (!sameKey) counter = 0L
        // composed-form flag: first row of the key, NULL previous ts, or a
        // strict gap. A NULL current ts never exceeds the gap (SQL 3VL) —
        // and under nulls-first ordering it can only follow another NULL.
        // entity split (null-safe <=>): a change of the entity under work
        // starts a new visit even inside the time gap
        val entNull = entIdx >= 0 && row.isNullAt(entIdx)
        val ent = if (entIdx < 0 || entNull) null else row.get(entIdx, entType)
        val entityChanged = entIdx >= 0 && sameKey &&
          !(if (entNull || prevEntNull) entNull && prevEntNull
            else entOrd.compare(ent, prevEnt) == 0)
        val newSess = !sameKey || prevTsNull ||
          (!tNull && t > prevTs + gap) || entityChanged
        if (newSess) { counter += 1L; numSessions += 1 }
        hasPrev = true
        prevEntNull = entIdx < 0 || entNull
        // stable copies: unsafe-row-backed values (UTF8String, binary,
        // structs, arrays, decimals) are reused buffers; copyValue
        // deep-copies every buffer-backed type, not just strings
        prevEnt = if (entIdx < 0 || entNull) null else InternalRow.copyValue(ent)
        prevKey = if (kNull) null else InternalRow.copyValue(k)
        prevTsNull = tNull
        prevTs = t
        numOut += 1
        idRow.setLong(0, counter)
        resultProj(joined(row, idRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SessionizeExec =
    copy(child = newChild)
}

/** Public surface: append `session_id` to a DataFrame by column names.
  * Requires [[SessionizeStrategy]] (registered by [[graft.GraftExtensions]]).
  */
object SessionizePlan {
  def sessionize(
      df: DataFrame,
      key: String,
      ts: String,
      tie: Seq[String] = Nil,
      gapMinutes: Int = 30,
      sessionCol: String = "session_id",
      entity: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.classic
    def attr(name: String): Attribute =
      df.queryExecution.analyzed.output
        .find(_.name == name)
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not in ${df.columns.mkString(", ")}"))
    val node = Sessionize(
      df.queryExecution.analyzed,
      attr(key), attr(ts), tie.map(attr),
      gapMinutes.toLong * 60L * 1000000L,
      entity.map(attr),
      AttributeReference(sessionCol, LongType, nullable = false)())
    classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[classic.SparkSession], node)
  }
}
