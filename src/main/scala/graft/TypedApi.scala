package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed `Dataset[T]` surface over the same tables (SURVEY.md §1.3): for
  * pipeline code where compile-time row types pay (ingest normalization,
  * entity logic), while the relational operators stay `DataFrame`-based so
  * Catalyst sees through every expression. The typed aggregate below
  * compiles to the SAME two-phase hash aggregate as the untyped one —
  * parity is pinned in TypedApiSpec against the oracle-checked
  * etl_user_lifetime.
  */
object TypedApi {

  final case class Event(
      event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class UserLifetime(
      user_id: Long, first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp,
      n_events: Long)

  /** events as a typed Dataset (nanos handling inherited from Tables). */
  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    Tables(spark, sfDir, "events").as[Event]
  }

  /** Typed groupByKey + typed aggregators — same physical plan family as
    * the untyped groupBy (partial/final HashAggregate), but the call sites
    * keep case-class types end to end.
    */
  def userLifetime(ev: Dataset[Event]): Dataset[UserLifetime] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .agg(
        min($"ts").as[java.sql.Timestamp],
        max($"ts").as[java.sql.Timestamp],
        count(lit(1)).as[Long])
      .map { case (u, first, last, n) => UserLifetime(u, first, last, n) }
  }

  /** Typed filter+map normalization pass (ingest-side shape, R1). */
  def purchasesOver(ev: Dataset[Event], threshold: Double): Dataset[Event] =
    ev.filter(e => e.event_type == "purchase" && e.value >= threshold)
}
