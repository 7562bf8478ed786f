package graft

import org.scalatest.funsuite.AnyFunSuite

class TypedApiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("typed userLifetime matches the oracle-checked etl_user_lifetime") {
    val typed = TypedApi.userLifetime(TypedApi.events(spark, sf))
      .collect().map(u => (u.user_id, u.first_ts, u.last_ts, u.n_events))
      .sortBy(_._1).toSeq
    val untyped = SparkEntry.queries("etl_user_lifetime")(spark, sf)
      .select("user_id", "first_ts", "last_ts", "n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)]
      .collect().sortBy(_._1).toSeq
    assert(typed == untyped)
  }

  test("typed filter keeps only qualifying purchases") {
    val out = TypedApi.purchasesOver(TypedApi.events(spark, sf), 100.0).collect()
    assert(out.nonEmpty)
    assert(out.forall(e => e.event_type == "purchase" && e.value >= 100.0))
  }
}
