package graft

import graft.operators.Etl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases + invariants for visit construction (SURVEY.md §5.2.2/3). */
class SessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import TestSpark.ts
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.map { case (id, t, u) => (id, ts(t), u) }
      .toDF("event_id", "ts", "user_id")

  private def sessions(df: org.apache.spark.sql.DataFrame) =
    Etl.sessionized(df)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n"))

  test("gap exactly == 30 min stays in one session; > 30 min splits") {
    val df = ev(
      (1, "2024-01-01 10:00:00", 1), // +30:00 exactly → same session
      (2, "2024-01-01 10:30:00", 1), // +30:00.000001 → new session
      (3, "2024-01-01 11:00:00.000001", 1))
    val s = sessions(df).collect()
    assert(s.length == 2)
    assert(s.map(_.getLong(2)).sorted.toSeq == Seq(1L, 2L))
  }

  test("sessions never span users; every event lands in exactly one session") {
    val df = ev(
      (1, "2024-01-01 10:00:00", 1), (2, "2024-01-01 10:05:00", 2),
      (3, "2024-01-01 12:00:00", 1), (4, "2024-01-01 10:10:00", 2))
    val total = sessions(df).agg(sum("n")).as[Long].head()
    assert(total == 4)
    assert(sessions(df).count() == 3) // user1: 2 sessions, user2: 1
  }

  test("single event per user is its own session") {
    val df = ev((1, "2024-01-01 00:00:00", 7))
    assert(sessions(df).count() == 1)
  }

  test("session count == users + strict gaps (randomized)") {
    val rnd = new scala.util.Random(7)
    val base = ts("2024-01-05 00:00:00").getTime
    val rows = (0 until 400).map { i =>
      val u = rnd.nextInt(5).toLong
      (i.toLong, new java.sql.Timestamp(base + rnd.nextInt(86400) * 1000L), u)
    }
    val df = rows.toDF("event_id", "ts", "user_id")
    // expected: per user, sort, count gaps > 30min
    val expected = rows.groupBy(_._3).map { case (_, es) =>
      val sorted = es.map(_._2.getTime).sorted
      1 + sorted.sliding(2).count {
        case Seq(a, b) => b - a > 30 * 60 * 1000L
        case _         => false
      }
    }.sum
    assert(sessions(df).count() == expected)
  }

  test("sessionize is invariant under input row shuffling") {
    val rnd = new scala.util.Random(11)
    val base = ts("2024-02-01 00:00:00").getTime
    val rows = (0 until 200).map { i =>
      (i.toLong, new java.sql.Timestamp(base + rnd.nextInt(43200) * 1000L),
        rnd.nextInt(4).toLong)
    }
    val a = sessions(rows.toDF("event_id", "ts", "user_id"))
      .orderBy("user_id", "session_id").collect().toSeq
    val b = sessions(rnd.shuffle(rows).toDF("event_id", "ts", "user_id"))
      .orderBy("user_id", "session_id").collect().toSeq
    assert(a == b)
  }
}
