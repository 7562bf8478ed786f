package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the declared §2.D reports that have structure beyond a
  * plain hash aggregate (the DuckDB oracle pins values; these pin the
  * distribution-report semantics on the real fixtures).
  */
class AggregatesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("agg_histogram: buckets cover every row, CDF is monotone and ends at 1") {
    val sf = "/root/testdata/sf0.001"
    val hist = SparkEntry.queries("agg_histogram")(spark, sf).collect()
    val events = Tables(spark, sf, "events").where(col("value").isNotNull)

    // the bucket counts partition the input: sum(n) == non-null row count
    assert(hist.map(_.getAs[Long]("n")).sum == events.count())
    assert(hist.forall(_.getAs[Long]("n") > 0))
    // buckets strictly increasing; bucket_lo is the bucket's left edge
    val buckets = hist.map(_.getAs[Long]("bucket"))
    assert(buckets.sorted.toSeq == buckets.toSeq && buckets.distinct.length == buckets.length)
    assert(hist.forall(r => r.getAs[Double]("bucket_lo") == r.getAs[Long]("bucket") * 100.0))
    // cum_n is the prefix sum of n; cdf monotone, final value exactly 1
    val cums = hist.map(_.getAs[Long]("cum_n"))
    assert(cums.toSeq == hist.map(_.getAs[Long]("n")).scanLeft(0L)(_ + _).tail.toSeq)
    val cdfs = hist.map(_.getAs[Double]("cdf"))
    assert(cdfs.zip(cdfs.tail).forall { case (a, b) => a <= b })
    assert(cdfs.last == 1.0)
  }

  test("agg_gini: bounds, degenerate cases, and a driver-side rank-formula oracle") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("agg_gini")(spark, sf).collect()
    assert(rows.nonEmpty)
    // Gini of nonnegative spend lies in [0, 1)
    assert(rows.forall { r =>
      val g = r.getAs[Double]("gini"); g >= 0.0 && g < 1.0
    })
    // replay the rank identity driver-side from the raw tables
    val spend = Tables(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey"), col("sp").cast("double").as("sp"),
        col("o_custkey"))
      .collect()
      .groupBy(_.getAs[Int]("c_nationkey"))
    val nation = Tables(spark, sf, "nation")
      .select("n_nationkey", "n_name").collect()
      .map(r => r.getAs[Int]("n_nationkey") -> r.getAs[String]("n_name")).toMap
    rows.foreach { r =>
      val key = nation.collectFirst {
        case (k, v) if v == r.getAs[String]("n_name") => k
      }.get
      val xs = spend(key)
        .sortBy(x => (x.getAs[Double]("sp"), x.getAs[Long]("o_custkey")))
        .map(_.getAs[Double]("sp"))
      val n = xs.length
      val s = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val expected =
        math.floor((2.0 * s / (n * xs.sum) - (n + 1.0) / n) * 1e6) / 1e6
      assert(math.abs(r.getAs[Double]("gini") - expected) < 1e-9,
        s"${r.getAs[String]("n_name")}: ${r.getAs[Double]("gini")} vs $expected")
    }
  }

  test("agg_regression: moment formula matches a driver-side least-squares fit") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("agg_regression")(spark, sf).collect()
    assert(rows.nonEmpty)
    val pts = Tables(spark, sf, "lineitem")
      .join(Tables(spark, sf, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"), col("l_quantity").as("x"),
        col("l_extendedprice").as("y"))
      .collect().groupBy(_.getAs[String]("p_brand"))
    rows.foreach { r =>
      val ps = pts(r.getAs[String]("p_brand"))
        .map(p => (p.getAs[Double]("x"), p.getAs[Double]("y")))
      val n = ps.length.toDouble
      val (mx, my) = (ps.map(_._1).sum / n, ps.map(_._2).sum / n)
      val cov = ps.map { case (x, y) => (x - mx) * (y - my) }.sum
      val vx = ps.map { case (x, _) => (x - mx) * (x - mx) }.sum
      val vy = ps.map { case (_, y) => (y - my) * (y - my) }.sum
      val slope = cov / vx
      assert(r.getAs[Long]("n") == ps.length)
      // centered driver fit vs the engine's raw-moment fit: agreement to
      // float-noise tolerance (the DuckDB oracle pins exactness; this
      // pins that the moment algebra IS least squares)
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-4)
      assert(math.abs(r.getAs[Double]("intercept") - (my - slope * mx)) < 1e-2)
      assert(math.abs(r.getAs[Double]("r2") - cov * cov / (vx * vy)) < 1e-6)
    }
  }

  test("agg_entropy: uniform mix hits log2(k), single segment hits 0, fixture in bounds") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("agg_entropy")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy_bits")
      val k = r.getAs[Long]("n_segments")
      assert(h >= 0.0 && h <= math.log(k.toDouble) / math.log(2.0) + 1e-9,
        s"${r.getAs[String]("n_name")}: H=$h outside [0, log2($k)]")
    }
    // synthetic degenerate cases through the same fold expression
    val segs = Seq(
      ("u", "A", 10L), ("u", "B", 10L), ("u", "C", 10L), ("u", "D", 10L),
      ("d", "A", 40L)).toDF("g", "seg", "cnt")
    val folded = segs.groupBy("g").agg(
      expr("sort_array(collect_list(struct(seg, cnt)))").as("segs"),
      sum("cnt").as("n_customers"))
      .select(col("g"), expr(
        """aggregate(segs, 0d, (acc, s) ->
          |  acc + (-(CAST(s.cnt AS DOUBLE) / CAST(n_customers AS DOUBLE))
          |         * ln(CAST(s.cnt AS DOUBLE) / CAST(n_customers AS DOUBLE))
          |         / ln(2.0d)))""".stripMargin).as("h"))
      .collect().map(r => r.getAs[String]("g") -> r.getAs[Double]("h")).toMap
    assert(math.abs(folded("u") - 2.0) < 1e-12) // uniform over 4 = 2 bits
    assert(folded("d") == 0.0)                  // single segment = 0 bits
  }

  test("dq_volume_anomaly: integer-moment z matches a driver-side replay") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("dq_volume_anomaly")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .orderBy("day").collect()
      .map(r => r.getAs[java.sql.Date]("day").toString -> r.getAs[Long]("n"))
    rows.foreach { r =>
      val day = r.getAs[java.sql.Date]("day").toString
      val i = daily.indexWhere(_._1 == day)
      val win = daily.slice(math.max(0, i - 7), i).map(_._2)
      val (s1, s2, m) = (win.sum.toDouble,
        win.map(x => x * x).sum.toDouble, win.size.toDouble)
      assert(m >= 4)
      val varN = (s2 - s1 * s1 / m) / (m - 1)
      val z = (daily(i)._2.toDouble - s1 / m) / math.sqrt(varN)
      assert(r.getAs[Long]("n") == daily(i)._2)
      assert(r.getAs[Double]("mu") == math.floor(s1 / m * 100) / 100)
      assert(r.getAs[Double]("z") == math.floor(z * 10000) / 10000)
    }
  }

  test("llm_source_mix_kl: nonnegative, zero for a corpus-proportional source") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("llm_source_mix_kl")(spark, sf).collect()
    assert(rows.nonEmpty)
    // Gibbs: KL(p‖q) ≥ 0, and the floor display can dip at most 1e-6 below
    assert(rows.forall(_.getAs[Double]("kl_bits") >= -1e-6))
    // a source whose lang mix IS the corpus mix scores exactly 0 — replay
    // the fold on a two-source frame with identical distributions
    val docs = Seq(
      ("a", "en"), ("a", "en"), ("a", "fr"),
      ("b", "en"), ("b", "en"), ("b", "fr")).toDF("source", "lang")
    val c = docs.groupBy("source", "lang").agg(count(lit(1)).as("cnt"))
    val gm = c.groupBy("lang").agg(sum(col("cnt")).as("gcnt"))
    val tot = c.agg(sum(col("cnt")).as("total"))
    val kl = c.join(broadcast(gm), Seq("lang")).crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(expr("sort_array(collect_list(struct(lang, cnt, gcnt, total)))").as("ls"),
        sum(col("cnt")).as("n_docs"))
      .select(col("source"), expr(
        """aggregate(ls, 0d, (acc, e) ->
          |  acc + ((CAST(e.cnt AS DOUBLE) / CAST(n_docs AS DOUBLE))
          |         * ln((CAST(e.cnt AS DOUBLE) / CAST(n_docs AS DOUBLE))
          |              / (CAST(e.gcnt AS DOUBLE) / CAST(e.total AS DOUBLE)))
          |         / ln(2.0d)))""".stripMargin).as("kl"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(kl("a") == 0.0 && kl("b") == 0.0)
  }

  test("win_rolling_median: window median equals a driver-side slice median") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("win_rolling_median")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { ts =>
      val sorted = ts.sortBy(_.getAs[java.sql.Date]("day").toString)
      val ns = sorted.map(_.getAs[Long]("n"))
      sorted.zipWithIndex.foreach { case (r, i) =>
        val win = ns.slice(math.max(0, i - 6), i + 1).sorted
        val med =
          if (win.length % 2 == 1) win(win.length / 2).toDouble
          else (win(win.length / 2 - 1) + win(win.length / 2)) / 2.0
        // integer medians land only on .0/.5 — round(·,1) is identity
        assert(r.getAs[Double]("med7") == med,
          s"${r.getAs[String]("event_type")} day $i: ${r.getAs[Double]("med7")} vs $med")
      }
    }
  }

  test("win_cusum / etl_forecast_snaive: driver-side recurrence and lag-7 replays") {
    val sf = "/root/testdata/sf0.001"
    val daily = Tables(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("n")))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3)).toMap

    SparkEntry.queries("win_cusum")(spark, sf).collect().foreach { r =>
      val xs = daily(r.getAs[String]("event_type")).map(_.toDouble)
      val mu = xs.sum / xs.length // same fold order irrelevant at tol 1e-9
      val series = xs.indices.map { t =>
        xs.take(t + 1).foldLeft(0.0)((a, b) =>
          math.max(0.0, a + b - mu * 1.02))
      }
      assert(r.getAs[Long]("n_days") == xs.length)
      assert(math.abs(r.getAs[Double]("cusum_max") -
        math.floor(series.max * 1e4) / 1e4) < 1e-9)
      assert(r.getAs[Long]("n_days_alarmed") ==
        series.count(_ > mu * 0.25))
    }

    SparkEntry.queries("etl_forecast_snaive")(spark, sf).collect().foreach { r =>
      val xs = daily(r.getAs[String]("event_type"))
      val scored = xs.drop(7).zip(xs).map { case (n, pred) => math.abs(n - pred) }
      assert(r.getAs[Long]("n_days_scored") == scored.length)
      assert(r.getAs[Long]("total_abs_err") == scored.sum)
    }
  }

  test("win_ewma: fold equals the driver-side recurrence, seeded at day one") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("win_ewma")(spark, sf).collect()
    assert(rows.nonEmpty)
    val daily = Tables(spark, sf, "events")
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x"))
      .collect().groupBy(_.getAs[Long]("user_id"))
    rows.foreach { r =>
      val series = daily(r.getAs[Long]("user_id"))
        .sortBy(_.getAs[java.sql.Date]("day").toString)
        .map(_.getAs[Double]("x"))
      val ewma = series.tail.foldLeft(series.head)((acc, x) => 0.3 * x + 0.7 * acc)
      assert(r.getAs[Long]("n_days") == series.length)
      // identical op sequence → bit-exact before the floor display scaling
      assert(r.getAs[Double]("ewma") == math.floor(ewma * 100000) / 100000)
    }
  }
}
