package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** §2.E window functions (SURVEY.md). One shuffle per distinct
  * (partitionBy, orderBy) spec; all specs here partition on user_id or a
  * fact key, so at scale each query is a single exchange + in-partition
  * sort. Ordering keys always include a unique tie-break (event_id /
  * orderkey) per the determinism checklist (SURVEY.md §7.4).
  */
object Windows {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private val byUserTime: WindowSpec =
    Window.partitionBy("user_id").orderBy("ts", "event_id")

  val qs: Seq[Q] = Seq(

    // Round 8: the rank family's scale-safe representative — exact GLOBAL
    // row_number/rank/dense_rank/percent_rank/cume_dist with NO global
    // sort (the §2.E surface keys above partition on a data key; a truly
    // global ordering would otherwise be one task sorting the fact).
    // RankFence.globalRanksFenced: KLL fence → interval offsets → ONE
    // window pass whose partitions are bounded intervals; rank/dense/
    // cume ride the same exchange as integer group-start folds, and the
    // doubles are single divisions of exact longs (bit-identical
    // cross-engine). l_quantity is discrete 1..50 — every rank group is
    // a real multi-thousand-row tie at sf0.1. Determinism catch (round 8,
    // cont. 4): the HARNESS lineitem's (l_orderkey, l_linenumber) is NOT
    // unique (~24% of sf0.1 key pairs repeat — FIXTURES.md has no PK
    // claim for it), so the row_number tie-break and the output ordering
    // both carry the 5-tuple (+partkey, +suppkey, +shipdate), the
    // smallest combination unique at every SF; (ok, ln) alone passed
    // sf≤0.01 only by engine-order luck and failed the sf0.1 hash.
    Q("win_rank_global_fenced",
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, l_shipdate,
        |       l_quantity,
        |       CAST(row_number() OVER
        |         (ORDER BY l_quantity, l_orderkey, l_linenumber,
        |          l_partkey, l_suppkey, l_shipdate) AS BIGINT) AS rn,
        |       CAST(rank() OVER w AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM lineitem
        |WINDOW w AS (ORDER BY l_quantity)
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |         l_shipdate""".stripMargin) { (s, d) =>
      RankFence.globalRanksFenced(
          t(s, d, "lineitem")
            .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
              "l_shipdate", "l_quantity"),
          Seq(RankFence.OrderCol("l_quantity")),
          Seq(RankFence.OrderCol("l_orderkey"),
            RankFence.OrderCol("l_linenumber"),
            RankFence.OrderCol("l_partkey"),
            RankFence.OrderCol("l_suppkey"),
            RankFence.OrderCol("l_shipdate")))
        .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_shipdate")
    },

    // Rolling 7-day Pearson correlation (round 8, cont. 4): per
    // event_type, the trailing-week correlation between daily VOLUME and
    // daily REVENUE — the time-varying readout agg_spearman_daily
    // summarizes into one number (a coupling that holds all month vs one
    // that decays mid-month look identical in the scalar). All six
    // rolling moments (c, Σx, Σy, Σxy, Σx², Σy²) are exact BIGINTs over
    // integer cents (revenue² fits to ~1e9 cents/day; past that the
    // overflow-proof sibling is the rank-based spearman — its moments
    // are bounded by the window LENGTH, not the values); the correlation
    // is assembled from exact longs with doubles only in the final
    // sqrt/divide, identical IEEE order. Windows partition by type over
    // the BOUNDED daily frame (31 rows/type — report scale, the fact is
    // reduced by the groupBy first).
    Q("win_rolling_corr",
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, day,
        |         CAST(count(*) OVER w AS BIGINT) AS c,
        |         CAST(sum(x) OVER w AS BIGINT) AS sx,
        |         CAST(sum(y) OVER w AS BIGINT) AS sy,
        |         CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
        |         CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
        |         CAST(sum(y * y) OVER w AS BIGINT) AS syy
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       CASE WHEN c * sxx - sx * sx = 0 OR c * syy - sy * sy = 0
        |            THEN NULL
        |            ELSE floor(CAST(c * sxy - sx * sy AS DOUBLE)
        |                  / sqrt(CAST(c * sxx - sx * sx AS DOUBLE)
        |                         * CAST(c * syy - sy * sy AS DOUBLE))
        |                  * 1000000) / 1000000 END AS corr7
        |FROM r WHERE c = 7
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = t(s, d, "events")
        .where(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"),
          sum(round(col("value") * 100).cast("long")).as("y"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, Window.currentRow)
      val r = daily.select(col("event_type"), col("day"),
        count(lit(1)).over(w).as("c"),
        sum(col("x")).over(w).as("sx"),
        sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("y")).over(w).as("sxy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("y") * col("y")).over(w).as("syy"))
      val vx = col("c") * col("sxx") - col("sx") * col("sx")
      val vy = col("c") * col("syy") - col("sy") * col("sy")
      r.where(col("c") === 7)
        .select(col("event_type"), col("day"),
          when(vx === 0 || vy === 0, lit(null))
            .otherwise(floor(
              (col("c") * col("sxy") - col("sx") * col("sy")).cast("double")
                / sqrt(vx.cast("double") * vy.cast("double")) * 1000000)
              / 1000000).as("corr7"))
        .orderBy("event_type", "day")
    },

    // Rolling 7-day OLS regression (round 8, cont. 6): the effect-SIZE
    // companion to win_rolling_corr over the same trailing week — how
    // many dollars does one extra event buy today, and how much of the
    // revenue variance does volume explain? slope and its numerator/
    // denominator come from the same six exact-BIGINT rolling moments
    // (one window pass, shared frame); r² must square a ~1e12 numerator,
    // so it moves to DOUBLE before the square (2^63 would overflow) with
    // identical IEEE order in both engines. Same bounded daily frame —
    // the fact is reduced by the groupBy before any window.
    Q("win_rolling_regression",
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS x,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), r AS (
        |  SELECT event_type, day,
        |         CAST(count(*) OVER w AS BIGINT) AS c,
        |         CAST(sum(x) OVER w AS BIGINT) AS sx,
        |         CAST(sum(y) OVER w AS BIGINT) AS sy,
        |         CAST(sum(x * y) OVER w AS BIGINT) AS sxy,
        |         CAST(sum(x * x) OVER w AS BIGINT) AS sxx,
        |         CAST(sum(y * y) OVER w AS BIGINT) AS syy
        |  FROM d
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day
        |               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       CASE WHEN c * sxx - sx * sx = 0 THEN NULL
        |            ELSE floor(CAST(c * sxy - sx * sy AS DOUBLE)
        |                       / CAST(c * sxx - sx * sx AS DOUBLE)
        |                       / 100 * 1000000) / 1000000 END AS slope7,
        |       CASE WHEN c * sxx - sx * sx = 0 THEN NULL
        |            ELSE floor((CAST(sy AS DOUBLE)
        |                        - CAST(c * sxy - sx * sy AS DOUBLE)
        |                          / CAST(c * sxx - sx * sx AS DOUBLE)
        |                          * CAST(sx AS DOUBLE))
        |                       / c / 100 * 1000000) / 1000000
        |       END AS intercept7,
        |       CASE WHEN c * sxx - sx * sx = 0 OR c * syy - sy * sy = 0
        |            THEN NULL
        |            ELSE floor(CAST(c * sxy - sx * sy AS DOUBLE)
        |                       * CAST(c * sxy - sx * sy AS DOUBLE)
        |                       / (CAST(c * sxx - sx * sx AS DOUBLE)
        |                          * CAST(c * syy - sy * sy AS DOUBLE))
        |                       * 1000000) / 1000000 END AS r2
        |FROM r WHERE c = 7
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = t(s, d, "events")
        .where(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("x"),
          sum(round(col("value") * 100).cast("long")).as("y"))
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, Window.currentRow)
      val r = daily.select(col("event_type"), col("day"),
        count(lit(1)).over(w).as("c"),
        sum(col("x")).over(w).as("sx"),
        sum(col("y")).over(w).as("sy"),
        sum(col("x") * col("y")).over(w).as("sxy"),
        sum(col("x") * col("x")).over(w).as("sxx"),
        sum(col("y") * col("y")).over(w).as("syy"))
      val num = (col("c") * col("sxy") - col("sx") * col("sy")).cast("double")
      val vx = (col("c") * col("sxx") - col("sx") * col("sx"))
      val vy = (col("c") * col("syy") - col("sy") * col("sy"))
      r.where(col("c") === 7)
        .select(col("event_type"), col("day"),
          when(vx === 0, lit(null))
            .otherwise(floor(num / vx.cast("double") / 100 * 1000000)
              / 1000000).as("slope7"),
          when(vx === 0, lit(null))
            .otherwise(floor((col("sy").cast("double")
              - num / vx.cast("double") * col("sx").cast("double"))
              / col("c") / 100 * 1000000) / 1000000).as("intercept7"),
          when(vx === 0 || vy === 0, lit(null))
            .otherwise(floor(num * num
              / (vx.cast("double") * vy.cast("double")) * 1000000)
              / 1000000).as("r2"))
        .orderBy("event_type", "day")
    },

    // Maximum drawdown (round 8, cont. 6): per event_type, the deepest
    // peak-to-trough fall of CUMULATIVE daily revenue — the risk scalar
    // beside win_cusum's change detector (a revenue stream can pass
    // every mean test and still carry a brutal drawdown; this is the
    // number an SLA/runway review reads). Exact: daily cents, prefix
    // sums and running maxima fold in-row over the day-ordered ≤31-row
    // list (the etl_changepoint idiom); the argmax ENCODES
    // (drawdown, day) into one BIGINT — dd·1024 + (1024 − k) — and
    // takes a scalar max (DuckDB's LIST-accumulator list_reduce bug),
    // ties to the EARLIEST trough; one division at display. Plan: one
    // fact scan, bounded (type, day) groupBy, O(n²) in-row fold — zero
    // windows (the window-free spelling of a running-max window pair).
    Q("win_drawdown",
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |           AS c
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type,
        |         list(struct_pack(day := day, c := c) ORDER BY day) AS l
        |  FROM d GROUP BY event_type
        |), b AS (
        |  SELECT event_type, l, CAST(len(l) AS BIGINT) AS n,
        |         list_max(list_transform(range(1, len(l) + 1), k ->
        |           (list_max(list_transform(range(1, k + 1), j ->
        |              list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                list_transform(l[1 : CAST(j AS INT)], e -> e.c)),
        |                (a, x) -> a + x)))
        |            - list_reduce(list_prepend(CAST(0 AS BIGINT),
        |                list_transform(l[1 : CAST(k AS INT)], e -> e.c)),
        |                (a, x) -> a + x)) * 1024
        |           + (1024 - k))) AS best
        |  FROM g
        |)
        |SELECT event_type, n AS n_days,
        |       floor(CAST(best // 1024 AS DOUBLE) / 100 * 1000000)
        |         / 1000000 AS max_drawdown,
        |       l[CAST(1024 - best % 1024 AS INT)].day AS trough_day
        |FROM b ORDER BY event_type""".stripMargin) { (s, d) =>
      val g = t(s, d, "events")
        .where(col("value").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("c"))
        .groupBy("event_type")
        .agg(expr("sort_array(collect_list(struct(day, c)))").as("l"))
      g.select(col("event_type"), col("l"),
          size(col("l")).cast("long").as("n"),
          expr(
            """array_max(transform(sequence(1, size(l)), k ->
              |  (array_max(transform(sequence(1, k), j ->
              |     aggregate(transform(slice(l, 1, CAST(j AS INT)),
              |         e -> e.c),
              |       CAST(0 AS BIGINT), (a, x) -> a + x)))
              |   - aggregate(transform(slice(l, 1, CAST(k AS INT)),
              |       e -> e.c),
              |     CAST(0 AS BIGINT), (a, x) -> a + x)) * 1024
              |  + (1024 - k)))""".stripMargin).as("best"))
        .select(col("event_type"), col("n").as("n_days"),
          (floor(expr("best DIV 1024").cast("double") / 100 * 1000000)
            / 1000000).as("max_drawdown"),
          expr("element_at(l, CAST(1024 - best % 1024 AS INT)).day")
            .as("trough_day"))
        .orderBy("event_type")
    },

    Q("win_row_number",
      """SELECT event_id, user_id,
        |       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS rn
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"), col("user_id"),
          row_number().over(byUserTime).cast("long").as("rn"))
        .orderBy("event_id")
    },

    // rank/dense_rank with real ties (l_quantity is discrete 1..50).
    Q("win_rank_dense",
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |       CAST(rank() OVER w AS BIGINT) AS rnk,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drnk
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity").desc)
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    },

    // Relative standing within a group (round 5): percent_rank and
    // cume_dist — the remaining rank-family functions. Both are exact
    // rationals evaluated in ONE integer-derived division ((rank−1)/(n−1)
    // and rows≤current/n), so the doubles are bit-identical cross-engine
    // with no rounding needed. Same scale shape as every rank window:
    // one exchange on the partition key.
    Q("win_percent_cume",
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM lineitem
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity DESC)
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_returnflag").orderBy(col("l_quantity").desc)
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cume"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    },

    // Previous/next event per user — time-between-visits core (R4).
    Q("win_lag_lead",
      """SELECT event_id, user_id,
        |       date_diff('second', lag(ts) OVER w, ts) AS gap_prev_s,
        |       lead(event_type) OVER w AS next_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val prev = lag(col("ts"), 1).over(byUserTime)
      t(s, d, "events")
        .select(
          col("event_id"), col("user_id"),
          (unix_timestamp(col("ts")) - unix_timestamp(prev)).as("gap_prev_s"),
          lead(col("event_type"), 1).over(byUserTime).as("next_type"))
        .orderBy("event_id")
    },

    // Running sum — accumulation order is the window order in both engines,
    // so the double prefix-sums agree bit-for-bit.
    Q("win_running_sum",
      """SELECT event_id, user_id,
        |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_value
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .select(
          col("event_id"), col("user_id"),
          round(
            sum(col("value")).over(
              byUserTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
            2).as("cum_value"))
        .orderBy("event_id")
    },

    // Trailing 7-day activity — RANGE frame over epoch seconds.
    Q("win_sliding_range",
      """SELECT event_id, user_id,
        |       CAST(count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(unix_timestamp(col("ts")))
        .rangeBetween(-604800L, 0L)
      t(s, d, "events")
        .select(
          col("event_id"), col("user_id"),
          count(lit(1)).over(w).as("n_7d"))
        .orderBy("event_id")
    },

    Q("win_first_last",
      """SELECT event_id, user_id,
        |       first_value(event_type) OVER w AS first_type,
        |       last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = byUserTime.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "events")
        .select(
          col("event_id"), col("user_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"))
        .orderBy("event_id")
    },

    // Quartile bucketing of users by activity (R11). The global
    // Window.orderBy is a deliberate single-task sort: exact global ntile
    // is order-global by definition, and the input here is the PER-USER
    // aggregate (rows = users, not events), so the sorted partition is
    // the small side of the pipeline. At a cardinality where even that
    // overflows one task, the scale escape is percent_rank over a
    // range-partitioned global sort (orderBy + floor(pr·4)) — same
    // buckets up to boundary ties, fully parallel — or approx quantile
    // cutpoints joined map-side.
    Q("win_ntile",
      """WITH ua AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY user_id
        |)
        |SELECT user_id, n_events,
        |       CAST(ntile(4) OVER (ORDER BY n_events DESC, user_id) AS BIGINT) AS quartile
        |FROM ua ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.orderBy(col("n_events").desc, col("user_id"))
      t(s, d, "events")
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"), col("n_events"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy("user_id")
    },

    // nth_value with an explicit full frame (round 5) — completes the
    // positional window family (first/last/nth): each order sees its
    // customer's 2nd-highest order value. NULL for single-order
    // customers, exercising the function's NULL-on-short-frame edge.
    Q("win_nth_value",
      """SELECT o_orderkey, o_custkey,
        |       nth_value(o_totalprice, 2) OVER (
        |         PARTITION BY o_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |       ) AS second_highest
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          nth_value(col("o_totalprice"), 2).over(w).as("second_highest"))
        .orderBy("o_orderkey")
    },

    // Longest consecutive-day activity streak per user (round 5) — the
    // classic gaps-and-islands ISLANDS shape (etl_resample_ffill is its
    // gap-filling sibling): distinct active days, then day − row_number
    // is constant exactly within a consecutive run, so grouping on that
    // anchor yields streak lengths. Purely integer date arithmetic —
    // bit-exact cross-engine, no float risk anywhere.
    //
    // Scale shape: the distinct collapses events to one row per
    // (user, day) BEFORE any window — the window and both aggregates see
    // ≤ users×days rows, never raw events. Exchanges: one for the
    // distinct (user, day), one on user_id for the window (the
    // (user, day)-keyed distinct can't serve the user-keyed window), and
    // the streak groupBy reuses the window's user_id partitioning. The
    // per-user window sort is bounded by days-in-history (≤ a few
    // thousand), so the Zipf hot-user exposure of raw-event windows
    // (SCALING.md round 3) cannot arise.
    Q("win_streak",
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), runs AS (
        |  SELECT user_id, day,
        |         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        |  FROM days
        |), streaks AS (
        |  SELECT user_id, anchor, CAST(count(*) AS BIGINT) AS len
        |  FROM runs GROUP BY user_id, anchor
        |)
        |SELECT user_id, max(len) AS longest_streak,
        |       CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM streaks GROUP BY user_id
        |ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("day")
      t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .withColumn("anchor", date_sub(col("day"), row_number().over(w)))
        .groupBy("user_id", "anchor")
        .agg(count(lit(1)).as("len"))
        .groupBy("user_id")
        .agg(max(col("len")).as("longest_streak"),
          sum(col("len")).as("n_active_days"))
        .orderBy("user_id")
    },

    // Top-3 orders per customer — InferWindowGroupLimit prunes per group.
    Q("win_topk_per_group",
      """SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |             ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"))
        .where(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("rn").cast("long").as("rn"))
        .orderBy("o_custkey", "rn")
    },

    // Ratio-to-report (round 5, continued) — the share-of-total window
    // every BI layer ships (value / SUM(value) OVER (PARTITION BY
    // group)): top-5 users per event type by spend share. The per-user
    // totals go through DECIMAL(18,2) BEFORE both the groupBy sum and the
    // normalizing window, so both sums are EXACT decimal arithmetic
    // (order-independent across engines — a raw double sum would wobble
    // in the last ulp with partial-agg order); the share division then
    // runs in double space on identical inputs. The OUTPUT total is cast
    // back to DOUBLE: bare decimal output columns were the only three r5
    // hash misses (driver-side decimal canonicalization) — money stays
    // decimal internally, double at the edge.
    // Plan: one exchange for the (type, user) groupBy; the ranking and
    // normalizing windows share the event_type partitioning, and
    // WindowGroupLimit prunes the rank filter before the share division.
    Q("win_ratio_to_report",
      """WITH g AS (
        |  SELECT event_type, user_id,
        |         sum(CAST(value AS DECIMAL(18,2))) AS total_dec
        |  FROM events WHERE user_id IS NOT NULL
        |  GROUP BY event_type, user_id
        |), r AS (
        |  SELECT event_type, user_id,
        |         round(CAST(total_dec AS DOUBLE), 2) AS total,
        |         round(CAST(total_dec AS DOUBLE) /
        |               CAST(sum(total_dec) OVER (PARTITION BY event_type) AS DOUBLE), 6)
        |           AS share,
        |         row_number() OVER (PARTITION BY event_type
        |             ORDER BY total_dec DESC, user_id) AS rn
        |  FROM g
        |)
        |SELECT event_type, user_id, total, share, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY event_type, rn""".stripMargin) { (s, d) =>
      val g = t(s, d, "events")
        .where(col("user_id").isNotNull)
        .groupBy("event_type", "user_id")
        .agg(sum(col("value").cast("decimal(18,2)")).as("total_dec"))
      val wt = Window.partitionBy("event_type")
      // Rank on the UNROUNDED exact decimal total (r6 change): deterministic,
      // but top-5 membership can differ from pre-r6 output on totals that tie
      // only after rounding — intentional; Spark and oracle moved in lockstep.
      val wr = wt.orderBy(col("total_dec").desc, col("user_id"))
      g.select(col("event_type"), col("user_id"),
          round(col("total_dec").cast("double"), 2).as("total"),
          round(col("total_dec").cast("double") /
            sum(col("total_dec")).over(wt).cast("double"), 6).as("share"),
          row_number().over(wr).as("rn"))
        .where(col("rn") <= 5)
        .select(col("event_type"), col("user_id"), col("total"), col("share"),
          col("rn").cast("long").as("rn"))
        .orderBy("event_type", "rn")
    },

    // Rolling z-score anomaly detection (round 5, cont.): flag events
    // whose value sits >2σ from the mean of the user's previous 10
    // events — the per-entity drift monitor of a metrics pipeline. The
    // determinism trick: the rolling moments are INTEGER window sums
    // over exact cents (Σc, Σc², n) — both engines then derive
    // mean/σ/z through the same double expression on identical integer
    // inputs, so the result is bit-identical and the >2σ cut can't
    // wobble across engines (a raw double rolling avg/stddev would
    // differ in the ulp between Spark's frame re-scan and DuckDB's
    // segment tree, and a 1-ulp straddle at a round(·,4) tie or the 2σ
    // fence flips rows). One user_id exchange; the three window sums
    // share one frame spec. The display scaling is FLOOR-based, not
    // round: mu = Σc/(100n) can land exactly on a decimal tie
    // (s1=34853, n=8 → 43.56625 did, at sf0.1), where Spark rounds the
    // exact binary value HALF_UP but DuckDB rounds v·10⁴ computed in
    // double space — floor of the same double has no tie semantics, so
    // it is deterministic cross-engine at every scale.
    Q("win_rolling_stats",
      """WITH c AS (
        |  SELECT event_id, user_id, ts, value,
        |         CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events
        |), r AS (
        |  SELECT event_id, user_id, value, cents,
        |         CAST(sum(cents) OVER w AS DOUBLE) AS s1,
        |         CAST(sum(cents * cents) OVER w AS DOUBLE) AS s2,
        |         CAST(count(*) OVER w AS DOUBLE) AS n
        |  FROM c
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
        |), z AS (
        |  SELECT event_id, user_id, value, n,
        |         s1 / n / 100.0 AS mu,
        |         (CAST(cents AS DOUBLE) - s1 / n)
        |           / sqrt((s2 - s1 * s1 / n) / (n - 1)) AS zs,
        |         (s2 - s1 * s1 / n) / (n - 1) AS var_c
        |  FROM r
        |)
        |SELECT event_id, user_id, value,
        |       floor(mu * 100000) / 100000 AS mu,
        |       floor(zs * 10000) / 10000 AS z
        |FROM z WHERE n >= 5 AND var_c > 0 AND abs(zs) > 2
        |ORDER BY event_id""".stripMargin) { (s, d) =>
      val w = byUserTime.rowsBetween(-10, -1)
      val cents = round(col("value") * 100).cast("long")
      val r = t(s, d, "events")
        .withColumn("cents", cents)
        .select(col("event_id"), col("user_id"), col("value"), col("cents"),
          sum(col("cents")).over(w).cast("double").as("s1"),
          sum(col("cents") * col("cents")).over(w).cast("double").as("s2"),
          count(lit(1)).over(w).cast("double").as("n"))
      val varC = (col("s2") - col("s1") * col("s1") / col("n")) / (col("n") - 1)
      val zs = (col("cents").cast("double") - col("s1") / col("n")) / sqrt(varC)
      r.select(col("event_id"), col("user_id"), col("value"), col("n"),
          (col("s1") / col("n") / lit(100.0)).as("mu"), zs.as("zs"),
          varC.as("var_c"))
        .where(col("n") >= 5 && col("var_c") > 0 && abs(col("zs")) > 2)
        .select(col("event_id"), col("user_id"), col("value"),
          (floor(col("mu") * 100000) / lit(100000)).as("mu"),
          (floor(col("zs") * 10000) / lit(10000)).as("z"))
        .orderBy("event_id")
    },

    // Exponentially-weighted moving average of daily spend per user
    // (round 7, cont.): the recency-weighted activity level a
    // metrics/feature pipeline keeps per entity (α = 0.3, seeded at the
    // first observed day — pandas ewm(adjust=False) semantics). The
    // recurrence ewmaₜ = α·xₜ + (1−α)·ewmaₜ₋₁ is inherently sequential,
    // so it runs as an IN-ROW FOLD over each user's day-sorted daily
    // series (≤ days-in-history elements — bounded the way win_streak's
    // islands are): both engines execute the IDENTICAL 0.3·x + 0.7·acc
    // op sequence on identical exact-decimal daily sums, so the
    // pre-display doubles are bit-exact — no pow()/libm anywhere (the
    // closed-form Σα(1−α)^(t−j)xⱼ would drag in engine-specific pow).
    // Plan: one (user, day) groupBy collapses events map-side-combinably,
    // one user groupBy folds — the day-keyed frame can't serve the
    // user-keyed agg, so two exchanges is the floor; the fold itself is
    // a codegen higher-order function, no UDF. FLOOR-scaled display.
    Q("win_ewma",
      """WITH daily AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |         sum(CAST(value AS DECIMAL(18,2))) AS xd
        |  FROM events GROUP BY 1, 2
        |), ser AS (
        |  SELECT user_id,
        |         list(CAST(xd AS DOUBLE) ORDER BY day) AS xs,
        |         CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(xd) AS DOUBLE) AS tot
        |  FROM daily GROUP BY user_id
        |)
        |SELECT user_id, n_days, round(tot, 2) AS total,
        |       floor(list_reduce(xs, (acc, x) -> 0.3 * x + 0.7 * acc)
        |             * 100000) / 100000 AS ewma
        |FROM ser ORDER BY user_id""".stripMargin) { (s, d) =>
      val daily = t(s, d, "events")
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast("decimal(18,2)")).as("xd"))
      // struct sort on (day, x) = sort by day (unique per user); the
      // projected xs array is the day-ascending series the fold walks
      daily.groupBy("user_id")
        .agg(
          expr("transform(sort_array(collect_list(struct(day, CAST(xd AS DOUBLE) AS x))), e -> e.x)")
            .as("xs"),
          count(lit(1)).as("n_days"),
          sum(col("xd")).cast("double").as("tot"))
        .select(col("user_id"), col("n_days"),
          round(col("tot"), 2).as("total"),
          (floor(expr(
            """aggregate(slice(xs, 2, size(xs) - 1), element_at(xs, 1),
              |          (acc, x) -> 0.3d * x + 0.7d * acc)""".stripMargin)
            * 100000) / lit(100000)).as("ewma"))
        .orderBy("user_id")
    },

    // Rolling 7-day median of daily volume per event type (round 7,
    // cont.): the robust trend line a monitoring dashboard draws —
    // dq_volume_anomaly's z-score flags spikes, the rolling MEDIAN
    // smooths past them (one outlier day barely moves it, unlike the
    // rolling mean). Determinism: the window inputs are exact INTEGER
    // daily counts, and the interpolating median of ≤7 integers lands
    // only on .0/.5 fractions (exactly representable — round(·,1) can't
    // tie). Plan: the fact-sized work is the map-side-combinable
    // (type, day) groupBy; the percentile window runs over the O(types ×
    // days) frame — report-scale at any SF, the dq_volume_anomaly
    // argument — partitioned by type with a 7-row frame.
    Q("win_rolling_median",
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT event_type, day, n,
        |       round(median(n) OVER (PARTITION BY event_type ORDER BY day
        |             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 1) AS med7
        |FROM d ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, 0)
      t(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("day"), col("n"),
          round(percentile(col("n"), lit(0.5)).over(w), 1).as("med7"))
        .orderBy("event_type", "day")
    },

    // One-sided CUSUM drift detection per event type (round 7, cont.):
    // sₜ = max(0, sₜ₋₁ + xₜ − μ·(1+slack)) over the daily volume series
    // — the change-point monitor that catches a SUSTAINED small upward
    // shift dq_volume_anomaly's per-day z-score never flags (each day
    // is individually unremarkable; the cumulative exceedance is not).
    // Like win_ewma the recurrence is inherently sequential, so it runs
    // as in-row folds over the day-sorted series; the full CUSUM series
    // is the prefix-fold family (O(days²) ops on an O(days) frame —
    // arithmetic at the report grain, not data). Every input is an
    // exact integer count; both engines execute identical
    // greatest(0, a + x − thr) sequences — bit-exact, FLOOR-scaled.
    Q("win_cusum",
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |         CAST(sum(n) AS BIGINT) AS tot,
        |         list(CAST(n AS DOUBLE) ORDER BY day) AS xs
        |  FROM d GROUP BY event_type
        |), c AS (
        |  SELECT event_type, n_days,
        |         CAST(tot AS DOUBLE) / n_days AS mu,
        |         list_transform(range(1, n_days + 1), t ->
        |           list_reduce(list_prepend(0.0, xs[1:t]), (a, b) ->
        |             greatest(0.0, a + b
        |                      - CAST(tot AS DOUBLE) / n_days * 1.02))) AS ss
        |  FROM m
        |)
        |SELECT event_type, n_days,
        |       floor(mu * 10000) / 10000 AS mu,
        |       floor(list_aggregate(ss, 'max') * 10000) / 10000 AS cusum_max,
        |       CAST(len(list_filter(ss, v -> v > mu * 0.25)) AS BIGINT)
        |         AS n_days_alarmed
        |FROM c ORDER BY event_type""".stripMargin) { (s, d) =>
      val m = t(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum(col("n")).as("tot"),
          expr("transform(sort_array(collect_list(struct(day, CAST(n AS DOUBLE) AS x))), e -> e.x)")
            .as("xs"))
      m.select(col("event_type"), col("n_days"),
          (col("tot").cast("double") / col("n_days")).as("mu"),
          expr(
            """transform(sequence(1, CAST(n_days AS INT)), t ->
              |  aggregate(slice(xs, 1, t), 0d, (a, b) ->
              |    greatest(0d, a + b
              |             - CAST(tot AS DOUBLE) / n_days * 1.02d)))""".stripMargin)
            .as("ss"))
        .select(col("event_type"), col("n_days"),
          (floor(col("mu") * 10000) / lit(10000)).as("mu"),
          (floor(array_max(col("ss")) * 10000) / lit(10000)).as("cusum_max"),
          expr("CAST(size(filter(ss, v -> v > mu * 0.25)) AS BIGINT)")
            .as("n_days_alarmed"))
        .orderBy("event_type")
    },

    // Irregular-interval time-decay EWMA (round 9): win_ewma's row-based
    // recursion assumes equally spaced observations; real event streams
    // are not, so each step must decay by the ACTUAL gap. The decay
    // kernel is HYPERBOLIC — w(Δt) = H/(H+Δt), H = 1h in seconds —
    // rather than exp(−Δt/τ): one IEEE division of exact integers is
    // bit-identical across engines, where exp() is a libm call the
    // float doctrine (§7.4) can't pin. Non-associative recursion ⇒
    // in-row pinned-order fold per user (the clamped-ledger shape): one
    // user_id shuffle, state [s, prev_sec], no windows. Fold order
    // (sec, event_id) is a total order, so ties can't flip the result.
    Q("win_ewma_time",
      """WITH e AS (
        |  SELECT user_id, event_id,
        |         CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
        |  FROM events WHERE user_id IS NOT NULL
        |), f AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |         list_reduce(list_prepend(
        |             CAST([0.0, -1.0] AS DOUBLE[]),
        |             list([CAST(sec AS DOUBLE), value]
        |                  ORDER BY sec, event_id)),
        |           (a, b) -> CASE WHEN a[2] < 0
        |             THEN [b[2], b[1]]
        |             ELSE [b[2] + 3600.0 / (3600.0 + (b[1] - a[2])) * a[1],
        |                   b[1]] END) AS st
        |  FROM e GROUP BY user_id
        |)
        |SELECT user_id, n_events,
        |       floor(st[1] * 1000000) / 1000000 AS ewma_last
        |FROM f ORDER BY user_id""".stripMargin) { (s, d) =>
      t(s, d, "events").where(col("user_id").isNotNull)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).cast("double").as("sec"), col("value"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          expr("""aggregate(
                 |  sort_array(collect_list(struct(sec, event_id, value))),
                 |  array(0d, -1d),
                 |  (a, e) -> CASE WHEN a[1] < 0d
                 |    THEN array(CAST(e.value AS DOUBLE), e.sec)
                 |    ELSE array(e.value + 3600d / (3600d + (e.sec - a[1])) * a[0],
                 |               e.sec) END)""".stripMargin).as("st"))
        .select(col("user_id"), col("n_events"),
          (floor(col("st")(0) * 1000000) / 1000000).as("ewma_last"))
        .orderBy("user_id")
    },

    // Hampel filter (round 9): robust rolling outlier detection on the
    // daily volume series — flag days where |x − med₇| > 3·1.4826·MAD₇
    // over the trailing 7-day window. The robust sibling of
    // win_rolling_stats' mean±σ band: one wild day inflates a rolling
    // σ and masks the NEXT anomaly, while the median/MAD pair is
    // unmoved by it (breakdown point ½ vs 0) — the standard despike
    // pass before a forecast fit (etl_forecast_*). EXACT integer
    // arithmetic throughout: the window's ≤7 counts are collected and
    // sorted IN-ROW, medsum = lo+hi order statistics (= 2·median,
    // integer), deviations |2v − medsum| are integers, madsum likewise
    // (= 4·MAD), and the flag compares 20000·|2n − medsum| >
    // 44478·madsum — the 3·1.4826 threshold cleared of every division.
    // The two reported medians divide by 2 and 4 only at display
    // (exact binary divisions). Flags fire only on FULL windows (k=7);
    // MAD=0 (≥half the window identical) degenerates to "any deviation
    // flags", the standard Hampel edge, deterministic here.
    //
    // Scale shape: identical to win_rolling_median — the window runs
    // over the calendar-BOUNDED daily frame (one map-side-combinable
    // fact groupBy first), partitioned by event_type; the ≤7-element
    // in-row sorts are O(1) per row. 100× the fact grows only the
    // first aggregate.
    Q("win_hampel",
      """WITH d AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), w AS (
        |  SELECT event_type, day, n,
        |         list_sort(list(n) OVER (PARTITION BY event_type ORDER BY day
        |                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
        |  FROM d
        |), m AS (
        |  SELECT event_type, day, n, arr, len(arr) AS k,
        |         arr[CAST((len(arr) + 1) // 2 AS INT)]
        |           + arr[CAST((len(arr) + 2) // 2 AS INT)] AS medsum
        |  FROM w
        |), f AS (
        |  SELECT event_type, day, n, k, medsum,
        |         list_sort(list_transform(arr, v -> abs(2 * v - medsum)))
        |           AS darr
        |  FROM m
        |), g AS (
        |  SELECT event_type, day, n, k, medsum,
        |         darr[CAST((k + 1) // 2 AS INT)]
        |           + darr[CAST((k + 2) // 2 AS INT)] AS madsum
        |  FROM f
        |)
        |SELECT event_type, day, n,
        |       CAST(medsum AS DOUBLE) / 2.0 AS med7,
        |       CAST(madsum AS DOUBLE) / 4.0 AS mad7,
        |       CAST(CASE WHEN k = 7
        |                  AND 20000 * abs(2 * n - medsum) > 44478 * madsum
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM g ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, 0)
      t(s, d, "events")
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .withColumn("arr", sort_array(collect_list(col("n")).over(w)))
        .withColumn("k", size(col("arr")))
        .withColumn("medsum",
          expr("""element_at(arr, CAST((k + 1) DIV 2 AS INT))
                 | + element_at(arr, CAST((k + 2) DIV 2 AS INT))"""
            .stripMargin))
        .withColumn("darr",
          expr("sort_array(transform(arr, v -> abs(2 * v - medsum)))"))
        .withColumn("madsum",
          expr("""element_at(darr, CAST((k + 1) DIV 2 AS INT))
                 | + element_at(darr, CAST((k + 2) DIV 2 AS INT))"""
            .stripMargin))
        .select(col("event_type"), col("day"), col("n"),
          (col("medsum").cast("double") / 2.0).as("med7"),
          (col("madsum").cast("double") / 4.0).as("mad7"),
          when(col("k") === 7 &&
            lit(20000) * abs(lit(2) * col("n") - col("medsum")) >
              lit(44478) * col("madsum"), 1L).otherwise(0L)
            .as("is_outlier"))
        .orderBy("event_type", "day")
    },

    // Bollinger bands (round 10): trailing-7-day mean ± 2σ envelope on
    // daily volume per event_type with breach flags — the parametric
    // twin of win_hampel (hampel = median/MAD robust fence; bollinger =
    // mean/σ envelope, the volatility-expansion readout ops dashboards
    // plot). Determinism: the ±2σ BREACH TESTS never touch a float —
    // x > mean + 2σ cross-multiplies to (7x−s1 > 0) ∧ (7x−s1)² > 4(7s2−s1²)
    // over exact BIGINT rolling sums s1=Σx, s2=Σx² (same trick for the
    // lower band), so the flag can't flip on a sqrt ulp; ma7/sd7 are
    // display-only doubles (single division / one sqrt of an exact
    // integer, round-6). One window pass over the bounded (type × day)
    // frame; flags only on complete 7-day windows.
    Q("win_bollinger",
      """WITH daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), w AS (
        |  SELECT event_type, day, n,
        |         sum(n) OVER w7 AS s1, sum(n * n) OVER w7 AS s2,
        |         CAST(count(*) OVER w7 AS BIGINT) AS k
        |  FROM daily
        |  WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day, n,
        |       round(CAST(s1 AS DOUBLE) / 7, 6) AS ma7,
        |       round(sqrt(CAST(7 * s2 - s1 * s1 AS DOUBLE)) / 7, 6) AS sd7,
        |       CAST(CASE WHEN 7 * n - s1 > 0 AND
        |                 (7 * n - s1) * (7 * n - s1) > 4 * (7 * s2 - s1 * s1)
        |            THEN 1 ELSE 0 END AS BIGINT) AS breach_up,
        |       CAST(CASE WHEN 7 * n - s1 < 0 AND
        |                 (7 * n - s1) * (7 * n - s1) > 4 * (7 * s2 - s1 * s1)
        |            THEN 1 ELSE 0 END AS BIGINT) AS breach_dn
        |FROM w WHERE k = 7
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val w7 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-6, Window.currentRow)
      val d7 = col("n") * 7 - col("s1")
      val v7 = col("s2") * 7 - col("s1") * col("s1")
      t(s, d, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
        .select(col("event_type"), col("day"), col("n"),
          sum(col("n")).over(w7).as("s1"),
          sum(col("n") * col("n")).over(w7).as("s2"),
          count(lit(1)).over(w7).as("k"))
        .where(col("k") === 7)
        .select(col("event_type"), col("day"), col("n"),
          round(col("s1").cast("double") / 7, 6).as("ma7"),
          round(sqrt(v7.cast("double")) / 7, 6).as("sd7"),
          when(d7 > 0 && d7 * d7 > v7 * 4, 1L).otherwise(0L).as("breach_up"),
          when(d7 < 0 && d7 * d7 > v7 * 4, 1L).otherwise(0L).as("breach_dn"))
        .orderBy("event_type", "day")
    },

    // 14-day RSI (round 10; Wilder 1978, simple-average form): per
    // event_type, 100·Σgains/(Σgains+Σlosses) over the trailing 14
    // daily revenue deltas — the momentum oscillator (>70 overbought /
    // <30 oversold) completing the volatility panel: bollinger flags
    // band exits, RSI flags one-sided runs. With simple averages the
    // /14 cancels, so RSI is ONE division of two exact BIGINT cent
    // sums — no float before the display rounding; flat 14-day windows
    // (all deltas 0) are NULL in both engines. Same bounded
    // (type × day) frame, two window passes sharing one exchange.
    Q("win_rsi",
      """WITH d AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), dl AS (
        |  SELECT event_type, day,
        |         y - lag(y) OVER (PARTITION BY event_type ORDER BY day) AS delta
        |  FROM d
        |), w AS (
        |  SELECT event_type, day,
        |         CAST(sum(CASE WHEN delta > 0 THEN delta ELSE 0 END)
        |           OVER w14 AS BIGINT) AS sg,
        |         CAST(sum(CASE WHEN delta < 0 THEN -delta ELSE 0 END)
        |           OVER w14 AS BIGINT) AS sl,
        |         CAST(count(delta) OVER w14 AS BIGINT) AS k
        |  FROM dl
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round(100.0 * sg / nullif(sg + sl, 0), 6) AS rsi14
        |FROM w WHERE k = 14
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = t(s, d, "events")
        .where(col("value").isNotNull)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val w14 = wl.rowsBetween(-13, Window.currentRow)
      daily
        .select(col("event_type"), col("day"),
          (col("y") - lag(col("y"), 1).over(wl)).as("delta"))
        .select(col("event_type"), col("day"),
          sum(when(col("delta") > 0, col("delta")).otherwise(0L)).over(w14)
            .as("sg"),
          sum(when(col("delta") < 0, -col("delta")).otherwise(0L)).over(w14)
            .as("sl"),
          count(col("delta")).over(w14).as("k"))
        .where(col("k") === 14)
        .select(col("event_type"), col("day"),
          round(lit(100.0) * col("sg") /
            when(col("sg") + col("sl") =!= 0, col("sg") + col("sl")), 6)
            .as("rsi14"))
        .orderBy("event_type", "day")
    },

    // Running VWAP (round 11): cumulative volume-weighted average price
    // per supplier over its daily shipments — THE execution-quality /
    // cost-basis line every trading and procurement dashboard draws
    // (was the daily price above or below the running average paid?).
    // Determinism: prices enter as exact BIGINT cents and quantities as
    // exact BIGINT units (the win_rsi cent-grid), both cumulative sums
    // are integer window folds, and the only float op is the final
    // single division — bit-identical cross-engine. One exchange on
    // suppkey serves both running sums; suppkey < 20 bounds the report tail at every SF.
    Q("win_vwap",
      """WITH daily AS (
        |  SELECT l_suppkey, CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
        |         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS pv,
        |         CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
        |  FROM lineitem WHERE l_suppkey < 20 GROUP BY 1, 2
        |), c AS (
        |  SELECT l_suppkey, day,
        |         CAST(sum(pv) OVER w AS BIGINT) AS cpv,
        |         CAST(sum(q) OVER w AS BIGINT) AS cq
        |  FROM daily
        |  WINDOW w AS (PARTITION BY l_suppkey ORDER BY day
        |               ROWS UNBOUNDED PRECEDING)
        |)
        |SELECT l_suppkey, day, cpv, cq,
        |       round(CAST(cpv AS DOUBLE) / 100 / cq, 6) AS vwap
        |FROM c ORDER BY l_suppkey, day""".stripMargin) { (s, d) =>
      val daily = t(s, d, "lineitem")
        .where(col("l_suppkey") < 20)
        .groupBy(col("l_suppkey"), date_trunc("day", col("l_shipdate")).as("day"))
        .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("pv"),
          sum(round(col("l_quantity")).cast("long")).as("q"))
      val w = Window.partitionBy("l_suppkey").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(col("l_suppkey"), col("day"),
          sum(col("pv")).over(w).as("cpv"),
          sum(col("q")).over(w).as("cq"))
        .select(col("l_suppkey"), col("day"), col("cpv"), col("cq"),
          round(col("cpv").cast("double") / 100 / col("cq"), 6).as("vwap"))
        .orderBy("l_suppkey", "day")
    },

    // Stochastic oscillator (round 11; Lane): %K = 100·(close −
    // min14(low)) / (max14(high) − min14(low)) over daily cent OHLC,
    // %D = 3-period mean of %K — where the close sits INSIDE the
    // recent range (rsi asks how one-sided the moves were; %K asks
    // where we ended up). Rolling extrema are exact BIGINT cents; %K
    // is one division per row; %D averages exactly 3 %K doubles in
    // frame order — the same ordered 3-value sum in both engines.
    // Complete 14-day windows only; flat ranges NULL via nullif.
    Q("win_stochastic",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), k AS (
        |  SELECT event_type, day,
        |         CAST(min(l) OVER w14 AS BIGINT) AS lo14,
        |         CAST(max(h) OVER w14 AS BIGINT) AS hi14,
        |         cl, CAST(count(*) OVER w14 AS BIGINT) AS n14
        |  FROM o
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |), pk AS (
        |  SELECT event_type, day,
        |         round(100.0 * (cl - lo14) / nullif(hi14 - lo14, 0), 4)
        |           AS pct_k
        |  FROM k WHERE n14 = 14
        |)
        |SELECT event_type, day, pct_k,
        |       round(avg(pct_k) OVER (PARTITION BY event_type ORDER BY day
        |                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
        |             4) AS pct_d
        |FROM pk ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val w14 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-13, Window.currentRow)
      val w3 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-2, Window.currentRow)
      o.select(col("event_type"), col("day"),
          min(col("l")).over(w14).as("lo14"),
          max(col("h")).over(w14).as("hi14"),
          col("cl"), count(lit(1)).over(w14).as("n14"))
        .where(col("n14") === 14)
        .select(col("event_type"), col("day"),
          round(lit(100.0) * (col("cl") - col("lo14")) /
            nullif(col("hi14") - col("lo14"), lit(0)), 4).as("pct_k"))
        .select(col("event_type"), col("day"), col("pct_k"),
          round(avg(col("pct_k")).over(w3), 4).as("pct_d"))
        .orderBy("event_type", "day")
    },

    // Williams %R (round 13; Williams): -100·(hi14 − close)/(hi14 −
    // lo14) — the stochastic %K's mirror (where the close sits measured
    // from the TOP of the 14-day range instead of the bottom; %R =
    // %K − 100). Same daily cent-OHLC frame, same exact BIGINT rolling
    // extrema, one float division per row, complete windows only, flat
    // ranges NULL via nullif — the whole key is one more readout over
    // the already-audited stochastic machinery.
    Q("win_williams_r",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), k AS (
        |  SELECT event_type, day,
        |         CAST(min(l) OVER w14 AS BIGINT) AS lo14,
        |         CAST(max(h) OVER w14 AS BIGINT) AS hi14,
        |         cl, CAST(count(*) OVER w14 AS BIGINT) AS n14
        |  FROM o
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round(-100.0 * (hi14 - cl) / nullif(hi14 - lo14, 0), 4)
        |         AS pct_r
        |FROM k WHERE n14 = 14 ORDER BY event_type, day""".stripMargin) {
      (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val w14 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-13, Window.currentRow)
      o.select(col("event_type"), col("day"),
          min(col("l")).over(w14).as("lo14"),
          max(col("h")).over(w14).as("hi14"),
          col("cl"), count(lit(1)).over(w14).as("n14"))
        .where(col("n14") === 14)
        .select(col("event_type"), col("day"),
          round(lit(-100.0) * (col("hi14") - col("cl")) /
            nullif(col("hi14") - col("lo14"), lit(0)), 4).as("pct_r"))
        .orderBy("event_type", "day")
    },

    // Commodity Channel Index (round 13; Lambert): how far today's
    // typical price sits from its 20-day mean, in units of the window's
    // OWN mean absolute deviation — cci = (tp − sma20)/(0.015·md20).
    // The subtlety is md20: every element's deviation is from the
    // CURRENT window's sma, so it is NOT a second rolling aggregate of
    // a per-row value — the window's 20 values themselves are needed
    // per output row. The 20-element frame is collected per row
    // (bounded by construction) and folded with EXACT integers: tp
    // rides as tp3 = h+l+close cents (3× typical price, no division),
    // deviations as |tp3ᵢ·20 − Σtp3| — every comparison and sum is
    // BIGINT, and the single float step is the final display division.
    // Same 0-or-1-scan shape both engines: DuckDB folds list(tp3) OVER
    // the window, Spark aggregates collect_list over the same frame.
    Q("win_cci",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) + min(c) + max(CASE WHEN rn_d = 1 THEN c END)
        |              AS BIGINT) AS tp3
        |  FROM v GROUP BY event_type, day
        |), k AS (
        |  SELECT event_type, day, tp3,
        |         CAST(sum(tp3) OVER w20 AS BIGINT) AS s20,
        |         list(tp3) OVER w20 AS l20,
        |         CAST(count(*) OVER w20 AS BIGINT) AS n20
        |  FROM o
        |  WINDOW w20 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round((tp3 * 20 - s20) * 20000.0
        |             / (15.0 * nullif(list_sum(list_transform(l20,
        |                  x -> abs(x * 20 - s20))), 0)), 4) AS cci
        |FROM k WHERE n20 = 20 ORDER BY event_type, day""".stripMargin) {
      (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg((max(col("c")) + min(col("c")) +
          max(when(col("rn_d") === 1, col("c")))).as("tp3"))
      val w20 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-19, Window.currentRow)
      o.select(col("event_type"), col("day"), col("tp3"),
          sum(col("tp3")).over(w20).as("s20"),
          collect_list(col("tp3")).over(w20).as("l20"),
          count(lit(1)).over(w20).as("n20"))
        .where(col("n20") === 20)
        .select(col("event_type"), col("day"),
          round((col("tp3") * 20 - col("s20")) * lit(20000.0) /
            (lit(15.0) * nullif(aggregate(
              transform(col("l20"), x => abs(x * 20 - col("s20"))),
              lit(0L), (a, x) => a + x), lit(0L))), 4).as("cci"))
        .orderBy("event_type", "day")
    },

    // Money Flow Index (round 13; Quong/Soudack): volume-weighted RSI —
    // raw money flow tp·volume flows into the positive or negative
    // bucket by the typical price's DIRECTION vs yesterday, and mfi =
    // 100·pos14/(pos14+neg14). Volume here is the day's event count
    // (the harness' trade-count analogue, the win_obv convention). All
    // flows are exact BIGINT products of cent-grid tp3 × count; the
    // direction compare is integer; one float division per row at
    // display. First day per series dropped (no prior tp), complete
    // 14-windows only, all-flat windows NULL via nullif.
    Q("win_mfi",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) + min(c) + max(CASE WHEN rn_d = 1 THEN c END)
        |              AS BIGINT) AS tp3,
        |         CAST(count(*) AS BIGINT) AS vol
        |  FROM v GROUP BY event_type, day
        |), f AS (
        |  SELECT event_type, day, tp3, vol,
        |         lag(tp3) OVER (PARTITION BY event_type ORDER BY day) AS prev
        |  FROM o
        |), b AS (
        |  SELECT event_type, day,
        |         CASE WHEN tp3 > prev THEN tp3 * vol ELSE 0 END AS pos,
        |         CASE WHEN tp3 < prev THEN tp3 * vol ELSE 0 END AS neg
        |  FROM f WHERE prev IS NOT NULL
        |), k AS (
        |  SELECT event_type, day,
        |         CAST(sum(pos) OVER w14 AS BIGINT) AS pos14,
        |         CAST(sum(neg) OVER w14 AS BIGINT) AS neg14,
        |         CAST(count(*) OVER w14 AS BIGINT) AS n14
        |  FROM b
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round(100.0 * pos14 / nullif(pos14 + neg14, 0), 4) AS mfi
        |FROM k WHERE n14 = 14 ORDER BY event_type, day""".stripMargin) {
      (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg((max(col("c")) + min(col("c")) +
          max(when(col("rn_d") === 1, col("c")))).as("tp3"),
          count(lit(1)).as("vol"))
      val ws = Window.partitionBy("event_type").orderBy("day")
      val w14 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-13, Window.currentRow)
      o.withColumn("prev", lag(col("tp3"), 1).over(ws))
        .where(col("prev").isNotNull)
        .select(col("event_type"), col("day"),
          when(col("tp3") > col("prev"), col("tp3") * col("vol"))
            .otherwise(lit(0L)).as("pos"),
          when(col("tp3") < col("prev"), col("tp3") * col("vol"))
            .otherwise(lit(0L)).as("neg"))
        .select(col("event_type"), col("day"),
          sum(col("pos")).over(w14).as("pos14"),
          sum(col("neg")).over(w14).as("neg14"),
          count(lit(1)).over(w14).as("n14"))
        .where(col("n14") === 14)
        .select(col("event_type"), col("day"),
          round(lit(100.0) * col("pos14") /
            nullif(col("pos14") + col("neg14"), lit(0L)), 4).as("mfi"))
        .orderBy("event_type", "day")
    },

    // Rolling 20-day beta vs the market series (round 13): the
    // regression slope of each series' daily close on the
    // lexicographically-first event_type's close — systematic-exposure
    // tracking, the two-series companion to win_rolling_corr. The
    // market close joins by day (one equi-join of the bounded daily
    // frames); every window moment sum (Σx, Σy, Σxy, Σx²) is exact
    // BIGINT on the cent grid; β is ONE float expression per row;
    // complete windows only, zero-variance windows NULL.
    Q("win_rolling_beta",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), mkt AS (
        |  SELECT day, cl AS m FROM o
        |  WHERE event_type = (SELECT min(event_type) FROM o)
        |), j AS (
        |  SELECT o.event_type, o.day, o.cl AS y, mkt.m AS x
        |  FROM o JOIN mkt USING (day)
        |  WHERE o.event_type <> (SELECT min(event_type) FROM o)
        |), k AS (
        |  SELECT event_type, day,
        |         CAST(sum(x) OVER w20 AS BIGINT) AS sx,
        |         CAST(sum(y) OVER w20 AS BIGINT) AS sy,
        |         CAST(sum(x * y) OVER w20 AS BIGINT) AS sxy,
        |         CAST(sum(x * x) OVER w20 AS BIGINT) AS sxx,
        |         CAST(count(*) OVER w20 AS BIGINT) AS n
        |  FROM j
        |  WINDOW w20 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
        |             / nullif(CAST(n AS DOUBLE) * sxx
        |                      - CAST(sx AS DOUBLE) * sx, 0), 6) AS beta
        |FROM k WHERE n = 20 ORDER BY event_type, day""".stripMargin) {
      (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(when(col("rn_d") === 1, col("c"))).as("cl"))
        .persist()
      val mn = o.agg(min(col("event_type")).as("mkt_type"))
      val mkt = o.join(broadcast(mn),
          col("event_type") === col("mkt_type"))
        .select(col("day"), col("cl").as("x"))
      val j = o.join(broadcast(mn),
          col("event_type") =!= col("mkt_type"))
        .select(col("event_type"), col("day"), col("cl").as("y"))
        .join(mkt, Seq("day"))
      val w20 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-19, Window.currentRow)
      j.select(col("event_type"), col("day"),
          sum(col("x")).over(w20).as("sx"),
          sum(col("y")).over(w20).as("sy"),
          sum(col("x") * col("y")).over(w20).as("sxy"),
          sum(col("x") * col("x")).over(w20).as("sxx"),
          count(lit(1)).over(w20).as("n"))
        .where(col("n") === 20)
        .select(col("event_type"), col("day"),
          round((col("n").cast("double") * col("sxy") -
            col("sx").cast("double") * col("sy")) /
            nullif(col("n").cast("double") * col("sxx") -
              col("sx").cast("double") * col("sx"), lit(0.0)), 6)
            .as("beta"))
        .orderBy("event_type", "day")
    },

    // Rescaled-range statistic + single-scale Hurst estimate per series
    // (round 13; Hurst 1951): R/S of the full daily-close series — the
    // long-memory readout (H ≈ 0.5 random walk, > 0.5 trending,
    // < 0.5 mean-reverting) next to the autocorrelation keys. The
    // cumulative-deviation series is kept EXACT by scaling: Yₖ =
    // Σᵢ≤ₖ(n·xᵢ − Σx) is a BIGINT prefix sum (one per-series window),
    // R = (max Y − min Y)/n, S from exact moments; the two logs are
    // the only float steps. Series with zero variance NULL out.
    Q("agg_hurst_rs",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(cl) AS BIGINT) AS s1,
        |         CAST(sum(cl * cl) AS BIGINT) AS s2
        |  FROM o GROUP BY event_type
        |), yk AS (
        |  SELECT o.event_type,
        |         CAST(sum(m.n * o.cl - m.s1) OVER (PARTITION BY o.event_type
        |              ORDER BY o.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS y
        |  FROM o JOIN m ON m.event_type = o.event_type
        |), r AS (
        |  SELECT event_type,
        |         CAST(max(y) - min(y) AS BIGINT) AS range_scaled
        |  FROM yk GROUP BY event_type
        |)
        |SELECT m.event_type, m.n,
        |       round((CAST(r.range_scaled AS DOUBLE) / m.n)
        |             / nullif(sqrt(CAST(m.n AS DOUBLE) * m.s2
        |                           - CAST(m.s1 AS DOUBLE) * m.s1) / m.n, 0),
        |             6) AS rs,
        |       round(ln((CAST(r.range_scaled AS DOUBLE) / m.n)
        |                / nullif(sqrt(CAST(m.n AS DOUBLE) * m.s2
        |                              - CAST(m.s1 AS DOUBLE) * m.s1)
        |                         / m.n, 0))
        |             / ln(CAST(m.n AS DOUBLE) / 2), 6) AS hurst_est
        |FROM m JOIN r USING (event_type)
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(when(col("rn_d") === 1, col("c"))).as("cl"))
        .persist()
      val m = o.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cl")).as("s1"),
          sum(col("cl") * col("cl")).as("s2"))
      val wc = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val r = o.join(m, Seq("event_type"))
        .select(col("event_type"), col("day"),
          sum(col("n") * col("cl") - col("s1")).over(wc).as("y"))
        .groupBy("event_type")
        .agg((max(col("y")) - min(col("y"))).as("range_scaled"))
      val sd = sqrt(col("n").cast("double") * col("s2") -
        col("s1").cast("double") * col("s1")) / col("n")
      val rs = (col("range_scaled").cast("double") / col("n")) /
        nullif(sd, lit(0.0))
      m.join(r, Seq("event_type"))
        .select(col("event_type"), col("n"),
          round(rs, 6).as("rs"),
          round(log(rs) / log(col("n").cast("double") / 2), 6)
            .as("hurst_est"))
        .orderBy("event_type")
    },

    // Sharpe + Sortino ratios per series (round 13): mean daily return
    // over total vs DOWNSIDE volatility — the risk-adjusted readouts a
    // portfolio report pairs with win_drawdown/win_ulcer_index. Returns
    // are EXACT micro-unit integers r₆ = ((c − pc)·10⁶) div pc (both
    // engines truncate toward zero — pinned by this key), so every
    // sum/sum-of-squares is BIGINT; the ratios assemble from exact
    // integers in identical IEEE order with one sqrt each (the
    // agg_cohens_d doctrine). Zero-variance series NULL via nullif.
    Q("win_sharpe_sortino",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), r AS (
        |  SELECT event_type,
        |         ((cl - pc) * 1000000) // pc AS r6
        |  FROM (SELECT event_type, cl,
        |               lag(cl) OVER (PARTITION BY event_type ORDER BY day)
        |                 AS pc
        |        FROM o)
        |  WHERE pc IS NOT NULL AND pc <> 0
        |), m AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(r6) AS BIGINT) AS s1,
        |         CAST(sum(r6 * r6) AS BIGINT) AS s2,
        |         CAST(sum(CASE WHEN r6 < 0 THEN r6 * r6 ELSE 0 END)
        |              AS BIGINT) AS sd2
        |  FROM r GROUP BY event_type
        |)
        |SELECT event_type, n,
        |       round(CAST(s1 AS DOUBLE) / n / 10000, 6) AS mean_ret_pct,
        |       round((CAST(s1 AS DOUBLE) / n)
        |             / nullif(sqrt(CAST(n AS DOUBLE) * s2
        |                           - CAST(s1 AS DOUBLE) * s1) / n, 0), 6)
        |         AS sharpe,
        |       round((CAST(s1 AS DOUBLE) / n)
        |             / nullif(sqrt(CAST(sd2 AS DOUBLE) / n), 0), 6)
        |         AS sortino
        |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val ws = Window.partitionBy("event_type").orderBy("day")
      val r = o.withColumn("pc", lag(col("cl"), 1).over(ws))
        .where(col("pc").isNotNull && col("pc") =!= 0)
        .select(col("event_type"),
          expr("((cl - pc) * 1000000) div pc").as("r6"))
      r.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("r6")).as("s1"),
          sum(col("r6") * col("r6")).as("s2"),
          sum(when(col("r6") < 0, col("r6") * col("r6")).otherwise(0L))
            .as("sd2"))
        .select(col("event_type"), col("n"),
          round(col("s1").cast("double") / col("n") / 10000, 6)
            .as("mean_ret_pct"),
          round((col("s1").cast("double") / col("n")) /
            nullif(sqrt(col("n").cast("double") * col("s2") -
              col("s1").cast("double") * col("s1")) / col("n"), lit(0.0)),
            6).as("sharpe"),
          round((col("s1").cast("double") / col("n")) /
            nullif(sqrt(col("sd2").cast("double") / col("n")), lit(0.0)), 6)
            .as("sortino"))
        .orderBy("event_type")
    },

    // Days since the running peak (round 13): how long each series has
    // been under water — the DURATION companion to win_drawdown's depth
    // (a 5% drawdown that is 40 days old is a different regime than a
    // fresh one). The running peak and ITS DAY travel together as one
    // BIGINT encoding (close·2²⁰ + day-number — close wins the max,
    // earliest day breaks close ties via the inverted day field), so
    // one running MAX window carries both; everything stays exact
    // integers to the output.
    Q("win_peak_age",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl,
        |         datediff('day', DATE '1990-01-01', CAST(day AS DATE)) AS dn
        |  FROM v GROUP BY event_type, day
        |), k AS (
        |  SELECT event_type, day, cl, dn,
        |         CAST(max(cl * 1048576 + (1048575 - dn)) OVER
        |              (PARTITION BY event_type ORDER BY day
        |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pk
        |  FROM o
        |)
        |SELECT event_type, day,
        |       CAST(pk // 1048576 AS BIGINT) AS peak_cents,
        |       CAST(dn - (1048575 - pk % 1048576) AS BIGINT)
        |         AS days_since_peak
        |FROM k ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(when(col("rn_d") === 1, col("c"))).as("cl"))
        .withColumn("dn",
          datediff(col("day").cast("date"), lit("1990-01-01").cast("date"))
            .cast("long"))
      val wc = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.select(col("event_type"), col("day"), col("dn"),
          max(col("cl") * 1048576 + (lit(1048575L) - col("dn"))).over(wc)
            .as("pk"))
        .select(col("event_type"), col("day"),
          expr("pk div 1048576").as("peak_cents"),
          (col("dn") - (lit(1048575L) - pmod(col("pk"), lit(1048576L))))
            .as("days_since_peak"))
        .orderBy("event_type", "day")
    },

    // Rolling 20-day skewness (round 13): the asymmetry companion to
    // win_rolling_stats' mean/stdev — a return series that looks calm
    // by σ but skews hard negative is tail risk, not calm. Window
    // moment sums (Σc, Σc², Σc³) are exact BIGINT on the cent grid
    // (c³ ≤ 10¹² per element — far inside range); the skew assembles
    // from them in ONE identical float expression per row; complete
    // windows only, zero-variance windows NULL.
    Q("win_rolling_skew",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), k AS (
        |  SELECT event_type, day,
        |         CAST(sum(cl) OVER w20 AS BIGINT) AS s1,
        |         CAST(sum(cl * cl) OVER w20 AS BIGINT) AS s2,
        |         CAST(sum(cl * cl * cl) OVER w20 AS BIGINT) AS s3,
        |         CAST(count(*) OVER w20 AS BIGINT) AS n
        |  FROM o
        |  WINDOW w20 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round((CAST(s3 AS DOUBLE) / n
        |              - 3.0 * (CAST(s1 AS DOUBLE) / n)
        |                    * (CAST(s2 AS DOUBLE) / n)
        |              + 2.0 * (CAST(s1 AS DOUBLE) / n)
        |                    * (CAST(s1 AS DOUBLE) / n)
        |                    * (CAST(s1 AS DOUBLE) / n))
        |             / nullif(pow(CAST(s2 AS DOUBLE) / n
        |                          - (CAST(s1 AS DOUBLE) / n)
        |                            * (CAST(s1 AS DOUBLE) / n), 1.5), 0),
        |             6) AS skew
        |FROM k WHERE n = 20 ORDER BY event_type, day""".stripMargin) {
      (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val w20 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-19, Window.currentRow)
      val k = o.select(col("event_type"), col("day"),
        sum(col("cl")).over(w20).as("s1"),
        sum(col("cl") * col("cl")).over(w20).as("s2"),
        sum(col("cl") * col("cl") * col("cl")).over(w20).as("s3"),
        count(lit(1)).over(w20).as("n"))
      def dn(c: org.apache.spark.sql.Column) = c.cast("double") / col("n")
      k.where(col("n") === 20)
        .select(col("event_type"), col("day"),
          round((dn(col("s3")) - lit(3.0) * dn(col("s1")) * dn(col("s2"))
            + lit(2.0) * dn(col("s1")) * dn(col("s1")) * dn(col("s1"))) /
            nullif(pow(dn(col("s2")) - dn(col("s1")) * dn(col("s1")),
              lit(1.5)), lit(0.0)), 6).as("skew"))
        .orderBy("event_type", "day")
    },

    // Chandelier exit (round 13; Le Beau): the volatility-scaled
    // trailing long stop — hi22 − 3·ATR22 — the position-management
    // consumer of the ATR machinery (ATR prices the move a stop must
    // absorb; the chandelier hangs the stop that far below the 22-day
    // high). Everything stays exact BIGINT cents (22-window max, true-
    // range sum) until ONE display expression; first day per series
    // dropped (no prev close), complete 22-windows only.
    Q("win_chandelier_exit",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), tr AS (
        |  SELECT event_type, day, h,
        |         greatest(h - l, abs(h - pc), abs(l - pc)) AS tr
        |  FROM (SELECT event_type, day, h, l,
        |               lag(cl) OVER (PARTITION BY event_type ORDER BY day)
        |                 AS pc
        |        FROM o)
        |  WHERE pc IS NOT NULL
        |), k AS (
        |  SELECT event_type, day,
        |         CAST(max(h) OVER w22 AS BIGINT) AS hi22,
        |         CAST(sum(tr) OVER w22 AS BIGINT) AS tr22,
        |         CAST(count(*) OVER w22 AS BIGINT) AS n22
        |  FROM tr
        |  WINDOW w22 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 21 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round((hi22 - 3.0 * tr22 / 22) / 100, 4) AS chandelier_long
        |FROM k WHERE n22 = 22 ORDER BY event_type, day""".stripMargin) {
      (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val ws = Window.partitionBy("event_type").orderBy("day")
      val w22 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-21, Window.currentRow)
      o.withColumn("pc", lag(col("cl"), 1).over(ws))
        .where(col("pc").isNotNull)
        .select(col("event_type"), col("day"), col("h"),
          greatest(col("h") - col("l"), abs(col("h") - col("pc")),
            abs(col("l") - col("pc"))).as("tr"))
        .select(col("event_type"), col("day"),
          max(col("h")).over(w22).as("hi22"),
          sum(col("tr")).over(w22).as("tr22"),
          count(lit(1)).over(w22).as("n22"))
        .where(col("n22") === 22)
        .select(col("event_type"), col("day"),
          round((col("hi22") - lit(3.0) * col("tr22") / 22) / 100, 4)
            .as("chandelier_long"))
        .orderBy("event_type", "day")
    },

    // Momentum + rate-of-change (round 13): close − close₁₂ (absolute
    // move, dollars) and 100·(close − close₁₂)/close₁₂ (relative) over
    // the 12-day lag — the plain-speed readouts under the MACD/RSI
    // family. Integer cent subtraction; two display divisions; rows
    // without a full 12-day lag dropped.
    Q("win_momentum_roc",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), m AS (
        |  SELECT event_type, day, cl,
        |         lag(cl, 12) OVER (PARTITION BY event_type ORDER BY day)
        |           AS cl12
        |  FROM o
        |)
        |SELECT event_type, day,
        |       round((cl - cl12) / 100.0, 4) AS momentum,
        |       round(100.0 * (cl - cl12) / nullif(cl12, 0), 4) AS roc
        |FROM m WHERE cl12 IS NOT NULL
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val ws = Window.partitionBy("event_type").orderBy("day")
      o.withColumn("cl12", lag(col("cl"), 12).over(ws))
        .where(col("cl12").isNotNull)
        .select(col("event_type"), col("day"),
          round((col("cl") - col("cl12")) / lit(100.0), 4).as("momentum"),
          round(lit(100.0) * (col("cl") - col("cl12")) /
            nullif(col("cl12"), lit(0L)), 4).as("roc"))
        .orderBy("event_type", "day")
    },

    // ATR — average true range (round 11; Wilder 1978, simple-average
    // form like win_rsi): 14-day mean of the TRUE range
    // max(high−low, |high−prev_close|, |low−prev_close|) over each
    // event type's daily cent OHLC (the agg_ohlc frame with values on
    // the cent grid) — the volatility SIZE readout next to bollinger's
    // envelope (band width says "wide vs narrow"; ATR prices the move a
    // stop-loss must absorb). All range arithmetic is exact BIGINT
    // cents; the /14 happens once at display. Complete windows only
    // (k = 14), first day dropped (no prev_close).
    Q("win_atr",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), tr AS (
        |  SELECT event_type, day,
        |         greatest(h - l,
        |                  abs(h - lag(cl) OVER w), abs(l - lag(cl) OVER w))
        |           AS t
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), s AS (
        |  SELECT event_type, day,
        |         CAST(sum(t) OVER w14 AS BIGINT) AS st,
        |         CAST(count(t) OVER w14 AS BIGINT) AS k
        |  FROM tr WHERE t IS NOT NULL
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round(CAST(st AS DOUBLE) / 14 / 100, 4) AS atr14
        |FROM s WHERE k = 14
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val w14 = wl.rowsBetween(-13, Window.currentRow)
      o.select(col("event_type"), col("day"),
          greatest(col("h") - col("l"),
            abs(col("h") - lag(col("cl"), 1).over(wl)),
            abs(col("l") - lag(col("cl"), 1).over(wl))).as("t"))
        .where(col("t").isNotNull)
        .select(col("event_type"), col("day"),
          sum(col("t")).over(w14).as("st"),
          count(col("t")).over(w14).as("k"))
        .where(col("k") === 14)
        .select(col("event_type"), col("day"),
          round(col("st").cast("double") / 14 / 100, 4).as("atr14"))
        .orderBy("event_type", "day")
    },

    // Ichimoku cloud (round 13, cont.; Hosoda's system): tenkan (4-day
    // range midpoint), kijun (8-day), senkou A = their mean shifted 8
    // forward, senkou B = 16-day midpoint shifted 8 forward, chikou =
    // close shifted 8 back (the classic 9/26/52 ratios scaled 1:2:4 to
    // the fixture's 30-day span; displacement = kijun period as in the
    // original) — the full five-line overlay, completing
    // the channel family (donchian gives one range box; ichimoku
    // layers three horizons plus displacement). Integer doctrine: each
    // midpoint stays as the exact BIGINT sum hi+lo (2×mid in cents) —
    // senkou A is then (t2+k2), an exact int until ONE display
    // division (/400); the displaced spans are plain lag/lead on
    // the day-ordered series, NULL-propagating incomplete warmup
    // windows out. Complete senkou rows only; chikou NULLs at the
    // series tail (no future close) are kept — same rule both engines.
    Q("win_ichimoku",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), m AS (
        |  SELECT event_type, day, cl,
        |         CASE WHEN count(*) OVER w9 = 4
        |              THEN CAST(max(h) OVER w9 + min(l) OVER w9 AS BIGINT)
        |         END AS t2,
        |         CASE WHEN count(*) OVER w26 = 8
        |              THEN CAST(max(h) OVER w26 + min(l) OVER w26 AS BIGINT)
        |         END AS k2,
        |         CASE WHEN count(*) OVER w52 = 16
        |              THEN CAST(max(h) OVER w52 + min(l) OVER w52 AS BIGINT)
        |         END AS b2
        |  FROM o
        |  WINDOW w9 AS (PARTITION BY event_type ORDER BY day
        |                ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        |         w26 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
        |         w52 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
        |), f AS (
        |  SELECT event_type, day, cl, t2, k2,
        |         lag(t2 + k2, 8) OVER wd AS sa4,
        |         lag(b2, 8) OVER wd AS sb2,
        |         lead(cl, 8) OVER wd AS ck
        |  FROM m WINDOW wd AS (PARTITION BY event_type ORDER BY day)
        |)
        |SELECT event_type, day,
        |       round(t2 / 200.0, 4) AS tenkan,
        |       round(k2 / 200.0, 4) AS kijun,
        |       round(sa4 / 400.0, 4) AS senkou_a,
        |       round(sb2 / 200.0, 4) AS senkou_b,
        |       round(ck / 100.0, 4) AS chikou
        |FROM f WHERE sa4 IS NOT NULL AND sb2 IS NOT NULL
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val ws = Window.partitionBy("event_type").orderBy("day")
      def mid2(k: Int) = {
        val w = ws.rowsBetween(-(k - 1), Window.currentRow)
        when(count(lit(1)).over(w) === k,
          (max(col("h")).over(w) + min(col("l")).over(w)).cast("long"))
      }
      val m = o.select(col("event_type"), col("day"), col("cl"),
        mid2(4).as("t2"), mid2(8).as("k2"), mid2(16).as("b2"))
      val f = m.select(col("event_type"), col("day"), col("cl"),
        col("t2"), col("k2"),
        lag(col("t2") + col("k2"), 8).over(ws).as("sa4"),
        lag(col("b2"), 8).over(ws).as("sb2"),
        lead(col("cl"), 8).over(ws).as("ck"))
      f.where(col("sa4").isNotNull && col("sb2").isNotNull)
        .select(col("event_type"), col("day"),
          round(col("t2") / 200.0, 4).as("tenkan"),
          round(col("k2") / 200.0, 4).as("kijun"),
          round(col("sa4") / 400.0, 4).as("senkou_a"),
          round(col("sb2") / 200.0, 4).as("senkou_b"),
          round(col("ck") / 100.0, 4).as("chikou"))
        .orderBy("event_type", "day")
    },

    // Vortex indicator (round 13, cont.; Botes & Siepman 2010): VI⁺ =
    // Σ|hi − lo₋₁| / ΣTR and VI⁻ = Σ|lo − hi₋₁| / ΣTR over 14 days —
    // the trend-direction companion riding the audited true-range
    // machinery (ATR prices volatility SIZE; vortex reads which way
    // the ranges lean, crossings flag reversals). Exact BIGINT cent
    // sums for all three numerators; complete windows only; one float
    // division per output column, zero ΣTR → NULL via nullif.
    Q("win_vortex",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), tr AS (
        |  SELECT event_type, day,
        |         greatest(h - l,
        |                  abs(h - lag(cl) OVER w), abs(l - lag(cl) OVER w))
        |           AS t,
        |         abs(h - lag(l) OVER w) AS vmp,
        |         abs(l - lag(h) OVER w) AS vmm
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), s AS (
        |  SELECT event_type, day,
        |         CAST(sum(t) OVER w14 AS BIGINT) AS st,
        |         CAST(sum(vmp) OVER w14 AS BIGINT) AS sp,
        |         CAST(sum(vmm) OVER w14 AS BIGINT) AS sm,
        |         CAST(count(t) OVER w14 AS BIGINT) AS k
        |  FROM tr WHERE t IS NOT NULL
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round(CAST(sp AS DOUBLE) / nullif(st, 0), 6) AS vi_plus,
        |       round(CAST(sm AS DOUBLE) / nullif(st, 0), 6) AS vi_minus
        |FROM s WHERE k = 14
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val w14 = wl.rowsBetween(-13, Window.currentRow)
      o.select(col("event_type"), col("day"),
          greatest(col("h") - col("l"),
            abs(col("h") - lag(col("cl"), 1).over(wl)),
            abs(col("l") - lag(col("cl"), 1).over(wl))).as("t"),
          abs(col("h") - lag(col("l"), 1).over(wl)).as("vmp"),
          abs(col("l") - lag(col("h"), 1).over(wl)).as("vmm"))
        .where(col("t").isNotNull)
        .select(col("event_type"), col("day"),
          sum(col("t")).over(w14).as("st"),
          sum(col("vmp")).over(w14).as("sp"),
          sum(col("vmm")).over(w14).as("sm"),
          count(col("t")).over(w14).as("k"))
        .where(col("k") === 14)
        .select(col("event_type"), col("day"),
          round(col("sp").cast("double") / nullif(col("st"), lit(0L)), 6)
            .as("vi_plus"),
          round(col("sm").cast("double") / nullif(col("st"), lit(0L)), 6)
            .as("vi_minus"))
        .orderBy("event_type", "day")
    },

    // Price gaps (round 13, cont.): days whose entire range stays on
    // one side of the previous CLOSE — gap UP iff the day's low never
    // trades back to yesterday's close, gap DOWN iff its high stays
    // under it — the discontinuity detector (a gap is a jump the market
    // never traded through; on telemetry series a gap day is a step
    // change win_cusum confirms later). One lag pass over the daily
    // frame; exact integer cent compares and magnitudes; first day
    // dropped (no previous close).
    Q("win_gaps",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), w AS (
        |  SELECT event_type, day, h, l,
        |         lag(cl) OVER wd AS pc
        |  FROM o WINDOW wd AS (PARTITION BY event_type ORDER BY day)
        |)
        |SELECT event_type, day,
        |       CASE WHEN l > pc THEN 'up' ELSE 'down' END AS direction,
        |       round(CASE WHEN l > pc THEN l - pc ELSE pc - h END / 100.0, 2)
        |         AS gap
        |FROM w WHERE pc IS NOT NULL AND (l > pc OR h < pc)
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd0 = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd0))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val wd = Window.partitionBy("event_type").orderBy("day")
      o.withColumn("pc", lag(col("cl"), 1).over(wd))
        .where(col("pc").isNotNull &&
          (col("l") > col("pc") || col("h") < col("pc")))
        .select(col("event_type"), col("day"),
          when(col("l") > col("pc"), "up").otherwise("down").as("direction"),
          round(when(col("l") > col("pc"), col("l") - col("pc"))
            .otherwise(col("pc") - col("h")) / 100.0, 2).as("gap"))
        .orderBy("event_type", "day")
    },

    // Williams fractals (round 13, cont.): 5-bar pivot points — a day
    // is a fractal HIGH iff its high strictly exceeds the two days
    // before AND after (mirror for lows) — the swing-point detector
    // support/resistance and breakout logic anchor on (donchian gives
    // the rolling envelope; fractals mark the exact pivot bars it was
    // built from). Pure leads/lags over the daily frame — no recursion,
    // no second pass; exact integer cent compares; interior days only
    // (the 2-bar margin at both ends can't qualify); a day can be both
    // a high and a low pivot (wide-range bar) — both rows emitted.
    Q("win_fractals",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l
        |  FROM v GROUP BY event_type, day
        |), w AS (
        |  SELECT event_type, day, h, l,
        |         lag(h, 2) OVER wd AS hb2, lag(h, 1) OVER wd AS hb1,
        |         lead(h, 1) OVER wd AS hf1, lead(h, 2) OVER wd AS hf2,
        |         lag(l, 2) OVER wd AS lb2, lag(l, 1) OVER wd AS lb1,
        |         lead(l, 1) OVER wd AS lf1, lead(l, 2) OVER wd AS lf2
        |  FROM o WINDOW wd AS (PARTITION BY event_type ORDER BY day)
        |)
        |SELECT event_type, day, kind, round(cents / 100.0, 2) AS value
        |FROM (
        |  SELECT event_type, day, 'high' AS kind, h AS cents
        |  FROM w WHERE hb2 IS NOT NULL AND hf2 IS NOT NULL
        |    AND h > hb2 AND h > hb1 AND h > hf1 AND h > hf2
        |  UNION ALL
        |  SELECT event_type, day, 'low' AS kind, l AS cents
        |  FROM w WHERE lb2 IS NOT NULL AND lf2 IS NOT NULL
        |    AND l < lb2 AND l < lb1 AND l < lf1 AND l < lf2
        |)
        |ORDER BY event_type, day, kind""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val o = v.groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"))
      val wd = Window.partitionBy("event_type").orderBy("day")
      val w = o
        .withColumn("hb2", lag(col("h"), 2).over(wd))
        .withColumn("hb1", lag(col("h"), 1).over(wd))
        .withColumn("hf1", lead(col("h"), 1).over(wd))
        .withColumn("hf2", lead(col("h"), 2).over(wd))
        .withColumn("lb2", lag(col("l"), 2).over(wd))
        .withColumn("lb1", lag(col("l"), 1).over(wd))
        .withColumn("lf1", lead(col("l"), 1).over(wd))
        .withColumn("lf2", lead(col("l"), 2).over(wd))
      val hi = w.where(col("hb2").isNotNull && col("hf2").isNotNull &&
          col("h") > col("hb2") && col("h") > col("hb1") &&
          col("h") > col("hf1") && col("h") > col("hf2"))
        .select(col("event_type"), col("day"), lit("high").as("kind"),
          col("h").as("cents"))
      val lo = w.where(col("lb2").isNotNull && col("lf2").isNotNull &&
          col("l") < col("lb2") && col("l") < col("lb1") &&
          col("l") < col("lf1") && col("l") < col("lf2"))
        .select(col("event_type"), col("day"), lit("low").as("kind"),
          col("l").as("cents"))
      hi.unionByName(lo)
        .select(col("event_type"), col("day"), col("kind"),
          round(col("cents") / 100.0, 2).as("value"))
        .orderBy("event_type", "day", "kind")
    },

    // Up/down run-length distribution (round 13, cont.): how long do
    // daily up-moves and down-moves RUN, as a length histogram per
    // direction — the independence diagnostic behind agg_runs_test's
    // single z (under independence run lengths are geometric; a fat
    // tail of long runs is momentum, an excess of 1-runs is
    // mean-reversion — the histogram shows WHICH, the z only says
    // "not independent"). Direction is an exact cent compare; runs are
    // gaps-and-islands on the direction flag; flat days (cl = prev)
    // break runs and are excluded — pinned identically.
    Q("win_run_lengths",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl,
        |         datediff('day', DATE '1990-01-01', CAST(day AS DATE)) AS dn
        |  FROM v GROUP BY event_type, day
        |), dirs AS (
        |  SELECT event_type, day, dn,
        |         CASE WHEN cl > lag(cl) OVER w THEN 'up'
        |              WHEN cl < lag(cl) OVER w THEN 'down' END AS dir
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), runs AS (
        |  SELECT event_type, dir,
        |         dn - row_number() OVER (PARTITION BY event_type, dir
        |                                 ORDER BY day) AS isl
        |  FROM dirs WHERE dir IS NOT NULL
        |), lens AS (
        |  SELECT event_type, dir, CAST(count(*) AS BIGINT) AS len
        |  FROM runs GROUP BY event_type, dir, isl
        |)
        |SELECT event_type, dir, len,
        |       CAST(count(*) AS BIGINT) AS n_runs
        |FROM lens GROUP BY event_type, dir, len
        |ORDER BY event_type, dir, len""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(when(col("rn_d") === 1, col("c"))).as("cl"))
        .withColumn("dn",
          datediff(col("day").cast("date"), lit("1990-01-01").cast("date"))
            .cast("long"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val dirs = o.select(col("event_type"), col("day"), col("dn"),
        when(col("cl") > lag(col("cl"), 1).over(wl), "up")
          .when(col("cl") < lag(col("cl"), 1).over(wl), "down").as("dir"))
      val wr = Window.partitionBy("event_type", "dir").orderBy("day")
      val runs = dirs.where(col("dir").isNotNull)
        .withColumn("isl", col("dn") - row_number().over(wr))
      runs.groupBy("event_type", "dir", "isl")
        .agg(count(lit(1)).as("len"))
        .groupBy("event_type", "dir", "len")
        .agg(count(lit(1)).as("n_runs"))
        .orderBy("event_type", "dir", "len")
    },

    // Underwater spells (round 13, cont.): the DURATION side of
    // drawdown risk as a per-spell table — each maximal run of days
    // below the running peak, with its length, trough depth, and
    // whether the series recovered by the end of data (win_drawdown
    // reports only the worst depth; win_peak_age only the current
    // clock; an allocator prices the DISTRIBUTION of spell lengths).
    // Pure gaps-and-islands on the exact-integer underwater flag
    // (cl < running peak): island id = day_number − underwater_rank
    // is constant within a spell; depth aggregates exact cents; the
    // recovered flag compares the spell's end against the series' last
    // day — all integer arithmetic.
    Q("win_underwater_spells",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl,
        |         datediff('day', DATE '1990-01-01', CAST(day AS DATE)) AS dn
        |  FROM v GROUP BY event_type, day
        |), p AS (
        |  SELECT event_type, day, cl, dn,
        |         CAST(max(cl) OVER (PARTITION BY event_type ORDER BY day
        |                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS pk,
        |         CAST(max(dn) OVER (PARTITION BY event_type) AS BIGINT)
        |           AS last_dn
        |  FROM o
        |), u AS (
        |  SELECT event_type, day, cl, dn, pk, last_dn,
        |         dn - row_number() OVER (PARTITION BY event_type
        |                                 ORDER BY day) AS isl
        |  FROM p WHERE cl < pk
        |)
        |SELECT event_type,
        |       min(day) AS spell_start,
        |       CAST(count(*) AS BIGINT) AS spell_days,
        |       round(max(pk - cl) / 100.0, 2) AS max_depth,
        |       round(max(pk) / 100.0, 2) AS peak,
        |       max(dn) < max(last_dn) AS recovered
        |FROM u GROUP BY event_type, isl
        |ORDER BY event_type, spell_start""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(when(col("rn_d") === 1, col("c"))).as("cl"))
        .withColumn("dn",
          datediff(col("day").cast("date"), lit("1990-01-01").cast("date"))
            .cast("long"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val p = o
        .withColumn("pk", max(col("cl")).over(
          wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("last_dn",
          max(col("dn")).over(Window.partitionBy("event_type")))
      val u = p.where(col("cl") < col("pk"))
        .withColumn("isl", col("dn") - row_number().over(wl))
      u.groupBy("event_type", "isl")
        .agg(min(col("day")).as("spell_start"),
          count(lit(1)).as("spell_days"),
          round(max(col("pk") - col("cl")) / 100.0, 2).as("max_depth"),
          round(max(col("pk")) / 100.0, 2).as("peak"),
          (max(col("dn")) < max(col("last_dn"))).as("recovered"))
        .drop("isl")
        .select(col("event_type"), col("spell_start"), col("spell_days"),
          col("max_depth"), col("peak"), col("recovered"))
        .orderBy("event_type", "spell_start")
    },

    // Volume profile (round 13, cont.): per series, the share of
    // activity at each PRICE level — the day-independent market-profile
    // view (every other window key slices by TIME; traders read where
    // in the price RANGE the volume sat, and the modal bucket is the
    // "point of control" support/resistance anchor). Ten equal-width
    // cent buckets over the series' own [min, max]; bucket assignment
    // is pure integer arithmetic ((c−mn)·10 div (mx−mn+1)); POC = modal
    // bucket, ties to the lowest price (pinned); all counts exact, one
    // share display per row.
    Q("win_volume_profile",
      """WITH v AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |), r AS (
        |  SELECT event_type, CAST(min(c) AS BIGINT) AS mn,
        |         CAST(max(c) AS BIGINT) AS mx,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM v GROUP BY event_type
        |), b AS (
        |  SELECT v.event_type,
        |         CAST((c - mn) * 10 // (mx - mn + 1) AS BIGINT) AS bucket,
        |         mn, mx, n
        |  FROM v JOIN r ON v.event_type = r.event_type
        |), g AS (
        |  SELECT event_type, bucket, mn, mx,
        |         CAST(count(*) AS BIGINT) AS vol, max(n) AS n
        |  FROM b GROUP BY 1, 2, 3, 4
        |)
        |SELECT event_type, bucket,
        |       round((mn + bucket * (mx - mn + 1) / 10.0) / 100, 2)
        |         AS bucket_lo,
        |       vol, round(CAST(vol AS DOUBLE) / n, 6) AS vol_share,
        |       CAST(row_number() OVER (PARTITION BY event_type
        |              ORDER BY vol DESC, bucket) = 1 AS BOOLEAN) AS is_poc
        |FROM g ORDER BY event_type, bucket""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .select(col("event_type"),
          round(col("value") * 100).cast("long").as("c"))
      val r = v.groupBy("event_type")
        .agg(min(col("c")).as("mn"), max(col("c")).as("mx"),
          count(lit(1)).as("n"))
      val b = v.join(broadcast(r), Seq("event_type"))
        .select(col("event_type"),
          expr("(c - mn) * 10 div (mx - mn + 1)").cast("long").as("bucket"),
          col("mn"), col("mx"), col("n"))
      val g = b.groupBy("event_type", "bucket", "mn", "mx")
        .agg(count(lit(1)).as("vol"), max(col("n")).as("n"))
      val wp = Window.partitionBy("event_type")
        .orderBy(col("vol").desc, col("bucket"))
      g.select(col("event_type"), col("bucket"),
          round((col("mn") + col("bucket") * (col("mx") - col("mn") + 1)
            / 10.0) / 100, 2).as("bucket_lo"),
          col("vol"), round(col("vol").cast("double") / col("n"), 6)
            .as("vol_share"),
          (row_number().over(wp) === 1).as("is_poc"))
        .orderBy("event_type", "bucket")
    },

    // Choppiness index (round 13, cont.; Dreiss): 100·log₁₀(ΣTR₁₄ /
    // (hi₁₄−lo₁₄))/log₁₀(14) — is the market TRENDING (low: the path
    // nearly equals the net range) or CHOPPING (high: the path folds
    // back inside the range)? The regime filter that decides whether
    // trend indicators (MACD/ADX) or mean-reversion ones (RSI bands)
    // apply. Non-recursive: the true-range sum and the 14-day extrema
    // are the audited exact-BIGINT machinery; ONE log expression per
    // row; complete windows only, degenerate flat ranges NULL.
    Q("win_choppiness",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), tr AS (
        |  SELECT event_type, day, h, l,
        |         greatest(h - l,
        |                  abs(h - lag(cl) OVER w), abs(l - lag(cl) OVER w))
        |           AS t
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), s AS (
        |  SELECT event_type, day,
        |         CAST(sum(t) OVER w14 AS BIGINT) AS st,
        |         CAST(max(h) OVER w14 - min(l) OVER w14 AS BIGINT) AS rng,
        |         CAST(count(t) OVER w14 AS BIGINT) AS k
        |  FROM tr WHERE t IS NOT NULL
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       floor(100 * log10(CAST(st AS DOUBLE) / nullif(rng, 0))
        |             / log10(14.0) * 1000000) / 1000000 AS chop14
        |FROM s WHERE k = 14
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val w14 = wl.rowsBetween(-13, Window.currentRow)
      o.select(col("event_type"), col("day"), col("h"), col("l"),
          greatest(col("h") - col("l"),
            abs(col("h") - lag(col("cl"), 1).over(wl)),
            abs(col("l") - lag(col("cl"), 1).over(wl))).as("t"))
        .where(col("t").isNotNull)
        .select(col("event_type"), col("day"),
          sum(col("t")).over(w14).as("st"),
          (max(col("h")).over(w14) - min(col("l")).over(w14)).as("rng"),
          count(col("t")).over(w14).as("k"))
        .where(col("k") === 14)
        .select(col("event_type"), col("day"),
          (floor(lit(100) * log10(col("st").cast("double")
            / nullif(col("rng"), lit(0L))) / log10(lit(14.0)) * 1000000)
            / 1000000).as("chop14"))
        .orderBy("event_type", "day")
    },

    // Accumulation/Distribution line (round 13, cont.; Chaikin): ADL =
    // running Σ of CLV·volume where CLV = ((cl−l)−(h−cl))/(h−l) locates
    // the close inside the day's range — the flow indicator reading
    // WHERE in the range the money settled (win_obv only reads the
    // close-to-close SIGN; a down-close near the day's high is
    // accumulation OBV miscounts). Daily event count is the volume
    // proxy (win_mfi convention). CLV·volume quantizes per day to 1e-6
    // integers (one fixed expression on exact cents — ulcer doctrine)
    // so the running sum is an exact BIGINT; flat days (h = l)
    // contribute zero — pinned identically.
    Q("win_adl",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl,
        |         CAST(count(*) AS BIGINT) AS vol
        |  FROM v GROUP BY event_type, day
        |), f AS (
        |  SELECT event_type, day,
        |         CASE WHEN h = l THEN CAST(0 AS BIGINT)
        |              ELSE CAST(round(CAST((cl - l) - (h - cl) AS DOUBLE)
        |                              / (h - l) * vol * 1000000) AS BIGINT)
        |         END AS mf6
        |  FROM o
        |)
        |SELECT event_type, day,
        |       round(CAST(mf6 AS DOUBLE) / 1000000, 4) AS money_flow,
        |       round(CAST(sum(mf6) OVER (PARTITION BY event_type
        |                ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE)
        |             / 1000000, 4) AS adl
        |FROM f ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"),
          count(lit(1)).as("vol"))
      val f = o.select(col("event_type"), col("day"),
        when(col("h") === col("l"), lit(0L))
          .otherwise(round(((col("cl") - col("l")) - (col("h") - col("cl")))
            .cast("double") / (col("h") - col("l")) * col("vol") * 1000000)
            .cast("long")).as("mf6"))
      val cum = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      f.select(col("event_type"), col("day"),
          round(col("mf6").cast("double") / 1000000, 4).as("money_flow"),
          round(sum(col("mf6")).over(cum).cast("double") / 1000000, 4)
            .as("adl"))
        .orderBy("event_type", "day")
    },

    // Range-based volatility estimators (round 13, cont.): 14-day
    // Parkinson (high/low only) and Garman-Klass (adds the close-to-
    // open term; prev close proxies the open, the win_dmi_adx
    // convention) — the OHLC volatility family that converges ~5-7×
    // faster than close-to-close stdev because it uses the WHOLE daily
    // range, the difference between "volatile day" and "trended day".
    // Per-day terms are one fixed float expression on exact cent ratios
    // quantized to 1e-12 integers (ulcer doctrine) so the window sums
    // are exact BIGINT; one sqrt per output column; GK's occasionally
    // negative day terms are kept (the estimator's definition), the
    // window sum clamps at 0 before the sqrt — pinned identically.
    // Zero-cent days (the fixture's value floor rounds to 0 cents at
    // sf0.1) cannot support log-range terms — such days are NULLed out
    // and the complete-window count skips them, same rule both engines.
    Q("win_range_volatility",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), tq AS (
        |  SELECT event_type, day,
        |         CASE WHEN l > 0 AND cl > 0 AND lag(cl) OVER w > 0 THEN
        |         CAST(round(ln(CAST(h AS DOUBLE) / l)
        |                    * ln(CAST(h AS DOUBLE) / l)
        |                    / (4 * ln(2.0)) * 1000000000000) AS BIGINT)
        |         END AS pk12,
        |         CASE WHEN l > 0 AND cl > 0 AND lag(cl) OVER w > 0 THEN
        |         CAST(round((0.5 * ln(CAST(h AS DOUBLE) / l)
        |                         * ln(CAST(h AS DOUBLE) / l)
        |                     - (2 * ln(2.0) - 1)
        |                       * ln(CAST(cl AS DOUBLE) / lag(cl) OVER w)
        |                       * ln(CAST(cl AS DOUBLE) / lag(cl) OVER w))
        |                    * 1000000000000) AS BIGINT)
        |         END AS gk12
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), s AS (
        |  SELECT event_type, day,
        |         CAST(sum(pk12) OVER w14 AS BIGINT) AS sp,
        |         CAST(sum(gk12) OVER w14 AS BIGINT) AS sg,
        |         CAST(count(gk12) OVER w14 AS BIGINT) AS k
        |  FROM tq WHERE gk12 IS NOT NULL
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       floor(sqrt(CAST(sp AS DOUBLE) / 14 / 1000000000000)
        |             * 1000000) / 1000000 AS parkinson14,
        |       floor(sqrt(greatest(CAST(sg AS DOUBLE), 0) / 14
        |                  / 1000000000000) * 1000000) / 1000000
        |         AS garman_klass14
        |FROM s WHERE k = 14
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val w14 = wl.rowsBetween(-13, Window.currentRow)
      val lnHL = log(col("h").cast("double") / col("l"))
      val lnCO = log(col("cl").cast("double") / lag(col("cl"), 1).over(wl))
      val ok = col("l") > 0 && col("cl") > 0 && lag(col("cl"), 1).over(wl) > 0
      val tq = o.select(col("event_type"), col("day"),
        when(ok, round(lnHL * lnHL / (lit(4) * log(lit(2.0)))
          * 1000000000000L).cast("long")).as("pk12"),
        when(ok, round((lit(0.5) * lnHL * lnHL
          - (lit(2) * log(lit(2.0)) - 1) * lnCO * lnCO) * 1000000000000L)
          .cast("long")).as("gk12"))
      tq.where(col("gk12").isNotNull)
        .select(col("event_type"), col("day"),
          sum(col("pk12")).over(w14).as("sp"),
          sum(col("gk12")).over(w14).as("sg"),
          count(col("gk12")).over(w14).as("k"))
        .where(col("k") === 14)
        .select(col("event_type"), col("day"),
          (floor(sqrt(col("sp").cast("double") / 14 / 1000000000000L)
            * 1000000) / 1000000).as("parkinson14"),
          (floor(sqrt(greatest(col("sg").cast("double"), lit(0.0)) / 14
            / 1000000000000L) * 1000000) / 1000000).as("garman_klass14"))
        .orderBy("event_type", "day")
    },

    // DMI / ADX (round 13, cont.; Wilder 1978, simple-average form like
    // win_rsi/win_atr): directional movement +DM/−DM gated by Wilder's
    // rule (only the LARGER of the two counts, and only if positive),
    // DI± = 100·ΣDM/ΣTR over 14 days, DX = 100·|ΣDM⁺−ΣDM⁻|/(ΣDM⁺+ΣDM⁻)
    // — the shared-denominator identity makes DX a pure function of the
    // two exact integer sums — and ADX = the 14-day mean of DX. The
    // second-level window rides per-row 1e-6-quantized DX integers (the
    // ulcer-index doctrine: a float sliding sum could disagree in the
    // last ulp between Spark's re-fold and DuckDB's segment tree; an
    // integer sum cannot). Complete windows at both levels only.
    Q("win_dmi_adx",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), dm AS (
        |  SELECT event_type, day,
        |         greatest(h - l,
        |                  abs(h - lag(cl) OVER w), abs(l - lag(cl) OVER w))
        |           AS t,
        |         CASE WHEN h - lag(h) OVER w > lag(l) OVER w - l
        |               AND h - lag(h) OVER w > 0
        |              THEN h - lag(h) OVER w ELSE 0 END AS dmp,
        |         CASE WHEN lag(l) OVER w - l > h - lag(h) OVER w
        |               AND lag(l) OVER w - l > 0
        |              THEN lag(l) OVER w - l ELSE 0 END AS dmm,
        |         lag(cl) OVER w AS pc
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), s AS (
        |  SELECT event_type, day,
        |         CAST(sum(t) OVER w14 AS BIGINT) AS st,
        |         CAST(sum(dmp) OVER w14 AS BIGINT) AS sp,
        |         CAST(sum(dmm) OVER w14 AS BIGINT) AS sm,
        |         CAST(count(t) OVER w14 AS BIGINT) AS k
        |  FROM dm WHERE pc IS NOT NULL
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |), x AS (
        |  SELECT event_type, day, st, sp, sm,
        |         CASE WHEN k = 14 THEN CAST(round(
        |           100.0 * abs(sp - sm) / nullif(sp + sm, 0) * 1000000)
        |           AS BIGINT) END AS dx6
        |  FROM s
        |), a AS (
        |  SELECT event_type, day, st, sp, sm, dx6,
        |         CAST(sum(dx6) OVER w14 AS BIGINT) AS sdx,
        |         CAST(count(dx6) OVER w14 AS BIGINT) AS k2
        |  FROM x
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round(100.0 * sp / nullif(st, 0), 6) AS di_plus,
        |       round(100.0 * sm / nullif(st, 0), 6) AS di_minus,
        |       floor(CAST(sdx AS DOUBLE) / 14 / 1000000 * 1000000)
        |         / 1000000 AS adx
        |FROM a WHERE k2 = 14
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val w14 = wl.rowsBetween(-13, Window.currentRow)
      val up = col("h") - lag(col("h"), 1).over(wl)
      val dn = lag(col("l"), 1).over(wl) - col("l")
      val dm = o.select(col("event_type"), col("day"),
        greatest(col("h") - col("l"),
          abs(col("h") - lag(col("cl"), 1).over(wl)),
          abs(col("l") - lag(col("cl"), 1).over(wl))).as("t"),
        when(up > dn && up > 0, up).otherwise(0L).as("dmp"),
        when(dn > up && dn > 0, dn).otherwise(0L).as("dmm"),
        lag(col("cl"), 1).over(wl).as("pc"))
      val sF = dm.where(col("pc").isNotNull)
        .select(col("event_type"), col("day"),
          sum(col("t")).over(w14).as("st"),
          sum(col("dmp")).over(w14).as("sp"),
          sum(col("dmm")).over(w14).as("sm"),
          count(col("t")).over(w14).as("k"))
      val x = sF.withColumn("dx6",
        when(col("k") === 14, round(lit(100.0) * abs(col("sp") - col("sm"))
          / nullif(col("sp") + col("sm"), lit(0L)) * 1000000).cast("long")))
      x.withColumn("sdx", sum(col("dx6")).over(w14))
        .withColumn("k2", count(col("dx6")).over(w14))
        .where(col("k2") === 14)
        .select(col("event_type"), col("day"),
          round(lit(100.0) * col("sp") / nullif(col("st"), lit(0L)), 6)
            .as("di_plus"),
          round(lit(100.0) * col("sm") / nullif(col("st"), lit(0L)), 6)
            .as("di_minus"),
          (floor(col("sdx").cast("double") / 14 / 1000000 * 1000000)
            / 1000000).as("adx"))
        .orderBy("event_type", "day")
    },

    // Ulcer index (round 12 — Martin & McCann 1989): RMS of the 14-day
    // percentage drawdown from the rolling high — the downside-only
    // volatility readout (stddev penalizes upside; ulcer prices only
    // the pain). Float doctrine: each day's squared drawdown is
    // quantized PER ROW to integer 1e-12-ticks (round((dd)²·1e12) —
    // deterministic double from exact cents, the cosine-sim per-row
    // precedent), so the WINDOW sum is an exact BIGINT fold — immune to
    // the engines' different sliding-sum strategies (Spark re-folds the
    // frame in row order; DuckDB uses segment-tree aggregation — a
    // double sum could disagree in the last ulp, an integer sum cannot).
    Q("win_ulcer_index",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), dd AS (
        |  SELECT event_type, day,
        |         CAST(round(
        |           CAST(max(cl) OVER w14 - cl AS DOUBLE)
        |           * (max(cl) OVER w14 - cl)
        |           / (max(cl) OVER w14) / (max(cl) OVER w14)
        |           * 1000000000000) AS BIGINT) AS ddq,
        |         CAST(count(cl) OVER w14 AS BIGINT) AS k
        |  FROM o
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |), s AS (
        |  SELECT event_type, day,
        |         CAST(sum(ddq) OVER w14 AS BIGINT) AS sq,
        |         CAST(count(ddq) OVER w14 AS BIGINT) AS k2, k
        |  FROM dd
        |  WINDOW w14 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       floor(sqrt(CAST(sq AS DOUBLE) / 14 / 1000000000000)
        |             * 1000000) / 1000000 AS ulcer14
        |FROM s WHERE k = 14 AND k2 = 14
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val w14 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-13, Window.currentRow)
      val mx = max(col("cl")).over(w14)
      val dd = o.select(col("event_type"), col("day"),
        round((mx - col("cl")).cast("double") * (mx - col("cl"))
          / mx / mx * 1000000000000L).cast("long").as("ddq"),
        count(col("cl")).over(w14).as("k"))
      dd.select(col("event_type"), col("day"),
          sum(col("ddq")).over(w14).as("sq"),
          count(col("ddq")).over(w14).as("k2"), col("k"))
        .where(col("k") === 14 && col("k2") === 14)
        .select(col("event_type"), col("day"),
          (floor(sqrt(col("sq").cast("double") / 14 / 1000000000000L)
            * 1000000) / 1000000).as("ulcer14"))
        .orderBy("event_type", "day")
    },

    // Daily pivot points (round 12 — the floor-trader levels): P =
    // (H+L+C)/3 of the PRIOR day, R1 = 2P − L_prev, S1 = 2P − H_prev —
    // the support/resistance scaffold quoted on every trading desk.
    // Exact integers throughout: the 3× basis (p3 = h+l+c) and the
    // ×300 level numerators never divide until display (FLOOR at 4dp).
    Q("win_pivot_points",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), p AS (
        |  SELECT event_type, day,
        |         lag(h + l + cl) OVER w AS p3,
        |         lag(h) OVER w AS ph, lag(l) OVER w AS pl
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |)
        |SELECT event_type, day,
        |       floor(CAST(p3 AS DOUBLE) / 300 * 10000) / 10000 AS pivot,
        |       floor(CAST(2 * p3 - 3 * pl AS DOUBLE) / 300 * 10000) / 10000
        |         AS r1,
        |       floor(CAST(2 * p3 - 3 * ph AS DOUBLE) / 300 * 10000) / 10000
        |         AS s1
        |FROM p WHERE p3 IS NOT NULL
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      o.select(col("event_type"), col("day"),
          lag(col("h") + col("l") + col("cl"), 1).over(wl).as("p3"),
          lag(col("h"), 1).over(wl).as("ph"),
          lag(col("l"), 1).over(wl).as("pl"))
        .where(col("p3").isNotNull)
        .select(col("event_type"), col("day"),
          (floor(col("p3").cast("double") / 300 * 10000) / 10000)
            .as("pivot"),
          (floor((lit(2) * col("p3") - lit(3) * col("pl")).cast("double")
            / 300 * 10000) / 10000).as("r1"),
          (floor((lit(2) * col("p3") - lit(3) * col("ph")).cast("double")
            / 300 * 10000) / 10000).as("s1"))
        .orderBy("event_type", "day")
    },

    // Donchian channel (round 12 — Richard Donchian's four-week rule,
    // the oldest breakout system): 20-day rolling high/low of the daily
    // cent series plus the close's position inside the channel — the
    // range readout next to the bollinger/keltner envelopes. Exact
    // integers end-to-end (max/min of cents, one guarded division at
    // display, FLOOR-scaled); the same daily-OHLC frame and ROWS
    // window as the rest of the finance panel.
    Q("win_donchian",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), s AS (
        |  SELECT event_type, day, cl,
        |         CAST(max(h) OVER w20 AS BIGINT) AS dc_high,
        |         CAST(min(l) OVER w20 AS BIGINT) AS dc_low,
        |         CAST(count(h) OVER w20 AS BIGINT) AS k
        |  FROM o
        |  WINDOW w20 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       round(CAST(dc_high AS DOUBLE) / 100, 2) AS dc_high,
        |       round(CAST(dc_low AS DOUBLE) / 100, 2) AS dc_low,
        |       floor(CASE WHEN dc_high = dc_low THEN 0.5
        |             ELSE CAST(cl - dc_low AS DOUBLE) / (dc_high - dc_low)
        |             END * 1000000) / 1000000 AS channel_pos
        |FROM s WHERE k = 20
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val w20 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-19, Window.currentRow)
      o.select(col("event_type"), col("day"), col("cl"),
          max(col("h")).over(w20).as("dc_high"),
          min(col("l")).over(w20).as("dc_low"),
          count(col("h")).over(w20).as("k"))
        .where(col("k") === 20)
        .select(col("event_type"), col("day"),
          round(col("dc_high").cast("double") / 100, 2).as("dc_high"),
          round(col("dc_low").cast("double") / 100, 2).as("dc_low"),
          (floor(when(col("dc_high") === col("dc_low"), 0.5)
            .otherwise((col("cl") - col("dc_low")).cast("double")
              / (col("dc_high") - col("dc_low"))) * 1000000) / 1000000)
            .as("channel_pos"))
        .orderBy("event_type", "day")
    },

    // Aroon indicator (round 12 — Chande 1995): days since the 25-day
    // high/low, scaled to [0,100] — the trend-age readout (aroon_up
    // near 100 = the high is fresh, a trend in force; both near 50 =
    // drift). Recency must break ties DETERMINISTICALLY across engines,
    // so the argmax rides a PACKED integer (cents·1e5 + day-ordinal:
    // max picks the highest high, then the most recent — the Aroon
    // convention) and the argmin packs the negated ordinal — no
    // arg_max/max_by whose tie rule differs between engines. Exact
    // BIGINT arithmetic end-to-end; aroon values are exact multiples
    // of 4 (25-day window).
    Q("win_aroon",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(datediff('day', DATE '2024-01-01', day) AS BIGINT) AS dd
        |  FROM v GROUP BY event_type, day
        |), s AS (
        |  SELECT event_type, day, dd,
        |         CAST(max(h * 100000 + dd) OVER w25 AS BIGINT) AS hp,
        |         CAST(min(l * 100000 + (99999 - dd)) OVER w25 AS BIGINT) AS lp,
        |         CAST(count(h) OVER w25 AS BIGINT) AS k
        |  FROM o
        |  WINDOW w25 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       CAST((25 - (dd - hp % 100000)) * 4 AS BIGINT) AS aroon_up,
        |       CAST((25 - (dd - (99999 - lp % 100000))) * 4 AS BIGINT)
        |         AS aroon_down
        |FROM s WHERE k = 25
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val o = v.groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"))
        .withColumn("dd",
          datediff(col("day"), lit("2024-01-01").cast("date")).cast("long"))
      val w25 = Window.partitionBy("event_type").orderBy("day")
        .rowsBetween(-24, Window.currentRow)
      o.select(col("event_type"), col("day"), col("dd"),
          max(col("h") * 100000 + col("dd")).over(w25).as("hp"),
          min(col("l") * 100000 + (lit(99999) - col("dd"))).over(w25)
            .as("lp"),
          count(col("h")).over(w25).as("k"))
        .where(col("k") === 25)
        .select(col("event_type"), col("day"),
          ((lit(25) - (col("dd") - col("hp") % 100000)) * 4)
            .cast("long").as("aroon_up"),
          ((lit(25) - (col("dd") - (lit(99999) - col("lp") % 100000))) * 4)
            .cast("long").as("aroon_down"))
        .orderBy("event_type", "day")
    },

    // Keltner channel (round 12 — Chester Keltner's original 1960
    // ten-day-rule form, which used SIMPLE averages; the EMA variant is
    // the modern restatement): mid = SMA20 of the typical price
    // (h+l+c)/3, bands at ±2·ATR10 — the volatility envelope that
    // complements win_bollinger (stddev envelope) with a true-range
    // envelope. Exact arithmetic throughout: cent prices, tp3 = h+l+c
    // kept as 3× integer (never a per-row /3), true range via the
    // win_atr greatest construction, BIGINT window sums; every display
    // double derives from exact integer sums and FLOOR-scales at 4dp.
    // Cost: the win_atr daily-OHLC frame + two ROWS-window sums over
    // the bounded per-type day series.
    Q("win_keltner",
      """WITH v AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(round(value * 100) AS BIGINT) AS c,
        |         row_number() OVER (PARTITION BY event_type, date_trunc('day', ts)
        |                            ORDER BY ts DESC, event_id DESC) AS rn_d
        |  FROM events WHERE value IS NOT NULL
        |), o AS (
        |  SELECT event_type, day,
        |         CAST(max(c) AS BIGINT) AS h, CAST(min(c) AS BIGINT) AS l,
        |         CAST(max(CASE WHEN rn_d = 1 THEN c END) AS BIGINT) AS cl
        |  FROM v GROUP BY event_type, day
        |), tr AS (
        |  SELECT event_type, day, h + l + cl AS tp3,
        |         greatest(h - l,
        |                  abs(h - lag(cl) OVER w), abs(l - lag(cl) OVER w))
        |           AS t
        |  FROM o WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |), s AS (
        |  SELECT event_type, day,
        |         CAST(sum(tp3) OVER w20 AS BIGINT) AS s20,
        |         CAST(count(tp3) OVER w20 AS BIGINT) AS k20,
        |         CAST(sum(t) OVER w10 AS BIGINT) AS st10,
        |         CAST(count(t) OVER w10 AS BIGINT) AS k10
        |  FROM tr
        |  WINDOW w20 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW),
        |         w10 AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
        |)
        |SELECT event_type, day,
        |       floor(CAST(s20 AS DOUBLE) / 6000 * 10000) / 10000 AS mid20,
        |       floor((CAST(s20 AS DOUBLE) / 6000
        |              + 2 * CAST(st10 AS DOUBLE) / 1000) * 10000) / 10000
        |         AS upper_band,
        |       floor((CAST(s20 AS DOUBLE) / 6000
        |              - 2 * CAST(st10 AS DOUBLE) / 1000) * 10000) / 10000
        |         AS lower_band
        |FROM s WHERE k20 = 20 AND k10 = 10
        |ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val v = t(s, d, "events")
        .where(col("value").isNotNull)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("c", round(col("value") * 100).cast("long"))
      val wd = Window.partitionBy("event_type", "day")
        .orderBy(col("ts").desc, col("event_id").desc)
      val o = v.withColumn("rn_d", row_number().over(wd))
        .groupBy("event_type", "day")
        .agg(max(col("c")).as("h"), min(col("c")).as("l"),
          max(when(col("rn_d") === 1, col("c"))).as("cl"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val w20 = wl.rowsBetween(-19, Window.currentRow)
      val w10 = wl.rowsBetween(-9, Window.currentRow)
      o.select(col("event_type"), col("day"),
          (col("h") + col("l") + col("cl")).as("tp3"),
          greatest(col("h") - col("l"),
            abs(col("h") - lag(col("cl"), 1).over(wl)),
            abs(col("l") - lag(col("cl"), 1).over(wl))).as("t"))
        .select(col("event_type"), col("day"),
          sum(col("tp3")).over(w20).as("s20"),
          count(col("tp3")).over(w20).as("k20"),
          sum(col("t")).over(w10).as("st10"),
          count(col("t")).over(w10).as("k10"))
        .where(col("k20") === 20 && col("k10") === 10)
        .select(col("event_type"), col("day"),
          (floor(col("s20").cast("double") / 6000 * 10000) / 10000)
            .as("mid20"),
          (floor((col("s20").cast("double") / 6000
            + lit(2) * col("st10").cast("double") / 1000) * 10000) / 10000)
            .as("upper_band"),
          (floor((col("s20").cast("double") / 6000
            - lit(2) * col("st10").cast("double") / 1000) * 10000) / 10000)
            .as("lower_band"))
        .orderBy("event_type", "day")
    },

    // On-balance volume (round 11): OBV per event_type — cumulative
    // event volume signed by the daily revenue delta (Granville 1963:
    // volume flowing with rising prices confirms a move; OBV diverging
    // from price flags distribution). Completes the volatility/momentum
    // panel (bollinger = envelope, rsi = one-sidedness, macd =
    // crossover, obv = volume confirmation). Exact arithmetic
    // throughout: cent revenue deltas and event counts are BIGINT, the
    // signed accumulation is an integer running sum — no float anywhere
    // (the first day contributes 0: no prior delta, both engines via
    // the same CASE on a NULL lag).
    Q("win_obv",
      """WITH d AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y,
        |         CAST(count(*) AS BIGINT) AS v
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), s AS (
        |  SELECT event_type, day, v,
        |         y - lag(y) OVER (PARTITION BY event_type ORDER BY day)
        |           AS delta
        |  FROM d
        |)
        |SELECT event_type, day,
        |       CAST(sum(CASE WHEN delta > 0 THEN v
        |                     WHEN delta < 0 THEN -v ELSE 0 END)
        |         OVER (PARTITION BY event_type ORDER BY day
        |               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS obv
        |FROM s ORDER BY event_type, day""".stripMargin) { (s, d) =>
      val daily = t(s, d, "events")
        .where(col("value").isNotNull)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"),
          count(lit(1)).as("v"))
      val wl = Window.partitionBy("event_type").orderBy("day")
      val wc = wl.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily
        .select(col("event_type"), col("day"), col("v"),
          (col("y") - lag(col("y"), 1).over(wl)).as("delta"))
        .select(col("event_type"), col("day"),
          sum(when(col("delta") > 0, col("v"))
            .when(col("delta") < 0, -col("v")).otherwise(0L)).over(wc)
            .as("obv"))
        .orderBy("event_type", "day")
    },

    // MACD (round 11): the EWMA crossover indicator — fast EWMA(12) −
    // slow EWMA(26) with a 9-period signal line over each event type's
    // daily cent volume; histogram = macd − signal. The win_ewma
    // single-α fold generalized to a THREE-state recursion, run as one
    // in-row fixed-arity DOUBLE-array fold (the etl_forecast_holt
    // list_reduce discipline: scalar observations lifted to 1-element
    // lists, accumulator [e12, e26, sig] — the shape both engines fold
    // identically; no per-row list_transform feeds a list accumulator,
    // so the DuckDB list_reduce miscompute class is avoided). α as the
    // literal ratios 2/13, 2/27, 2/10 written identically in both
    // texts; outputs floor-scaled 1e5 (the win_ewma grid).
    Q("win_macd",
      """WITH d AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
        |), g AS (
        |  SELECT event_type,
        |         list(CAST(y AS DOUBLE) ORDER BY day) AS xs,
        |         CAST(count(*) AS BIGINT) AS n_days
        |  FROM d GROUP BY event_type
        |), f AS (
        |  SELECT event_type, n_days,
        |         list_reduce(list_prepend([xs[1], xs[1], CAST(0 AS DOUBLE)],
        |             list_transform(xs[2 : len(xs)],
        |                            x -> [x, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
        |           (a, o) -> [
        |             (CAST(2 AS DOUBLE) / 13) * o[1]
        |               + (1 - CAST(2 AS DOUBLE) / 13) * a[1],
        |             (CAST(2 AS DOUBLE) / 27) * o[1]
        |               + (1 - CAST(2 AS DOUBLE) / 27) * a[2],
        |             (CAST(2 AS DOUBLE) / 10)
        |               * (((CAST(2 AS DOUBLE) / 13) * o[1]
        |                     + (1 - CAST(2 AS DOUBLE) / 13) * a[1])
        |                  - ((CAST(2 AS DOUBLE) / 27) * o[1]
        |                     + (1 - CAST(2 AS DOUBLE) / 27) * a[2]))
        |               + (1 - CAST(2 AS DOUBLE) / 10) * a[3]]) AS st
        |  FROM g
        |)
        |SELECT event_type, n_days,
        |       floor((st[1] - st[2]) * 100000) / 100000 AS macd,
        |       floor(st[3] * 100000) / 100000 AS signal,
        |       floor((st[1] - st[2] - st[3]) * 100000) / 100000 AS histogram
        |FROM f ORDER BY event_type""".stripMargin) { (s, d) =>
      t(s, d, "events")
        .where(col("value").isNotNull)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(round(col("value") * 100).cast("long")).as("y"))
        .groupBy("event_type")
        .agg(
          expr("transform(sort_array(collect_list(struct(day, CAST(y AS DOUBLE) AS x))), e -> e.x)")
            .as("xs"),
          count(lit(1)).as("n_days"))
        .select(col("event_type"), col("n_days"),
          expr(
            """aggregate(slice(xs, 2, size(xs) - 1),
              |          array(element_at(xs, 1), element_at(xs, 1), 0.0d),
              |          (a, x) -> array(
              |            (2.0d / 13) * x + (1 - 2.0d / 13) * a[0],
              |            (2.0d / 27) * x + (1 - 2.0d / 27) * a[1],
              |            (2.0d / 10)
              |              * (((2.0d / 13) * x + (1 - 2.0d / 13) * a[0])
              |                 - ((2.0d / 27) * x + (1 - 2.0d / 27) * a[1]))
              |              + (1 - 2.0d / 10) * a[2]))""".stripMargin).as("st"))
        .select(col("event_type"), col("n_days"),
          (floor((col("st")(0) - col("st")(1)) * 100000) / 100000).as("macd"),
          (floor(col("st")(2) * 100000) / 100000).as("signal"),
          (floor((col("st")(0) - col("st")(1) - col("st")(2)) * 100000)
            / 100000).as("histogram"))
        .orderBy("event_type")
    }
  )
}
