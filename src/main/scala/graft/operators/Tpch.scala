package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The full TPC-H suite (all 22 queries) adapted to the testdata schema — the scan/agg and multi-join
  * reporting shapes that exercise the join PLANNER the way a warehouse
  * user would: one fact-to-fact shuffle (lineitem⋈orders, sort-merge or
  * AQE's choice), every true dimension broadcast, filters pushed below
  * the joins, decimal-exact money sums (the agg_groupby pattern — per-row
  * double product cast to DECIMAL(18,4), so both engines sum exactly and
  * the hash compare is stable), and a deterministic total order with
  * explicit tie-breaks. Averages divide the exact decimal sum (as DOUBLE)
  * by the group count — one IEEE division on identical operands in both
  * engines, so even the ratio columns hash-compare exactly.
  *
  * Schema adaptations vs. standard TPC-H: o_orderpriority stands in for
  * o_shippriority (Q3); the testdata has no partsupp/returns tables, so
  * Q5/Q10 keep their standard join graphs over the tables that exist;
  * lineitem carries no commit/receipt dates, so Q4's "late order" is
  * shipped >60 days after order date; no p_container/l_shipmode, so Q19's
  * disjunction ranges over brand × size × quantity; no c_phone, so Q22
  * groups dormant high-balance customers by nation instead of country
  * code, with "no orders since 2000-01-01" as the dormancy predicate
  * (the testdata generator gives every customer at least one order, so
  * the verbatim NOT EXISTS would be vacuously empty).
  * Round-5 completions (Q2/Q8/Q9/Q11/Q12/Q15/Q16/Q17/Q20/Q21): there is
  * no partsupp table, so the part↔supplier relationship is DERIVED from
  * lineitem where a query needs one — unit cost = min(l_extendedprice /
  * l_quantity) per (part, supplier) stands in for ps_supplycost (Q2),
  * shipped value for ps_availqty·ps_supplycost (Q11, Q20), and observed
  * (part, supplier) line pairs for partsupp membership (Q16). Q9's
  * profit uses p_retailprice·l_quantity as the cost leg. Q12's shipmode
  * becomes l_returnflag and Q12/Q21's lateness is ship-lag > 60 days
  * after order date (no commit/receipt dates — same adaptation as Q4).
  * Single-nation filters widen to one region's nation set (25 nations /
  * 100 suppliers in the generator — a nation is only ~4 suppliers).
  * At 100 TB: lineitem/orders shuffle on the join key; nation/region are
  * TRUE fixed-size dimensions (25/5 rows at every SF) and carry explicit
  * broadcast() hints forever. customer/supplier scale LINEARLY with SF,
  * so (round 5) they carry NO broadcast hint anywhere in this file: an
  * explicit hint overrides AQE's size check and would driver-OOM at
  * warehouse scale by construction. Instead each query pre-reduces the
  * dimension through its selective filter/projection (the Q7 pattern) and
  * leaves the join strategy to AQE, which broadcasts exactly when the
  * runtime size clears spark.sql.autoBroadcastJoinThreshold and shuffles
  * otherwise — the right call at every SF. PlanSpec pins that no
  * customer/supplier relation is hint-broadcast in any tpch_* plan.
  */
object Tpch {

  private def t(s: SparkSession, d: String, n: String) = Tables(s, d, n)

  private def money(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(18,4)")).cast("double")

  private val revenueExpr = "CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

  /** One region's (n_nationkey, n_name) set — a FIXED 5-row frame at every
    * SF (25 nations / 5 regions in the generator and the spec), the only
    * dimension shape this file ever broadcast-hints. Centralizing it keeps
    * the hint policy PlanSpec pins in one place. Callers wrap the join side
    * in broadcast(). */
  private def regionNations(s: SparkSession, d: String, name: String) = {
    val r = t(s, d, "region").where(col("r_name") === name)
      .select("r_regionkey")
    t(s, d, "nation")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
  }

  val qs: Seq[Q] = Seq(

    // Q3 — shipping-priority: unshipped orders of one segment, top revenue.
    Q(
      "tpch_q3",
      s"""SELECT l_orderkey,
         |       $revenueExpr AS revenue,
         |       o_orderdate, o_orderpriority
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1997-03-15'
         |  AND l_shipdate > TIMESTAMP '1997-03-15'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey
         |LIMIT 10""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer")
        .where(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val o = t(s, d, "orders")
        .where(col("o_orderdate") < lit("1997-03-15").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val l = t(s, d, "lineitem")
        .where(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    },

    // Q5 — local-supplier volume: revenue by nation inside one region,
    // where the supplier is in the customer's nation.
    //
    // Plan (round 5): the r_name filter only constrains supplier through
    // nation⋈region, and Catalyst won't reorder the join chain to exploit
    // that without CBO stats — so the q7 pre-reduce pattern is applied by
    // hand: supplier pre-joins the 5-row ASIA nation set map-side, which
    // drops ~4/5 of the supplier rows BEFORE the fact-side join and
    // removes the post-hoc nation/region joins entirely. customer cannot
    // be pre-reduced (its nation is only constrained through the
    // s_nationkey equality at join time) and carries no hint — AQE picks.
    Q(
      "tpch_q5",
      s"""SELECT n_name,
         |       $revenueExpr AS revenue
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |GROUP BY n_name
         |ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer").select("c_custkey", "c_nationkey")
      val o = t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      // ASIA nations (5 rows at every SF) pre-reduce supplier map-side
      val nAsia = regionNations(s, d, "ASIA")
      val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(nAsia), col("s_nationkey") === col("n_nationkey"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(sup,
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },

    // Q7 — volume shipping between a nation PAIR: the same nation
    // dimension joined twice under different roles (supplier side via
    // lineitem, customer side via orders), symmetric pair filter, yearly
    // revenue. Exercises aliased-dimension planning no other key does.
    //
    // Plan (round 4): the symmetric OR predicate spans BOTH nation roles,
    // so Catalyst cannot push it into either join on its own — naively
    // every lineitem row survives both dimension probes before ~all are
    // dropped. The IMPLIED per-role filter n_name IN (pair) is derived by
    // hand and applied to each nation scan (PlanSpec pins the pushed In
    // filter); supplier/customer then pre-join to their 2-row nation
    // role map-side, so the lineitem probe drops ~(1 - 2/25) of the fact
    // table BEFORE the lineitem⋈orders shuffle. The OR pair predicate
    // stays (it still excludes the two same-nation combinations). No hard
    // broadcast on the full customer/supplier dimensions (they scale with
    // SF): only the 2-row nation roles are hinted, and the pre-reduced
    // supplier/customer sides are left to AQE.
    Q(
      "tpch_q7",
      s"""SELECT supp_nation, cust_nation, l_year,
         |       $revenueExpr AS revenue
         |FROM (
         |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         |         l_extendedprice, l_discount
         |  FROM supplier
         |    JOIN lineitem ON s_suppkey = l_suppkey
         |    JOIN orders ON o_orderkey = l_orderkey
         |    JOIN customer ON c_custkey = o_custkey
         |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         |)
         |GROUP BY supp_nation, cust_nation, l_year
         |ORDER BY supp_nation, cust_nation, l_year""".stripMargin) { (s, d) =>
      val pair = Seq("NATION_1", "NATION_2")
      val l = t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate",
          "l_extendedprice", "l_discount")
      val o = t(s, d, "orders").select("o_orderkey", "o_custkey")
      val n1 = t(s, d, "nation").where(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
      val n2 = t(s, d, "nation").where(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
      val supN = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      val custN = t(s, d, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      l.join(supN, col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(custN, col("o_custkey") === col("c_custkey"))
        .where(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },

    // Q18 — large-volume customers: orders whose total quantity clears a
    // threshold (HAVING over a pre-aggregation), then the reporting join.
    // Plan shape: the HAVING set is a semi-join filter on orders BEFORE
    // the wide join — at 100 TB the pre-agg shuffles lineitem once on
    // l_orderkey and the probe side only carries qualifying orders.
    Q(
      "tpch_q18",
      s"""SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
         |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON o_orderkey = l_orderkey
         |WHERE o_orderkey IN (
         |  SELECT l_orderkey FROM lineitem
         |  GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
         |GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
         |ORDER BY o_totalprice DESC, o_orderkey
         |LIMIT 20""".stripMargin) { (s, d) =>
      val l = t(s, d, "lineitem").select("l_orderkey", "l_quantity")
      val big = l.groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("q"))
        .where(col("q") > 300)
        .select("l_orderkey")
      val c = t(s, d, "customer").select("c_custkey", "c_name")
      val o = t(s, d, "orders")
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .join(big.withColumnRenamed("l_orderkey", "o_orderkey"),
          Seq("o_orderkey"), "left_semi")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"))
        .agg(money(col("l_quantity")).as("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },

    // Q10 — returned-item reporting: customers who returned the most
    // revenue in a quarter.
    Q(
      "tpch_q10",
      s"""SELECT c_custkey, c_name,
         |       $revenueExpr AS revenue,
         |       c_acctbal, n_name
         |FROM customer
         |  JOIN orders ON c_custkey = o_custkey
         |  JOIN lineitem ON l_orderkey = o_orderkey
         |  JOIN nation ON c_nationkey = n_nationkey
         |WHERE o_orderdate >= TIMESTAMP '1996-10-01'
         |  AND o_orderdate < TIMESTAMP '1997-01-01'
         |  AND l_returnflag = 'R'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey
         |LIMIT 20""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer")
        .select("c_custkey", "c_name", "c_acctbal", "c_nationkey")
      val o = t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-10-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = t(s, d, "lineitem")
        .where(col("l_returnflag") === "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
      val n = t(s, d, "nation").select("n_nationkey", "n_name")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },

    // Q1 — pricing summary report: the canonical scan+aggregate. No join
    // at all; the whole query is one parquet scan feeding a two-phase
    // HashAggregate over a 6-group key space, so at 100 TB the exchange
    // carries 6 rows per map partition. Every sum is decimal-exact; the
    // averages are (exact decimal sum)/count in one double division.
    Q(
      "tpch_q1",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_price,
        |       CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
        |       count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2001-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      val cnt = count(lit(1))
      t(s, d, "lineitem")
        .where(col("l_shipdate") <= lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          money(col("l_quantity")).as("sum_qty"),
          money(col("l_extendedprice")).as("sum_base_price"),
          money(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("sum_disc_price"),
          // charge is a TRIPLE product → 6 true decimal digits, so a
          // scale-4 cast lands exactly on .00005 ties where Spark
          // (exact-binary HALF_UP) and DuckDB (rounds v*10^scale in
          // double space) disagree on 68/58k rows; at scale 6 the value
          // is tie-free and both engines round identically (measured)
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")) *
            (lit(1) + col("l_tax"))).cast("decimal(18,6)")).cast("double")
            .as("sum_charge"),
          (money(col("l_quantity")) / cnt).as("avg_qty"),
          (money(col("l_extendedprice")) / cnt).as("avg_price"),
          (money(col("l_discount")) / cnt).as("avg_disc"),
          cnt.as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q4 — order-priority checking: EXISTS decorrelated to a left-semi
    // join. The date window prunes orders at the scan; the semi join
    // shuffles on the order key with the ship-lag predicate as a residual
    // condition — at 100 TB the probe side carries only the window's
    // orders and the build side never materializes more than the join.
    Q(
      "tpch_q4",
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        |  AND o_orderdate < TIMESTAMP '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-07-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val l = t(s, d, "lineitem").select("l_orderkey", "l_shipdate")
      o.join(l,
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q6 — forecasting revenue change: pure scan + filter + ONE global
    // aggregate. All three predicates push to the parquet scan
    // (PlanSpec pins the date range reaching PushedFilters); the global
    // sum is a map-side partial per partition plus a 1-row reduce.
    Q(
      "tpch_q6",
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin) { (s, d) =>
      t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(money(col("l_extendedprice") * col("l_discount")).as("revenue"))
    },

    // Q13 — customer order-count distribution: LEFT OUTER join (keeping
    // order-less customers at count 0) then a two-level aggregation. The
    // priority filter lives on the orders side BEFORE the join (the ON
    // -clause filter of the spec), so the outer join probe carries only
    // qualifying orders; the second groupBy is over ≤ a few hundred
    // distinct counts — a trivially small exchange at any SF.
    Q(
      "tpch_q13",
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey
        |)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      val c = t(s, d, "customer").select("c_custkey")
      val o = t(s, d, "orders")
        .where(col("o_orderpriority") =!= "5-LOW")
        .select("o_custkey", "o_orderkey")
      c.join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },

    // Q14 — promotion effect: one month of lineitem against the part
    // dimension, conditional/total revenue ratio. part scales with SF so
    // it carries NO hint (AQE decides); the month filter prunes lineitem
    // at the scan so the join probe is ~1/80th of the fact table. Both
    // sums are decimal-exact; the ratio is one double division.
    Q(
      "tpch_q14",
      """SELECT CAST((100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO'
        |           THEN l_extendedprice * (1 - l_discount) ELSE 0 END AS DECIMAL(18,4))) AS DOUBLE))
        |       / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
        |       AS DOUBLE) AS promo_revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin) { (s, d) =>
      val l = t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
        .select("l_partkey", "l_extendedprice", "l_discount")
      val p = t(s, d, "part").select("p_partkey", "p_type")
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .agg(((lit(100.0) *
          money(when(col("p_type") === "PROMO", disc).otherwise(lit(0)))) /
          money(disc)).as("promo_revenue"))
    },

    // Q19 — discounted revenue under a disjunction of brand × size ×
    // quantity bands. The OR predicate spans BOTH join inputs, so
    // Catalyst cannot factor it onto either scan on its own (same
    // planner blind spot as Q7's symmetric pair) — the IMPLIED per-side
    // envelopes (brand IN the three bands + the size/quantity hulls) are
    // derived by hand and applied to each scan, shrinking both join
    // inputs before the shuffle; the exact disjunction stays as the
    // post-join residual. PlanSpec pins the pushed In/range filters.
    Q(
      "tpch_q19",
      """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#1'  AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)""".stripMargin) { (s, d) =>
      val p = t(s, d, "part")
        .where(col("p_brand").isin("Brand#1", "Brand#13", "Brand#23") &&
          col("p_size").between(1, 30))
        .select("p_partkey", "p_brand", "p_size")
      val l = t(s, d, "lineitem")
        .where(col("l_quantity").between(1, 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .where(
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) &&
            col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#13" && col("p_size").between(1, 20) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#23" && col("p_size").between(1, 30) &&
              col("l_quantity").between(20, 30)))
        .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("revenue"))
    },

    // Q22 — dormant high-balance customers: an UNCORRELATED scalar
    // subquery (the balance threshold) plus a NOT EXISTS anti-join,
    // written as Spark SQL so Catalyst plans both rewrites itself: the
    // scalar becomes a 1-row subquery broadcast to every filter task and
    // the NOT EXISTS a left-anti join — no collect, no hint, nothing
    // driver-sized. The threshold divides the exact decimal sum by the
    // count so both engines compare against bit-identical doubles.
    Q(
      "tpch_q22",
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
        |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM customer
        |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
        |                   FROM customer WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin) { (s, d) =>
      t(s, d, "customer").createOrReplaceTempView("customer_q22_v")
      t(s, d, "orders").createOrReplaceTempView("orders_q22_v")
      s.sql(
        """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
          |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
          |FROM customer_q22_v
          |WHERE c_acctbal > (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
          |                   FROM customer_q22_v WHERE c_acctbal > 0)
          |  AND NOT EXISTS (SELECT 1 FROM orders_q22_v
          |                  WHERE o_custkey = c_custkey
          |                    AND o_orderdate >= TIMESTAMP '2000-01-01')
          |GROUP BY c_nationkey
          |ORDER BY c_nationkey""".stripMargin)
    },

    // Q2 — minimum-cost supplier: for each size-15 part, the ASIA
    // supplier(s) achieving the lowest observed unit price (the
    // correlated-min shape; unit cost from lineitem stands in for
    // ps_supplycost). The min is computed as a groupBy + join-back —
    // the decorrelation Catalyst would apply to the scalar subquery,
    // spelled as a plan. min() of doubles involves no summation, so the
    // equality join back on (partkey, cost) is bit-exact in both
    // engines. Both query filters are GROUP-preserving (supplier region
    // and part size drop whole (part,supplier) groups, never individual
    // lines), so lineitem semi-joins to the ASIA-supplier and size-15
    // part key sets BEFORE the cost aggregate — the dominant shuffle
    // carries ~2% of parts × ~1/5 of suppliers instead of the corpus,
    // and every retained group still sees its full line set (min
    // unchanged). The ASIA nation set (5 rows, fixed) is the only
    // broadcast hint; AQE sizes the part/supplier key-set joins.
    Q(
      "tpch_q2",
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
        |  FROM lineitem GROUP BY l_partkey, l_suppkey
        |), psr AS (
        |  SELECT l_partkey, l_suppkey, cost, s_name, s_acctbal, n_name
        |  FROM ps JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation ON s_nationkey = n_nationkey
        |    JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'ASIA'
        |)
        |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost
        |FROM part JOIN psr ON p_partkey = l_partkey
        |WHERE p_size = 15
        |  AND cost = (SELECT min(cost) FROM psr WHERE l_partkey = p_partkey)
        |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin) { (s, d) =>
      val nAsia = regionNations(s, d, "ASIA")
      val sup = t(s, d, "supplier")
        .select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
        .join(broadcast(nAsia), col("s_nationkey") === col("n_nationkey"))
      val p = t(s, d, "part").where(col("p_size") === 15)
        .select("p_partkey", "p_type")
      val ps = t(s, d, "lineitem")
        .join(sup.select("s_suppkey"),
          col("l_suppkey") === col("s_suppkey"), "left_semi")
        .join(p.select("p_partkey"),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
      val psr = ps.join(sup, col("l_suppkey") === col("s_suppkey"))
        .select("l_partkey", "cost", "s_name", "s_acctbal", "n_name")
      val minCost = psr.groupBy(col("l_partkey").as("mc_partkey"))
        .agg(min(col("cost")).as("min_cost"))
      p.join(psr, col("p_partkey") === col("l_partkey"))
        .join(minCost,
          col("l_partkey") === col("mc_partkey") &&
            col("cost") === col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type", "cost")
        .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // Q8 — national market share: NATION_3's share of AMERICA-customer
    // ECONOMY-part revenue, by order year. Two nation roles like Q7:
    // the customer side pre-joins the 5-row AMERICA nation set map-side
    // (dropping ~4/5 of customers before the fact shuffle), the
    // supplier side keeps all 25 nations for the share's numerator
    // flag. Numerator and denominator are separate decimal-exact sums;
    // the share is one double division.
    Q(
      "tpch_q8",
      """SELECT o_year,
        |       CAST(CAST(sum(CASE WHEN nat = 'NATION_3'
        |                 THEN CAST(volume AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
        |       / CAST(sum(CAST(volume AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |         l_extendedprice * (1 - l_discount) AS volume,
        |         n2.n_name AS nat
        |  FROM part
        |    JOIN lineitem ON p_partkey = l_partkey
        |    JOIN supplier ON s_suppkey = l_suppkey
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation n1 ON c_nationkey = n1.n_nationkey
        |    JOIN region ON n1.n_regionkey = r_regionkey
        |    JOIN nation n2 ON s_nationkey = n2.n_nationkey
        |  WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        |    AND o_orderdate >= TIMESTAMP '1996-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |)
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin) { (s, d) =>
      val p = t(s, d, "part").where(col("p_type") === "ECONOMY")
        .select("p_partkey")
      val l = t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey",
          "l_extendedprice", "l_discount")
      val o = t(s, d, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
      val nAmerica = regionNations(s, d, "AMERICA")
        .select(col("n_nationkey").as("n1_key"))
      val c = t(s, d, "customer").select("c_custkey", "c_nationkey")
        .join(broadcast(nAmerica), col("c_nationkey") === col("n1_key"))
        .select("c_custkey")
      val n2 = t(s, d, "nation")
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("nat"))
      val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_nationkey"),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg((money(when(col("nat") === "NATION_3", volume)
          .otherwise(lit(0))) / money(volume)).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q9 — product-type profit by supplier nation and year: every
    // 'red …' part's margin, profit = revenue − p_retailprice·quantity
    // (the cost leg; no ps_supplycost exists). The per-row profit is a
    // ≤4-decimal-digit value (2-digit money × 2-digit discount minus
    // 2-digit retail × integral qty), so DECIMAL(18,4) holds it exactly
    // — no rounding, no tie risk. nation (25 rows, fixed) is the only
    // broadcast; part/supplier pre-project and AQE decides.
    Q(
      "tpch_q9",
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
        |                     - p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
        |FROM part
        |  JOIN lineitem ON p_partkey = l_partkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE 'red%'
        |GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
        |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
      val p = t(s, d, "part").where(col("p_name").like("red%"))
        .select("p_partkey", "p_retailprice")
      val l = t(s, d, "lineitem")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice", "l_discount")
      val o = t(s, d, "orders").select("o_orderkey", "o_orderdate")
      val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
      val n = t(s, d, "nation").select("n_nationkey", "n_name")
      val profit = col("l_extendedprice") * (lit(1) - col("l_discount")) -
        col("p_retailprice") * col("l_quantity")
      l.join(p, col("l_partkey") === col("p_partkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(money(profit).as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q11 — important stock: parts whose shipped value through ASIA
    // suppliers exceeds 2× the mean per-part value (HAVING against an
    // uncorrelated scalar aggregate; the spec's fixed fraction is
    // 0.0001/SF — dividing by the part count is the same idea made
    // scale-free, so the key returns rows at every SF). The scalar is a
    // 1-row frame cross-joined back (what Catalyst builds for the
    // subquery) — both sides derive from exact decimal sums, so the >
    // comparison sees bit-identical doubles in both engines. One
    // shuffle for the per-part aggregate; the 1-row threshold is
    // broadcast by construction.
    Q(
      "tpch_q11",
      s"""WITH asia_value AS (
         |  SELECT l_partkey,
         |         $revenueExpr AS value
         |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         |    JOIN nation ON s_nationkey = n_nationkey
         |    JOIN region ON n_regionkey = r_regionkey
         |  WHERE r_name = 'ASIA'
         |  GROUP BY l_partkey
         |)
         |SELECT l_partkey, value
         |FROM asia_value
         |WHERE value > (SELECT CAST(2.0 AS DOUBLE) * (CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*))
         |               FROM asia_value)
         |ORDER BY value DESC, l_partkey""".stripMargin) { (s, d) =>
      val sup = t(s, d, "supplier").select("s_suppkey", "s_nationkey")
        .join(broadcast(regionNations(s, d, "ASIA").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey")
      val value = t(s, d, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("value"))
      val total = value.agg((lit(2.0).cast("double") *
        (money(col("value")) / count(lit(1)))).as("threshold"))
      value.join(total)
        .where(col("value") > col("threshold"))
        .select("l_partkey", "value")
        .orderBy(col("value").desc, col("l_partkey"))
    },

    // Q12 — late shipments by class: l_returnflag stands in for
    // l_shipmode and "late" is ship-lag > 60 days (the Q4 adaptation);
    // counts split by order priority. One fact-fact join with the date
    // window pushed to the lineitem scan; the lag predicate is the join
    // residual; the output exchange carries 3 groups.
    Q(
      "tpch_q12",
      """SELECT l_returnflag,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val l = t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_shipdate", "l_returnflag")
      val o = t(s, d, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      l.join(o, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy("l_returnflag")
        .agg(
          sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_returnflag")
    },

    // Q15 — top supplier: quarterly revenue per supplier, keep the
    // max (uncorrelated scalar over an aggregate). Revenue sums are
    // decimal-exact so the = against the 1-row max compares identical
    // doubles. The revenue aggregate shuffles lineitem once on
    // l_suppkey; the 1-row max is broadcast by construction; supplier
    // joins AFTER the filter, touching only winner keys.
    Q(
      "tpch_q15",
      s"""WITH revenue AS (
         |  SELECT l_suppkey,
         |         $revenueExpr AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey
         |)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
         |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val rev = t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy("l_suppkey")
        .agg(money(col("l_extendedprice") * (lit(1) - col("l_discount")))
          .as("total_revenue"))
      val best = rev.agg(max(col("total_revenue")).as("best_revenue"))
      rev.join(best, col("total_revenue") === col("best_revenue"))
        .join(t(s, d, "supplier").select("s_suppkey", "s_name"),
          col("l_suppkey") === col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // Q16 — supplier diversity per part attribute: distinct suppliers
    // observed shipping each (brand, type, size) bucket, excluding
    // flagged (negative-balance) suppliers. The exclusion is a NOT IN
    // on a never-null key → left-anti join; the distinct count is
    // two-phase. The observed (part, supplier) pairs from lineitem
    // stand in for partsupp membership.
    Q(
      "tpch_q16",
      """SELECT p_brand, p_type, p_size,
        |       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM part JOIN lineitem ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#1'
        |  AND p_size IN (1, 9, 15, 23, 31, 40, 46, 50)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) { (s, d) =>
      val p = t(s, d, "part")
        .where(col("p_brand") =!= "Brand#1" &&
          col("p_size").isin(1, 9, 15, 23, 31, 40, 46, 50))
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val bad = t(s, d, "supplier").where(col("s_acctbal") < 0)
        .select(col("s_suppkey").as("bad_suppkey"))
      t(s, d, "lineitem").select("l_partkey", "l_suppkey")
        .join(p, col("l_partkey") === col("p_partkey"))
        .join(bad, col("l_suppkey") === col("bad_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Q17 — small-quantity revenue: lines of one brand+type whose
    // quantity is below 20% of that part's corpus-wide average
    // (correlated avg, decorrelated to a per-part aggregate joined
    // back). The threshold is spelled as exact-decimal-sum / count in
    // BOTH engines (never a bare avg()) so the < compares identical
    // doubles. Only the Brand#23+PROMO parts' thresholds are ever
    // consulted and the filter is part-attribute (group-preserving), so
    // lineitem joins to the filtered part keys BEFORE the per-part
    // aggregate: each qualifying part still sees its full line set
    // (threshold values unchanged — the oracle's full-corpus qthr
    // agrees on every probed key) and the dominant shuffle carries
    // ~1/150 of the corpus instead of all of it.
    Q(
      "tpch_q17",
      """WITH qthr AS (
        |  SELECT l_partkey AS t_partkey,
        |         CAST(0.2 AS DOUBLE) * (CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |                                / count(*)) AS thr
        |  FROM lineitem GROUP BY l_partkey
        |)
        |SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
        |FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN qthr ON t_partkey = l_partkey
        |WHERE p_brand = 'Brand#23' AND p_type = 'PROMO'
        |  AND l_quantity < thr""".stripMargin) { (s, d) =>
      val p = t(s, d, "part")
        .where(col("p_brand") === "Brand#23" && col("p_type") === "PROMO")
        .select("p_partkey")
      val lp = t(s, d, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(p, col("l_partkey") === col("p_partkey"))
      val thr = lp.groupBy(col("l_partkey").as("t_partkey"))
        .agg((lit(0.2).cast("double") *
          (money(col("l_quantity")) / count(lit(1)))).as("thr"))
      lp.join(thr, col("l_partkey") === col("t_partkey"))
        .where(col("l_quantity") < col("thr"))
        .agg((money(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },

    // Q20 — heavy shippers of promo parts: ASIA suppliers who moved
    // more than 50 units of some PROMO part in 1997 (nested semi-join
    // with an aggregate threshold; shipped volume stands in for
    // ps_availqty). The qualifying-supplier set reduces through the
    // (suppkey, partkey) aggregate BEFORE touching supplier — at scale
    // the only full shuffle is that two-key aggregate over one year of
    // lineitem.
    Q(
      "tpch_q20",
      """SELECT s_suppkey, s_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem JOIN part ON l_partkey = p_partkey
        |    WHERE p_type = 'PROMO'
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY l_suppkey, l_partkey
        |    HAVING sum(l_quantity) > 50)
        |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val p = t(s, d, "part").where(col("p_type") === "PROMO")
        .select("p_partkey")
      val heavy = t(s, d, "lineitem")
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select("l_partkey", "l_suppkey", "l_quantity")
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(sum(col("l_quantity")).as("q"))
        .where(col("q") > 50)
        .select("l_suppkey") // no distinct: the semi join's hash build dedups
      t(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey")
        .join(broadcast(regionNations(s, d, "ASIA").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .join(heavy.withColumnRenamed("l_suppkey", "s_suppkey"),
          Seq("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    },

    // Q21 — suppliers who kept orders waiting: late lines (ship-lag
    // > 60 days) on finished multi-supplier orders where NO other
    // supplier was late. The EXISTS / NOT EXISTS pair decorrelates to
    // per-order distinct counts: a late line survives iff its order has
    // ≥2 distinct suppliers and exactly 1 distinct LATE supplier —
    // bit-for-bit the double-subquery semantics (the late line's own
    // supplier IS the one late supplier), with one groupBy replacing
    // two correlated probes of the fact table. ASIA suppliers only.
    Q(
      "tpch_q21",
      """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders, nation, region
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin) { (s, d) =>
      val o = t(s, d, "orders").where(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      // persist: lo feeds both the per-order qualifier and the final
      // late-row count — unpersisted, the lineitem⋈orders join ran twice
      val lo = t(s, d, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .withColumn("late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey", "late")
        .persist()
      // two plain aggregates instead of a double countDistinct (no Expand
      // pass): per (order, supplier) first — n_supp is the row count of
      // that frame, n_late the count of suppliers with any late line
      val perOrder = lo
        .groupBy(col("l_orderkey").as("po_orderkey"), col("l_suppkey"))
        .agg(max(col("late")).as("any_late"))
        .groupBy(col("po_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          count(when(col("any_late"), 1)).as("n_late"))
        .where(col("n_supp") >= 2 && col("n_late") === 1)
        .select("po_orderkey")
      val sup = t(s, d, "supplier").select("s_suppkey", "s_name", "s_nationkey")
        .join(broadcast(regionNations(s, d, "ASIA").select("n_nationkey")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_name")
      lo.where(col("late"))
        .join(perOrder, col("l_orderkey") === col("po_orderkey"), "left_semi")
        .join(sup, col("l_suppkey") === col("s_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    }
  )
}
