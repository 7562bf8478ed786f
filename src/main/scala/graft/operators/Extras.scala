package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The remaining declare=opt rows of SURVEY.md §2: interval-overlap join
  * (2.C), ordered per-group collection (2.D), map functions (2.H).
  */
object Extras {

  /** Integer-mass PageRank over a weighted directed edge list (src, dst,
    * cnt) — damping 0.85, total mass 10¹² BIGINT micro-units so every
    * update is exact integer arithmetic (order-independent, engine-
    * portable; see the graph_pagerank Q for the full rationale). Returns
    * (node, rank).
    *
    * DANGLING nodes (round 8 — a sink with no out-edges would silently
    * LEAK its mass every round): a one-job probe counts sinks up front.
    * A caller whose edges have no sinks BY CONSTRUCTION (symmetrization
    * puts an out-edge on every node — the declared key and every graph_*
    * caller here) passes `noDanglings = true` and skips the probe
    * entirely: the probe is a distinct(dst) + anti-join scan, measured
    * ~1 s of pure overhead on the 2M-edge declared key (round-8 cont. 3
    * bench). Zero sinks takes the lean loop below; a
    * directed graph with sinks takes the dangling-aware loop, which
    * redistributes the sinks' total mass uniformly each round (one
    * broadcast 1-row scalar per round — the standard PageRank dangling
    * treatment, Page et al. 1999 §2.5) over the FULL node set (src ∪
    * dst), and localCheckpoints each round because the rank vector is
    * referenced twice (contribution join + sink-mass aggregate) — an
    * unbroken lazy chain would double the plan per round (the BPE
    * lesson). ComponentsSpec pins mass conservation on a sink graph.
    *
    * Cache contract: persists the edge list (pre-partitioned on src) and
    * the out-weight frame — they feed every iteration and cannot be
    * unpersisted here because the returned frame is lazy; callers doing
    * repeated runs should clearCache() when done.
    */
  def pageRank(edges0: DataFrame, iterations: Int = 3,
      noDanglings: Boolean = false,
      knownDanglings: Boolean = false): DataFrame = {
    // the input is referenced twice below (out-weight aggregate + the
    // weight merge join) — persist it so an unpersisted upstream edge
    // derivation is evaluated once, not twice (the same
    // double-evaluation finding as Extras.symmetrize)
    val e0p = edges0.persist()
    // out-weights are O(nodes); merging them INTO the persisted edge list
    // up front means each iteration is ONE equi-join + one groupBy
    // instead of two joins — the per-round network cost is exactly the
    // rank vector, nothing else
    val outw = e0p.groupBy("src").agg(sum(col("cnt")).as("w")).persist()
    val edges = e0p.join(outw, Seq("src"))
      .repartition(col("src"))
      .persist()
    lazy val sinks = e0p.select(col("dst")).distinct()
      .join(outw, col("dst") === col("src"), "left_anti")
      .persist()
    // the probe job runs only when the caller asserts NEITHER direction:
    // noDanglings (symmetrized callers) and knownDanglings (the directed
    // declared key, where every supplier is a sink by construction) each
    // skip the distinct+anti-join scan — same move, opposite branch
    if (noDanglings || (!knownDanglings && sinks.isEmpty)) {
      val n = outw.agg(count(lit(1)).cast("long").as("n_nodes"))
      var rank = outw.crossJoin(broadcast(n))
        .select(col("src").as("node"),
          expr("CAST(1000000000000 div n_nodes AS BIGINT)").as("rank"))
      for (_ <- 1 to iterations) {
        rank = edges
          .join(rank, col("node") === col("src"))
          .crossJoin(broadcast(n))
          .groupBy(col("dst"), col("n_nodes"))
          .agg(expr("CAST((150000000000 div n_nodes)" +
            " + (85 * sum((rank * cnt) div w)) div 100 AS BIGINT)").as("rank"))
          .select(col("dst").as("node"), col("rank"))
      }
      rank
    } else {
      // full node set: sources ∪ sinks — sinks hold rank too
      val nodes = outw.select(col("src").as("node"))
        .unionByName(sinks.select(col("dst").as("node")))
        .persist()
      val n = nodes.agg(count(lit(1)).cast("long").as("n_nodes"))
      var rank = nodes.crossJoin(broadcast(n))
        .select(col("node"),
          expr("CAST(1000000000000 div n_nodes AS BIGINT)").as("rank"))
        .localCheckpoint()
      for (_ <- 1 to iterations) {
        // the round's ONE broadcast scalar: total mass sitting on sinks
        val dangling = rank
          .join(outw, col("node") === col("src"), "left_anti")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("dmass"))
        val contrib = edges
          .join(rank, col("node") === col("src"))
          .groupBy(col("dst"))
          .agg(sum(expr("(rank * cnt) div w")).as("c"))
        rank = nodes
          .join(contrib, col("node") === col("dst"), "left")
          .crossJoin(broadcast(dangling))
          .crossJoin(broadcast(n))
          .select(col("node"),
            expr("CAST((150000000000 div n_nodes) + (85 * " +
              "(coalesce(c, 0) + dmass div n_nodes)) div 100 AS BIGINT)")
              .as("rank"))
          .localCheckpoint()
      }
      rank
    }
  }

  /** HITS hub/authority scoring (Kleinberg 1999) over a weighted
    * directed edge list (src, dst, cnt), L1-normalized in BIGINT mass
    * units so both engines replay identical integer arithmetic (the
    * graph_pagerank doctrine; classic L2 normalization would put a
    * sqrt in a compare position). Per half-round: auth(v) = Σ_{u→v}
    * hub(u)·cnt then rescale so Σauth snaps back to ~`mass`
    * (score div greatest(1, Σ div mass) — the greatest guards the
    * all-cnt-1 corner where truncated init mass dips just below
    * `mass`); hubs symmetrically over out-edges. Rescaling each
    * half-round keeps every product within BIGINT headroom at any data
    * size (scores stay in [mass, 2·mass); products bounded by
    * 2·mass·max-degree-weight). Returns (hubs, auths) score frames.
    *
    * Plan: edges persisted pre-partitioned once; each half-round is ONE
    * equi-join + groupBy + a broadcast 1-row rescale scalar; score
    * frames are node-sized and localCheckpointed per half-round (each
    * is referenced twice: next contribution join + its own rescale
    * aggregate — the pageRank dangling-loop lesson). Cache contract as
    * with [[pageRank]]: callers doing repeated runs should clearCache().
    */
  def hits(edges0: DataFrame, rounds: Int = 2,
      mass: Long = 1000000000L): (DataFrame, DataFrame) = {
    // the auth frame is only assigned inside the loop — rounds = 0 would
    // return (hub, null) and NPE at first downstream use (same parameter
    // discipline as pageRank)
    require(rounds >= 1, s"hits: rounds=$rounds must be >= 1")
    // Two statically-partitioned copies of the edge frame (round 13) —
    // the auth half-round joins on src, the hub half-round on dst, so a
    // SINGLE src-partitioned copy re-exchanged the edges on dst every
    // half-round. localCheckpoint (not persist) pins partitioning + sort
    // order statically in the LogicalRDD, so each half-round's SMJ moves
    // and sorts only the node-sized score vector; eDst derives from the
    // materialized eSrc, so the caller's edge derivation runs once.
    // Measured −16% on graph_hits (stash A/B, min-of-2 filtered runs).
    val e = edges0.repartition(col("src"))
      .sortWithinPartitions("src").localCheckpoint()
    val eDst = e.repartition(col("dst"))
      .sortWithinPartitions("dst").localCheckpoint()
    def rescale(raw0: DataFrame): DataFrame = {
      // checkpoint the PRE-rescale scores (round 13): raw is referenced
      // twice (the Σ rescale scalar and the projection) — checkpointing
      // the projection instead ran the half-round's edge join + aggregate
      // TWICE (once inside the broadcast build, once inside the
      // checkpoint job). The rescale itself is a lazy projection over the
      // materialized node-sized vector.
      val raw = raw0.localCheckpoint()
      val s = raw.agg(sum(col("raw")).as("s"))
      raw.crossJoin(broadcast(s))
        .select(col("node"),
          expr(s"CAST(raw div greatest(1, s div ${mass}L) AS BIGINT)")
            .as("sc"))
    }
    val nC = e.select(col("src")).distinct()
      .agg(count(lit(1)).cast("long").as("n"))
    var hub = e.select(col("src")).distinct().crossJoin(broadcast(nC))
      .select(col("src").as("node"),
        expr(s"CAST(${mass}L div n AS BIGINT)").as("sc"))
      .localCheckpoint()
    var auth: DataFrame = null
    for (_ <- 1 to rounds) {
      auth = rescale(e.join(hub, col("node") === col("src"))
        .groupBy(col("dst"))
        .agg(sum(col("sc") * col("cnt")).as("raw"))
        .select(col("dst").as("node"), col("raw")))
      hub = rescale(eDst.join(auth, col("node") === col("dst"))
        .groupBy(col("src"))
        .agg(sum(col("sc") * col("cnt")).as("raw"))
        .select(col("src").as("node"), col("raw")))
    }
    (hub, auth)
  }

  /** Triangle + edge counts over an id-ORIENTED distinct edge list
    * (columns `a` < `b`): wedge join on the middle vertex, closing-edge
    * probe on the (low, high) pair — each triangle counted exactly once
    * (see the graph_triangles Q for the full rationale). Returns one row
    * (n_edges, n_triangles).
    *
    * Cache contract: persists the edge frame (it feeds three join
    * references); callers doing repeated runs should clearCache() when
    * done, as with [[pageRank]].
    */
  def triangles(edges0: DataFrame): DataFrame = {
    val e = edges0.persist()
    val bc = e.select(col("a").as("b2"), col("b").as("c"))
    val ac = e.select(col("a").as("a3"), col("b").as("c3"))
    val tri = e.join(bc, col("b") === col("b2"))
      .join(ac, col("a") === col("a3") && col("c") === col("c3"))
      .agg(count(lit(1)).as("n_triangles"))
    e.agg(count(lit(1)).as("n_edges")).join(tri)
  }

  /** DEGREE-oriented triangle counting (Suri & Vassilvitskii 2011, "the
    * curse of the last reducer") — the power-law escape [[triangles]]
    * documents: orient every edge from its lower-(degree, id) endpoint to
    * the higher one. A wedge is two out-edges of one vertex, so a vertex
    * contributes C(out-degree, 2) wedges; under id orientation a hub
    * sitting MID-RANGE in the id order keeps ~half its degree as
    * out-edges and contributes O(deg²) wedges (a hub at the low/high id
    * extreme is accidentally safe — the hazard depends on where ids
    * landed). Degree orientation makes every hub the HIGHEST rank among
    * its neighbors — zero out-edges, zero hub wedges — capping any
    * vertex's out-degree at O(√m) and total wedges at O(m^1.5)
    * REGARDLESS of the degree distribution (ScaleSmoke measures the
    * mid-id-hub A/B). Every triangle {x,y,z} with rank rx<ry<rz is
    * enumerated exactly once at its lowest-rank vertex as wedge (y,z)
    * closed by oriented edge y→z — same counts as [[triangles]]
    * (equality law + brute-force oracle in ComponentsSpec), same input
    * contract (distinct undirected edges as a<b), same output row. The
    * total rank packs (degree, id) into one BIGINT — degree and id both
    * fit 31 bits at any realistic node count.
    */
  def trianglesByDegree(edges0: DataFrame): DataFrame = {
    // two-struct explode + persist: `und` feeds the degree aggregate and
    // the orientation join — one evaluation of the caller's edge
    // derivation, one of the symmetrized frame
    val und = edges0.select(explode(array(
        struct(col("a").as("u"), col("b").as("v")),
        struct(col("b").as("u"), col("a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist()
    val rank = und.groupBy("u")
      .agg(count(lit(1)).as("d"))
      .select(col("u").as("n"), (col("d") * lit(4294967296L) + col("u")).as("r"))
    val or = und
      .join(rank.select(col("n").as("nu"), col("r").as("ru")),
        col("u") === col("nu"))
      .join(rank.select(col("n").as("nv"), col("r").as("rv")),
        col("v") === col("nv"))
      .where(col("ru") < col("rv"))
      .select(col("u").as("a"), col("v").as("b"), col("rv").as("rb"))
    val e = or.persist()
    // wedges at the lowest-rank vertex: two out-edges (a→b), (a→c) with
    // rank(b) < rank(c); the closing edge must then be oriented b→c
    val right = e.select(col("a").as("a2"), col("b").as("c"),
      col("rb").as("rc"))
    val closing = e.select(col("a").as("cb"), col("b").as("cc"))
    val tri = e.join(right, col("a") === col("a2") && col("rb") < col("rc"))
      .join(closing, col("b") === col("cb") && col("c") === col("cc"))
      .agg(count(lit(1)).as("n_triangles"))
    e.agg(count(lit(1)).as("n_edges")).join(tri)
  }

  val qs: Seq[Q] = Seq(

    // Cross-user session-overlap pairs (visit-overlap QA, R3). The
    // 100 TB-safe shape: explode each session to the calendar days it
    // spans and equi-join on day first, so the quadratic theta predicate
    // only runs within a day bucket, never across the whole table.
    Q("join_interval_overlap",
      """WITH g AS (
        |  SELECT user_id, event_id, ts,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
        |              THEN 1 ELSE 0 END AS new_sess
        |  FROM events WHERE user_id < 30
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), sm AS (
        |  SELECT user_id, ts,
        |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM g
        |), sess AS (
        |  SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
        |  FROM sm GROUP BY user_id, session_id
        |), days AS (
        |  SELECT user_id, session_id, s, e,
        |         unnest(generate_series(CAST(date_trunc('day', s) AS TIMESTAMP),
        |                                CAST(date_trunc('day', e) AS TIMESTAMP),
        |                                INTERVAL 1 DAY)) AS day
        |  FROM sess
        |)
        |SELECT DISTINCT a.user_id AS a_user, a.session_id AS a_session,
        |       b.user_id AS b_user, b.session_id AS b_session
        |FROM days a JOIN days b
        |  ON a.day = b.day AND a.user_id < b.user_id
        | AND a.s <= b.e AND b.s <= a.e
        |ORDER BY a_user, a_session, b_user, b_session""".stripMargin) { (s, d) =>
      val sess = Etl.sessionized(
        Tables(s, d, "events").where(col("user_id") < 30))
        .groupBy("user_id", "session_id")
        .agg(min(col("ts")).as("s"), max(col("ts")).as("e"))
      val days = sess.select(
        col("user_id"), col("session_id"), col("s"), col("e"),
        explode(sequence(
          date_trunc("day", col("s")), date_trunc("day", col("e")),
          expr("INTERVAL 1 DAY"))).as("day"))
      days.as("a")
        .join(days.as("b"),
          col("a.day") === col("b.day") &&
            col("a.user_id") < col("b.user_id") &&
            col("a.s") <= col("b.e") && col("b.s") <= col("a.e"))
        .select(
          col("a.user_id").as("a_user"), col("a.session_id").as("a_session"),
          col("b.user_id").as("b_user"), col("b.session_id").as("b_session"))
        .distinct()
        .orderBy("a_user", "a_session", "b_user", "b_session")
    },

    // Band join (round 13, cont.): every (purchase, click-within-the-
    // prior-10-minutes) pair per user, rolled up to a per-purchase
    // click count — the attribution-window primitive (join_asof takes
    // the single most recent; the band join keeps ALL events inside the
    // window, the shape behind conversion-window and fraud-burst
    // queries). THE scale plan: never a per-user cross — purchases
    // explode to their two 600-second epoch buckets, clicks carry one,
    // and the join is EQUI on (user, bucket) with the exact band
    // predicate applied after (any <600 s gap spans at most 2 buckets,
    // so candidates per purchase are the user's two-bucket click load,
    // not their whole history). The oracle spells the naive range join
    // — same rows, different asymptote. Purchases with zero clicks kept
    // via the left join.
    Q("join_band",
      """WITH p AS (
        |  SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase' AND user_id IS NOT NULL
        |), c AS (
        |  SELECT user_id, ts FROM events
        |  WHERE event_type = 'click' AND user_id IS NOT NULL
        |)
        |SELECT p.event_id AS purchase_id, p.user_id,
        |       CAST(count(c.ts) AS BIGINT) AS n_clicks_10m
        |FROM p LEFT JOIN c ON c.user_id = p.user_id
        |  AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
        |GROUP BY 1, 2 ORDER BY purchase_id""".stripMargin) { (s, d) =>
      val ev = Tables(s, d, "events").where(col("user_id").isNotNull)
      val p = ev.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"),
          expr("unix_timestamp(ts) div 600").as("pb"))
        .withColumn("bk", explode(array(col("pb") - 1, col("pb"))))
      val c = ev.where(col("event_type") === "click")
        .select(col("user_id").as("cu"), col("ts").as("cts"),
          expr("unix_timestamp(ts) div 600").as("cb"))
      p.join(c,
          col("user_id") === col("cu") && col("bk") === col("cb") &&
            col("cts") >= col("ts") - expr("INTERVAL 10 MINUTES") &&
            col("cts") < col("ts"), "left")
        .groupBy(col("event_id").as("purchase_id"), col("user_id"))
        .agg(count(col("cts")).as("n_clicks_10m"))
        .orderBy("purchase_id")
    },

    // Ordered per-group event history (case event lists, R5): collect is
    // unordered in both engines, so order is imposed by sorting (ts,
    // event_id) structs and projecting the id — deterministic on both. The
    // DECLARED output joins the ids with ',' (driver comparator cannot hash
    // ARRAY cells); ArrayOutputSpec covers the array form.
    Q("agg_collect_sorted",
      """SELECT user_id,
        |       array_to_string(list(event_id ORDER BY ts, event_id), ',') AS event_ids
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      Tables(s, d, "events")
        .groupBy("user_id")
        .agg(
          concat_ws(",", transform(
            sort_array(collect_list(struct(col("ts"), col("event_id")))),
            x => x.getField("event_id"))).as("event_ids"))
        .orderBy("user_id")
    },

    // Map build/lookup/keys (R10 property bags). DuckDB map extraction
    // yields a LIST, so the oracle scalarizes with [1]; key order is made
    // deterministic by sorting.
    Q("fn_map",
      """SELECT event_id,
        |       m['k'][1] AS k_val,
        |       m['type'][1] AS type_val,
        |       array_to_string(list_sort(map_keys(m)), ',') AS ks
        |FROM (
        |  SELECT event_id,
        |         map(['k', 'type'],
        |             [json_extract_string(props, '$.k'), event_type]) AS m
        |  FROM events
        |) ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables(s, d, "events")
        .select(
          col("event_id"),
          map(
            lit("k"), get_json_object(col("props"), "$.k"),
            lit("type"), col("event_type")).as("m"))
        .select(
          col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          element_at(col("m"), "type").as("type_val"),
          concat_ws(",", sort_array(map_keys(col("m")))).as("ks"))
        .orderBy("event_id")
    },

    // PageRank (round 5) over the customer↔supplier transaction graph —
    // the link-analysis op a crawl-curation pipeline runs on its host
    // graph (Page et al. 1999; harmonic/PageRank centrality is how
    // CommonCrawl-scale corpora weight domains). Nodes are customers
    // (2k) and suppliers (2k+1); edges are order lineitems, symmetrized
    // so no node dangles; damping 0.85, 3 fixed iterations.
    //
    // Determinism design: ranks live in BIGINT MICRO-UNITS (total mass
    // 10¹²) and every update is integer arithmetic — (rank·cnt) div w
    // truncated, damped as (85·Σ) div 100 — so the accumulation is
    // EXACT in both engines regardless of summation order. A double
    // implementation would disagree cross-engine in last-ulp wobble that
    // compounds through iterations; integer mass cannot. The truncation
    // bleeds ≤1 unit per edge per iteration (measured ~1e-7 relative),
    // the standard price of fixed-point PageRank.
    //
    // Scale shape: each iteration is one equi-join of the edge list with
    // the rank vector (shuffle on src) + one groupBy dst — the classic
    // distributed PageRank round. The three iterations unroll into ONE
    // plan, so Spark's ReusedExchange serves the edge/outw subtrees from
    // the first shuffle instead of rescanning; an open-ended production
    // loop would checkpoint per round like operators/Components does.
    Q("graph_pagerank", pagerankOracle) { (s, d) =>
      val pair = custSuppPairs(s, d)
      // symmetrize via two-struct explode (ONE evaluation of the
      // materialized pair frame — the unionAll form read it twice)
      // and hand off to the ONE pageRank definition (also driven at 20M
      // edges by ScaleSmoke): edges/outw are persisted pre-partitioned
      // in there, so each round shuffles only the ranks
      val edges = pair.select(explode(array(
          struct(col("c").as("src"), col("s").as("dst"), col("cnt")),
          struct(col("s").as("src"), col("c").as("dst"), col("cnt")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.cnt").as("cnt"))
      pageRank(edges, 3, noDanglings = true).orderBy(col("rank").desc, col("node")).limit(20)
    },

    // DIRECTED PageRank with dangling sinks (round 8, cont. 4) — the
    // declared twin of [[Extras.pageRank]]'s dangling-aware loop (the
    // round-8 fix that stopped a sink from silently leaking its mass
    // every iteration). Graph: customer → supplier flow edges ONLY, so
    // EVERY supplier is a sink by construction — the hostile shape for
    // naive PageRank (here ~6% of nodes hold the entire damped inflow).
    // Each round the sinks' total mass is re-spread uniformly over the
    // full node set before damping (Page et al. 1999 §2.5), as one
    // broadcast 1-row scalar — mass is conserved up to div truncation
    // (ComponentsSpec pins the law on a star-into-sink graph).
    //
    // Same integer-mass determinism doctrine as graph_pagerank: BIGINT
    // micro-units, every update a truncating div, so the oracle replays
    // the identical arithmetic — including the per-round dmass div n —
    // with zero float wobble. Plan: per round ONE rank shuffle (edges
    // persisted pre-partitioned on src inside pageRank), one O(sinks)
    // anti-join aggregate for dmass, rank vector localCheckpointed
    // because it is referenced twice per round.
    Q("graph_pagerank_directed",
      """WITH pair AS (
        |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2
        |), edges AS (
        |  SELECT c AS src, s AS dst, cnt FROM pair
        |), outw AS (
        |  SELECT src, CAST(sum(cnt) AS BIGINT) AS w FROM edges GROUP BY src
        |), sinks AS (
        |  SELECT DISTINCT dst AS node FROM edges
        |  WHERE dst NOT IN (SELECT src FROM outw)
        |), nodes AS (
        |  SELECT src AS node FROM outw UNION ALL SELECT node FROM sinks
        |), n AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM nodes
        |), r0 AS (
        |  SELECT node, CAST(1000000000000 // n_nodes AS BIGINT) AS rank
        |  FROM nodes CROSS JOIN n
        |), d1 AS (
        |  SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dmass FROM r0
        |  WHERE node NOT IN (SELECT src FROM outw)
        |), c1 AS (
        |  SELECT e.dst, CAST(sum((r.rank * e.cnt) // o.w) AS BIGINT) AS c
        |  FROM edges e JOIN r0 r ON r.node = e.src
        |               JOIN outw o ON o.src = e.src
        |  GROUP BY e.dst
        |), r1 AS (
        |  SELECT nd.node,
        |         CAST((150000000000 // n_nodes)
        |              + (85 * (coalesce(c.c, 0) + dmass // n_nodes))
        |                // 100 AS BIGINT) AS rank
        |  FROM nodes nd LEFT JOIN c1 c ON nd.node = c.dst
        |       CROSS JOIN d1 CROSS JOIN n
        |), d2 AS (
        |  SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dmass FROM r1
        |  WHERE node NOT IN (SELECT src FROM outw)
        |), c2 AS (
        |  SELECT e.dst, CAST(sum((r.rank * e.cnt) // o.w) AS BIGINT) AS c
        |  FROM edges e JOIN r1 r ON r.node = e.src
        |               JOIN outw o ON o.src = e.src
        |  GROUP BY e.dst
        |), r2 AS (
        |  SELECT nd.node,
        |         CAST((150000000000 // n_nodes)
        |              + (85 * (coalesce(c.c, 0) + dmass // n_nodes))
        |                // 100 AS BIGINT) AS rank
        |  FROM nodes nd LEFT JOIN c2 c ON nd.node = c.dst
        |       CROSS JOIN d2 CROSS JOIN n
        |), d3 AS (
        |  SELECT CAST(coalesce(sum(rank), 0) AS BIGINT) AS dmass FROM r2
        |  WHERE node NOT IN (SELECT src FROM outw)
        |), c3 AS (
        |  SELECT e.dst, CAST(sum((r.rank * e.cnt) // o.w) AS BIGINT) AS c
        |  FROM edges e JOIN r2 r ON r.node = e.src
        |               JOIN outw o ON o.src = e.src
        |  GROUP BY e.dst
        |), r3 AS (
        |  SELECT nd.node,
        |         CAST((150000000000 // n_nodes)
        |              + (85 * (coalesce(c.c, 0) + dmass // n_nodes))
        |                // 100 AS BIGINT) AS rank
        |  FROM nodes nd LEFT JOIN c3 c ON nd.node = c.dst
        |       CROSS JOIN d3 CROSS JOIN n
        |)
        |SELECT node, rank FROM r3
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin) { (s, d) =>
      val edges = custSuppPairs(s, d)
        .select(col("c").as("src"), col("s").as("dst"), col("cnt"))
      // knownDanglings: every supplier is a sink BY CONSTRUCTION (edges
      // only run c→s), so the eager probe job is skipped and the sink
      // frame evaluates inside the main plan instead — byte-identical
      // output either way (ComponentsSpec pins it)
      pageRank(edges, 3, knownDanglings = true)
        .orderBy(col("rank").desc, col("node")).limit(20)
    },

    // HITS hubs & authorities (round 8, cont. 4 — Kleinberg 1999): the
    // OTHER classic link-analysis scoring, naturally two-sided where
    // PageRank is one-sided — on the directed customer→supplier flow
    // graph, hub score ranks customers by how much they buy from
    // well-bought-from suppliers, authority score ranks suppliers by how
    // much well-buying customers buy from them (the query/content duality
    // a crawl-curation pipeline uses to separate portal pages from
    // content pages). 2 full mutual-reinforcement rounds via
    // [[Extras.hits]]: L1-normalized BIGINT mass (integer-exact
    // cross-engine — L2's sqrt would sit in a compare position),
    // per-half-round rescale as ONE broadcast scalar, score frames
    // localCheckpointed (each referenced twice). Top-10 per role via
    // TakeOrderedAndProject, never a global sort.
    Q("graph_hits",
      """WITH pair AS (
        |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2
        |), edges AS (
        |  SELECT c AS src, s AS dst, cnt FROM pair
        |), nc AS (
        |  SELECT CAST(count(DISTINCT src) AS BIGINT) AS n FROM edges
        |), h0 AS (
        |  SELECT src AS node, CAST(1000000000 // n AS BIGINT) AS sc
        |  FROM (SELECT DISTINCT src FROM edges) CROSS JOIN nc
        |), a1r AS (
        |  SELECT e.dst AS node, CAST(sum(h.sc * e.cnt) AS BIGINT) AS raw
        |  FROM edges e JOIN h0 h ON h.node = e.src GROUP BY e.dst
        |), a1 AS (
        |  SELECT node, CAST(raw // greatest(1, s // 1000000000) AS BIGINT) AS sc
        |  FROM a1r CROSS JOIN (SELECT CAST(sum(raw) AS BIGINT) AS s FROM a1r)
        |), h1r AS (
        |  SELECT e.src AS node, CAST(sum(a.sc * e.cnt) AS BIGINT) AS raw
        |  FROM edges e JOIN a1 a ON a.node = e.dst GROUP BY e.src
        |), h1 AS (
        |  SELECT node, CAST(raw // greatest(1, s // 1000000000) AS BIGINT) AS sc
        |  FROM h1r CROSS JOIN (SELECT CAST(sum(raw) AS BIGINT) AS s FROM h1r)
        |), a2r AS (
        |  SELECT e.dst AS node, CAST(sum(h.sc * e.cnt) AS BIGINT) AS raw
        |  FROM edges e JOIN h1 h ON h.node = e.src GROUP BY e.dst
        |), a2 AS (
        |  SELECT node, CAST(raw // greatest(1, s // 1000000000) AS BIGINT) AS sc
        |  FROM a2r CROSS JOIN (SELECT CAST(sum(raw) AS BIGINT) AS s FROM a2r)
        |), h2r AS (
        |  SELECT e.src AS node, CAST(sum(a.sc * e.cnt) AS BIGINT) AS raw
        |  FROM edges e JOIN a2 a ON a.node = e.dst GROUP BY e.src
        |), h2 AS (
        |  SELECT node, CAST(raw // greatest(1, s // 1000000000) AS BIGINT) AS sc
        |  FROM h2r CROSS JOIN (SELECT CAST(sum(raw) AS BIGINT) AS s FROM h2r)
        |), ta AS (
        |  SELECT 'auth' AS role, node, sc AS score FROM a2
        |  ORDER BY sc DESC, node LIMIT 10
        |), th AS (
        |  SELECT 'hub' AS role, node, sc AS score FROM h2
        |  ORDER BY sc DESC, node LIMIT 10
        |)
        |SELECT role, node, score
        |FROM (SELECT * FROM ta UNION ALL SELECT * FROM th)
        |ORDER BY role, score DESC, node""".stripMargin) { (s, d) =>
      val edges = custSuppPairs(s, d)
        .select(col("c").as("src"), col("s").as("dst"), col("cnt"))
      val (hub, auth) = hits(edges, rounds = 2)
      val ta = auth.orderBy(col("sc").desc, col("node")).limit(10)
        .select(lit("auth").as("role"), col("node"), col("sc").as("score"))
      val th = hub.orderBy(col("sc").desc, col("node")).limit(10)
        .select(lit("hub").as("role"), col("node"), col("sc").as("score"))
      ta.unionByName(th)
        .orderBy(col("role"), col("score").desc, col("node"))
    },

    // Graph modularity of the nation partition (round 8, cont. 4 —
    // Newman-Girvan Q): how much more intra-community weight the
    // customer↔supplier transaction graph carries than a degree-matched
    // random graph would — THE quality score a community-detection /
    // graph-curation pipeline optimizes, here evaluated for the natural
    // nation partition (per-community contributions show which nations
    // trade within themselves). Q = Σ_c [e_c/(2m) − (d_c/(2m))²] with
    // e_c = 2× intra-community directed weight (symmetrization implied),
    // d_c = weighted degree mass of the community's customers+suppliers.
    //
    // Exactness/plan: ONE fact pass folds the orders⋈lineitem pair frame
    // to the BOUNDED nation×nation weight matrix (≤625 cells, persisted);
    // e_c, d_c, 2m, and every contribution NUMERATOR (e_c·2m − d_c²) are
    // exact BIGINTs (products < 2⁶³ to ~1e8 total edge weight; DECIMAL
    // dial documented); one double division per display. Dimension joins
    // are SHUFFLE_HASH (customer/supplier scale with SF — the
    // no-broadcast-of-linear-dims audit); only the 25-row nation frame
    // broadcasts.
    Q("graph_modularity",
      """WITH pair AS (
        |  SELECT o_custkey AS c, l_suppkey AS s,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2
        |), e AS (
        |  SELECT cu.c_nationkey AS cn, su.s_nationkey AS sn,
        |         CAST(sum(cnt) AS BIGINT) AS w
        |  FROM pair JOIN customer cu ON pair.c = cu.c_custkey
        |            JOIN supplier su ON pair.s = su.s_suppkey
        |  GROUP BY 1, 2
        |), m AS (
        |  SELECT CAST(2 * sum(w) AS BIGINT) AS m2 FROM e
        |), iw AS (
        |  SELECT cn AS nk, CAST(sum(w) AS BIGINT) AS intw
        |  FROM e WHERE cn = sn GROUP BY 1
        |), cd AS (
        |  SELECT cn AS nk, CAST(sum(w) AS BIGINT) AS cdw FROM e GROUP BY 1
        |), sd AS (
        |  SELECT sn AS nk, CAST(sum(w) AS BIGINT) AS sdw FROM e GROUP BY 1
        |), comm AS (
        |  SELECT n_name,
        |         2 * coalesce(intw, 0) AS e_internal,
        |         coalesce(cdw, 0) + coalesce(sdw, 0) AS degree_w, m2
        |  FROM nation LEFT JOIN cd ON n_nationkey = cd.nk
        |              LEFT JOIN sd ON n_nationkey = sd.nk
        |              LEFT JOIN iw ON n_nationkey = iw.nk
        |       CROSS JOIN m
        |), con AS (
        |  SELECT n_name, e_internal, degree_w,
        |         e_internal * m2 - degree_w * degree_w AS num, m2
        |  FROM comm
        |), tot AS (
        |  SELECT CAST(sum(num) AS BIGINT) AS qnum FROM con
        |)
        |SELECT n_name, e_internal, degree_w,
        |       floor(CAST(num AS DOUBLE) / CAST(m2 * m2 AS DOUBLE)
        |             * 1000000) / 1000000 AS contribution,
        |       floor(CAST(qnum AS DOUBLE) / CAST(m2 * m2 AS DOUBLE)
        |             * 1000000) / 1000000 AS q_total
        |FROM con CROSS JOIN tot ORDER BY n_name""".stripMargin) { (s, d) =>
      val pair = Tables(s, d, "orders").select("o_orderkey", "o_custkey")
        .join(Tables(s, d, "lineitem").select("l_orderkey", "l_suppkey"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .agg(count(lit(1)).as("cnt"))
      val e = pair
        .join(Tables(s, d, "customer")
          .select(col("c_custkey"), col("c_nationkey")).hint("shuffle_hash"),
          col("c") === col("c_custkey"))
        .join(Tables(s, d, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")).hint("shuffle_hash"),
          col("s") === col("s_suppkey"))
        .groupBy(col("c_nationkey").as("cn"), col("s_nationkey").as("sn"))
        .agg(sum(col("cnt")).as("w"))
        .persist() // ≤625-cell matrix feeds 2m, intra, and both margins
      val m2f = e.agg((sum(col("w")) * 2).as("m2"))
      val iw = e.where(col("cn") === col("sn"))
        .groupBy(col("cn").as("nk")).agg(sum(col("w")).as("intw"))
      val cd = e.groupBy(col("cn").as("nk")).agg(sum(col("w")).as("cdw"))
      val sd = e.groupBy(col("sn").as("nk")).agg(sum(col("w")).as("sdw"))
      val con = Tables(s, d, "nation")
        .select(col("n_nationkey"), col("n_name"))
        .join(broadcast(cd), col("n_nationkey") === cd("nk"), "left")
        .join(broadcast(sd), col("n_nationkey") === sd("nk"), "left")
        .join(broadcast(iw), col("n_nationkey") === iw("nk"), "left")
        .crossJoin(broadcast(m2f))
        .select(col("n_name"),
          (lit(2) * coalesce(col("intw"), lit(0L))).as("e_internal"),
          (coalesce(col("cdw"), lit(0L)) + coalesce(col("sdw"), lit(0L)))
            .as("degree_w"),
          col("m2"))
        .select(col("n_name"), col("e_internal"), col("degree_w"),
          (col("e_internal") * col("m2") - col("degree_w") * col("degree_w"))
            .as("num"),
          col("m2"))
      val tot = con.agg(sum(col("num")).as("qnum"))
      con.crossJoin(broadcast(tot))
        .select(col("n_name"), col("e_internal"), col("degree_w"),
          (floor(col("num").cast("double")
            / (col("m2") * col("m2")).cast("double") * 1000000) / 1000000)
            .as("contribution"),
          (floor(col("qnum").cast("double")
            / (col("m2") * col("m2")).cast("double") * 1000000) / 1000000)
            .as("q_total"))
        .orderBy("n_name")
    },

    // Triangle counting (round 5) — the graph-density/clustering op that
    // completes the graph family (components = Components.scala,
    // centrality = graph_pagerank). Graph: parts co-ordered within the
    // same 1997 order (the customer↔supplier graph is bipartite and
    // triangle-free by construction). Edges are ORIENTED by part id
    // (a < b), so each wedge (a<b<c) is enumerated exactly once from its
    // lowest vertex and the closing-edge join counts every triangle once
    // — no /6 correction, no double counting, integer-exact in both
    // engines.
    //
    // Scale shape: two equi-joins over the oriented edge list — wedge
    // build (join on the middle vertex) then closure probe (join on the
    // (low, high) pair). The edge frame is referenced three times (wedge
    // left, wedge right, closure probe), so it is persisted once — the
    // same multiply-referenced-frame idiom as the LSH band frames;
    // PlanSpec pins all three references read the cache. Id-orientation
    // keeps the enumeration exact at any
    // scale; on a power-law graph the refinement is DEGREE orientation
    // (orient low→high degree, Suri & Vassilvitskii 2011), which caps
    // out-degree at O(√m) and wedge volume at O(m^1.5) — same plan, one
    // extra degree join — the documented escape if a hub part ever
    // dominates the wedge stage.
    Q("graph_triangles",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |)
        |SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
        |       CAST(count(*) AS BIGINT) AS n_triangles
        |FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b""".stripMargin) { (s, d) =>
      triangles(coOrderEdges(s, d, "1997-01-01", "1998-01-01"))
    },

    // Global transitivity (round 13, cont.): 3·triangles / wedges — the
    // one-number clustering coefficient of the whole graph (graph_local_cc
    // answers it per hub; graph_clustering_by_degree bins it; this is
    // the scalar the two refine, and the standard small-world readout
    // against a random-graph baseline). Rides the SAME persisted edge
    // frame for both counts: the triangle 3-join and the degree moment
    // Σ C(deg,2) — all exact BIGINT, one FLOOR-scaled division.
    Q("graph_transitivity",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), tri AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_triangles
        |  FROM e e1 JOIN e e2 ON e2.a = e1.b
        |    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |), deg AS (
        |  SELECT n AS node, CAST(count(*) AS BIGINT) AS degree FROM (
        |    SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n
        |), wg AS (
        |  SELECT CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges
        |  FROM deg
        |)
        |SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
        |       n_triangles, n_wedges,
        |       floor(CAST(3 * n_triangles AS DOUBLE) / n_wedges * 1000000)
        |         / 1000000 AS transitivity
        |FROM tri CROSS JOIN wg""".stripMargin) { (s, d) =>
      val e = coOrderEdges(s, d, "1997-01-01", "1998-01-01")
        .localCheckpoint()
      val tri = triangles(e).select(col("n_edges"), col("n_triangles"))
      val wg = e.select(explode(array(col("a"), col("b"))).as("n"))
        .groupBy("n").agg(count(lit(1)).as("degree"))
        .agg(sum(expr("degree * (degree - 1) div 2")).as("n_wedges"))
      tri.crossJoin(wg)
        .select(col("n_edges"), col("n_triangles"), col("n_wedges"),
          (floor((lit(3) * col("n_triangles")).cast("double")
            / col("n_wedges") * 1000000) / 1000000).as("transitivity"))
    },

    // Nation homophily (round 13, cont.; Newman 2003's discrete
    // assortativity): do customers trade with SAME-nation suppliers
    // more than random mixing predicts? r = (Σeᵢᵢ − Σaᵢbᵢ)/(1 − Σaᵢbᵢ)
    // over the 25×25 nation mixing matrix of distinct trade edges —
    // the attribute-mixing companion to graph_assortativity's
    // degree-degree correlation (degree assortativity reads structure;
    // this reads GEOGRAPHY, the single most actionable mixing axis a
    // logistics platform has). Everything reduces to exact BIGINT
    // counts over the bounded nation domain; r = (same·E − ab)/(E² −
    // ab) assembles once in DOUBLE from exact integers, FLOOR-scaled.
    Q("graph_nation_homophily",
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), en AS (
        |  SELECT c_nationkey AS cn, s_nationkey AS sn
        |  FROM e JOIN customer ON c = c_custkey
        |  JOIN supplier ON s = s_suppkey
        |), m AS (
        |  SELECT cn, sn, CAST(count(*) AS BIGINT) AS n FROM en GROUP BY 1, 2
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS e,
        |         CAST(sum(CASE WHEN cn = sn THEN n ELSE 0 END) AS BIGINT)
        |           AS same
        |  FROM m
        |), ma AS (SELECT cn, CAST(sum(n) AS BIGINT) AS a FROM m GROUP BY cn
        |), mb AS (SELECT sn, CAST(sum(n) AS BIGINT) AS b FROM m GROUP BY sn
        |), ab AS (
        |  SELECT CAST(coalesce(sum(a * b), 0) AS BIGINT) AS ab
        |  FROM ma JOIN mb ON cn = sn
        |)
        |SELECT e AS n_edges, same AS n_same_nation,
        |       round(CAST(same AS DOUBLE) / e, 6) AS same_share,
        |       floor((CAST(same AS DOUBLE) * e - ab)
        |             / (CAST(e AS DOUBLE) * e - ab) * 1000000) / 1000000
        |         AS homophily_r
        |FROM tot CROSS JOIN ab""".stripMargin) { (s, d) =>
      val e = Tables(s, d, "orders")
        .join(Tables(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct()
      val en = e
        .join(Tables(s, d, "customer"), col("c") === col("c_custkey"))
        .join(broadcast(Tables(s, d, "supplier")),
          col("s") === col("s_suppkey"))
        .select(col("c_nationkey").as("cn"), col("s_nationkey").as("sn"))
      val m = en.groupBy("cn", "sn").agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val tot = m.agg(sum(col("n")).as("e"),
        sum(when(col("cn") === col("sn"), col("n")).otherwise(0L)).as("same"))
      val ma = m.groupBy("cn").agg(sum(col("n")).as("a"))
      val mb = m.groupBy("sn").agg(sum(col("n")).as("b"))
      val ab = ma.join(mb, col("cn") === col("sn"))
        .agg(coalesce(sum(col("a") * col("b")), lit(0L)).as("ab"))
      tot.crossJoin(ab)
        .select(col("e").as("n_edges"), col("same").as("n_same_nation"),
          round(col("same").cast("double") / col("e"), 6).as("same_share"),
          (floor((col("same").cast("double") * col("e") - col("ab"))
            / (col("e").cast("double") * col("e") - col("ab")) * 1000000)
            / 1000000).as("homophily_r"))
    },

    // Bipartite graph profile (round 13, cont.): the customer↔supplier
    // trade graph's one-screen profile — side cardinalities, edge
    // count, density E/(L·R), and a degree Gini PER SIDE (how
    // concentrated is each side's participation — a high supplier-side
    // Gini means a few suppliers carry the trade network; the input to
    // choosing the skew strategy before any graph_* algorithm runs).
    // Edges = one fact join reduced to DISTINCT pairs map-side; Ginis
    // use the exact rank identity (agg_gini doctrine) over
    // DIMENSION-sized per-side degree frames (the fence); all counts
    // exact, FLOOR-scaled displays.
    Q("graph_bipartite_stats",
      """WITH e AS (
        |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |), dl AS (
        |  SELECT c, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY c
        |), dr AS (
        |  SELECT s, CAST(count(*) AS BIGINT) AS deg FROM e GROUP BY s
        |), gl AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(deg) AS BIGINT) AS t,
        |         CAST(sum(i * deg) AS BIGINT) AS w
        |  FROM (SELECT deg, CAST(row_number() OVER (ORDER BY deg, c)
        |                         AS BIGINT) AS i FROM dl)
        |), gr AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(deg) AS BIGINT) AS t,
        |         CAST(sum(i * deg) AS BIGINT) AS w
        |  FROM (SELECT deg, CAST(row_number() OVER (ORDER BY deg, s)
        |                         AS BIGINT) AS i FROM dr)
        |)
        |SELECT gl.n AS n_customers, gr.n AS n_suppliers,
        |       gl.t AS n_edges,
        |       floor(CAST(gl.t AS DOUBLE) / gl.n / gr.n * 1000000)
        |         / 1000000 AS density,
        |       floor((2.0 * gl.w / (CAST(gl.n AS DOUBLE) * gl.t)
        |              - (CAST(gl.n AS DOUBLE) + 1.0) / gl.n) * 1000000)
        |         / 1000000 AS gini_customer_deg,
        |       floor((2.0 * gr.w / (CAST(gr.n AS DOUBLE) * gr.t)
        |              - (CAST(gr.n AS DOUBLE) + 1.0) / gr.n) * 1000000)
        |         / 1000000 AS gini_supplier_deg
        |FROM gl CROSS JOIN gr""".stripMargin) { (s, d) =>
      val e = Tables(s, d, "orders")
        .join(Tables(s, d, "lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("s"))
        .distinct().localCheckpoint()
      def gini(df: DataFrame, key: String): DataFrame = {
        val deg = df.groupBy(col(key)).agg(count(lit(1)).as("deg"))
        deg.withColumn("i", row_number().over(
            Window.orderBy(col("deg"), col(key))).cast("long"))
          .agg(count(lit(1)).as("n"), sum(col("deg")).as("t"),
            sum(col("i") * col("deg")).as("w"))
      }
      val gl = gini(e, "c")
      val gr = gini(e, "s")
        .select(col("n").as("n2"), col("t").as("t2"), col("w").as("w2"))
      def g(n: Column, t: Column, w: Column) =
        floor((lit(2.0) * w / (n.cast("double") * t)
          - (n.cast("double") + lit(1.0)) / n) * 1000000) / 1000000
      gl.crossJoin(gr)
        .select(col("n").as("n_customers"), col("n2").as("n_suppliers"),
          col("t").as("n_edges"),
          (floor(col("t").cast("double") / col("n") / col("n2") * 1000000)
            / 1000000).as("density"),
          g(col("n"), col("t"), col("w")).as("gini_customer_deg"),
          g(col("n2"), col("t2"), col("w2")).as("gini_supplier_deg"))
    },

    // 4-truss edge peeling, 3 unrolled rounds (round 13, cont.; Cohen
    // 2008): repeatedly drop edges in fewer than 2 triangles — the
    // EDGE-level cohesion filter between triangle counting and
    // community detection (a k-core keeps hub STARS; a truss keeps only
    // edges embedded in mutual triangles — the skeleton communities
    // actually live on). Fixed 3 peel rounds on the bounded Jan-1997
    // co-order graph (the graph_harmonic month slice), each ONE
    // common-neighbor equi-join + left-join filter — no iteration state
    // beyond the edge frame; exact integer supports; per-round
    // edge/drop counts reported.
    Q("graph_truss_peel", {
      def round(r: Int) =
        s"""s$r AS (
           |  SELECT a, b FROM e${r - 1}
           |  UNION ALL SELECT b AS a, a AS b FROM e${r - 1}
           |), sup$r AS (
           |  SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS cn
           |  FROM e${r - 1} e
           |  JOIN s$r x ON x.a = e.a
           |  JOIN s$r y ON y.a = e.b AND y.b = x.b
           |  GROUP BY e.a, e.b
           |), e$r AS (
           |  SELECT e.a, e.b FROM e${r - 1} e
           |  LEFT JOIN sup$r s ON s.a = e.a AND s.b = e.b
           |  WHERE coalesce(s.cn, 0) >= 2
           |)""".stripMargin
      s"""WITH lp AS (
         |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
         |    AND o_orderdate < TIMESTAMP '1997-02-01'
         |), e0 AS (
         |  SELECT DISTINCT x.p AS a, y.p AS b
         |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
         |),
         |${round(1)},
         |${round(2)},
         |${round(3)}
         |SELECT CAST(1 AS BIGINT) AS peel_round,
         |       CAST((SELECT count(*) FROM e1) AS BIGINT) AS n_edges,
         |       CAST((SELECT count(*) FROM e0)
         |            - (SELECT count(*) FROM e1) AS BIGINT) AS n_dropped
         |UNION ALL
         |SELECT 2, CAST((SELECT count(*) FROM e2) AS BIGINT),
         |       CAST((SELECT count(*) FROM e1)
         |            - (SELECT count(*) FROM e2) AS BIGINT)
         |UNION ALL
         |SELECT 3, CAST((SELECT count(*) FROM e3) AS BIGINT),
         |       CAST((SELECT count(*) FROM e2)
         |            - (SELECT count(*) FROM e3) AS BIGINT)
         |ORDER BY peel_round""".stripMargin
    }) { (s, d) =>
      var e = coOrderEdges(s, d, "1997-01-01", "1997-02-01")
        .localCheckpoint()
      var prev = e.count()
      val out = (1 to 3).map { r =>
        val sym = e.select(col("a"), col("b"))
          .unionAll(e.select(col("b").as("a"), col("a").as("b")))
        val sup = e
          .join(sym.select(col("a").as("xa"), col("b").as("xb")),
            col("xa") === col("a"))
          .join(sym.select(col("a").as("ya"), col("b").as("yb")),
            col("ya") === col("b") && col("yb") === col("xb"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("cn"))
        e = e.join(sup.select(col("a").as("sa"), col("b").as("sb"),
            col("cn")),
            col("a") === col("sa") && col("b") === col("sb"), "left")
          .where(coalesce(col("cn"), lit(0L)) >= 2)
          .select(col("a"), col("b"))
          .localCheckpoint()
        val n = e.count()
        val row = (r.toLong, n, prev - n)
        prev = n
        row
      }
      import s.implicits._
      out.toDF("peel_round", "n_edges", "n_dropped")
        .orderBy("peel_round")
    },

    // Per-node LOCAL clustering coefficient (round 7, cont.): for the
    // top-20 highest-degree parts, C(v) = triangles-through-v /
    // C(deg(v), 2) — "is this hub a community core or a pass-through
    // star?", the node-level refinement of the global triangle count.
    // All counts integer (triangle credit via an in-row explode of each
    // enumerated a<b<c triangle to its three corners; wedges by integer
    // division) until the one rounded division; the top-k cut orders by
    // (degree DESC, node) so ties can't flip membership. Same persisted
    // edge frame feeds degrees and the 3-join.
    Q("graph_local_cc",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), und AS (
        |  SELECT a AS n FROM e UNION ALL SELECT b FROM e
        |), deg AS (
        |  SELECT n AS node, CAST(count(*) AS BIGINT) AS degree
        |  FROM und GROUP BY n
        |), tn AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |    SELECT unnest([e1.a, e1.b, e2.b]) AS node
        |    FROM e e1 JOIN e e2 ON e2.a = e1.b
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |  ) GROUP BY node
        |)
        |SELECT node, degree, COALESCE(n_tri, 0) AS n_tri,
        |       degree * (degree - 1) // 2 AS wedges,
        |       round(COALESCE(n_tri, 0) * 1.0
        |             / (degree * (degree - 1) // 2), 6) AS local_cc
        |FROM deg LEFT JOIN tn USING (node)
        |WHERE degree >= 2
        |ORDER BY degree DESC, node LIMIT 20""".stripMargin) { (s, d) =>
      localClustering(coOrderEdges(s, d, "1997-01-01", "1998-01-01"), 20)
    },

    // Connected components as a DECLARED graph key (round 5, continued) —
    // the general-graph twin of the near-dup CC the dedup family already
    // oracle-proves (llm_dedup_groups_lsh): same Components machinery
    // (O(diameter) min-label propagation with the O(log n) star-
    // contraction fallback, edge frame pre-partitioned + checkpointed
    // once), but over an arbitrary edge list rather than LSH candidates.
    // Graph: parts co-ordered within January 1997 (one month keeps the
    // component structure interesting — the full-year graph collapses
    // into a giant component). Output: one row per component
    // (label = min part id) with its node count.
    //
    // Scale shape: identical to the dedup-group path — per-round
    // shuffles carry only the changing label vector, the diameter budget
    // bounds the round count, and the recursive-CTE oracle replays the
    // same min-label fixpoint in DuckDB (reachMinCte's UNION-set
    // recursion is oracle-scale-only; the declared plan never does that).
    Q("graph_cc",
      s"""WITH RECURSIVE lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-02-01'
        |), e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), edges AS (
        |  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0
        |), ${Components.reachMinCte("SELECT DISTINCT a AS id FROM edges", "edges")},
        |lab AS (
        |  SELECT node, min(r) AS comp FROM reach GROUP BY node
        |)
        |SELECT CAST(comp AS BIGINT) AS component,
        |       CAST(count(*) AS BIGINT) AS n_nodes
        |FROM lab GROUP BY comp
        |ORDER BY n_nodes DESC, component""".stripMargin) { (s, d) =>
      val sym = symmetrize(coOrderEdges(s, d, "1997-01-01", "1997-02-01"))
        .persist()
      val nodes = sym.select(col("a").as("id")).distinct()
      // Star contraction, NOT propagation (round 7): this is the
      // general-graph key, and the co-order graph's diameter GROWS with
      // SF (22 propagation rounds at sf0.1 — measured — already past the
      // 12-round budget, so propagation burned its full budget and then
      // restarted on the star engine anyway: 13 s → 3.4 s local). The
      // near-dup keys keep propagation because LSH similarity graphs
      // have small data-independent diameters; an arbitrary edge list
      // gets the O(log n) engine directly, per SCALING.md's engine A/B.
      // Labels are engine-independent (ComponentsSpec pins equality), so
      // the oracle can't see the choice.
      Components.connectedComponentsStar(nodes, "id", sym)
        .groupBy(col("lbl").cast("long").as("component"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy(col("n_nodes").desc, col("component"))
    },

    // Label propagation communities (round 8, cont. 6): the INTRA-
    // component structure graph_cc cannot see — LPA partitions a
    // connected graph into densely-knit regions (Raghavan et al. 2007),
    // the standard cheap community pass a graph-curation pipeline runs
    // between CC and modularity scoring (graph_modularity evaluates a
    // partition; this key PRODUCES one). Async LPA is run-order-
    // dependent, so this is the DETERMINISTIC synchronous variant with a
    // total tie-break: exactly 3 rounds, every node simultaneously
    // adopts the most frequent label among its neighbors, ties to the
    // SMALLEST label (max(struct(cnt, -label)) == the oracle's
    // row_number ORDER BY cnt DESC, label). Fixed rounds instead of
    // convergence because synchronous LPA can 2-cycle on bipartite-ish
    // regions — a fixpoint loop would never terminate there, and the
    // round budget IS the declared semantics (both engines replay it).
    //
    // Scale shape: per round ONE shuffle of the label vector to the
    // edge partitioning (edges repartitioned by the probe side +
    // checkpointed once) + one (node,label) count — O(1) edge-sized
    // shuffles per round like the CC loop; labels localCheckpointed per
    // round (each referenced by the next join twice: count + pick).
    // Output: community-size histogram (bounded by sqrt-ish distinct
    // sizes), not the node vector.
    Q("graph_label_propagation",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-02-01'
        |), e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), edges AS (
        |  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0
        |), l0 AS (
        |  SELECT DISTINCT a AS node, a AS label FROM edges
        |), c1 AS (
        |  SELECT e.a AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
        |  FROM edges e JOIN l0 l ON e.b = l.node GROUP BY 1, 2
        |), l1 AS (
        |  SELECT node, label FROM (
        |    SELECT node, label, row_number() OVER (
        |      PARTITION BY node ORDER BY cnt DESC, label) AS rn
        |    FROM c1) WHERE rn = 1
        |), c2 AS (
        |  SELECT e.a AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
        |  FROM edges e JOIN l1 l ON e.b = l.node GROUP BY 1, 2
        |), l2 AS (
        |  SELECT node, label FROM (
        |    SELECT node, label, row_number() OVER (
        |      PARTITION BY node ORDER BY cnt DESC, label) AS rn
        |    FROM c2) WHERE rn = 1
        |), c3 AS (
        |  SELECT e.a AS node, l.label, CAST(count(*) AS BIGINT) AS cnt
        |  FROM edges e JOIN l2 l ON e.b = l.node GROUP BY 1, 2
        |), l3 AS (
        |  SELECT node, label FROM (
        |    SELECT node, label, row_number() OVER (
        |      PARTITION BY node ORDER BY cnt DESC, label) AS rn
        |    FROM c3) WHERE rn = 1
        |), comm AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS sz FROM l3 GROUP BY label
        |)
        |SELECT sz AS community_size,
        |       CAST(count(*) AS BIGINT) AS n_communities
        |FROM comm GROUP BY sz ORDER BY sz""".stripMargin) { (s, d) =>
      labelPropagation(
          symmetrize(coOrderEdges(s, d, "1997-01-01", "1997-02-01")),
          rounds = 3)
        .groupBy("label").agg(count(lit(1)).as("sz"))
        .groupBy(col("sz").as("community_size"))
        .agg(count(lit(1)).as("n_communities"))
        .orderBy("community_size")
    },

    // Harmonic centrality, 3-hop bounded (round 8, cont. 6): for the 8
    // highest-degree hubs of the Jan-1997 co-order graph, how REACHABLE
    // is the rest of the graph — harmonic_3 = n1 + n2/2 + n3/3
    // (Boldi & Vigna 2014's harmonic variant of closeness, which a
    // degree count alone misranks: a hub inside a dense clique can reach
    // less at 3 hops than a moderate-degree bridge). Hop-BOUNDED because
    // exact all-pairs closeness is O(V·E); bounded multi-source BFS from
    // a fixed seed set is the shape that survives 100 TB (frontier
    // frames ≤ seeds × nodes, three rounds, each ONE join + one
    // anti-join against the visited set — the graph_bfs loop run 8-wide
    // simultaneously). Exact: 6·harmonic = 6n1 + 3n2 + 2n3 is an exact
    // BIGINT; one division at display. Seeds tie-break to the smallest
    // node; the oracle replays hops as chained EXCEPT CTEs.
    Q("graph_harmonic",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-02-01'
        |), e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), edges AS (
        |  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0
        |), deg AS (
        |  SELECT a AS node, CAST(count(*) AS BIGINT) AS degree
        |  FROM edges GROUP BY a
        |), seeds AS (
        |  SELECT node, degree FROM (
        |    SELECT node, degree,
        |           row_number() OVER (ORDER BY degree DESC, node) AS rn
        |    FROM deg) WHERE rn <= 8
        |), d1 AS (
        |  SELECT DISTINCT s.node AS seed, e.b AS node
        |  FROM seeds s JOIN edges e ON e.a = s.node
        |), d2 AS (
        |  SELECT DISTINCT d.seed, e.b AS node
        |  FROM d1 d JOIN edges e ON e.a = d.node
        |  EXCEPT SELECT seed, node FROM d1
        |  EXCEPT SELECT node AS seed, node FROM seeds
        |), d3 AS (
        |  SELECT DISTINCT d.seed, e.b AS node
        |  FROM d2 d JOIN edges e ON e.a = d.node
        |  EXCEPT SELECT seed, node FROM d2
        |  EXCEPT SELECT seed, node FROM d1
        |  EXCEPT SELECT node AS seed, node FROM seeds
        |), h AS (
        |  SELECT s.node, s.degree,
        |         (SELECT CAST(count(*) AS BIGINT) FROM d1
        |          WHERE d1.seed = s.node) AS n1,
        |         (SELECT CAST(count(*) AS BIGINT) FROM d2
        |          WHERE d2.seed = s.node) AS n2,
        |         (SELECT CAST(count(*) AS BIGINT) FROM d3
        |          WHERE d3.seed = s.node) AS n3
        |  FROM seeds s
        |)
        |SELECT node, degree, n1, n2, n3,
        |       floor(CAST(6 * n1 + 3 * n2 + 2 * n3 AS DOUBLE) / 6
        |             * 1000000) / 1000000 AS harmonic3
        |FROM h ORDER BY node""".stripMargin) { (s, d) =>
      val e = symmetrize(coOrderEdges(s, d, "1997-01-01", "1997-02-01"))
        .repartition(col("a")).localCheckpoint()
      val deg = e.groupBy(col("a").as("node"))
        .agg(count(lit(1)).as("degree"))
      val seeds = deg.orderBy(col("degree").desc, col("node")).limit(8)
        .localCheckpoint()
      val counts = multiSourceDistances(e, seeds.select("node"), maxHops = 3)
        .groupBy("seed")
        .agg(sum(when(col("dist") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("dist") === 2, 1L).otherwise(0L)).as("n2"),
          sum(when(col("dist") === 3, 1L).otherwise(0L)).as("n3"))
      seeds.join(broadcast(counts), seeds("node") === counts("seed"))
        .select(col("node"), col("degree"),
          col("n1"), col("n2"), col("n3"),
          (floor((lit(6) * col("n1") + lit(3) * col("n2")
            + lit(2) * col("n3")).cast("double") / 6 * 1000000) / 1000000)
            .as("harmonic3"))
        .orderBy("node")
    },

    // Degree distribution (round 5, continued) — the graph-profile
    // report (how skewed is this graph?) that decides whether the
    // id-oriented triangle plan is safe or the degree-oriented one is
    // required (see trianglesByDegree). Same 1997 co-order graph as
    // graph_triangles. One symmetrize + two groupBys; the first groupBy
    // keys on the node, the second on the (tiny) degree domain.
    Q("graph_degree_dist", degreeDistOracle) { (s, d) =>
      coOrderEdges(s, d, "1997-01-01", "1998-01-01")
        .select(explode(array(col("a"), col("b"))).as("u"))
        .groupBy("u").agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    },

    // MAINTAINED-frame twin of graph_degree_dist (round 13 — VERDICT
    // r12 #1, the round's top ask): the same degree distribution, but
    // SERVED from the incrementally-maintained AnalyticFrames co-order
    // frame — built on the 1997 H1 orders, then two ∝-batch ingests
    // (Q3, Q4) append their edge segments, exactly the nightly
    // deployment lifecycle. The serve is the frame's merge-on-read
    // shape: a multi-segment scan + ONE distinct restoring set
    // semantics across segments (PlanSpec pins segments>1 and the
    // distinct). The oracle is the FULL derivation from the base
    // tables — identical text to graph_degree_dist — so maintained
    // state that drifted from the derivation hash-mismatches the
    // moment it serves: the llm_incremental_neardup_registry doctrine
    // extended to the graph frames, which until this round were
    // spec-proven but never oracle-verified as served product.
    Q("graph_degree_dist_maintained", degreeDistOracle) { (s, d) =>
      coOrderEdgesMaintained(s, d)
        .select(explode(array(col("a"), col("b"))).as("u"))
        .groupBy("u").agg(count(lit(1)).as("degree"))
        .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
        .orderBy("degree")
    },

    // MAINTAINED-frame twin of graph_pagerank (round 13 — VERDICT r12
    // #1): the identical integer-mass 3-round PageRank, but the
    // customer↔supplier pair frame arrives from AnalyticFrames after
    // build-on-a-third + two ∝-batch ingests. cnt partials over
    // disjoint order batches merge ADDITIVELY, so the serve is one
    // bounded groupBy-sum over (build ∪ segments) — the frame's
    // merge-on-read law, here under the full DuckDB oracle replay of
    // the derivation + all three rank rounds. Identical oracle text to
    // graph_pagerank: two declared keys, one truth — recompute twin
    // and maintained-serving twin can never drift apart silently.
    Q("graph_pagerank_maintained", pagerankOracle) { (s, d) =>
      val pair = custSuppPairsMaintained(s, d)
      val edges = pair.select(explode(array(
          struct(col("c").as("src"), col("s").as("dst"), col("cnt")),
          struct(col("s").as("src"), col("c").as("dst"), col("cnt")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.cnt").as("cnt"))
      pageRank(edges, 3, noDanglings = true)
        .orderBy(col("rank").desc, col("node")).limit(20)
    },

    // Eigenvector centrality via 3 power-iteration rounds (round 13;
    // Bonacich): rank ∝ the adjacency-weighted sum of neighbors' ranks
    // — the "important because connected to the important" score, the
    // undamped cousin of PageRank (no stochastic normalization, no
    // teleport; influence compounds through hubs instead of being
    // rationed by out-degree). Graph: the symmetrized weighted
    // customer↔supplier frame (the graph_pagerank edges). Integer-mass
    // determinism doctrine: ranks live in BIGINT micro-units and each
    // round renormalizes by max via ONE truncating division (rank' =
    // y div (max(y) div 10⁶) — division-first, so no product ever
    // exceeds ~10¹³ at sf0.1 and the arithmetic replays exactly in both
    // engines). Plan: per round one equi-join of the persisted
    // pre-partitioned edge list with the rank vector + one groupBy dst
    // + a broadcast 1-row max — the pageRank round shape minus the
    // out-weight join.
    Q("graph_eigenvector",
      """WITH pair AS (
        |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2
        |), edges AS (
        |  SELECT c AS src, s AS dst, cnt FROM pair
        |  UNION ALL
        |  SELECT s AS src, c AS dst, cnt FROM pair
        |), r0 AS (
        |  SELECT DISTINCT src AS node, CAST(1000000 AS BIGINT) AS rank
        |  FROM edges
        |), y1 AS (
        |  SELECT e.dst AS node, CAST(sum(e.cnt * r.rank) AS BIGINT) AS y
        |  FROM edges e JOIN r0 r ON r.node = e.src GROUP BY 1
        |), r1 AS (
        |  SELECT node, CAST(y // (SELECT max(y) // 1000000 FROM y1)
        |               AS BIGINT) AS rank FROM y1
        |), y2 AS (
        |  SELECT e.dst AS node, CAST(sum(e.cnt * r.rank) AS BIGINT) AS y
        |  FROM edges e JOIN r1 r ON r.node = e.src GROUP BY 1
        |), r2 AS (
        |  SELECT node, CAST(y // (SELECT max(y) // 1000000 FROM y2)
        |               AS BIGINT) AS rank FROM y2
        |), y3 AS (
        |  SELECT e.dst AS node, CAST(sum(e.cnt * r.rank) AS BIGINT) AS y
        |  FROM edges e JOIN r2 r ON r.node = e.src GROUP BY 1
        |), r3 AS (
        |  SELECT node, CAST(y // (SELECT max(y) // 1000000 FROM y3)
        |               AS BIGINT) AS rank FROM y3
        |)
        |SELECT node, rank FROM r3
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin) { (s, d) =>
      val pair = custSuppPairs(s, d)
      val edges = pair.select(explode(array(
          struct(col("c").as("src"), col("s").as("dst"), col("cnt")),
          struct(col("s").as("src"), col("c").as("dst"), col("cnt")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.cnt").as("cnt"))
        .repartition(col("src")).persist()
      var rank = edges.select(col("src").as("node")).distinct()
        .withColumn("rank", lit(1000000L))
      for (_ <- 1 to 3) {
        // checkpoint the PRE-normalization vector (round 13): y is
        // referenced twice (the max-scalar subquery and the rescale
        // projection) — checkpointing rank instead ran the edge join +
        // aggregate TWICE per round (once inside the broadcast build,
        // once inside the checkpoint job). Now the edge join runs once;
        // the max scalar and next round's rank are cheap reads of the
        // materialized node-sized vector.
        val y = edges.join(rank, col("node") === col("src"))
          .groupBy(col("dst").as("n")).agg(sum(col("cnt") * col("rank")).as("y"))
          .select(col("n").as("node"), col("y"))
          .localCheckpoint()
        val m = y.agg(max(col("y")).as("my"))
          .select(expr("my div 1000000").as("m"))
        rank = y.crossJoin(broadcast(m))
          .select(col("node"), expr("y div m").as("rank"))
      }
      rank.orderBy(col("rank").desc, col("node")).limit(20)
    },

    // Katz centrality, 3-term attenuated walk count (round 13; Katz
    // 1953): x' = 1 + α·Aᵀx with α = 0.015 on the symmetrized weighted
    // customer↔supplier graph — unlike PageRank's random surfer, Katz
    // counts ALL inbound walks with geometric attenuation (a hub's
    // influence compounds instead of being rationed by out-degree),
    // and the +1 baseline keeps every node at a floor. Fixed 3 rounds
    // = walks up to length 3 (bipartite: c→s→c→s chains genuinely
    // compound), the same unrolled-plan shape as graph_pagerank.
    // Integer doctrine: micro-unit BIGINT, the α step is
    // (15·Σcnt·x) // 1000 — one truncating division per node per
    // round, replayed exactly; α·max-row-weight < 1 on the fixtures so
    // 3 rounds stay far inside BIGINT range (documented ceiling: the
    // products stay < 10¹⁷ at 100× the sf0.1 edge weights).
    Q("graph_katz",
      """WITH pair AS (
        |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2
        |), edges AS (
        |  SELECT c AS src, s AS dst, cnt FROM pair
        |  UNION ALL
        |  SELECT s AS src, c AS dst, cnt FROM pair
        |), nodes AS (
        |  SELECT DISTINCT src AS node FROM edges
        |), x0 AS (
        |  SELECT node, CAST(1000000 AS BIGINT) AS x FROM nodes
        |), y1 AS (
        |  SELECT e.dst AS node, CAST(sum(e.cnt * r.x) AS BIGINT) AS y
        |  FROM edges e JOIN x0 r ON r.node = e.src GROUP BY 1
        |), x1 AS (
        |  SELECT n.node,
        |         CAST(1000000 + coalesce((15 * y.y) // 1000, 0) AS BIGINT) AS x
        |  FROM nodes n LEFT JOIN y1 y ON y.node = n.node
        |), y2 AS (
        |  SELECT e.dst AS node, CAST(sum(e.cnt * r.x) AS BIGINT) AS y
        |  FROM edges e JOIN x1 r ON r.node = e.src GROUP BY 1
        |), x2 AS (
        |  SELECT n.node,
        |         CAST(1000000 + coalesce((15 * y.y) // 1000, 0) AS BIGINT) AS x
        |  FROM nodes n LEFT JOIN y2 y ON y.node = n.node
        |), y3 AS (
        |  SELECT e.dst AS node, CAST(sum(e.cnt * r.x) AS BIGINT) AS y
        |  FROM edges e JOIN x2 r ON r.node = e.src GROUP BY 1
        |), x3 AS (
        |  SELECT n.node,
        |         CAST(1000000 + coalesce((15 * y.y) // 1000, 0) AS BIGINT) AS x
        |  FROM nodes n LEFT JOIN y3 y ON y.node = n.node
        |)
        |SELECT node, x AS katz FROM x3
        |ORDER BY katz DESC, node LIMIT 20""".stripMargin) { (s, d) =>
      val pair = custSuppPairs(s, d)
      val edges = pair.select(explode(array(
          struct(col("c").as("src"), col("s").as("dst"), col("cnt")),
          struct(col("s").as("src"), col("c").as("dst"), col("cnt")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.cnt").as("cnt"))
        .repartition(col("src")).persist()
      val nodes = edges.select(col("src").as("node")).distinct().persist()
      var x = nodes.withColumn("x", lit(1000000L))
      for (_ <- 1 to 3) {
        val y = edges.join(x, col("node") === col("src"))
          .groupBy(col("dst").as("n")).agg(sum(col("cnt") * col("x")).as("y"))
        x = nodes.join(y, col("node") === col("n"), "left")
          .select(col("node"),
            (lit(1000000L) + coalesce(expr("(15 * y) div 1000"), lit(0L)))
              .as("x"))
          .localCheckpoint()
      }
      x.orderBy(col("x").desc, col("node")).limit(20)
        .select(col("node"), col("x").as("katz"))
    },

    // Average neighbor degree by degree class — knn(k) (round 11): the
    // LOCAL readout of graph_assortativity's single coefficient
    // (Pastor-Satorras et al. 2001: knn(k) falling with k =
    // disassortative hubs-link-leaves, rising = assortative core). Same
    // materialized 1997 co-order frame. EXACT arithmetic: per-node
    // neighbor-degree SUMS are BIGINT; within a degree class the
    // divisor is constant (deg == k), so the class mean collapses to
    // Σsnd / (k·n) — ONE float division per output row, no
    // order-dependent double summation anywhere (the doctrine that a
    // per-node avg-then-avg would violate).
    Q("graph_avg_neighbor_degree",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), sym AS (
        |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
        |), deg AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS degree FROM sym GROUP BY u
        |), nb AS (
        |  SELECT s.u, CAST(sum(d2.degree) AS BIGINT) AS snd
        |  FROM sym s JOIN deg d2 ON d2.u = s.v
        |  GROUP BY s.u
        |)
        |SELECT d.degree, CAST(count(*) AS BIGINT) AS n_nodes,
        |       round(CAST(sum(nb.snd) AS DOUBLE)
        |             / (d.degree * count(*)), 6) AS avg_neighbor_degree
        |FROM deg d JOIN nb ON nb.u = d.u
        |GROUP BY d.degree ORDER BY d.degree""".stripMargin) { (s, d) =>
      val sym = symByV(coOrderEdges(s, d, "1997-01-01", "1998-01-01"))
      val deg = sym.groupBy("u").agg(count(lit(1)).as("degree"))
      val nb = sym
        .join(deg.select(col("u").as("v"), col("degree").as("nd")), Seq("v"))
        .groupBy("u").agg(sum(col("nd")).as("snd"))
      deg.join(nb, Seq("u"))
        .groupBy("degree")
        .agg(count(lit(1)).as("n_nodes"),
          round(sum(col("snd")).cast("double") /
            (col("degree") * count(lit(1))), 6).as("avg_neighbor_degree"))
        .orderBy("degree")
    },

    // Common-neighbors link prediction (round 5, continued): the
    // classic "people you may know" score — for part pairs NOT directly
    // co-ordered, count shared neighbors in the 1997 co-order graph and
    // report the top 20. Completes the graph family's analytics trio:
    // centrality (pagerank), density (triangles), link prediction.
    //
    // Scale shape: the wedge join on the shared neighbor is the same
    // O(sum deg²) enumeration as triangle counting — the symmetric
    // adjacency frame feeds both sides of the self-join plus the
    // closing anti-join probe, so it is persisted once (the
    // multiply-referenced-frame idiom); on a power-law graph the
    // degree-orientation refinement (trianglesByDegree) applies here
    // unchanged. The anti-join removes existing edges BEFORE the top-k,
    // and TakeOrderedAndProject caps what crosses to the driver.
    Q("graph_common_neighbors",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), sym AS (
        |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
        |), cn AS (
        |  SELECT s1.u AS a, s2.u AS b, CAST(count(*) AS BIGINT) AS common_neighbors
        |  FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
        |  GROUP BY s1.u, s2.u
        |)
        |SELECT cn.a, cn.b, common_neighbors FROM cn
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b)
        |ORDER BY common_neighbors DESC, a, b LIMIT 20""".stripMargin) { (s, d) =>
      commonNeighbors(coOrderEdges(s, d, "1997-01-01", "1998-01-01"), 20)
    },

    // Jaccard link prediction (round 7, continued): common-neighbors
    // normalized by neighborhood-union size — the score that stops hub
    // nodes from dominating the "people you may know" list (a raw
    // common-neighbor count always favors high-degree pairs; Jaccard
    // asks what FRACTION of their combined neighborhoods is shared).
    // Same 1997 co-order graph and wedge plan as graph_common_neighbors;
    // the only additions are the O(nodes) degree aggregate joined on the
    // candidate keys and the free union size da+db−common. Both engines
    // order by the ROUNDED score (ties → (a,b)) so the top-20 cut cannot
    // be flipped by sub-1e-6 float noise.
    Q("graph_jaccard_neighbors",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), sym AS (
        |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
        |), deg AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u
        |), cn AS (
        |  SELECT s1.u AS a, s2.u AS b, CAST(count(*) AS BIGINT) AS common_neighbors
        |  FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
        |  GROUP BY s1.u, s2.u
        |), nc AS (
        |  SELECT cn.a, cn.b, common_neighbors FROM cn
        |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b)
        |)
        |SELECT nc.a, nc.b, common_neighbors,
        |       round(CAST(common_neighbors AS DOUBLE) /
        |             (da.deg + db.deg - common_neighbors), 6) AS jaccard
        |FROM nc JOIN deg da ON da.u = nc.a JOIN deg db ON db.u = nc.b
        |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin) { (s, d) =>
      jaccardNeighbors(coOrderEdges(s, d, "1997-01-01", "1998-01-01"), 20)
    },

    // Weighted reciprocity of the journey transition graph (round 10;
    // Squartini et al. 2013): per unordered event-type pair, how much
    // of the A→B transition mass comes back B→A — min(w_fwd, w_rev) is
    // the reciprocated flow; Σmin / Σall is the one-number symmetry
    // score (browse↔search loops vs one-way funnels — the structural
    // readout etl_transition_matrix's per-edge probabilities don't
    // summarize). Self-loops excluded (trivially reciprocal). Pure
    // integer arithmetic: weights are exact transition counts, the
    // ratio is one floor-grid division of exact BIGINT sums broadcast
    // from the bounded K×K frame.
    Q("graph_reciprocity",
      """WITH t AS (
        |  SELECT event_type,
        |         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           AS prev_type
        |  FROM events
        |), w AS (
        |  SELECT prev_type AS src, event_type AS dst,
        |         CAST(count(*) AS BIGINT) AS w
        |  FROM t WHERE prev_type IS NOT NULL AND prev_type <> event_type
        |  GROUP BY 1, 2
        |), pairs AS (
        |  SELECT least(f.src, f.dst) AS t1, greatest(f.src, f.dst) AS t2,
        |         CAST(sum(CASE WHEN f.src < f.dst THEN f.w ELSE 0 END) AS BIGINT)
        |           AS w_fwd,
        |         CAST(sum(CASE WHEN f.src > f.dst THEN f.w ELSE 0 END) AS BIGINT)
        |           AS w_rev
        |  FROM w f GROUP BY 1, 2
        |), tot AS (
        |  SELECT CAST(sum(w_fwd + w_rev) AS BIGINT) AS mass,
        |         CAST(sum(2 * least(w_fwd, w_rev)) AS BIGINT) AS recip
        |  FROM pairs
        |)
        |SELECT t1, t2, w_fwd, w_rev,
        |       CAST(2 * least(w_fwd, w_rev) AS BIGINT) AS w_recip,
        |       floor(CAST(recip AS DOUBLE) / mass * 1000000) / 1000000
        |         AS reciprocity
        |FROM pairs CROSS JOIN tot
        |ORDER BY t1, t2""".stripMargin) { (s, d) =>
      val w = Tables(s, d, "events")
        .withColumn("prev_type", lag(col("event_type"), 1).over(
          Window.partitionBy("user_id").orderBy("ts", "event_id")))
        .where(col("prev_type").isNotNull &&
          col("prev_type") =!= col("event_type"))
        .groupBy(col("prev_type").as("src"), col("event_type").as("dst"))
        .agg(count(lit(1)).as("w"))
      val pairs = w
        .groupBy(least(col("src"), col("dst")).as("t1"),
          greatest(col("src"), col("dst")).as("t2"))
        .agg(
          sum(when(col("src") < col("dst"), col("w")).otherwise(0L))
            .as("w_fwd"),
          sum(when(col("src") > col("dst"), col("w")).otherwise(0L))
            .as("w_rev"))
      val tot = pairs.agg(
        sum(col("w_fwd") + col("w_rev")).as("mass"),
        sum(least(col("w_fwd"), col("w_rev")) * 2).as("recip"))
      pairs.crossJoin(broadcast(tot))
        .select(col("t1"), col("t2"), col("w_fwd"), col("w_rev"),
          (least(col("w_fwd"), col("w_rev")) * 2).as("w_recip"),
          (floor(col("recip").cast("double") / col("mass") * 1000000)
            / 1000000).as("reciprocity"))
        .orderBy("t1", "t2")
    },

    // Adamic–Adar link prediction (round 10; Adamic & Adar 2003): the
    // third member of the common-neighbors scoring family — each shared
    // neighbor contributes 1/ln(deg(w)), so a RARE shared neighbor
    // (deg 2) is worth ~1.44 while a hub everyone co-occurs with is
    // worth ~0.1 and can't flood the list the way raw counts do.
    // Same 1997 co-order wedge chain as graph_common_neighbors; the
    // degree frame attaches before the wedge self-join. Determinism:
    // each wedge's term is floored onto the 1e-6 grid BEFORE the sum
    // (floor(1e6/ln(dw)) — deg ≥ 2 for any common neighbor, so ln > 0),
    // making the per-pair score an exact BIGINT — the ranking can never
    // be flipped by double fold order; ln sits inside a floor with ~9
    // guard digits, never in a raw compare.
    Q("graph_adamic_adar",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), sym AS (
        |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
        |), deg AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u
        |), cn AS (
        |  SELECT s1.u AS a, s2.u AS b, CAST(count(*) AS BIGINT) AS common_neighbors,
        |         CAST(sum(CAST(floor(1000000 / ln(d.deg)) AS BIGINT)) AS BIGINT)
        |           AS score_micro
        |  FROM sym s1 JOIN deg d ON d.u = s1.v
        |              JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
        |  GROUP BY s1.u, s2.u
        |)
        |SELECT cn.a, cn.b, common_neighbors, score_micro,
        |       round(score_micro / 1000000.0, 6) AS adamic_adar
        |FROM cn
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b)
        |ORDER BY score_micro DESC, a, b LIMIT 20""".stripMargin) { (s, d) =>
      degreeWeightedLinkPred(
        coOrderEdges(s, d, "1997-01-01", "1998-01-01"), 20,
        dw => floor(lit(1000000.0) / log(dw.cast("double"))).cast("long"),
        "adamic_adar")
    },

    // Resource-Allocation link prediction (round 10; Zhou, Lü & Zhang
    // 2009): 1/deg(w) per shared neighbor — the harsher hub discount
    // that beats Adamic–Adar on dense co-occurrence graphs (each
    // neighbor "sends one unit of resource" split across its links).
    // Identical wedge plan to graph_adamic_adar; the term 1e6 div deg
    // is PURE integer arithmetic — this key has zero float operations
    // before the final display division.
    Q("graph_resource_alloc",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), sym AS (
        |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
        |), deg AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u
        |), cn AS (
        |  SELECT s1.u AS a, s2.u AS b, CAST(count(*) AS BIGINT) AS common_neighbors,
        |         CAST(sum(1000000 // d.deg) AS BIGINT) AS score_micro
        |  FROM sym s1 JOIN deg d ON d.u = s1.v
        |              JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
        |  GROUP BY s1.u, s2.u
        |)
        |SELECT cn.a, cn.b, common_neighbors, score_micro,
        |       round(score_micro / 1000000.0, 6) AS resource_alloc
        |FROM cn
        |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b)
        |ORDER BY score_micro DESC, a, b LIMIT 20""".stripMargin) { (s, d) =>
      degreeWeightedLinkPred(
        coOrderEdges(s, d, "1997-01-01", "1998-01-01"), 20,
        dw => expr("1000000 div dw"),
        "resource_alloc")
    },

    // Preferential-attachment link prediction (round 10; Barabási &
    // Albert 1999): score = deg(a)·deg(b) — the "rich get richer" null
    // model that completes the link-prediction family (CN counts shared
    // structure, Jaccard/AA/RA discount hubs, PA *is* the hub prior a
    // real ranker calibrates against). Candidates stay the wedge-
    // connected non-adjacent pairs (scoring ALL n² non-edges is the
    // textbook definition and the cluster outage); score is a pure
    // BIGINT product — zero float operations anywhere.
    Q("graph_pref_attachment",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), sym AS (
        |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
        |), deg AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u
        |), cn AS (
        |  SELECT DISTINCT s1.u AS a, s2.u AS b
        |  FROM sym s1 JOIN sym s2 ON s1.v = s2.v AND s1.u < s2.u
        |), nc AS (
        |  SELECT a, b FROM cn
        |  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b)
        |)
        |SELECT nc.a, nc.b, da.deg AS deg_a, db.deg AS deg_b,
        |       da.deg * db.deg AS pa_score
        |FROM nc JOIN deg da ON da.u = nc.a JOIN deg db ON db.u = nc.b
        |ORDER BY pa_score DESC, a, b LIMIT 20""".stripMargin) { (s, d) =>
      val e = coOrderEdges(s, d, "1997-01-01", "1998-01-01").persist()
      val sym = symByV(e)
      val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
      val s2 = sym.select(col("u").as("u2"), col("v").as("v2"))
      sym.join(s2, col("v") === col("v2") && col("u") < col("u2"))
        .select(col("u").as("a"), col("u2").as("b")).distinct()
        .join(e, Seq("a", "b"), "left_anti")
        .join(deg.select(col("u").as("a"), col("deg").as("deg_a")), Seq("a"))
        .join(deg.select(col("u").as("b"), col("deg").as("deg_b")), Seq("b"))
        .select(col("a"), col("b"), col("deg_a"), col("deg_b"),
          (col("deg_a") * col("deg_b")).as("pa_score"))
        .orderBy(col("pa_score").desc, col("a"), col("b"))
        .limit(20)
    },

    // Degree assortativity (round 7, continued): Newman's r — the
    // Pearson correlation of endpoint degrees across edges, the one
    // scalar that says whether hubs attach to hubs (r>0, social-style)
    // or to leaves (r<0, hub-and-spoke) — and hence whether the
    // degree-oriented triangle/wedge plans must expect hub×hub wedge
    // blowup. Completes the graph-profile pair with graph_degree_dist.
    // Plan: the O(nodes) degree aggregate joins the symmetric edge
    // frame on each endpoint (counting each undirected edge in both
    // directions IS the standard undirected definition); the corr fold
    // is one map-side-combinable pass; n_edges rides in as a broadcast
    // scalar. Exact BIGINT degrees cast identically, round-6 output
    // (the agg_stats float discipline).
    Q("graph_assortativity",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), sym AS (
        |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b AS u, a AS v FROM e
        |), deg AS (
        |  SELECT u, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY u
        |)
        |SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
        |       round(corr(CAST(da.deg AS DOUBLE), CAST(db.deg AS DOUBLE)), 6)
        |         AS assortativity
        |FROM sym JOIN deg da ON da.u = sym.u
        |         JOIN deg db ON db.u = sym.v""".stripMargin) { (s, d) =>
      val e = coOrderEdges(s, d, "1997-01-01", "1998-01-01").persist()
      val sym = symmetrize(e).select(col("a").as("u"), col("b").as("v"))
        .persist()
      val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
      val r = sym
        .join(deg.select(col("u"), col("deg").as("da")), Seq("u"))
        .join(deg.select(col("u").as("v"), col("deg").as("db")), Seq("v"))
        .agg(round(corr(col("da").cast("double"), col("db").cast("double")), 6)
          .as("assortativity"))
      e.agg(count(lit(1)).as("n_edges")).crossJoin(broadcast(r))
    },

    // Market-basket affinity (round 7, continued): association-rule
    // lift over parts co-ordered in 1997 — lift(a,b) =
    // P(a,b)/(P(a)·P(b)) over the order universe, the R11 cross-sell
    // report ("customers who bought X also bought Y") the co-order
    // GRAPH keys deliberately strip out (they keep adjacency, this
    // keeps the counts). Plan: the same in-row i<j pair explode as
    // coOrderEdges but WITHOUT the final distinct — the per-(a,b) row
    // count IS the pair support (ps is a set per order, so each order
    // contributes a pair at most once); item supports are one O(parts)
    // aggregate joined back on the pair keys, and the order-universe
    // size rides in as a broadcast scalar (pageRank's crossJoin idiom —
    // no driver collect). Lift stays a pure function of BIGINT counts
    // cast once to double, so both engines compute identical IEEE
    // values; ordering uses the rounded score, ties → (a,b).
    Q("etl_basket_affinity",
      """WITH op AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), n AS (
        |  SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n_orders FROM op
        |), item AS (
        |  SELECT p, CAST(count(*) AS BIGINT) AS cnt FROM op GROUP BY p
        |), pair AS (
        |  SELECT x.p AS a, y.p AS b, CAST(count(*) AS BIGINT) AS pair_cnt
        |  FROM op x JOIN op y ON x.ok = y.ok AND x.p < y.p
        |  GROUP BY x.p, y.p
        |)
        |SELECT pair.a, pair.b, pair_cnt,
        |       round(CAST(pair_cnt AS DOUBLE) * n_orders /
        |             (ia.cnt * ib.cnt), 6) AS lift
        |FROM pair CROSS JOIN n
        |  JOIN item ia ON ia.p = pair.a
        |  JOIN item ib ON ib.p = pair.b
        |WHERE pair_cnt >= 2
        |ORDER BY lift DESC, a, b LIMIT 20""".stripMargin) { (s, d) =>
      val op = Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
        .select("o_orderkey")
        .join(Tables(s, d, "lineitem").select("l_orderkey", "l_partkey"),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_orderkey").as("ok"), col("l_partkey").as("p"))
        .distinct()
        .persist()
      val n = op.agg(countDistinct(col("ok")).as("n_orders"))
      val item = op.groupBy("p").agg(count(lit(1)).as("cnt"))
      val pairs = op.groupBy(col("ok"))
        .agg(sort_array(collect_set(col("p"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
            |  transform(slice(ps, i + 2, size(ps)),
            |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("pair_cnt"))
        .where(col("pair_cnt") >= 2)
      pairs
        .join(item.select(col("p").as("a"), col("cnt").as("ca")), Seq("a"))
        .join(item.select(col("p").as("b"), col("cnt").as("cb")), Seq("b"))
        .crossJoin(broadcast(n))
        .select(col("a"), col("b"), col("pair_cnt"),
          round(col("pair_cnt").cast("double") * col("n_orders") /
            (col("ca") * col("cb")), 6).as("lift"))
        .orderBy(col("lift").desc, col("a"), col("b"))
        .limit(20)
    },

    // Bounded-hop BFS (round 5, continued): shortest-hop rings from a
    // seed node — reachability profiling (blast radius, neighborhood
    // size) over the January-1997 co-order graph, reported as nodes per
    // shortest-distance ring within 4 hops. The declared plan is the
    // classic distributed frontier BFS: per level, ONE equi-join of the
    // (small, shrinking) frontier against the pre-partitioned symmetric
    // edge frame + one anti-join against the visited set — the edge
    // frame crosses the network once (persisted hash-partitioned on the
    // join key, the Components idiom), so each round shuffles only the
    // frontier. The hop cap bounds the round count the way
    // DefaultMaxPropagationRounds bounds CC; per-level persists truncate
    // the unrolled lineage. The oracle replays the same semantics as a
    // capped recursive walk with a min-distance fold (UNION-set
    // recursion — oracle-scale-only, like reachMinCte).
    Q("graph_bfs",
      """WITH RECURSIVE lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), edges AS (
        |  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0
        |), walk(node, dist) AS (
        |  SELECT (SELECT min(a) FROM e0), 0
        |  UNION
        |  SELECT e.b, walk.dist + 1
        |  FROM walk JOIN edges e ON e.a = walk.node
        |  WHERE walk.dist < 4
        |), d AS (
        |  SELECT node, min(dist) AS dist FROM walk GROUP BY node
        |)
        |SELECT CAST(dist AS BIGINT) AS dist,
        |       CAST(count(*) AS BIGINT) AS n_nodes
        |FROM d GROUP BY dist ORDER BY dist""".stripMargin) { (s, d) =>
      val e0 = coOrderEdges(s, d, "1997-01-01", "1998-01-01").persist()
      bfs(symmetrize(e0), e0.agg(min(col("a")).as("node")), maxHops = 4)
        .groupBy(col("dist").cast("long").as("dist"))
        .agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
    },

    // k-core decomposition (round 7) — the dense-substructure filter that
    // completes the graph family's structure trio (components = "what is
    // connected", triangles = "how clustered", k-core = "what is DENSELY
    // connected"): iteratively peel every edge with an endpoint of degree
    // < k until stable; survivors are the maximal subgraph where every
    // node keeps ≥ 4 neighbors. Same January-1997 co-order graph as
    // graph_cc (fixpoint in ≤ 4 peels at every harness SF, measured;
    // maxRounds = 8 is a 2× budget). Peeling is Components.kCore — the CC
    // loop idiom (edge frame hash-partitioned once, per-round semi-joins
    // against the small qualifying-node frame, observe-fused counts,
    // localCheckpoint lineage) — while the oracle replays the SAME
    // simultaneous-removal rounds as a capped recursive window-function
    // peel: degrees computed over the round's snapshot, both endpoints
    // filtered against it. Peel order can't change the answer (the core
    // is the unique maximal fixpoint), and a budget hit still agrees —
    // both sides report the round-8 state.
    Q("graph_kcore",
      """WITH RECURSIVE lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1997-02-01'
        |), e0 AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), edges AS (
        |  SELECT a, b FROM e0 UNION ALL SELECT b AS a, a AS b FROM e0
        |), peel(iter, a, b) AS (
        |  SELECT 0, a, b FROM edges
        |  UNION ALL
        |  SELECT iter + 1, a, b FROM (
        |    SELECT iter, a, b,
        |           count(*) OVER (PARTITION BY a) AS da,
        |           count(*) OVER (PARTITION BY b) AS db
        |    FROM peel
        |  ) WHERE iter < 8 AND da >= 4 AND db >= 4
        |)
        |SELECT CAST(a AS BIGINT) AS node, CAST(count(*) AS BIGINT) AS core_degree
        |FROM peel WHERE iter = 8
        |GROUP BY a ORDER BY core_degree DESC, node""".stripMargin) { (s, d) =>
      Components.kCore(
          symmetrize(coOrderEdges(s, d, "1997-01-01", "1997-02-01")), k = 4)
        .orderBy(col("core_degree").desc, col("node"))
    },

    // Degree-stratified clustering (round 9): triangles/wedges ratio per
    // power-of-two degree bucket over the 1997 co-order graph — C(k),
    // the clustering-by-degree curve. This key is the DETECTOR for the
    // escape hatch graph_triangles documents: a flat/high C(k) at large
    // k says hubs sit in dense cores (id-orientation fine); a steep
    // power-law decay with fat hub degrees says wedge volume
    // concentrates at hubs and the degree-oriented plan
    // (trianglesByDegree, Suri & Vassilvitskii 2011) should take over.
    // Bucket cc = Σtri/Σwedges (per-bucket totals — exact BIGINTs, one
    // display division), not a mean of per-node ratios, so low-wedge
    // nodes can't dominate the bucket. Bucketing is an integer CASE
    // ladder (shared text, both engines) — floor(log2()) would lean on
    // libm rounding the determinism checklist forbids.
    //
    // Scale shape: the same persisted oriented edge frame feeds degrees
    // and the triangle 3-join (the graph_local_cc chain); the bucket
    // aggregate is bounded (≤20 rows). Cost class = graph_triangles.
    Q("graph_clustering_by_degree",
      s"""WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), und AS (
        |  SELECT a AS n FROM e UNION ALL SELECT b FROM e
        |), deg AS (
        |  SELECT n AS node, CAST(count(*) AS BIGINT) AS degree
        |  FROM und GROUP BY n
        |), tn AS (
        |  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
        |    SELECT unnest([e1.a, e1.b, e2.b]) AS node
        |    FROM e e1 JOIN e e2 ON e2.a = e1.b
        |      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        |  ) GROUP BY node
        |), nb AS (
        |  SELECT degree, COALESCE(n_tri, 0) AS n_tri,
        |         degree * (degree - 1) // 2 AS wedges,
        |         $degreeBucketCase AS bucket_lo
        |  FROM deg LEFT JOIN tn USING (node) WHERE degree >= 2
        |)
        |SELECT CAST(bucket_lo AS BIGINT) AS degree_bucket,
        |       CAST(count(*) AS BIGINT) AS n_nodes,
        |       CAST(sum(n_tri) AS BIGINT) AS sum_tri,
        |       CAST(sum(wedges) AS BIGINT) AS sum_wedges,
        |       floor(CAST(sum(n_tri) AS DOUBLE) / sum(wedges) * 1000000)
        |         / 1000000 AS bucket_cc
        |FROM nb GROUP BY bucket_lo ORDER BY degree_bucket""".stripMargin) {
      (s, d) =>
      val e = coOrderEdges(s, d, "1997-01-01", "1998-01-01").persist()
      val deg = symmetrize(e)
        .groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
      val bc = e.select(col("a").as("b2"), col("b").as("c"))
      val ac = e.select(col("a").as("a3"), col("b").as("c3"))
      val triNodes = e.join(bc, col("b") === col("b2"))
        .join(ac, col("a") === col("a3") && col("c") === col("c3"))
        .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
        .groupBy("node").agg(count(lit(1)).as("n_tri"))
      deg.join(triNodes, Seq("node"), "left")
        .where(col("degree") >= 2)
        .select(col("degree"),
          coalesce(col("n_tri"), lit(0L)).as("n_tri"),
          expr("degree * (degree - 1) DIV 2").as("wedges"),
          expr(degreeBucketCase).as("bucket_lo"))
        .groupBy(col("bucket_lo").cast("long").as("degree_bucket"))
        .agg(count(lit(1)).as("n_nodes"),
          sum("n_tri").as("sum_tri"),
          sum("wedges").as("sum_wedges"))
        .withColumn("bucket_cc",
          floor(col("sum_tri").cast("double") / col("sum_wedges")
            * 1000000) / 1000000)
        .orderBy("degree_bucket")
    },

    // Rich-club coefficient (round 9, cont.): φ(k) = 2·E_k/(N_k·(N_k−1))
    // over the 1997 co-order graph for k ∈ {2,4,8,16,32} — do the hubs
    // trade with EACH OTHER (φ→1, an interconnected core whose removal
    // fragments nothing) or only with the periphery (φ→0, a hub-and-
    // spoke where each hub is a single point of failure)? The
    // connectivity complement of graph_clustering_by_degree's density
    // curve and graph_assortativity's one-number mixing score (Colizza
    // et al. 2006). EXACT: both the degree histogram and the
    // min-endpoint-degree histogram are integer frames; per-k counts
    // are inequality-joined sums of those BOUNDED histograms (domain =
    // distinct degrees, the graph_degree_dist precedent); one display
    // division per k.
    //
    // Scale shape: degrees join onto the oriented edge frame (two hash
    // joins on node ids — the assortativity shape), then everything
    // collapses to the two bounded histograms before the k-ladder
    // touches anything; the ladder itself is a ≤5×degrees-domain
    // nested-loop over broadcast-bounded frames.
    Q("graph_richclub",
      """WITH lp AS (
        |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |    AND o_orderdate < TIMESTAMP '1998-01-01'
        |), e AS (
        |  SELECT DISTINCT x.p AS a, y.p AS b
        |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
        |), und AS (
        |  SELECT a AS n FROM e UNION ALL SELECT b FROM e
        |), deg AS (
        |  SELECT n AS node, CAST(count(*) AS BIGINT) AS degree
        |  FROM und GROUP BY n
        |), dh AS (
        |  SELECT degree, CAST(count(*) AS BIGINT) AS cnt
        |  FROM deg GROUP BY degree
        |), mh AS (
        |  SELECT least(da.degree, db.degree) AS md,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM e JOIN deg da ON e.a = da.node
        |         JOIN deg db ON e.b = db.node
        |  GROUP BY 1
        |), ks AS (
        |  SELECT unnest([2, 4, 8, 16, 32]) AS k
        |), agg AS (
        |  SELECT k,
        |    (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM dh
        |     WHERE degree > k) AS n_nodes,
        |    (SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) FROM mh
        |     WHERE md > k) AS n_edges
        |  FROM ks
        |)
        |SELECT CAST(k AS BIGINT) AS k, n_nodes, n_edges,
        |       floor(2.0 * n_edges / n_nodes / (n_nodes - 1) * 1000000)
        |         / 1000000 AS phi
        |FROM agg WHERE n_nodes >= 2 ORDER BY k""".stripMargin) { (s, d) =>
      val e = coOrderEdges(s, d, "1997-01-01", "1998-01-01").persist()
      val deg = symmetrize(e)
        .groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
      val dh = deg.groupBy("degree").agg(count(lit(1)).as("cnt"))
      val mh = e
        .join(deg.select(col("node").as("na"), col("degree").as("da")),
          col("a") === col("na"))
        .join(deg.select(col("node").as("nb"), col("degree").as("db")),
          col("b") === col("nb"))
        .select(least(col("da"), col("db")).as("md"))
        .groupBy("md").agg(count(lit(1)).as("cnt"))
      val ks = e.sparkSession.range(1, 6)
        .select(expr("CAST(shiftleft(1, CAST(id AS INT)) AS BIGINT)")
          .as("k"))
      val nodesK = ks.join(broadcast(dh), col("degree") > col("k"))
        .groupBy("k").agg(sum("cnt").as("n_nodes"))
      val edgesK = ks.join(broadcast(mh), col("md") > col("k"))
        .groupBy("k").agg(sum("cnt").as("n_edges"))
      ks.join(nodesK, Seq("k"), "left").join(edgesK, Seq("k"), "left")
        .select(col("k").cast("long").as("k"),
          coalesce(col("n_nodes"), lit(0L)).as("n_nodes"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"))
        .where(col("n_nodes") >= 2)
        .withColumn("phi",
          floor(lit(2.0) * col("n_edges") / col("n_nodes")
            / (col("n_nodes") - 1) * 1000000) / 1000000)
        .orderBy("k")
    }
  )

  /** Power-of-two degree-bucket CASE ladder — ONE text evaluated by both
    * engines (a floor(log2()) bucket would ride libm; integer compares
    * can't drift). Covers degree < 2^21; the ELSE arm labels the rest.
    */
  private lazy val degreeBucketCase: String =
    (1 to 20).map(b => s"WHEN degree < ${1L << (b + 1)} THEN ${1L << b}")
      .mkString("CASE ", " ", " ELSE 1048576 END")

  /** Top-k common-neighbors link prediction over an id-ORIENTED distinct
    * edge frame (a < b) — the wedge self-join on the shared neighbor,
    * existing edges removed by anti-join BEFORE the fused top-k (also
    * driven at 6M edges by ScaleSmoke). The oriented frame feeds the
    * symmetric adjacency (both self-join sides) plus the anti probe, so
    * it is persisted once — the multiply-referenced-frame idiom.
    *
    * Cache contract: persists the edge frame; callers doing repeated
    * runs should clearCache() when done, as with [[pageRank]].
    */
  /** Symmetrized adjacency (u, v) pinned at FULL parallelism on the
    * wedge key v (round 13). The wedge self-join's cost is its OUTPUT
    * (Σ deg² candidate pairs), which AQE cannot see: it sizes the
    * join's reduce partitions from the tiny edge-frame input bytes and
    * coalesced the whole wedge enumeration onto 2 tasks (event-log
    * evidence: 3.4M wedge rows produced by 2 tasks of ~2 s on 32
    * cores). An EXPLICIT partition count is a hard constraint AQE will
    * not coalesce, sized from the session's parallelism (scale-adaptive
    * — cores of the cluster, not a tuned constant); localCheckpoint
    * pins it statically so BOTH self-join sides arrive co-partitioned
    * on v and the join runs exchange-free at full width.
    */
  private def symByV(e: DataFrame): DataFrame = {
    val np = e.sparkSession.sparkContext.defaultParallelism
    symmetrize(e).select(col("a").as("u"), col("b").as("v"))
      .persist()
      .repartition(np, col("v"))
  }

  def commonNeighbors(edges0: DataFrame, k: Int): DataFrame = {
    val e = edges0.persist()
    val sym = symByV(e)
    val s2 = sym.select(col("u").as("u2"), col("v").as("v2"))
    sym.join(s2, col("v") === col("v2") && col("u") < col("u2"))
      .groupBy(col("u").as("a"), col("u2").as("b"))
      .agg(count(lit(1)).as("common_neighbors"))
      .join(e, Seq("a", "b"), "left_anti")
      .orderBy(col("common_neighbors").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Jaccard-coefficient link prediction (round 7, cont.): the
    * normalized twin of [[commonNeighbors]] — |N(a)∩N(b)| / |N(a)∪N(b)|
    * for non-adjacent pairs, so a 2-common-neighbor pair of degree-3
    * nodes outranks a 5-common-neighbor pair of hubs. Same wedge
    * enumeration (O(sum deg²), degree-orientation applies unchanged on
    * power-law graphs); the degree frame is O(nodes) and joins the
    * candidate frame on its grouping key, and union size comes free as
    * deg(a)+deg(b)−common (no second set pass). Ordering uses the
    * ROUNDED score so sub-1e-6 float noise can never flip the top-k cut
    * between engines; ties break on (a, b).
    */
  def jaccardNeighbors(edges0: DataFrame, k: Int): DataFrame = {
    val e = edges0.persist()
    val sym = symByV(e)
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val s2 = sym.select(col("u").as("u2"), col("v").as("v2"))
    sym.join(s2, col("v") === col("v2") && col("u") < col("u2"))
      .groupBy(col("u").as("a"), col("u2").as("b"))
      .agg(count(lit(1)).as("common_neighbors"))
      .join(e, Seq("a", "b"), "left_anti")
      .join(deg.select(col("u").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("u").as("b"), col("deg").as("db")), Seq("b"))
      .select(col("a"), col("b"), col("common_neighbors"),
        round(col("common_neighbors").cast("double") /
          (col("da") + col("db") - col("common_neighbors")), 6).as("jaccard"))
      .orderBy(col("jaccard").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Degree-weighted link prediction (round 10): the wedge chain of
    * [[commonNeighbors]] with each common neighbor's degree attached
    * BEFORE the wedge self-join (the degree frame is O(nodes) and
    * joins `sym` on its own key once — attaching after the join would
    * carry the equi-join over the Σdeg² wedge frame instead), folded
    * per candidate pair by `termMicro(dw)` — an exact-BIGINT per-wedge
    * score so the SUM (and therefore the top-k cut) is deterministic
    * across engines regardless of fold order. Adamic–Adar and
    * Resource-Allocation differ only in the term. */
  private def degreeWeightedLinkPred(
      edges0: DataFrame, k: Int, termMicro: Column => Column,
      scoreName: String): DataFrame = {
    val e = edges0.persist()
    val sym = symByV(e)
    val deg = sym.groupBy("u").agg(count(lit(1)).as("deg"))
    val s1 = sym.join(
      deg.select(col("u").as("v"), col("deg").as("dw")), Seq("v"))
    val s2 = sym.select(col("u").as("u2"), col("v").as("v2"))
    s1.join(s2, col("v") === col("v2") && col("u") < col("u2"))
      .groupBy(col("u").as("a"), col("u2").as("b"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(termMicro(col("dw"))).as("score_micro"))
      .join(e, Seq("a", "b"), "left_anti")
      .select(col("a"), col("b"), col("common_neighbors"),
        col("score_micro"),
        round(col("score_micro") / 1000000.0, 6).as(scoreName))
      .orderBy(col("score_micro").desc, col("a"), col("b"))
      .limit(k)
  }

  /** Bounded-hop frontier BFS over a SYMMETRIC edge frame (a, b) from a
    * seed frame with one `node` column — returns (node, dist) with dist =
    * shortest hop count ≤ maxHops (also driven at 20M edges by
    * ScaleSmoke). Per level: one frontier⋈edges equi-join + one anti-join
    * against the visited set. The edge frame crosses the network ONCE
    * (persisted hash-partitioned on the join key, the Components idiom) —
    * each round shuffles only the frontier; per-level persists truncate
    * the unrolled lineage.
    *
    * Cache contract: persists the edge frame and the per-level
    * visited/frontier frames; callers doing repeated runs should
    * clearCache() when done, as with [[pageRank]].
    */
  def bfs(edgesSym: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val sym = edgesSym.repartition(col("a")).persist()
    // each LEVEL is persisted once; `visited` stays a lazy unionAll of
    // the cached levels — persisting the growing superset per round
    // would double the cache footprint and rewrite the whole visited
    // set every level for no new information (review finding)
    var visited = seeds.select(col("node"), lit(0).as("dist")).localCheckpoint()
    var frontier = visited
    for (h <- 1 to maxHops) {
      // localCheckpoint per level (round 13; was a lazy persist): the
      // lazy form deferred every level into ONE final mega-job whose
      // unrolled plan re-embedded all previous levels' subtrees (~300
      // Exchange nodes at 4 hops — re-analyzed on every run); the eager
      // per-level job keeps each hop's plan flat at constant size. The
      // level frames stay node-sized, so the extra action is scheduling
      // noise next to the planning saved.
      frontier = frontier.join(sym, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .select(col("node"), lit(h).as("dist"))
        .localCheckpoint()
      // visited stays a lazy unionAll of the checkpointed levels — the
      // union of flat scans is itself flat, no extra action needed
      visited = visited.unionAll(frontier)
    }
    visited
  }

  /** Deterministic synchronous label propagation (Raghavan et al. 2007)
    * over a SYMMETRIZED (a, b) edge frame: `rounds` rounds, every node
    * simultaneously adopts the most frequent label among its neighbors,
    * ties to the SMALLEST label (max(struct(cnt, −label)) — total order).
    * Returns (node, label). The fixed round budget IS the semantics:
    * synchronous LPA can 2-cycle on bipartite-ish regions, so a
    * convergence loop would not terminate there.
    *
    * Scale shape: edge frame repartitioned on the probe side +
    * checkpointed ONCE; per round one label-vector shuffle against it +
    * one (node, label) count; labels localCheckpointed per round (flat
    * lineage, the CC-loop posture).
    */
  def labelPropagation(edgesSym: DataFrame, rounds: Int): DataFrame = {
    val e = edgesSym.repartition(col("b")).localCheckpoint()
    var labels = e.select(col("a").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      labels = e.join(labels, e("b") === labels("node"))
        .groupBy(e("a").as("n"), labels("label").as("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("n"))
        .agg(max(struct(col("cnt").as("c"), (-col("lbl")).as("nl")))
          .as("m"))
        .select(col("n").as("node"), (-col("m.nl")).as("label"))
        .localCheckpoint()
    }
    labels
  }

  /** Multi-source hop-bounded BFS distances over a SYMMETRIZED (a, b)
    * edge frame: the [[bfs]] loop run seed-wide — per hop ONE
    * frontier⋈edges join + one anti-join against the per-seed visited
    * set; frontier size ≤ seeds × nodes. `seeds` must have a `node`
    * column. Returns (seed, node, dist) for dist in 1..maxHops.
    */
  def multiSourceDistances(
      edgesSym: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    val e = edgesSym.repartition(col("a")).localCheckpoint()
    var visited = seeds
      .select(col("node").as("seed"), col("node"), lit(0).as("dist"))
    var frontier = visited
    for (h <- 1 to maxHops) {
      val nxt = frontier.join(e, frontier("node") === e("a"))
        .select(col("seed"), e("b").as("nx")).distinct()
        .withColumnRenamed("nx", "node")
      frontier = nxt
        .join(visited.select("seed", "node"), Seq("seed", "node"),
          "left_anti")
        .withColumn("dist", lit(h)).localCheckpoint()
      visited = visited.unionByName(frontier).localCheckpoint()
    }
    visited.where(col("dist") > 0)
  }

  /** Symmetrize an oriented edge frame (a, b) → both directions in ONE
    * pass: explode of a two-struct array instead of
    * `e.unionAll(e.swap)` — the union form references `e` TWICE, so an
    * unpersisted upstream derivation (the orders⋈lineitem pair build
    * here) is evaluated twice per materialization (caught by the
    * round-5 bench: graph_cc/graph_bfs paid the edge build 2–3×).
    */
  private def symmetrize(e: DataFrame): DataFrame =
    e.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))

  /** Distinct id-oriented (a < b) part pairs co-ordered within
    * [from, to) — the shared edge derivation of the graph-family keys
    * (graph_triangles / graph_cc / graph_degree_dist /
    * graph_common_neighbors / graph_bfs — the ONE definition all five
    * share). The quadratic pair build runs WITHIN an order (bounded
    * fan-out), never across the table — and entirely IN-ROW: one
    * groupBy(order) collects the sorted distinct part set, then a
    * nested `transform` explodes the i<j pairs map-side. Two wide
    * shuffles total (the groupBy and the final pair distinct); the
    * previous self-join form paid four (pre-distinct, both join
    * sides, pair distinct) for the same output.
    */
  /** Per-node local clustering coefficient over an a<b edge frame:
    * C(v) = triangles-through-v / C(deg(v), 2), reported for the top-k
    * highest-degree nodes. Everything is INTEGER (per-node triangle and
    * wedge counts) until the one rounded division — no float folds; the
    * top-k cut orders by (degree DESC, node) so degree ties can't flip
    * membership. Triangle enumeration reuses the id-oriented 3-join
    * (each triangle found once as a<b<c, credited to all three nodes by
    * an in-row explode). */
  private[graft] def localClustering(edges0: DataFrame, k: Int): DataFrame = {
    val e = edges0.persist()
    val deg = symmetrize(e)
      .groupBy(col("a").as("node")).agg(count(lit(1)).as("degree"))
    val bc = e.select(col("a").as("b2"), col("b").as("c"))
    val ac = e.select(col("a").as("a3"), col("b").as("c3"))
    val triNodes = e.join(bc, col("b") === col("b2"))
      .join(ac, col("a") === col("a3") && col("c") === col("c3"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
    deg.join(triNodes, Seq("node"), "left")
      .where(col("degree") >= 2)
      .select(col("node"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        expr("degree * (degree - 1) DIV 2").as("wedges"))
      .withColumn("local_cc",
        round(col("n_tri") * 1.0 / col("wedges"), 6))
      .orderBy(col("degree").desc, col("node"))
      .limit(k)
  }

  /** The ONE degree-distribution oracle text — shared verbatim by
    * graph_degree_dist (live-derivation serving) and
    * graph_degree_dist_maintained (incrementally-maintained frame
    * serving), so the two can never drift (round 13 — VERDICT r12 #1). */
  private lazy val degreeDistOracle: String =
    """WITH lp AS (
      |  SELECT DISTINCT o_orderkey AS ok, l_partkey AS p
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |    AND o_orderdate < TIMESTAMP '1998-01-01'
      |), e AS (
      |  SELECT DISTINCT x.p AS a, y.p AS b
      |  FROM lp x JOIN lp y ON x.ok = y.ok AND x.p < y.p
      |), deg AS (
      |  SELECT u, count(*) AS degree FROM (
      |    SELECT a AS u FROM e UNION ALL SELECT b AS u FROM e
      |  ) GROUP BY u
      |)
      |SELECT CAST(degree AS BIGINT) AS degree,
      |       CAST(count(*) AS BIGINT) AS n_nodes
      |FROM deg GROUP BY degree ORDER BY degree""".stripMargin

  /** The ONE weighted-PageRank oracle text — shared by graph_pagerank
    * and graph_pagerank_maintained (round 13 — VERDICT r12 #1). */
  private lazy val pagerankOracle: String =
      """WITH pair AS (
        |  SELECT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s,
        |         CAST(count(*) AS BIGINT) AS cnt
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2
        |), edges AS (
        |  SELECT c AS src, s AS dst, cnt FROM pair
        |  UNION ALL
        |  SELECT s AS src, c AS dst, cnt FROM pair
        |), outw AS (
        |  SELECT src, CAST(sum(cnt) AS BIGINT) AS w FROM edges GROUP BY src
        |), n AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM outw
        |), r0 AS (
        |  SELECT src AS node, CAST(1000000000000 // n_nodes AS BIGINT) AS rank
        |  FROM outw CROSS JOIN n
        |), r1 AS (
        |  SELECT e.dst AS node,
        |         CAST((150000000000 // n_nodes)
        |              + (85 * sum((r.rank * e.cnt) // o.w)) // 100 AS BIGINT) AS rank
        |  FROM edges e JOIN r0 r ON r.node = e.src
        |               JOIN outw o ON o.src = e.src CROSS JOIN n
        |  GROUP BY e.dst, n_nodes
        |), r2 AS (
        |  SELECT e.dst AS node,
        |         CAST((150000000000 // n_nodes)
        |              + (85 * sum((r.rank * e.cnt) // o.w)) // 100 AS BIGINT) AS rank
        |  FROM edges e JOIN r1 r ON r.node = e.src
        |               JOIN outw o ON o.src = e.src CROSS JOIN n
        |  GROUP BY e.dst, n_nodes
        |), r3 AS (
        |  SELECT e.dst AS node,
        |         CAST((150000000000 // n_nodes)
        |              + (85 * sum((r.rank * e.cnt) // o.w)) // 100 AS BIGINT) AS rank
        |  FROM edges e JOIN r2 r ON r.node = e.src
        |               JOIN outw o ON o.src = e.src CROSS JOIN n
        |  GROUP BY e.dst, n_nodes
        |)
        |SELECT node, rank FROM r3
        |ORDER BY rank DESC, node LIMIT 20""".stripMargin

  /** MAINTAINED co-order frame root for `d` (round 13 — VERDICT r12
    * #1): the declared twin builds the [[graft.config.AnalyticFrames]]
    * co-order frame on the 1997 H1 orders and ∝-batch-ingests Q3 and
    * Q4 — the deployment lifecycle, replayed once per source
    * fingerprint so the cached state IS the segmented frame a nightly
    * pipeline serves (the ensureCorpusRegistry pattern). Serving is the
    * frame's own merge-on-read read (multi-segment scan + distinct),
    * re-spread on the distribution key per the 1-split lesson. */
  private def coOrderEdgesMaintained(
      s: SparkSession, d: String): DataFrame = {
    val dir = graft.config.LakeCache.ensure(
      Seq(s"$d/orders.parquet", s"$d/lineitem.parquet"),
      "coorder:maintained:v1:1997", "graft_frames_maintained") { tmp =>
      val lines = Tables(s, d, "lineitem")
      def ordersIn(from: String, to: String) = Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(to).cast("timestamp"))
      graft.config.AnalyticFrames.buildCoOrder(
        s, ordersIn("1997-01-01", "1997-07-01"), lines, tmp)
      graft.config.AnalyticFrames.ingestCoOrder(
        s, tmp, ordersIn("1997-07-01", "1997-10-01"), lines)
      graft.config.AnalyticFrames.ingestCoOrder(
        s, tmp, ordersIn("1997-10-01", "1998-01-01"), lines)
    }
    graft.config.AnalyticFrames.coOrderEdges(s, dir)
      .repartition(col("a"), col("b"))
  }

  /** MAINTAINED customer↔supplier pair frame for `d` (round 13): build
    * on a third of the orders, ingest the other two thirds as complete-
    * order batches; the serve's bounded groupBy-sum merges the additive
    * cnt partials — [[graft.config.AnalyticFrames.custSuppPairs]]'s
    * merge-on-read law under a declared oracle. */
  private def custSuppPairsMaintained(
      s: SparkSession, d: String): DataFrame = {
    val dir = graft.config.LakeCache.ensure(
      Seq(s"$d/orders.parquet", s"$d/lineitem.parquet"),
      "custsupp:maintained:v1", "graft_frames_maintained") { tmp =>
      val lines = Tables(s, d, "lineitem")
      def slice(r: Int) = Tables(s, d, "orders")
        .where(pmod(col("o_orderkey"), lit(3)) === r)
      graft.config.AnalyticFrames.buildCustSupp(s, slice(0), lines, tmp)
      graft.config.AnalyticFrames.ingestCustSupp(s, tmp, slice(1), lines)
      graft.config.AnalyticFrames.ingestCustSupp(s, tmp, slice(2), lines)
    }
    // No read-side re-spread (round 13): the merge-on-read groupBy-sum
    // already leaves the frame hash-distributed, and the one consumer
    // (graph_pagerank_maintained) explodes and repartitions on src —
    // the extra exchange was thrown away immediately (guide §2.4).
    graft.config.AnalyticFrames.custSuppPairs(s, dir)
  }

  /** The customer↔supplier transaction pair frame (c = 2·cust,
    * s = 2·supp+1, cnt), MATERIALIZED once per (orders, lineitem)
    * fingerprint (round 11 — the co-order precedent): the pagerank /
    * pagerank_directed / hits trio each re-derived the same
    * orders⋈lineitem aggregate per key. Oracles still replay the
    * derivation from the base tables; re-spread on read per the
    * 1-split lesson. */
  private def custSuppPairs(
      s: SparkSession, d: String): DataFrame = {
    val dir = graft.config.LakeCache.ensure(
      Seq(s"$d/orders.parquet", s"$d/lineitem.parquet"),
      "custsupp:v1", "graft_custsupp_graph") { tmp =>
      custSuppPairsFrom(Tables(s, d, "orders"), Tables(s, d, "lineitem"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    }
    // No read-side re-spread here (round 13): all five consumers
    // (pagerank ×2, hits, eigenvector, katz) symmetrize-explode and then
    // repartition on their own loop key (src), so a repartition(c, s)
    // here was one pure-overhead exchange per key that the next exchange
    // immediately threw away (guide §2.4).
    s.read.parquet(dir)
  }

  /** The customer↔supplier pair derivation, frame-parameterized
    * (round 12 — the incremental-frame protocol derives batch partials
    * through the SAME definition the full build uses): cnt is a plain
    * count over joined lineitem rows, so partials over disjoint
    * lineitem batches merge ADDITIVELY — the property
    * [[graft.config.AnalyticFrames]] merge-on-read relies on. */
  private[graft] def custSuppPairsFrom(
      orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.select("o_orderkey", "o_custkey")
      .join(lineitem.select("l_orderkey", "l_suppkey"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy((col("o_custkey") * 2).as("c"),
        (col("l_suppkey") * 2 + 1).as("s"))
      .agg(count(lit(1)).as("cnt"))

  /** The 1997 co-order graph, served as a MATERIALIZED lake table
    * (round 11 — VERDICT r10 #6): 8+ declared graph keys consume the
    * SAME edge frame, and each used to rebuild it from orders⋈lineitem
    * (~13 s of the full-surface bench paid eight times over). The frame
    * now builds ONCE per (orders, lineitem, window) fingerprint through
    * [[graft.config.LakeCache]] — the IVF/sketch-registry protocol: any
    * change to either source parquet or the window invalidates, the
    * stage-then-rename publish means a crashed build never serves, and
    * the retention sweep bounds superseded state. This is exactly the
    * materialized edge table a production graph deployment keeps next
    * to its fact tables; the oracles still replay the full derivation
    * from the base tables, so a stale or wrong stored frame
    * hash-mismatches every consumer immediately.
    */
  private[graft] def coOrderEdges(
      s: SparkSession, d: String, from: String, to: String): DataFrame = {
    val dir = graft.config.LakeCache.ensure(
      Seq(s"$d/orders.parquet", s"$d/lineitem.parquet"),
      s"coorder:v1:$from:$to", "graft_coorder_graph") { tmp =>
      coOrderEdgesLive(s, d, from, to)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
    }
    // The stored frame is small enough that the scan coalesces to ONE
    // split — fine for the cheap consumers, but the wedge family then
    // symmetrizes/persists/self-joins from a single task (measured ×2
    // on graph_jaccard_neighbors). Re-spread on the live derivation's
    // own distribution key so every consumer starts at full parallelism
    // — the same hash exchange the in-memory distinct() used to leave
    // behind, paid once per key over a tiny frame.
    s.read.parquet(dir).repartition(col("a"), col("b"))
  }

  /** The live derivation (the only statement of the edge semantics —
    * the lake build above writes exactly this frame): within-order
    * a<b part pairs from ONE collect_set-per-order aggregate + an
    * in-row nested-transform explode, so the only join is
    * orders⋈lineitem (PlanSpec pins the shape). */
  private[graft] def coOrderEdgesLive(
      s: SparkSession, d: String, from: String, to: String): DataFrame =
    coOrderEdgesFrom(
      Tables(s, d, "orders")
        .where(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(to).cast("timestamp")),
      Tables(s, d, "lineitem"))

  /** The co-order edge derivation, frame-parameterized (round 12):
    * every edge lives WITHIN one order, so a batch of complete new
    * orders derives its edges from the batch alone — the ∝-batch
    * property [[graft.config.AnalyticFrames.ingestCoOrder]] uses. The
    * caller owns completeness (an order's lineitems must not split
    * across batches). */
  private[graft] def coOrderEdgesFrom(
      orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .select("o_orderkey")
      .join(lineitem.select("l_orderkey", "l_partkey"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      // ps is sorted ascending, so pairing ps[i] with every later
      // element yields each a<b pair exactly once per order
      .select(explode(expr(
        """flatten(transform(ps, (x, i) ->
          |  transform(slice(ps, i + 2, size(ps)),
          |            y -> struct(x AS a, y AS b))))""".stripMargin)).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .distinct()
}
