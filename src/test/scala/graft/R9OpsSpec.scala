package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Laws for the round-9 operator batch beyond their DuckDB oracles:
  * JVM-side recomputation cross-checks (regex/fold semantics), plan pins
  * (the bloom runtime filter must actually sit on the fact scan), and
  * sanity ranges on planted distributions.
  */
class R9OpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("join_bloom_runtime: the bloom probe filters the FACT side below the join") {
    val plan = run("join_bloom_runtime").queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_contains"),
      s"bloom runtime filter missing from the plan:\n$plan")
    // the probe must reference the fact key, not the dim key — a filter
    // on the dim side would be a no-op disguised as pushdown
    assert(plan.linesIterator.exists(l =>
      l.contains("bloom_contains") && l.contains("l_partkey")),
      s"bloom probe is not on the fact key:\n$plan")
  }

  test("win_ewma_time == sequential JVM recursion (hyperbolic decay law)") {
    val got = run("win_ewma_time")
      .select("user_id", "ewma_last").as[(Long, Double)].collect().toMap
    val events = Tables(spark, sf, "events")
      .where(col("user_id").isNotNull)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("sec"), col("value"))
      .as[(Long, Long, Long, Double)].collect()
    val want = events.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2))
      var s = 0.0; var prev = -1L
      sorted.foreach { case (_, _, sec, v) =>
        s = if (prev < 0) v else v + 3600.0 / (3600.0 + (sec - prev)) * s
        prev = sec
      }
      u -> math.floor(s * 1e6) / 1e6
    }
    assert(got == want)
  }

  test("llm_redact_lexicon == JVM regex recomputation") {
    val got = run("llm_redact_lexicon")
      .select("source", "total_hits", "chars_redacted")
      .as[(String, Long, Long)].collect()
      .map { case (k, h, c) => k -> ((h, c)) }.toMap
    val p = java.util.regex.Pattern.compile("\\b(key|value|table)\\b")
    val want = Tables(spark, sf, "documents")
      .select("source", "text").as[(String, String)].collect()
      .groupBy(_._1).map { case (src, rows) =>
        var hits = 0L; var chars = 0L
        rows.foreach { case (_, text) =>
          val m = p.matcher(text)
          while (m.find()) { hits += 1; chars += m.end() - m.start() }
        }
        src -> ((hits, chars))
      }
    assert(got == want)
    assert(got.values.map(_._1).sum > 0, "lexicon must actually occur — an all-zero corpus pins nothing")
  }

  test("llm_ttr_hapax == JVM recomputation on one source") {
    val got = run("llm_ttr_hapax")
      .where(col("source") === "src0")
      .select("n_tokens", "n_types", "n_hapax")
      .as[(Long, Long, Long)].head()
    val toks = Tables(spark, sf, "documents")
      .where(col("source") === "src0")
      .select("text").as[String].collect()
      .flatMap(_.split(" ", -1))
    val cnt = toks.groupBy(identity).map { case (_, v) => v.length }
    assert(got == ((toks.length.toLong, cnt.size.toLong,
      cnt.count(_ == 1).toLong)))
  }

  test("llm_zipf_slope: planted near-Zipf falls out with slope ~ -1 on the real corpus fit machinery") {
    val row = run("llm_zipf_slope").head()
    val slope = row.getAs[Double]("zipf_slope")
    // the sf0.001 vocabulary is smaller than the top-100 cap
    assert(row.getAs[Long]("n_terms") >= 20L)
    // the synthetic corpus is word-salad from a small vocabulary — the
    // fit must be a finite, negative, non-degenerate slope
    assert(slope < 0.0 && slope > -3.0, s"slope $slope out of range")
  }

  test("llm_shard_assign: deterministic, complete, near-balanced") {
    val a = run("llm_shard_assign").collect()
    val b = run("llm_shard_assign").collect()
    assert(a.toSeq == b.toSeq, "hash sharding must be re-run-stable")
    assert(a.map(_.getAs[Long]("shard")).toSet == (0L until 16L).toSet)
    val balances = a.map(_.getAs[Double]("balance"))
    assert(balances.forall(x => x > 0.5 && x < 1.5),
      s"uniform-hash shards should be near-balanced: ${balances.mkString(",")}")
  }

  test("dq_fd_violations == JVM recomputation of the worst offenders") {
    val got = run("dq_fd_violations")
      .select("l_partkey", "n_rhs").as[(Long, Long)].collect().toSeq
    val li = Tables(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey").as[(Long, Long)].collect()
    val byPart = li.groupBy(_._1).map { case (p, xs) =>
      (p, xs.map(_._2).distinct.length.toLong, xs.length.toLong)
    }.toSeq
    val want = byPart.filter(_._2 > 1)
      .sortBy { case (p, r, n) => (-r, -n, p) }.take(10).map(x => (x._1, x._2))
    assert(got == want)
    val vRate = run("dq_fd_violations").select("violation_rate")
      .as[Double].head()
    val trueRate = byPart.count(_._2 > 1).toDouble / byPart.size
    assert(math.abs(vRate - math.floor(trueRate * 1e6) / 1e6) < 1e-9)
  }

  test("etl_ar_aging: buckets partition the open orders exactly") {
    val aging = run("etl_ar_aging")
    val total = aging.agg(sum("n_orders"), round(sum("outstanding"), 2))
      .as[(Long, Double)].head()
    val open = Tables(spark, sf, "orders")
      .where(col("o_orderstatus") =!= "F")
      .join(Tables(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey")) // inner: same as the key's join
      .agg(count(lit(1)),
        round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2))
      .as[(Long, Double)].head()
    assert(total == open, "aging buckets must partition open orders")
  }

  test("llm_dedup_cluster_sizes accounts for every vector exactly once") {
    val cs = run("llm_dedup_cluster_sizes")
    val nVecs = cs.agg(sum("n_vecs")).as[Long].head()
    assert(nVecs == Tables(spark, sf, "embeddings").count())
    // cluster_size * n_clusters == n_vecs per row, by construction
    assert(cs.where(col("cluster_size") * col("n_clusters") =!= col("n_vecs"))
      .isEmpty)
  }

  test("dq_freshness: zero lag for the globally newest type, non-negative elsewhere") {
    val f = run("dq_freshness").select("lag_seconds").as[Long].collect()
    assert(f.min == 0L)
    assert(f.forall(_ >= 0L))
  }

  // ---- round-9 continuation batch ----

  test("win_hampel == JVM median/MAD recursion over the daily series") {
    val got = run("win_hampel")
      .select("event_type", "day", "n", "med7", "mad7", "is_outlier")
      .as[(String, java.sql.Date, Long, Double, Double, Long)].collect()
    val daily = got.groupBy(_._1).view.mapValues(_.sortBy(_._2.toString))
    daily.foreach { case (_, rows) =>
      val ns = rows.map(_._3)
      rows.zipWithIndex.foreach { case ((_, _, n, med, mad, flag), i) =>
        val win = ns.slice(math.max(0, i - 6), i + 1).sorted
        val k = win.length
        val medsum = win((k + 1) / 2 - 1) + win((k + 2) / 2 - 1)
        val darr = win.map(v => math.abs(2 * v - medsum)).sorted
        val madsum = darr((k + 1) / 2 - 1) + darr((k + 2) / 2 - 1)
        assert(med == medsum / 2.0 && mad == madsum / 4.0)
        val want =
          if (k == 7 && 20000 * math.abs(2 * n - medsum) > 44478 * madsum) 1L
          else 0L
        assert(flag == want, s"hampel flag mismatch at row $i")
      }
    }
  }

  test("agg_hodges_lehmann == JVM Walsh-average median") {
    val got = run("agg_hodges_lehmann")
      .select("o_orderpriority", "n_walsh", "hl_x4")
      .as[(String, Long, Long)].collect().toSeq
    val daily = Tables(spark, sf, "orders")
      .where(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .groupBy(col("o_orderpriority").as("pri"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("c"))
      .select("pri", "c").as[(String, Long)].collect()
    val want = daily.groupBy(_._1).map { case (pri, rows) =>
      val cs = rows.map(_._2)
      val walsh = (for {
        i <- cs.indices; j <- i until cs.length
      } yield cs(i) + cs(j)).sorted
      val m = walsh.length
      (pri, m.toLong, walsh((m + 1) / 2 - 1) + walsh((m + 2) / 2 - 1))
    }.toSeq.sortBy(_._1)
    assert(got.sortBy(_._1) == want)
  }

  test("dq_embedding_norms == JVM tick-norm recomputation, full coverage") {
    val got = run("dq_embedding_norms")
      .select("label", "n_vecs", "min_norm2_ticks", "max_norm2_ticks")
      .as[(Long, Long, Long, Long)].collect()
      .map { case (l, n, mn, mx) => l -> ((n, mn, mx)) }.toMap
    val vecs = Tables(spark, sf, "embeddings")
      .select(col("label").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect()
    // HALF_UP away from zero — the engines' round(), not math.round (which
    // rounds .5 toward +inf and would drift on negative components)
    def tick(v: Float): Long = BigDecimal(v.toDouble * 1e7)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val want = vecs.groupBy(_._1).map { case (l, rows) =>
      val n2s = rows.map { case (_, e) =>
        e.map(v => { val t = tick(v); t * t }).sum
      }
      l -> ((rows.length.toLong, n2s.min, n2s.max))
    }
    assert(got == want)
    assert(got.values.map(_._1).sum ==
      Tables(spark, sf, "embeddings").count())
  }

  test("etl_seasonality_strength stays in [0,1] and covers every stream") {
    val got = run("etl_seasonality_strength")
      .select("event_type", "n_days", "f_trend", "f_seasonal")
      .as[(String, Long, Double, Double)].collect()
    val types = Tables(spark, sf, "events")
      .select("event_type").distinct().as[String].collect().toSet
    assert(got.map(_._1).toSet == types)
    got.foreach { case (_, n, ft, fs) =>
      assert(n > 0 && ft >= 0.0 && ft <= 1.0 && fs >= 0.0 && fs <= 1.0)
    }
    spark.catalog.clearCache() // the key persists the daily trend frame
  }

  test("graph_clustering_by_degree: bucket triangle mass == 3x global count") {
    val buckets = run("graph_clustering_by_degree")
    val sumTri = buckets.agg(sum("sum_tri")).as[Long].head()
    val global = run("graph_triangles")
      .select("n_triangles").as[Long].head()
    assert(sumTri == 3 * global,
      "each triangle must be credited to exactly its three corners")
    buckets.select("sum_tri", "sum_wedges").as[(Long, Long)].collect()
      .foreach { case (t3, w) => assert(t3 <= w, "cc must be <= 1") }
    // the key persists the shared 1997 edge lineage — drop it so a
    // later suite's plan-shape assertions (PlanSpec scan counts) don't
    // see an InMemoryRelation swapped under the same lineage
    spark.catalog.clearCache()
  }

  test("etl_entity_resolution == JVM blocked levenshtein recomputation") {
    val got = run("etl_entity_resolution")
      .select("n_name", "n_candidates", "n_matches")
      .as[(String, Long, Long)].collect()
      .map { case (n, c, m) => n -> ((c, m)) }.toMap
    val nations = Tables(spark, sf, "nation")
      .select(col("n_nationkey").cast("long"), col("n_name"))
      .as[(Long, String)].collect().toMap
    val custs = Tables(spark, sf, "customer")
      .select(col("c_custkey").cast("long"), col("c_name"),
        col("c_nationkey").cast("long"))
      .as[(Long, String, Long)].collect()
    def lev(a: String, bStr: String): Int = {
      val d = Array.tabulate(a.length + 1, bStr.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to bStr.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == bStr(j - 1)) 0 else 1))
      d(a.length)(bStr.length)
    }
    // take(16), not substring(0, 16): SQL substring is length-safe, and
    // the mirror must not throw if the generator ever emits a short name
    val want = custs.groupBy(c => (c._3, c._2.take(16)))
      .toSeq.flatMap { case ((nk, _), rows) =>
        val sorted = rows.sortBy(_._1)
        for {
          i <- sorted.indices; j <- (i + 1) until sorted.length
        } yield (nk, lev(sorted(i)._2, sorted(j)._2) <= 1)
      }
      .groupBy(_._1).map { case (nk, ps) =>
        nations(nk) -> ((ps.size.toLong, ps.count(_._2).toLong))
      }
    assert(got == want)
  }

  test("agg_anderson_darling == JVM fold over the value-sorted bins") {
    val got = run("agg_anderson_darling")
      .select("event_type", "n_ref", "n_cur", "ad_stat")
      .as[(String, Long, Long, Double)].collect()
      .map { case (t, a, b, s) => t -> ((a, b, s)) }.toMap
    val split = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val rows = Tables(spark, sf, "events")
      .where(col("value").isNotNull)
      .select(col("event_type"), col("value"), col("ts"))
      .as[(String, Double, java.sql.Timestamp)].collect()
    val want = rows.groupBy(_._1).map { case (et, rs) =>
      val bins = rs.groupBy(_._2).toSeq.sortBy(_._1).map { case (_, g) =>
        (g.count(_._3.before(split)).toDouble,
          g.count(!_._3.before(split)).toDouble)
      }
      val n1 = bins.map(_._1).sum
      val n2 = bins.map(_._2).sum
      val n = n1 + n2
      var m = 0.0; var bCum = 0.0; var acc = 0.0
      bins.foreach { case (c1, c2) =>
        m += c1; bCum += c1 + c2
        if (bCum < n) {
          val x = n * m - n1 * bCum
          acc += (c1 + c2) * x * x / (bCum * (n - bCum))
        }
      }
      et -> ((n1.toLong, n2.toLong,
        math.floor(acc / n1 / n2 / n * 1e6) / 1e6))
    }
    assert(got == want)
  }

  test("graph_richclub: monotone core shrinkage, edges within node budget") {
    val rc = run("graph_richclub")
      .select("k", "n_nodes", "n_edges", "phi")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    rc.sliding(2).foreach {
      case Array((_, na, ea, _), (_, nb, eb, _)) =>
        assert(nb <= na && eb <= ea, "richer clubs can only shrink")
      case _ =>
    }
    rc.foreach { case (_, nk, ek, phi) =>
      assert(ek <= nk * (nk - 1) / 2, "edges exceed the clique budget")
      assert(phi >= 0.0 && phi <= 1.0)
    }
    spark.catalog.clearCache() // the key persists the shared edge lineage
  }

  test("llm_neardup_prune_quality: same groups as min-id prune, one " +
    "best-quality survivor per group") {
    val byQ = run("llm_neardup_prune_quality")
      .select("doc_id", "group_id", "quality", "is_kept")
      .as[(Long, Long, Double, Boolean)].collect()
    val byId = run("llm_neardup_prune")
      .select("doc_id", "group_id").as[(Long, Long)].collect().toMap
    // survivor POLICY changes; the group structure must not
    assert(byQ.map(r => r._1 -> r._2).toMap == byId)
    byQ.groupBy(_._2).foreach { case (_, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, "exactly one survivor per group")
      val best = members.minBy(m => (-m._3, m._1))
      assert(kept.head._1 == best._1,
        "survivor must be the (quality DESC, id) argmax")
    }
    spark.catalog.clearCache() // the chain persists the band frames
  }

  test("llm_cooccur_window == JVM windowed pair recomputation") {
    val got = run("llm_cooccur_window")
      .select("a", "b", "nab", "pmi")
      .as[(String, String, Long, Double)].collect().toSeq
    val texts = Tables(spark, sf, "documents")
      .select("text").as[String].collect()
    val pairs = texts.flatMap { t =>
      val w = t.split(" ", -1)
      for {
        i <- w.indices; j <- (i + 1) to math.min(i + 3, w.length - 1)
        if w(i) != w(j)
      } yield (if (w(i) < w(j)) (w(i), w(j)) else (w(j), w(i)))
    }
    val nab = pairs.groupBy(identity).view.mapValues(_.size.toLong)
    val marg = pairs.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).view.mapValues(_.size.toLong)
    val n = pairs.size.toDouble
    val want = nab.toSeq.filter(_._2 >= 5).map { case ((a, b), c) =>
      // HALF_UP like the engines' round(), not rint (half-even)
      (a, b, c, BigDecimal(math.log(c * n / (marg(a) * marg(b))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(r => (-r._4, r._1, r._2)).take(20)
    assert(got == want)
  }

  test("etl_markov_steady == JVM integer power iteration, mass conserved") {
    val got = run("etl_markov_steady")
      .select("event_type", "steady_micro")
      .as[(String, Long)].collect().toMap
    val trans: Seq[(String, String)] = Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
      .groupBy(_._1).values.flatMap { rows =>
        val seq = rows.sortBy(r => (r._2.getTime, r._3)).map(_._4).toSeq
        seq.zip(seq.drop(1))
      }.toSeq
    val e = trans.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rt = trans.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val nodes = (e.keys.map(_._1) ++ e.keys.map(_._2)).toSeq.distinct.sorted
    var v = nodes.map(_ -> 1000000000000L / nodes.length).toMap
    for (_ <- 1 to 3)
      v = nodes.map { ty =>
        ty -> e.collect { case ((s0, d0), n) if d0 == ty =>
          v(s0) * n / rt(s0)
        }.sum
      }.toMap
    assert(got == v)
    // integer flooring only ever LEAKS mass, never creates it
    assert(got.values.sum <= 1000000000000L)
    assert(got.values.sum > 1000000000000L - 1000000L)
  }

  test("dq_label_balance: consistent with per-label norms audit") {
    val b = run("dq_label_balance")
      .select("n_labels", "n_vecs", "max_n", "min_n", "max_share",
        "imbalance", "entropy")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    val perLabel = run("dq_embedding_norms")
      .select("n_vecs").as[Long].collect()
    assert(b._1 == perLabel.length && b._2 == perLabel.sum)
    assert(b._3 == perLabel.max && b._4 == perLabel.min)
    assert(b._5 >= 1.0 / b._1 && b._5 <= 1.0)
    assert(b._6 >= 1.0)
    assert(b._7 >= 0.0 && b._7 <= math.log(b._1.toDouble) + 1e-9)
  }
}
