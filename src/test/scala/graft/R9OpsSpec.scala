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
}
