package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions hook makes the native vector expressions
  * reachable from pure SQL — the full-surface claim of SURVEY.md §2.L.
  */
class ExtensionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("cosine_sim and vector_dot are SQL-callable via GraftExtensions") {
    val row = spark.sql(
      """SELECT
        |  cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |             CAST(array(0.0, 1.0) AS ARRAY<FLOAT>)) AS orth,
        |  cosine_sim(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |             CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS same,
        |  vector_dot(CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
        |             CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS dot
        |""".stripMargin).head()
    assert(row.getDouble(0) == 0.0)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-12)
    assert(row.getDouble(2) == 11.0)
  }

  test("portable_hash is SQL-callable and matches the Column API") {
    import org.apache.spark.sql.functions.col
    val viaSql = spark.sql("SELECT portable_hash('hello world') AS h").head().getLong(0)
    import spark.implicits._
    val viaCol = Seq("hello world").toDF("t")
      .select(graft.functions.PortableHash.pHash(col("t"))).head().getLong(0)
    assert(viaSql == viaCol)
    // known value: int(md5('hello world')[:15], 16) — same as the DuckDB twin
    assert(viaSql == 426544247714475757L)
  }

  test("portable_hash(non-string) hashes the STRING form on all three surfaces") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // SQL surface on a BIGINT must equal the Column API on its string cast
    // (and hence DuckDB's md5 of the VARCHAR form) — NOT the md5 of the
    // 8-byte binary encoding.
    val viaSql = spark.sql("SELECT portable_hash(CAST(12345 AS BIGINT)) AS h")
      .head().getLong(0)
    val viaCol = Seq(12345L).toDF("v")
      .select(graft.functions.PortableHash.pHash(col("v").cast("string")))
      .head().getLong(0)
    assert(viaSql == viaCol)
  }

  test("hll_sketch / hll_merge / hll_estimate are SQL-callable") {
    import org.apache.spark.sql.functions.col
    Tables(spark, "/root/testdata/sf0.001", "events")
      .createOrReplaceTempView("ev_hll_sql")
    // one-pass estimate via SQL == Column API estimate
    val viaSql = spark.sql(
      "SELECT hll_estimate(hll_sketch(user_id)) FROM ev_hll_sql")
      .head().getLong(0)
    val viaCol = Tables(spark, "/root/testdata/sf0.001", "events")
      .agg(org.apache.spark.sql.graft.HllFunctions.hllEstimate(
        org.apache.spark.sql.graft.HllFunctions.hllSketch(col("user_id"))))
      .head().getLong(0)
    assert(viaSql == viaCol && viaSql > 0)
    // per-group sketches merged via SQL == the one-pass sketch (lossless)
    val merged = spark.sql(
      """SELECT hll_estimate(hll_merge(sk)) FROM (
        |  SELECT event_type, hll_sketch(user_id) AS sk
        |  FROM ev_hll_sql GROUP BY event_type)""".stripMargin)
      .head().getLong(0)
    assert(merged == viaSql)
    // explicit precision argument
    val p8 = spark.sql(
      "SELECT hll_estimate(hll_sketch(user_id, 8)) FROM ev_hll_sql")
      .head().getLong(0)
    val exact = spark.sql("SELECT count(DISTINCT user_id) FROM ev_hll_sql")
      .head().getLong(0)
    assert(math.abs(p8 - exact).toDouble / exact < 0.2) // rsd ~6.5% at p=8
  }

  test("kmv sketch family is SQL-callable; merge lossless; intersect = exact below k") {
    Tables(spark, "/root/testdata/sf0.001", "events")
      .createOrReplaceTempView("ev_kmv_sql")
    // pre-hashed input: the portable_hash SQL function (KMV's contract)
    val onePass = spark.sql(
      """SELECT kmv_estimate(kmv_sketch(portable_hash(user_id)))
        |FROM ev_kmv_sql""".stripMargin).head().getDouble(0)
    val exact = spark.sql(
      "SELECT count(DISTINCT user_id) FROM ev_kmv_sql").head().getLong(0)
    // sf0.001 has < 256 distinct users → exact regime
    assert(onePass == exact.toDouble, s"kmv exact regime: $onePass vs $exact")
    // per-group sketches merged via SQL == one-pass (k-smallest-of-union)
    val merged = spark.sql(
      """SELECT kmv_estimate(kmv_merge(sk)) FROM (
        |  SELECT event_type, kmv_sketch(portable_hash(user_id)) AS sk
        |  FROM ev_kmv_sql GROUP BY event_type)""".stripMargin)
      .head().getDouble(0)
    assert(merged == onePass)
    // pairwise union + intersection over two type sketches: below k both
    // are EXACT, so inclusion-exclusion must close exactly
    val r = spark.sql(
      """SELECT kmv_estimate(a.sk) AS ea, kmv_estimate(b.sk) AS eb,
        |       kmv_intersect_est(a.sk, b.sk) AS ei,
        |       kmv_estimate(kmv_union_pair(a.sk, b.sk)) AS eu,
        |       kmv_theta(a.sk) AS ta
        |FROM (SELECT kmv_sketch(portable_hash(user_id)) AS sk
        |      FROM ev_kmv_sql WHERE event_type = 'click') a,
        |     (SELECT kmv_sketch(portable_hash(user_id)) AS sk
        |      FROM ev_kmv_sql WHERE event_type = 'view') b""".stripMargin)
      .head()
    assert(r.getDouble(4) == 1.0, "below-k sketch must have theta = 1")
    assert(r.getDouble(0) + r.getDouble(1) - r.getDouble(2) == r.getDouble(3),
      s"inclusion-exclusion must close exactly below k: $r")
    // small-k estimator regime engages and stays within 4·rsd
    val est32 = spark.sql(
      """SELECT kmv_estimate(kmv_sketch(portable_hash(event_id), 32))
        |FROM ev_kmv_sql""".stripMargin).head().getDouble(0)
    val exactIds = spark.sql(
      "SELECT count(DISTINCT event_id) FROM ev_kmv_sql").head().getLong(0)
    assert(exactIds > 32, "fixture must push event_id past k=32")
    assert(math.abs(est32 - exactIds) <= 4.0 * exactIds / math.sqrt(30.0),
      s"kmv k=32 estimate $est32 vs exact $exactIds")
  }

  test("kmv r8 hardening: all-NULL merge group decodes as empty; " +
    "non-long input is an analysis error; out-of-range hash fails loudly") {
    Tables(spark, "/root/testdata/sf0.001", "events")
      .createOrReplaceTempView("ev_kmv_guard")
    // a group whose kmv_merge inputs are all NULL evals to the empty
    // sentinel — downstream decodes must read it as the empty sketch
    val r = spark.sql(
      """SELECT kmv_estimate(kmv_merge(sk)) AS est,
        |       kmv_theta(kmv_merge(sk)) AS th,
        |       kmv_intersect_est(kmv_merge(sk), kmv_merge(sk)) AS ei
        |FROM (SELECT CAST(NULL AS BINARY) AS sk FROM ev_kmv_guard)"""
        .stripMargin).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 1.0 &&
      r.getDouble(2) == 0.0, s"empty-sentinel decode: $r")
    // a STRING child must fail at analysis (ExpectsInputTypes), not with
    // a runtime ClassCastException mid-job
    val analysisErr = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT kmv_sketch(event_type) FROM ev_kmv_guard").head()
    }
    assert(analysisErr.getMessage.toLowerCase.contains("bigint") ||
      analysisErr.getMessage.toLowerCase.contains("type"), analysisErr.getMessage)
    // negative input violates the pre-hashed [0, 2^bits) contract — the
    // aggregate rejects it instead of silently corrupting θ
    val runtimeErr = intercept[Exception] {
      spark.sql("SELECT kmv_estimate(kmv_sketch(-1L))").head()
    }
    val chain = Iterator.iterate(runtimeErr: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.toString).mkString("; ")
    assert(chain.contains("outside declared domain"), chain)
  }

  test("kll_sketch / kll_merge / kll_quantile are SQL-callable") {
    import org.apache.spark.sql.functions.col
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    ev.createOrReplaceTempView("ev_kll_sql")
    val values = ev.select("value").na.drop()
      .collect().map(_.getDouble(0)).sorted
    val n = values.length.toDouble
    def rankErr(v: Double, q: Double): Double = {
      val lo = values.count(_ < v) / n
      val hi = values.count(_ <= v) / n
      if (q < lo) lo - q else if (q > hi) q - hi else 0.0
    }
    val viaSql = spark.sql(
      "SELECT kll_quantile(kll_sketch(value), 0.5) FROM ev_kll_sql")
      .head().getDouble(0)
    assert(rankErr(viaSql, 0.5) < 0.03, s"SQL median=$viaSql")
    // per-group sketches merged via SQL track the global median too
    val merged = spark.sql(
      """SELECT kll_quantile(kll_merge(sk), 0.5) FROM (
        |  SELECT event_type, kll_sketch(value) AS sk
        |  FROM ev_kll_sql GROUP BY event_type)""".stripMargin)
      .head().getDouble(0)
    assert(rankErr(merged, 0.5) < 0.03, s"SQL merged median=$merged")
    // explicit k argument composes, and the SQL surface == the Column API
    // given the identical deterministic build order of a single partition
    val k64 = spark.sql(
      "SELECT kll_quantile(kll_sketch(value, 64), 0.9) FROM ev_kll_sql")
      .head().getDouble(0)
    assert(rankErr(k64, 0.9) < 0.08, s"k=64 p90=$k64")
    // row-wise pair merge from SQL: two half-sketches merged scalar-side
    // must track the global median like the aggregate merge does
    val paired = spark.sql(
      """SELECT kll_quantile(kll_merge_pair(a.sk, b.sk), 0.5) FROM
        |  (SELECT kll_sketch(value) AS sk FROM ev_kll_sql WHERE event_id % 2 = 0) a,
        |  (SELECT kll_sketch(value) AS sk FROM ev_kll_sql WHERE event_id % 2 = 1) b""".stripMargin)
      .head().getDouble(0)
    assert(rankErr(paired, 0.5) < 0.03, s"pair-merged median=$paired")
  }

  test("mg_sketch / mg_merge / mg_topk are SQL-callable") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    ev.createOrReplaceTempView("ev_mg_sql")
    // 5 event types ≪ default k=64 → the sketch is EXACT: top-1 from SQL
    // must equal the exact groupBy top-1
    val exact = ev.groupBy("event_type").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (t, c) => (-c, t) }
    val top = spark.sql(
      """SELECT t.item, t.est
        |FROM (SELECT mg_topk(mg_sketch(event_type), 2) AS top FROM ev_mg_sql)
        |LATERAL VIEW inline(top) t""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == exact.take(2).toSeq)
    // per-group sketches merged via SQL reproduce the same exact top-1
    val merged = spark.sql(
      """SELECT mg_topk(mg_merge(sk), 1) AS top FROM (
        |  SELECT user_id % 7 AS shard, mg_sketch(event_type) AS sk
        |  FROM ev_mg_sql GROUP BY user_id % 7)""".stripMargin)
      .selectExpr("inline(top)")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(merged.toSeq == exact.take(1).toSeq)
    // explicit k argument composes (k=1 keeps only a plurality candidate)
    val k1 = spark.sql(
      "SELECT size(mg_topk(mg_sketch(event_type, 1), 5)) FROM ev_mg_sql")
      .head().getInt(0)
    assert(k1 <= 1)
  }

  test("bloom_build / bloom_merge / bloom_contains are SQL-callable") {
    val ev = Tables(spark, "/root/testdata/sf0.001", "events")
    ev.createOrReplaceTempView("ev_bloom_sql")
    // filter built over the distinct user ids; every real id must probe
    // true, a fresh id should probe false at 128 KB / ~60 keys
    val hits = spark.sql(
      """SELECT count(*) FROM ev_bloom_sql,
        |  (SELECT bloom_build(user_id) AS bf FROM ev_bloom_sql)
        |WHERE bloom_contains(bf, user_id)""".stripMargin).head().getLong(0)
    assert(hits == ev.count())
    val miss = spark.sql(
      """SELECT bloom_contains(bf, CAST(1000000000 AS BIGINT))
        |FROM (SELECT bloom_build(user_id) AS bf FROM ev_bloom_sql)""".stripMargin)
      .head().getBoolean(0)
    assert(!miss)
    // per-shard filters merged via SQL behave like the one-pass filter
    val mergedHits = spark.sql(
      """SELECT count(*) FROM ev_bloom_sql,
        |  (SELECT bloom_merge(bf) AS bf FROM (
        |     SELECT user_id % 5 AS shard, bloom_build(user_id, 65536, 4) AS bf
        |     FROM ev_bloom_sql GROUP BY user_id % 5))
        |WHERE bloom_contains(bf, user_id)""".stripMargin).head().getLong(0)
    assert(mergedHits == ev.count())
  }

  test("SQL surface composes with tables (top pair via SQL only)") {
    Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .createOrReplaceTempView("emb_sql")
    val n = spark.sql(
      """SELECT a.vec_id, b.vec_id,
        |       cosine_sim(a.embedding, b.embedding) AS sim
        |FROM emb_sql a JOIN emb_sql b ON a.vec_id < b.vec_id
        |ORDER BY sim DESC LIMIT 5""".stripMargin).count()
    assert(n == 5)
  }

  test("approx-distinct rule: off by default, on rewrites to HLL within bound") {
    Tables(spark, "/root/testdata/sf0.01", "events")
      .createOrReplaceTempView("ev_approx")
    val q = """SELECT event_type, count(DISTINCT user_id) AS u
              |FROM ev_approx GROUP BY event_type ORDER BY event_type"""
      .stripMargin
    val exact = spark.sql(q).collect().map(r => r.getString(0) -> r.getLong(1))
    // default off: the plan must carry the exact distinct count
    val offPlan = spark.sql(q).queryExecution.optimizedPlan.toString
    assert(!offPlan.contains("hll_sketch"), s"rule fired while off:\n$offPlan")
    spark.conf.set("spark.graft.approx.countDistinct", "true")
    try {
      val df = spark.sql(q)
      val onPlan = df.queryExecution.optimizedPlan.toString
      assert(onPlan.contains("hll_sketch"),
        s"rule did not rewrite the distinct:\n$onPlan")
      assert(!onPlan.toLowerCase.contains("count(distinct"),
        s"exact distinct survived the rewrite:\n$onPlan")
      val approx = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // p=12 → ~1.6% standard error; 5% is a generous determinism-safe bound
      exact.foreach { case (k, ex) =>
        val ap = approx(k)
        assert(math.abs(ap - ex).toDouble / ex < 0.05,
          s"$k: approx $ap vs exact $ex")
      }
      // FILTER clauses must survive the rewrite
      val f = spark.sql(
        """SELECT count(DISTINCT user_id)
          |         FILTER (WHERE event_type = 'purchase') AS u
          |FROM ev_approx""".stripMargin)
      assert(f.queryExecution.optimizedPlan.toString.contains("hll_sketch"))
      val exactF = spark.sql(
        """SELECT count(DISTINCT user_id) FROM ev_approx
          |WHERE event_type = 'purchase'""".stripMargin)
      // compare under the same rewrite: both are sketches of the same set
      assert(f.head().getLong(0) == exactF.head().getLong(0))
      // multi-argument distinct tuples stay exact (scope guard)
      val multi = spark.sql(
        "SELECT count(DISTINCT user_id, event_type) FROM ev_approx")
      assert(!multi.queryExecution.optimizedPlan.toString.contains("hll_sketch"))
    } finally spark.conf.set("spark.graft.approx.countDistinct", "false")
  }

  test("cartesian guard: off by default, rejects unbounded products, allows scalar attaches") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val a = spark.range(100).toDF("a")
    val b = spark.range(100).toDF("b")
    // off (default): cross joins analyze fine
    assert(a.crossJoin(b).count() == 10000)
    spark.conf.set("spark.graft.guard.noCartesian", "true")
    try {
      // unconditional product of two unbounded frames → analysis error
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        a.crossJoin(b).collect()
      }
      assert(e.getMessage.contains("noCartesian"))
      // conditioned joins unaffected
      assert(a.join(b, col("a") === col("b")).count() == 100)
      // the repo's scalar-attach idiom (crossJoin of an ungrouped
      // aggregate) is provably one row and passes
      val tot = b.agg(count(lit(1)).as("n"))
      assert(a.crossJoin(broadcast(tot)).count() == 100)
      // literal frames and limits are bounded too
      assert(a.crossJoin(Seq(1, 2).toDF("x")).count() == 200)
      assert(a.crossJoin(b.limit(3)).count() == 300)
    } finally spark.conf.set("spark.graft.guard.noCartesian", "false")
  }
}
