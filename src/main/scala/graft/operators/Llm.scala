package graft.operators

import graft.{Q, Tables}
import graft.functions.{Aggregators, PortableHash}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions.{cosineSim, vectorDot}

/** §2.K LLM-data-pipeline operators (SURVEY.md; north star). The patterns
  * that matter at 100 TB:
  *  - text ops are pure codegen expression chains over the scan (no UDFs);
  *  - similarity ops broadcast the smaller side and keep the pair predicate
  *    inside the join so Catalyst prunes before the cosine is evaluated;
  *  - cosine is a native codegen `Expression` (org.apache.spark.sql.graft) —
  *    no per-row array allocation;
  *  - MinHash/LSH turn O(n²) near-dup search into an equi-join on band
  *    keys — the only shuffle is on the band key, and band width r scales
  *    with corpus size to keep bucket sizes bounded;
  *  - the centroid is a typed `Aggregator` with map-side partials.
  */
object Llm {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")
  private def emb(s: SparkSession, d: String) = Tables(s, d, "embeddings")

  /** lowercase → strip non-alnum → collapse runs of spaces → trim —
    * shared with the streaming ingest dedup via [[graft.functions
    * .TextNorm]] so batch and stream keys can never diverge.
    */
  private def normText(c: Column): Column = graft.functions.TextNorm.normText(c)

  private val normSql = graft.functions.TextNorm.normSql

  /** 3-token shingles per doc (word-level, space-joined), with
    * multiplicity — via the custom [[ShingleGenerator]] UDTF, which emits
    * rows directly instead of materializing a per-row shingle array
    * (equivalence with the transform+explode formulation is pinned in
    * ShingleGeneratorSpec).
    */
  private def shingleDfRaw(d: DataFrame): DataFrame =
    d.select(
      col("doc_id"),
      org.apache.spark.sql.graft.ShingleGenerator
        .shingles(split(col("text"), " "), 3).as("s"))

  /** Distinct 3-token shingles per doc. */
  private def shingleDf(d: DataFrame): DataFrame = shingleDfRaw(d).distinct()

  /** Per-doc shingle sets in the All-Pairs/PPJoin canonical token order
    * (ascending document frequency, token text as tie-break) plus the
    * τ-prefix length p = n - ⌈τ·n⌉ + 1. Rarest-first ordering is what makes
    * the prefix join selective: the tokens a record exposes are the ones
    * fewest other records contain (Bayardo et al., WWW'07; Xiao et al.,
    * WWW'08). One vocabulary-keyed shuffle computes the frequencies; the
    * per-doc sort is in-row (`sort_array`), never a global sort.
    */
  private[graft] def ppjoinDocFrame(docsDf: DataFrame, tau: Double): DataFrame = {
    val sh = shingleDf(docsDf)
    val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
    sh.join(dfreq, Seq("s"))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("s")))).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("p", (col("n") - ceil(lit(tau) * col("n")) + lit(1)).cast("int"))
  }

  /** Candidate pairs from the prefix filter: two records can reach
    * Jaccard ≥ τ only if their τ-prefixes share a token (prefix-filter
    * lemma: |x∩y| ≥ ⌈τ·max(|x|,|y|)⌉ forces the first |·|-⌈τ·|·|⌉+1 tokens
    * of each, in ANY shared total order, to intersect) — so the equi-join
    * on prefix tokens has NO false negatives and the verify stage makes the
    * result exactly the brute-force threshold join. The length filter
    * τ·|x| ≤ |y| ≤ |x|/τ is likewise implied by J ≥ τ.
    *
    * PPJoin's POSITIONAL filter stacks on top: J ≥ τ needs overlap
    * ≥ ⌈τ/(1+τ)·(|x|+|y|)⌉, and for the pair's FIRST shared prefix token
    * (positions i, j in the canonical order) no common token precedes it
    * in either record (a common token before i in x sits before j in y
    * too — the shared order aligns prefixes), so overlap ≤ 1 +
    * min(|x|−i, |y|−j). The bound is largest at the first match and
    * shrinks with i+j, so keeping pairs where ANY shared token passes ==
    * keeping pairs whose first match passes: still zero false negatives,
    * while shared-but-deep prefix tokens stop generating candidates
    * (sf0.1: 310k → the verify stage was the key's whole cost).
    */
  private[graft] def ppjoinCandidates(docFrame: DataFrame, tau: Double): DataFrame = {
    val prefix = docFrame.select(col("doc_id"), col("n"),
      posexplode(expr("transform(slice(toks, 1, p), x -> x.s)")))
      .withColumnRenamed("col", "tok")
    val overlapNeeded =
      ceil((col("a.n") + col("b.n")) * lit(tau / (1 + tau)))
    prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id") &&
        col("a.n") * lit(tau) <= col("b.n") &&
        col("b.n") * lit(tau) <= col("a.n") &&
        lit(1) + least(col("a.n") - (col("a.pos") + 1),
          col("b.n") - (col("b.pos") + 1)) >= overlapNeeded)
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
  }

  /** The exact verify stage: one in-row `array_intersect` per candidate
    * pair against the persisted doc frame. */
  private def ppjoinVerify(
      docFrame: DataFrame, cand: DataFrame, tau: Double): DataFrame = {
    val arrs = docFrame.select(col("doc_id"),
      expr("transform(toks, x -> x.s)").as("ts"), col("n"))
    cand
      .join(arrs.as("x"), col("d1") === col("x.doc_id"))
      .join(arrs.as("y"), col("d2") === col("y.doc_id"))
      .withColumn("inter",
        size(array_intersect(col("x.ts"), col("y.ts"))).cast("long"))
      .withColumn("jaccard",
        round(col("inter") * 1.0 / (col("x.n") + col("y.n") - col("inter")), 6))
      .where(col("jaccard") >= tau)
      .select(col("d1"), col("d2"), col("inter"), col("jaccard"))
      .orderBy("d1", "d2")
  }

  /** Blocks persisted by the MOST RECENT prefix/auto/shared-shingle
    * sim-join invocation. The multi-reference reuse inside one call needs
    * the persist (the doc/shingle frame feeds the prefix explode and both
    * verify sides), but a returned lazy DataFrame gives no "materialized,
    * safe to unpersist" hook — so the lifecycle is scoped per invocation:
    * each new call releases the previous call's blocks, and
    * [[releaseSimJoinCaches]] releases the last. A long-lived session
    * therefore holds at most ONE invocation's working set, never an
    * unbounded accumulation (the 200k-doc ScaleSmoke previously needed a
    * manual clearCache). Contract: the previous call's RESULT must be
    * materialized before the next call — the natural sequential use.
    */
  private val simJoinCaches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Must run BEFORE the new call's persist: a repeated identical plan
    * re-persists into the SAME cache entry (cache-manager plan matching),
    * so unpersisting the old frame after would evict the new one too. */
  private def registerSimJoinCaches(fresh: DataFrame*): Unit = synchronized {
    simJoinCaches ++= fresh
  }

  /** Release the blocks persisted by the latest sim-join invocation. */
  def releaseSimJoinCaches(): Unit = synchronized {
    simJoinCaches.foreach(_.unpersist(blocking = false))
    simJoinCaches.clear()
  }

  /** Prefix-filtered EXACT Jaccard join at threshold τ — candidates from
    * [[ppjoinCandidates]], then [[ppjoinVerify]] (the doc frame is
    * persisted once and feeds the prefix explode and both verify sides).
    * Result-identical to the all-shared-shingle-pairs plan, so the keys
    * share an oracle shape.
    */
  private[graft] def prefixJaccardJoin(docsDf: DataFrame, tau: Double): DataFrame = {
    releaseSimJoinCaches()
    val docFrame = ppjoinDocFrame(docsDf, tau).persist()
    registerSimJoinCaches(docFrame)
    ppjoinVerify(docFrame, ppjoinCandidates(docFrame, tau), tau)
  }

  /** The no-prefix exact plan: every shared-shingle pair, intersection
    * counted by the join itself (llm_ngram_jaccard's shape with a τ cut).
    * No canonical-order doc frame, no per-pair array work — cheaper when
    * prefixes wouldn't prune (small vocabularies make prefix tokens
    * common). */
  private[graft] def sharedShingleThreshold(
      docsDf: DataFrame, tau: Double): DataFrame = {
    releaseSimJoinCaches()
    val sh = shingleDf(docsDf).persist() // feeds sizes + both pair sides
    registerSimJoinCaches(sh)
    sharedShingleThresholdFrom(sh, tau)
  }

  /** Core of [[sharedShingleThreshold]] over an ALREADY-persisted shingle
    * frame — cache lifecycle stays with the caller. */
  private def sharedShingleThresholdFrom(
      sh: DataFrame, tau: Double): DataFrame = {
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pr = sh.as("a")
      .join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    pr.join(sz.as("x"), col("d1") === col("x.doc_id"))
      .join(sz.as("y"), col("d2") === col("y.doc_id"))
      .withColumn("jaccard",
        round(col("inter") * 1.0 / (col("x.n") + col("y.n") - col("inter")), 6))
      .where(col("jaccard") >= tau)
      .select(col("d1"), col("d2"), col("inter"), col("jaccard"))
      .orderBy("d1", "d2")
  }

  /** ADAPTIVE exact similarity join: probe the corpus's VOCABULARY SHAPE
    * first — shared-token pair mass Σ df·(df−1)/2 over the distinct
    * shingle frame, scaled by (1−τ)² for the prefix fraction each side
    * keeps — and run the prefix+per-pair-verify plan only when the
    * estimate stays within `candBudgetPerDoc`×docs; otherwise take the
    * shared-shingle aggregation, which counts intersections inside the
    * join instead of per pair. The AQE move (decide from observed stats)
    * applied where Spark can't see: BOTH branches are exact and return
    * identical rows, so the choice is invisible to results — the declared
    * key answers the same oracle whichever branch fires. The probe costs
    * one vocabulary aggregate over the shingle frame, which stays
    * persisted and (cache-manager plan matching) is REUSED by whichever
    * branch runs — large-vocab corpora (rare prefixes, ~true-pair-count
    * candidates) take the prefix path, the 31-word harness corpus falls
    * back. A mis-estimate can only cost time, never rows.
    */
  private[graft] def simJoinThresholdAuto(
      docsDf: DataFrame, tau: Double,
      candBudgetPerDoc: Long = 32L): DataFrame = {
    releaseSimJoinCaches()
    val sh = shingleDf(docsDf).persist()
    registerSimJoinCaches(sh)
    val probe = sh.groupBy("s").agg(count(lit(1)).as("df"))
      .agg(sum(col("df") * (col("df") - 1)).as("pair_mass2"))
      .head()
    val pairMass = Option(probe.get(0)).fold(0L)(_.asInstanceOf[Long]) / 2
    val nDocs = docsDf.select("doc_id").distinct().count()
    val estCand = ((1 - tau) * (1 - tau) * pairMass).toLong
    if (estCand <= candBudgetPerDoc * math.max(nDocs, 1L)) {
      // ppjoinDocFrame re-derives shingleDf(docsDf) — the cache manager
      // matches the canonicalized plan, so the persisted frame is reused
      val docFrame = ppjoinDocFrame(docsDf, tau).persist()
      registerSimJoinCaches(docFrame)
      ppjoinVerify(docFrame, ppjoinCandidates(docFrame, tau), tau)
    } else {
      sharedShingleThresholdFrom(sh, tau)
    }
  }

  /** BPE merge-rule training over a (text) frame — see the llm_bpe_train
    * Q for the full doctrine. Returns (round, pair, merged, cnt). Each
    * round's word table and argmax are `localCheckpoint`ed (the CC-loop
    * lineage idiom): round r references round r-1 TWICE (pair count +
    * rewrite), so an unbroken lazy chain doubles the logical plan per
    * round — 2^rounds subtrees analyzed (measured: OOMs the driver at 8
    * rounds). The checkpoint truncates each round to its materialized
    * result; the frames are vocabulary-sized, so the cost is a handful
    * of tiny jobs while the fact table is still scanned exactly once.
    */
  private[graft] def bpeTrain(docsDf: DataFrame, rounds: Int): DataFrame =
    bpeLoop(docsDf, rounds)._1

  /** The trained word table: each distinct word with its final
    * '|'-delimited symbol decomposition — the APPLY side's lookup
    * (vocabulary-sized, broadcastable). */
  private[graft] def bpeWords(docsDf: DataFrame, rounds: Int): DataFrame =
    bpeLoop(docsDf, rounds)._2

  private def bpeLoop(
      docsDf: DataFrame, rounds: Int): (DataFrame, DataFrame) = {
    var words = docsDf
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"),
        concat(lit("|"), array_join(split(col("w"), ""), "|"), lit("|"))
          .as("repr"),
        col("freq"))
      .localCheckpoint()
    val merges = (1 to rounds).map { r =>
      val pairs = words
        .select(col("freq"),
          split(trim(col("repr"), "|"), "\\|").as("s"))
        .select(col("freq"), explode(expr(
          // zip_with over the two shifted slices: empty when one symbol,
          // no sequence() (whose DESCENDING stop<start behavior differs
          // from the oracle's empty range())
          "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1)," +
            " (x, y) -> concat(x, ' ', y))")).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      val best = pairs
        .orderBy(col("cnt").desc, col("pair").asc).limit(1)
        .select(col("pair"), col("cnt"),
          concat(lit("|"), regexp_replace(col("pair"), " ", "|"), lit("|"))
            .as("pat"),
          concat(lit("|"), regexp_replace(col("pair"), " ", ""), lit("|"))
            .as("rep"))
        .localCheckpoint()
      words = words.crossJoin(broadcast(best))
        .select(col("w"),
          expr("replace(replace(repr, pat, rep), pat, rep)").as("repr"),
          col("freq"))
        .localCheckpoint()
      best.select(
        lit(r.toLong).as("round"), col("pair"),
        regexp_replace(col("pair"), " ", "").as("merged"), col("cnt"))
    }
    (merges.reduce(_.unionByName(_)).orderBy("round"),
      words.select(col("w"), col("repr")))
  }

  /** The shared CTE chain of [[bpeOracle]]/[[bpeApplyOracle]]:
    * w0 → p1/b1/w1 → … — each w_r carries (w, repr, freq). */
  private def bpeOracleChain(rounds: Int): String = {
    val base =
      """WITH w0 AS (
        |  SELECT w,
        |         '|' || array_to_string(string_split(w, ''), '|') || '|' AS repr,
        |         CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w
        |)""".stripMargin
    val roundCtes = (1 to rounds).map { r =>
      s"""p$r AS (
         |  SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (
         |    SELECT freq,
         |           unnest(list_transform(range(1, len(s)),
         |                  i -> s[i] || ' ' || s[i + 1])) AS pair
         |    FROM (SELECT freq, string_split(trim(repr, '|'), '|') AS s
         |          FROM w${r - 1})
         |  ) GROUP BY pair
         |), b$r AS (
         |  SELECT pair, cnt,
         |         '|' || replace(pair, ' ', '|') || '|' AS pat,
         |         '|' || replace(pair, ' ', '') || '|' AS rep
         |  FROM p$r ORDER BY cnt DESC, pair LIMIT 1
         |), w$r AS (
         |  SELECT w,
         |         replace(replace(repr, b.pat, b.rep), b.pat, b.rep) AS repr,
         |         freq
         |  FROM w${r - 1}, b$r AS b
         |)""".stripMargin
    }.mkString(", ")
    s"$base, $roundCtes"
  }

  /** Oracle twin of [[bpeTrain]]: the chain + union of the b_r picks. */
  private[graft] def bpeOracle(rounds: Int): String = {
    val picks = (1 to rounds).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS round, pair,
         |       replace(pair, ' ', '') AS merged, cnt FROM b$r""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"${bpeOracleChain(rounds)}\n$picks\nORDER BY round"
  }

  /** Oracle twin of the llm_bpe_apply key: the chain + the per-source
    * tokenization report off the final word table. */
  private[graft] def bpeApplyOracle(rounds: Int): String =
    s"""${bpeOracleChain(rounds)}
       |SELECT source,
       |       CAST(sum(n * len(w)) AS BIGINT) AS char_tokens,
       |       CAST(sum(n * len(string_split(trim(repr, '|'), '|'))) AS BIGINT)
       |         AS bpe_tokens,
       |       round(sum(n * len(w)) * 1.0 /
       |             sum(n * len(string_split(trim(repr, '|'), '|'))), 4)
       |         AS compression
       |FROM (
       |  SELECT source, w, CAST(count(*) AS BIGINT) AS n
       |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
       |        FROM documents)
       |  GROUP BY source, w
       |) s JOIN w$rounds USING (w)
       |GROUP BY source ORDER BY source""".stripMargin

  /** Embedding side for pairwise cosine with the norm PRECOMPUTED once per
    * vector: the O(n²) pair stage then evaluates a single dot product per
    * pair, with sim = dot/(na·nb) — bitwise-identical to CosineSimilarity
    * (same accumulation order), at a third of the loop work.
    */
  private def embWithNorm(s: SparkSession, d: String, prefix: String): DataFrame =
    emb(s, d).select(
      col("vec_id").as(s"${prefix}_id"),
      col("embedding").as(s"${prefix}_emb"),
      sqrt(vectorDot(col("embedding"), col("embedding"))).as(s"${prefix}_norm"))

  /** dot/(na·nb), NULL on zero norms — mirrors CosineSimilarity. */
  private def pairCos(a: String, b: String): Column =
    vectorDot(col(s"${a}_emb"), col(s"${b}_emb")) /
      nullif(col(s"${a}_norm") * col(s"${b}_norm"), lit(0.0))

  /** Probe-side fan-out for the brute-force embedding ops. The harness
    * parquet is a single split, so without a repartition the whole O(n²)
    * probe runs in ONE task; spreading it is the same move that matters on
    * a cluster. Derived from the session's shuffle parallelism — never a
    * numeric literal, so a 1000-executor cluster keeps its configured
    * width instead of being capped at the harness's 32.
    */
  private def probeFanout(s: SparkSession): Int =
    s.conf.get("spark.sql.shuffle.partitions").toInt

  /** The stored autoprobe state's derivation (round 13 — VERDICT r12
    * #4): the nprobe∈{1,2,4} recall@5 curve of the index's probe chain
    * against brute-force exact truth, measured on the offline query
    * sample (the lowest 20 vec_ids — the declared keys' sample), plus
    * the PICK — the smallest budget whose mean recall meets
    * [[IvfRecallFloor]], the max budget when unreachable. Exactly the
    * arithmetic the r12 in-plan key used (and the ivfAutoprobeOracle
    * replays), moved to index-publish time: [[graft.config.IvfIndex
    * .build]]/compact call this once per generation and persist the
    * result, so serving reads a decision instead of re-deriving a
    * curve. Returns (nprobe, mean_recall, picked) — bounded rows. */
  private[graft] def ivfAutoprobeState(
      s: SparkSession, corpus: DataFrame, cents: DataFrame,
      inv0: DataFrame): DataFrame = {
    val inv = inv0.select(col("cell"), col("vec_id").as("n_id"),
      col("embedding").as("n_emb"))
    val e = corpus.select(col("vec_id"), col("embedding"))
    val queries = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wq = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))
    val pr = queries.join(broadcast(cents), lit(true))
      .select(col("q_id"), col("q_emb"), col("cell"),
        round(cosineSim(col("q_emb"), col("cent")), 6).as("sim"))
      .withColumn("pr", row_number().over(wq))
      .where(col("pr") <= 4)
      .select(col("q_id"), col("q_emb"), col("cell"), col("pr"))
    val cand = pr.join(inv, Seq("cell"))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("pr"), col("n_id"),
        round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
    val bud = s.range(1)
      .select(explode(array(lit(1L), lit(2L), lit(4L))).as("nprobe"))
    val w5 = Window.partitionBy("nprobe", "q_id")
      .orderBy(col("sim").desc, col("n_id"))
    val t5 = cand.join(broadcast(bud), col("pr") <= col("nprobe"))
      .withColumn("rn", row_number().over(w5))
      .where(col("rn") <= 5)
      .select(col("nprobe").as("t_np"), col("q_id").as("t_qid"),
        col("n_id").as("t_nid"))
    val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      .repartition(probeFanout(s))
    val we = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    val exact = c.join(broadcast(queries), col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
      .withColumn("rn", row_number().over(we))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"))
    val curve = exact.crossJoin(broadcast(bud))
      .join(t5,
        col("t_np") === col("nprobe") && col("t_qid") === col("q_id") &&
          col("t_nid") === col("n_id"), "left")
      .groupBy("nprobe", "q_id")
      .agg(count(col("t_nid")).as("h"))
      .groupBy("nprobe")
      .agg(round(avg(col("h").cast("double")) / 5, 6).as("mean_recall"))
    // the pick, marked in-frame (bounded rows — a window over <=3)
    val wAll = Window.partitionBy(lit(1))
    curve.withColumn("picked", col("nprobe") === coalesce(
        min(when(col("mean_recall") >= IvfRecallFloor, col("nprobe")))
          .over(wAll),
        max(col("nprobe")).over(wAll)))
      .orderBy("nprobe")
  }

  /** τ=0.35 cosine near-dup groups over the embeddings corpus — the
    * llm_dedup_groups chain (brute edges + exact connected components),
    * factored so llm_dedup_cluster_sizes reports over the SAME groups.
    * `edges` is persisted (evaluated once, reused every propagation
    * round); per-round lineage control lives in Components. symPairs
    * keeps the O(n²) cosine scan to ONE evaluation.
    */
  private def cosineDedupGroups(s: SparkSession, d: String): DataFrame = {
    val a = embWithNorm(s, d, "a").repartition(probeFanout(s))
    val b = embWithNorm(s, d, "b")
    val e0 = a.join(broadcast(b), col("a_id") < col("b_id"))
      .where(round(pairCos("a", "b"), 6) >= 0.35)
      .select(col("a_id").as("ea"), col("b_id").as("eb"))
    val edges = symPairs(e0, "ea", "eb").persist()
    Components.connectedComponents(emb(s, d), "vec_id", edges)
      .select(col("id").as("vec_id"), col("lbl").as("group_id"))
  }

  /** The oracle CTE chain shared by llm_dedup_groups and
    * llm_dedup_cluster_sizes: brute τ=0.35 cosine edges, symmetrized,
    * reachability closure (use inside `WITH RECURSIVE`; exposes `reach`). */
  private lazy val dedupGroupsCtes: String = {
    val edges0 =
      """SELECT a.vec_id AS ea, b.vec_id AS eb
        |  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |  WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                     CAST(b.embedding AS DOUBLE[])), 6) >= 0.35""".stripMargin
    s"""e0 AS (
       |$edges0
       |), edges AS (
       |  SELECT ea AS a, eb AS b FROM e0 UNION ALL SELECT eb, ea FROM e0
       |), ${Components.reachMinCte("SELECT vec_id AS id FROM embeddings", "edges")}""".stripMargin
  }

  /** τ=0.8 near-dup groups via the LSH-bucketed edge generator — the
    * SCALE-PATH group chain (banded sign-LSH prefilter equi-join, exact
    * cosine verify of candidates only, exact connected components).
    * Factored (round 10) so llm_dedup_groups_lsh and the
    * llm_dedup_cluster_sizes_lsh curation report run the SAME groups. */
  private def lshDedupGroups(s: SparkSession, d: String): DataFrame = {
    val edges = symPairs(lshVerifiedEdges(s, d), "ea", "eb").persist()
    Components.connectedComponents(emb(s, d), "vec_id", edges)
      .select(col("id").as("vec_id"), col("lbl").as("group_id"))
  }

  /** The τ=0.8 LSH-verified edge frame (ea < eb) — factored round 12 so
    * the group chain and the group-density audit read ONE edge
    * definition. */
  private def lshVerifiedEdges(s: SparkSession, d: String): DataFrame = {
    val x = emb(s, d).select(col("vec_id").as("ea"), col("embedding").as("x_emb"))
    val y = emb(s, d).select(col("vec_id").as("eb"), col("embedding").as("y_emb"))
    lshCandidatePairs(s, d, 4, 4)
      .withColumnRenamed("a_id", "ea").withColumnRenamed("b_id", "eb")
      .join(x, Seq("ea")).join(y, Seq("eb"))
      .where(round(cosineSim(col("x_emb"), col("y_emb")), 6) >= 0.8)
      .select("ea", "eb")
  }

  /** Oracle CTE chain shared by llm_dedup_groups_lsh and
    * llm_dedup_cluster_sizes_lsh (use inside WITH RECURSIVE; exposes
    * `reach`): banded sign-LSH candidates → exact-cosine τ=0.8 verify →
    * symmetrized reachability closure. */
  private lazy val lshDedupGroupsCtes: String =
    s"""sig AS (
       |  $lshSigSql
       |), banded AS (
       |  ${lshBandedSql(4, 4)}
       |), cand AS (
       |  SELECT DISTINCT a.vec_id AS ea, b.vec_id AS eb
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.band_key = b.band_key
       |   AND a.vec_id < b.vec_id
       |), e0 AS (
       |  SELECT ea, eb
       |  FROM cand JOIN embeddings x ON x.vec_id = cand.ea
       |            JOIN embeddings y ON y.vec_id = cand.eb
       |  WHERE round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
       |                                     CAST(y.embedding AS DOUBLE[])), 6) >= 0.8
       |), edges AS (
       |  SELECT ea AS a, eb AS b FROM e0 UNION ALL SELECT eb, ea FROM e0
       |), ${Components.reachMinCte("SELECT vec_id AS id FROM embeddings", "edges")}""".stripMargin

  // ---- IVF ANN building blocks (llm_ann_ivf's plan, factored round 8 so
  // ---- specs can pin trained-vs-untrained recall at a fixed probe budget)

  /** Nearest-cell assignment KEEPING the winning similarity: one
    * broadcast of the bounded centroid frame, map-side cosine per
    * (vector, cell), WindowGroupLimit rn=1. The sim column feeds the
    * k-means‖ cost round ([[ivfSeedScalable]]); [[ivfAssign]] drops it. */
  private[graft] def ivfAssignSim(e: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cell"))
    e.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("embedding"), col("cell"),
        round(cosineSim(col("embedding"), col("cent")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cell"), col("sim"))
  }

  /** Nearest-cell assignment: one broadcast of the bounded centroid frame,
    * map-side cosine per (vector, cell), WindowGroupLimit rn=1. */
  private[graft] def ivfAssign(e: DataFrame, cents: DataFrame): DataFrame =
    ivfAssignSim(e, cents).select(col("vec_id"), col("embedding"), col("cell"))

  /** Scalable k-means‖-style seeding (round 9 — VERDICT r8 #5; replaces
    * the arbitrary `vec_id < 16` draw): k cells whose seeds come from
    * the CORPUS, not from insertion order, in three bounded passes —
    *
    *   1. UNIFORM deterministic draws: bucket every vector by a portable
    *      hash of vec_id (mod k) and take each bucket's min-uniform-hash
    *      vector — k independent uniform draws, one map-side-combinable
    *      min_by shuffle, no window over the fact.
    *   2. ONE cost round (the k-means‖ move, Bahmani et al. 2012):
    *      assign all vectors to the stage-1 seeds, cost = 1 − sim in
    *      exact INTEGER µ-units; draw an expected-ℓ oversample where
    *      u·ΣC < ℓ·cost·2⁶⁰ — cost-weighted threshold draws with a
    *      portable-hash uniform variate, every comparison exact integer
    *      arithmetic (DECIMAL(38,0) / HUGEINT), so both engines draw
    *      the IDENTICAL candidate set (no pow/ln in compare positions —
    *      the trig-table doctrine).
    *   3. Per-cell re-seed: each cell's max-cost candidate replaces its
    *      uniform seed (cells the draw missed keep stage 1's) — the
    *      weighted-reduction step, spreading seeds toward the mass the
    *      uniform draw under-covered.
    *
    * Every stage is a broadcast/one-shuffle plan at any corpus size;
    * the oracle replays the whole chain CTE-for-CTE
    * ([[ivfSeedCtes]]). Lloyd rounds then refine as before. */
  private[graft] def ivfSeedScalable(
      e: DataFrame, k: Int = 16, ell: Int = 64): DataFrame = {
    def ph(prefix: String): Column =
      PortableHash.pHash(concat(lit(prefix), col("vec_id").cast("string")))
    val c0 = e.select(col("vec_id"), col("embedding"),
        (ph("ivfb:") % k).as("cell"), ph("ivfu:").as("uh"))
      .groupBy("cell")
      .agg(min_by(col("embedding"), struct(col("uh"), col("vec_id")))
        .as("cent"))
    val costed = ivfAssignSim(e, c0)
      .select(col("vec_id"), col("embedding"), col("cell"),
        (lit(1000000L) - round(col("sim") * 1000000).cast("long")).as("c"),
        ph("ivfd:").as("ud"))
    val tot = costed.agg(sum(col("c")).cast("decimal(16,0)").as("t"))
    // u/2⁶⁰ < ℓ·c/ΣC  ⇔  u·ΣC < ℓ·c·2⁶⁰ — cross-multiplied so the
    // draw is an exact integer comparison (19+16+1 = 36 digits ≤ 38:
    // no precision loss on either engine)
    val cand = costed.crossJoin(broadcast(tot))
      .where(col("ud").cast("decimal(19,0)") * col("t") <
        col("c").cast("decimal(8,0)") * lit(ell).cast("decimal(3,0)") *
          lit(1152921504606846976L).cast("decimal(19,0)"))
    val re = cand.groupBy("cell")
      .agg(max_by(col("embedding"), struct(col("c"), col("vec_id")))
        .as("rcent"))
    c0.join(re, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("rcent"), col("cent")).as("cent"))
  }

  /** DuckDB oracle twin of [[ivfSeedScalable]]: CTE chain ending in
    * `s1(cell, cent)`. `src` is the training corpus CTE/table (round 11:
    * the ingest key trains on a base slice, then assigns everything). */
  private def ivfSeedCtes(
      k: Int = 16, ell: Int = 64, src: String = "embeddings"): String = {
    def ph(prefix: String): String =
      PortableHash.sql(s"'$prefix' || CAST(vec_id AS VARCHAR)")
    s"""bs AS (
       |  SELECT vec_id, embedding,
       |         CAST(${ph("ivfb:")} % $k AS BIGINT) AS cell,
       |         ${ph("ivfu:")} AS uh
       |  FROM $src
       |), c0 AS (
       |  SELECT cell, embedding AS cent FROM (
       |    SELECT cell, embedding,
       |           row_number() OVER (PARTITION BY cell
       |             ORDER BY uh, vec_id) AS rn
       |    FROM bs) WHERE rn = 1
       |), costed AS (
       |  SELECT vec_id, embedding, cell,
       |         CAST(1000000 - round(sim * 1000000) AS BIGINT) AS c,
       |         ${ph("ivfd:")} AS ud
       |  FROM (
       |    SELECT vec_id, embedding, cell, sim FROM (
       |      SELECT e.vec_id, e.embedding, c.cell,
       |             round(list_cosine_similarity(
       |               CAST(e.embedding AS DOUBLE[]),
       |               CAST(c.cent AS DOUBLE[])), 6) AS sim,
       |             row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |               round(list_cosine_similarity(
       |                 CAST(e.embedding AS DOUBLE[]),
       |                 CAST(c.cent AS DOUBLE[])), 6) DESC, c.cell) AS rn
       |      FROM $src e CROSS JOIN c0 c)
       |    WHERE rn = 1)
       |), stot AS (
       |  SELECT CAST(sum(c) AS HUGEINT) AS t FROM costed
       |), scand AS (
       |  SELECT cell, vec_id, embedding, c FROM costed, stot
       |  WHERE CAST(ud AS HUGEINT) * t <
       |        CAST(c AS HUGEINT) * $ell
       |          * CAST(1152921504606846976 AS HUGEINT)
       |), sre AS (
       |  SELECT cell, embedding AS rcent FROM (
       |    SELECT cell, embedding,
       |           row_number() OVER (PARTITION BY cell
       |             ORDER BY c DESC, vec_id DESC) AS rn
       |    FROM scand) WHERE rn = 1
       |), s1 AS (
       |  SELECT c0.cell, coalesce(sre.rcent, c0.cent) AS cent
       |  FROM c0 LEFT JOIN sre ON c0.cell = sre.cell
       |)""".stripMargin
  }

  /** Lloyd refinement from explicit seeds: each round reassigns and
    * re-averages (exact pinned-order centroid fold, 6-dp grid so the
    * oracle replays it). localCheckpoint cuts the per-iteration lineage
    * (centroid frame is broadcast-bounded): without it each round
    * re-plans ALL previous rounds and the final plan re-evaluates the
    * whole training cascade per stage. `lloydRounds = 0` returns the raw
    * seeds — the untrained baseline the recall spec compares against. */
  private[graft] def ivfTrain(
      e: DataFrame, seeds: DataFrame, lloydRounds: Int): DataFrame = {
    def toFloat(c: Column): Column = transform(c, x => x.cast("float"))
    var cents = seeds
    for (_ <- 1 to lloydRounds) {
      cents = ivfAssign(e, cents)
        .groupBy("cell")
        .agg(Aggregators.centroid(col("embedding")).as("c"))
        .select(col("cell"),
          toFloat(transform(col("c"), x => round(x, 6))).as("cent"))
        .localCheckpoint()
    }
    cents
  }

  /** DuckDB oracle twin of one [[ivfAssign]] pass (shared by the IVF
    * keys so the training replay cannot drift between them). `src` is
    * the assigned corpus — training rounds assign the training slice,
    * the final inverted-file pass assigns everything. */
  private def ivfAssignCte(
      centCte: String, out: String, src: String = "embeddings"): String =
    s"""$out AS (
       |  SELECT vec_id, embedding, cell FROM (
       |    SELECT e.vec_id, e.embedding, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                          CAST(c.cent AS DOUBLE[])), 6)
       |             DESC, c.cell) AS rn
       |    FROM $src e CROSS JOIN $centCte c)
       |  WHERE rn = 1
       |)""".stripMargin

  /** DuckDB oracle twin of one Lloyd re-averaging round of [[ivfTrain]]. */
  private def ivfCentCte(assignCteName: String, out: String): String =
    s"""$out AS (
       |  SELECT cell, list(CAST(round(m, 6) AS FLOAT) ORDER BY dim) AS cent FROM (
       |    SELECT cell, dim, avg(CAST(v AS DOUBLE)) AS m FROM (
       |      SELECT cell, unnest(embedding) AS v,
       |             unnest(range(1, len(embedding) + 1)) AS dim
       |      FROM $assignCteName)
       |    GROUP BY cell, dim)
       |  GROUP BY cell
       |)""".stripMargin

  /** The shared oracle training chain: k-means‖-style scalable seeds
    * ([[ivfSeedCtes]] → `s1`) → 2 Lloyd rounds → final assignment `a3`
    * over trained centroids `c2`. */
  private def ivfTrainedAssignCtes: String =
    s"""${ivfSeedCtes()},
       |${ivfAssignCte("s1", "a1")}, ${ivfCentCte("a1", "c1")},
       |${ivfAssignCte("c1", "a2")}, ${ivfCentCte("a2", "c2")},
       |${ivfAssignCte("c2", "a3")}""".stripMargin

  /** The INGEST oracle chain (round 11 — VERDICT r10 #1): seeding and
    * both Lloyd rounds see ONLY the base corpus (vec_id < `boundary` —
    * the state a static-trained production index was built from), but
    * the final inverted-file assignment `a3` covers EVERYTHING — which
    * is exactly stored-base-assignments ∪ assign-the-batch, since every
    * vector is assigned independently against the same trained
    * centroids. A served base+delta index that drifted from this replay
    * hash-mismatches immediately. */
  private def ivfBaseTrainedAssignCtes(boundary: Long): String =
    s"""ebase AS (
       |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < $boundary
       |),
       |${ivfSeedCtes(src = "ebase")},
       |${ivfAssignCte("s1", "a1", "ebase")}, ${ivfCentCte("a1", "c1")},
       |${ivfAssignCte("c1", "a2", "ebase")}, ${ivfCentCte("a2", "c2")},
       |${ivfAssignCte("c2", "a3")}""".stripMargin

  /** The ONE IVF top-k oracle text, shared verbatim by the stored-index
    * key (llm_ann_ivf) and its recompute twin (llm_ann_ivf_train) — the
    * driver hash-comparing both against the same replayed training chain
    * is what pins stored state to the live recipe. The ingest key
    * (llm_ann_ivf_ingest) answers the SAME probe text over the
    * base-trained chain. */
  /** The IVF probe chain over a trained-centroid CTE `c2` + inverted
    * file `a3`: 2-nearest-cell probe per query, exact re-rank within
    * the probed cells' members → `r(q_id, n_id, sim, rn)`. Shared by
    * the top-k oracles and the recall readout so the probe replay
    * cannot drift between them. */
  private val ivfProbeCtes: String =
    """probes AS (
      |  SELECT q_id, q_emb, cell FROM (
      |    SELECT e.vec_id AS q_id, e.embedding AS q_emb, c.cell,
      |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
      |                                          CAST(c.cent AS DOUBLE[])), 6)
      |             DESC, c.cell) AS rn
      |    FROM embeddings e CROSS JOIN c2 c
      |    WHERE e.vec_id < 20)
      |  WHERE rn <= 2
      |), rr AS (
      |  SELECT DISTINCT q_id, n.vec_id AS n_id,
      |         round(list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
      |                                      CAST(n.embedding AS DOUBLE[])), 6) AS sim
      |  FROM probes p JOIN a3 n ON n.cell = p.cell AND n.vec_id <> p.q_id
      |), r AS (
      |  SELECT q_id, n_id, sim,
      |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
      |  FROM rr
      |)""".stripMargin

  private def ivfTopkOracleFrom(chainCtes: String): String =
    s"""WITH $chainCtes,
       |$ivfProbeCtes
       |SELECT q_id, n_id, sim, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5
       |ORDER BY q_id, rn""".stripMargin

  private lazy val ivfTopkOracle: String =
    ivfTopkOracleFrom(ivfTrainedAssignCtes)

  /** IVF recall@5 oracle (round 11 — VERDICT r10 #3): the stored-probe
    * chain's top-5 LEFT-joined against brute-force exact top-5, per
    * query — the llm_pq_recall readout with the IVF chain swapped in,
    * completing the recall dashboard (LSH, PQ, IVF). */
  private lazy val ivfRecallOracle: String =
    s"""WITH $ivfTrainedAssignCtes,
       |$ivfProbeCtes, ivf5 AS (
       |  SELECT q_id, n_id FROM r WHERE rn <= 5
       |), ex AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                        CAST(c.embedding AS DOUBLE[])), 6)
       |             DESC, c.vec_id) AS rn
       |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 20
       |), exact AS (
       |  SELECT q_id, n_id FROM ex WHERE rn <= 5
       |)
       |SELECT e.q_id, CAST(count(p.n_id) AS BIGINT) AS n_hit,
       |       round(CAST(count(p.n_id) AS DOUBLE) / 5, 6) AS recall
       |FROM exact e LEFT JOIN ivf5 p
       |  ON p.q_id = e.q_id AND p.n_id = e.n_id
       |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin

  /** nprobe tuning curve (round 11): mean recall@5 of the stored-IVF
    * probe at nprobe ∈ {1, 2, 4} — the dial llm_ann_ivf_recall says to
    * turn, AS a curve. Candidate sets nest as the budget grows, so the
    * curve is non-decreasing (ApproxSpec pins it). */
  private lazy val ivfNprobeCtes: String =
    s"""$ivfTrainedAssignCtes,
       |pr AS (
       |  SELECT q_id, q_emb, cell, rn AS pr FROM (
       |    SELECT e.vec_id AS q_id, e.embedding AS q_emb, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                          CAST(c.cent AS DOUBLE[])), 6)
       |             DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN c2 c
       |    WHERE e.vec_id < 20)
       |  WHERE rn <= 4
       |), cand AS (
       |  SELECT p.q_id, p.pr, n.vec_id AS n_id,
       |         round(list_cosine_similarity(CAST(p.q_emb AS DOUBLE[]),
       |                                      CAST(n.embedding AS DOUBLE[])), 6) AS sim
       |  FROM pr p JOIN a3 n ON n.cell = p.cell AND n.vec_id <> p.q_id
       |), bud AS (
       |  SELECT CAST(unnest([1, 2, 4]) AS BIGINT) AS nprobe
       |), t5 AS (
       |  SELECT nprobe, q_id, n_id FROM (
       |    SELECT b.nprobe, c.q_id, c.n_id, row_number() OVER (
       |      PARTITION BY b.nprobe, c.q_id ORDER BY c.sim DESC, c.n_id) AS rn
       |    FROM bud b JOIN cand c ON c.pr <= b.nprobe) WHERE rn <= 5
       |), ex AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                        CAST(c.embedding AS DOUBLE[])), 6)
       |             DESC, c.vec_id) AS rn
       |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 20
       |), exact AS (
       |  SELECT q_id, n_id FROM ex WHERE rn <= 5
       |), hits AS (
       |  SELECT b.nprobe, e.q_id, CAST(count(t.n_id) AS BIGINT) AS h
       |  FROM bud b CROSS JOIN exact e
       |  LEFT JOIN t5 t ON t.nprobe = b.nprobe AND t.q_id = e.q_id
       |                AND t.n_id = e.n_id
       |  GROUP BY 1, 2
       |)""".stripMargin

  private lazy val ivfNprobeOracle: String =
    s"""WITH $ivfNprobeCtes
       |SELECT nprobe, CAST(count(*) AS BIGINT) AS n_queries,
       |       round(avg(CAST(h AS DOUBLE)) / 5, 6) AS mean_recall
       |FROM hits GROUP BY nprobe ORDER BY nprobe""".stripMargin

  /** Recall-targeted serving oracle (round 12 — VERDICT r11 #5): the
    * nprobe curve chain, a pick CTE choosing the SMALLEST budget whose
    * mean recall meets the floor (max when unreachable), and the serve
    * replayed at exactly that pick. mean_recall values are exact
    * 1/100ths (Σh over 20 queries × 5), so the floor comparison can
    * never sit on an engine-rounding tie. */
  val IvfRecallFloor = 0.5
  private lazy val ivfAutoprobeOracle: String =
    s"""WITH $ivfNprobeCtes, curve AS (
       |  SELECT nprobe, round(avg(CAST(h AS DOUBLE)) / 5, 6) AS mean_recall
       |  FROM hits GROUP BY nprobe
       |), pick AS (
       |  SELECT coalesce(
       |           min(CASE WHEN mean_recall >= $IvfRecallFloor
       |               THEN nprobe END),
       |           max(nprobe)) AS np
       |  FROM curve
       |), r AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id
       |           ORDER BY sim DESC, n_id) AS rn
       |  FROM cand, pick WHERE cand.pr <= pick.np
       |)
       |SELECT q_id, n_id, sim, CAST(rn AS BIGINT) AS rn,
       |       (SELECT np FROM pick) AS nprobe_used
       |FROM r WHERE rn <= 5
       |ORDER BY q_id, rn""".stripMargin

  /** Oracle for llm_mmr_rerank (round 13): the trained-index probe
    * chain at k=8, the bounded candidate-pair sim matrix, and the four
    * MMR selection rounds unrolled — scores 6-dp-rounded before every
    * compare, ties by n_id, identical composition to the Spark plan. */
  private lazy val mmrRerankOracle: String = {
    def step(k: Int): String = {
      val prev = s"sel${k - 1}"
      s"""rem$k AS (
         |  SELECT c.* FROM cand8 c LEFT JOIN $prev s
         |    ON s.q_id = c.q_id AND s.n_id = c.n_id
         |  WHERE s.n_id IS NULL
         |), mx$k AS (
         |  SELECT r.q_id, r.n_id, r.s6, CAST(max(cs.s6p) AS BIGINT) AS mx6
         |  FROM rem$k r
         |  JOIN cs ON cs.cq = r.q_id AND cs.i = r.n_id
         |  JOIN $prev sl ON sl.q_id = cs.cq AND sl.n_id = cs.j
         |  GROUP BY 1, 2, 3
         |), pick$k AS (
         |  SELECT q_id, n_id, sm FROM (
         |    SELECT q_id, n_id, s6 * 7 - mx6 * 3 AS sm,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY s6 * 7 - mx6 * 3 DESC, n_id) AS prn
         |    FROM mx$k) WHERE prn = 1
         |), sel$k AS (
         |  SELECT * FROM $prev
         |  UNION ALL
         |  SELECT q_id, n_id, CAST(sm AS DOUBLE) / 10000000,
         |         CAST($k AS BIGINT)
         |  FROM pick$k
         |)""".stripMargin
    }
    s"""WITH $ivfTrainedAssignCtes,
       |$ivfProbeCtes,
       |cand8 AS (
       |  SELECT q_id, n_id,
       |         CAST(round(sim * 1000000) AS BIGINT) AS s6
       |  FROM r WHERE rn <= 8
       |), cs AS (
       |  SELECT a.q_id AS cq, a.n_id AS i, b.n_id AS j,
       |         CAST(round(round(list_cosine_similarity(
       |           CAST(ea.embedding AS DOUBLE[]),
       |           CAST(eb.embedding AS DOUBLE[])), 6) * 1000000)
       |           AS BIGINT) AS s6p
       |  FROM cand8 a JOIN cand8 b
       |    ON a.q_id = b.q_id AND a.n_id <> b.n_id
       |  JOIN a3 ea ON ea.vec_id = a.n_id
       |  JOIN a3 eb ON eb.vec_id = b.n_id
       |), sel1 AS (
       |  SELECT q_id, n_id, CAST(s6 * 7 AS DOUBLE) / 10000000 AS score,
       |         CAST(1 AS BIGINT) AS mmr_rank
       |  FROM cand8 JOIN (SELECT q_id AS q1, n_id AS n1 FROM r WHERE rn = 1)
       |    ON q_id = q1 AND n_id = n1
       |),
       |${step(2)},
       |${step(3)},
       |${step(4)}
       |SELECT q_id, n_id, score, mmr_rank FROM sel4
       |ORDER BY q_id, mmr_rank""".stripMargin
  }

  /** Oracle for llm_rouge1_pairs (round 13): the verified-pair chain +
    * one corpus token-frequency pass; overlap = Σ min(tf₁, tf₂). */
  private lazy val rouge1PairsOracle: String =
    s"""WITH $minhashVerifiedCtes,
       |tf AS (
       |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
       |    FROM documents) GROUP BY 1, 2
       |), ln AS (
       |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY 1
       |), pr AS (
       |  SELECT d1, d2 FROM verified WHERE est_jaccard >= 0.2
       |), ov AS (
       |  SELECT p.d1, p.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS ov
       |  FROM pr p JOIN tf a ON a.doc_id = p.d1
       |  JOIN tf b ON b.doc_id = p.d2 AND b.w = a.w
       |  GROUP BY 1, 2
       |)
       |SELECT p.d1, p.d2, coalesce(o.ov, 0) AS overlap,
       |       l1.n AS n1, l2.n AS n2,
       |       round(CAST(coalesce(o.ov, 0) AS DOUBLE) / l1.n, 6)
       |         AS rouge1_precision,
       |       round(CAST(coalesce(o.ov, 0) AS DOUBLE) / l2.n, 6)
       |         AS rouge1_recall,
       |       round(2.0 * coalesce(o.ov, 0) / (l1.n + l2.n), 6)
       |         AS rouge1_f1
       |FROM pr p LEFT JOIN ov o ON o.d1 = p.d1 AND o.d2 = p.d2
       |JOIN ln l1 ON l1.doc_id = p.d1
       |JOIN ln l2 ON l2.doc_id = p.d2
       |ORDER BY p.d1, p.d2""".stripMargin

  /** Oracle for llm_ivf_maintain_audit (round 13 — VERDICT r12 #8):
    * replay the WHOLE maintenance decision history from the base
    * parquet alone — per-dim exact integer micro-moments for every
    * baseline/batch, the variance-standardized centroid-shift T² in the
    * SAME left-to-right double summation order as
    * [[graft.config.IvfIndex.driftT2Micro]]'s loop (a recursive CTE
    * over dims 1..64 — a plain SUM() would let the engine reorder the
    * float adds), the threshold compare, and the action/generation/
    * count bookkeeping. Baselines CHAIN: decision k's baseline depends
    * on which earlier decision last retrained, so the oracle selects
    * mA/mAB/mABC per the replayed drift flags — a stored maintlog that
    * disagrees with ANY part of this derivation hash-mismatches. */
  private lazy val ivfMaintainAuditOracle: String = {
    val thr = graft.config.IvfIndex.DriftT2ThresholdMicro
    s"""WITH RECURSIVE dims AS (SELECT unnest(range(1, 65)) AS i),
       |bounds AS (
       |  SELECT (max(vec_id) + 1) * 3 // 5 AS b,
       |         (max(vec_id) + 1) * 4 // 5 AS b1 FROM embeddings
       |),
       |mA AS MATERIALIZED (
       |  SELECT i,
       |         sum(CAST(round(x * 1000000) AS BIGINT)) AS s,
       |         sum(CAST(round(x * x * 1000000) AS BIGINT)) AS q,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM (
       |    SELECT CAST(embedding[i] AS DOUBLE) AS x, i
       |    FROM embeddings, dims WHERE vec_id < (SELECT b FROM bounds))
       |  GROUP BY i
       |),
       |mAB AS MATERIALIZED (
       |  SELECT i,
       |         sum(CAST(round(x * 1000000) AS BIGINT)) AS s,
       |         sum(CAST(round(x * x * 1000000) AS BIGINT)) AS q,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM (
       |    SELECT CAST(embedding[i] AS DOUBLE) AS x, i
       |    FROM embeddings, dims WHERE vec_id < (SELECT b1 FROM bounds))
       |  GROUP BY i
       |),
       |b1m AS MATERIALIZED (
       |  SELECT i,
       |         sum(CAST(round(x * 1000000) AS BIGINT)) AS s,
       |         sum(CAST(round(x * x * 1000000) AS BIGINT)) AS q,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM (
       |    SELECT CAST(embedding[i] AS DOUBLE) AS x, i
       |    FROM embeddings, dims WHERE vec_id >= (SELECT b FROM bounds) AND vec_id < (SELECT b1 FROM bounds))
       |  GROUP BY i
       |),
       |b2m AS MATERIALIZED (
       |  SELECT i,
       |         sum(CAST(round(x * 1000000) AS BIGINT)) AS s,
       |         sum(CAST(round(x * x * 1000000) AS BIGINT)) AS q,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM (
       |    SELECT CAST(CAST(CAST(embedding[i] AS DOUBLE) + 1.0 AS FLOAT)
       |                AS DOUBLE) AS x, i
       |    FROM embeddings, dims WHERE vec_id >= (SELECT b1 FROM bounds))
       |  GROUP BY i
       |),
       |b3m AS MATERIALIZED (
       |  SELECT i,
       |         sum(CAST(round(x * 1000000) AS BIGINT)) AS s,
       |         sum(CAST(round(x * x * 1000000) AS BIGINT)) AS q,
       |         CAST(count(*) AS BIGINT) AS n
       |  FROM (
       |    SELECT CAST(embedding[i] AS DOUBLE) AS x, i
       |    FROM embeddings, dims WHERE vec_id < 10)
       |  GROUP BY i
       |),
       |mABC AS MATERIALIZED (
       |  SELECT a.i, a.s + c.s AS s, a.q + c.q AS q, a.n + c.n AS n
       |  FROM mAB a JOIN b2m c USING (i)
       |),
       |cnts AS MATERIALIZED (
       |  SELECT (SELECT n FROM b1m LIMIT 1) AS n1,
       |         (SELECT n FROM b2m LIMIT 1) AS n2,
       |         (SELECT n FROM b3m LIMIT 1) AS n3,
       |         (SELECT n FROM mAB LIMIT 1) AS tot0,
       |         (SELECT n FROM mABC LIMIT 1) AS totAll
       |),
       |d1dims AS MATERIALIZED (
       |  SELECT b.i, b.s AS bs, b.q AS bq, b.n AS bn, c.s AS cs, c.n AS cn
       |  FROM mA b JOIN b1m c USING (i)
       |),
       |r1 AS (
       |  SELECT 0 AS i, CAST(0 AS DOUBLE) AS t2
       |  UNION ALL
       |  SELECT r.i + 1, r.t2 +
       |    (CAST(d.cs AS DOUBLE) / d.cn - CAST(d.bs AS DOUBLE) / d.bn)
       |      * (CAST(d.cs AS DOUBLE) / d.cn - CAST(d.bs AS DOUBLE) / d.bn)
       |      / greatest(CAST(d.bq AS DOUBLE) / d.bn * 1000000
       |                 - (CAST(d.bs AS DOUBLE) / d.bn)
       |                   * (CAST(d.bs AS DOUBLE) / d.bn), 1.0)
       |  FROM r1 r JOIN d1dims d ON d.i = r.i + 1
       |),
       |d1 AS MATERIALIZED (
       |  SELECT t2m, t2m > $thr AS drifted FROM (
       |    SELECT CAST(floor(t2 * (SELECT n1 FROM cnts) / 64 * 1000000)
       |                AS BIGINT) AS t2m
       |    FROM r1 WHERE i = 64)
       |),
       |base2 AS MATERIALIZED (
       |  SELECT a.i,
       |         CASE WHEN (SELECT drifted FROM d1) THEN ab.s ELSE a.s END AS s,
       |         CASE WHEN (SELECT drifted FROM d1) THEN ab.q ELSE a.q END AS q,
       |         CASE WHEN (SELECT drifted FROM d1) THEN ab.n ELSE a.n END AS n
       |  FROM mA a JOIN mAB ab USING (i)
       |),
       |d2dims AS MATERIALIZED (
       |  SELECT b.i, b.s AS bs, b.q AS bq, b.n AS bn, c.s AS cs, c.n AS cn
       |  FROM base2 b JOIN b2m c USING (i)
       |),
       |r2 AS (
       |  SELECT 0 AS i, CAST(0 AS DOUBLE) AS t2
       |  UNION ALL
       |  SELECT r.i + 1, r.t2 +
       |    (CAST(d.cs AS DOUBLE) / d.cn - CAST(d.bs AS DOUBLE) / d.bn)
       |      * (CAST(d.cs AS DOUBLE) / d.cn - CAST(d.bs AS DOUBLE) / d.bn)
       |      / greatest(CAST(d.bq AS DOUBLE) / d.bn * 1000000
       |                 - (CAST(d.bs AS DOUBLE) / d.bn)
       |                   * (CAST(d.bs AS DOUBLE) / d.bn), 1.0)
       |  FROM r2 r JOIN d2dims d ON d.i = r.i + 1
       |),
       |d2 AS MATERIALIZED (
       |  SELECT t2m, t2m > $thr AS drifted FROM (
       |    SELECT CAST(floor(t2 * (SELECT n2 FROM cnts) / 64 * 1000000)
       |                AS BIGINT) AS t2m
       |    FROM r2 WHERE i = 64)
       |),
       |base3 AS MATERIALIZED (
       |  SELECT a.i,
       |         CASE WHEN (SELECT drifted FROM d2) THEN abc.s
       |              WHEN (SELECT drifted FROM d1) THEN ab.s
       |              ELSE a.s END AS s,
       |         CASE WHEN (SELECT drifted FROM d2) THEN abc.q
       |              WHEN (SELECT drifted FROM d1) THEN ab.q
       |              ELSE a.q END AS q,
       |         CASE WHEN (SELECT drifted FROM d2) THEN abc.n
       |              WHEN (SELECT drifted FROM d1) THEN ab.n
       |              ELSE a.n END AS n
       |  FROM mA a JOIN mAB ab USING (i) JOIN mABC abc USING (i)
       |),
       |d3dims AS MATERIALIZED (
       |  SELECT b.i, b.s AS bs, b.q AS bq, b.n AS bn, c.s AS cs, c.n AS cn
       |  FROM base3 b JOIN b3m c USING (i)
       |),
       |r3 AS (
       |  SELECT 0 AS i, CAST(0 AS DOUBLE) AS t2
       |  UNION ALL
       |  SELECT r.i + 1, r.t2 +
       |    (CAST(d.cs AS DOUBLE) / d.cn - CAST(d.bs AS DOUBLE) / d.bn)
       |      * (CAST(d.cs AS DOUBLE) / d.cn - CAST(d.bs AS DOUBLE) / d.bn)
       |      / greatest(CAST(d.bq AS DOUBLE) / d.bn * 1000000
       |                 - (CAST(d.bs AS DOUBLE) / d.bn)
       |                   * (CAST(d.bs AS DOUBLE) / d.bn), 1.0)
       |  FROM r3 r JOIN d3dims d ON d.i = r.i + 1
       |),
       |d3 AS MATERIALIZED (
       |  SELECT t2m, t2m > $thr AS drifted FROM (
       |    SELECT CAST(floor(t2 * (SELECT n3 FROM cnts) / 64 * 1000000)
       |                AS BIGINT) AS t2m
       |    FROM r3 WHERE i = 64)
       |)
       |SELECT * FROM (
       |  SELECT CAST(1 AS BIGINT) AS log_seq,
       |         CAST(1 + CASE WHEN d1.drifted THEN 1 ELSE 0 END AS BIGINT)
       |           AS gen_seq,
       |         CASE WHEN d1.drifted THEN 'retrain' ELSE 'ingest' END
       |           AS action,
       |         c.n1 AS batch_n, c.tot0 AS total_n,
       |         d1.t2m AS drift_t2_micro,
       |         CAST($thr AS BIGINT) AS drift_t2_threshold_micro
       |  FROM d1, cnts c
       |  UNION ALL
       |  SELECT CAST(2 AS BIGINT),
       |         CAST(1 + CASE WHEN d1.drifted THEN 1 ELSE 0 END
       |                + CASE WHEN d2.drifted THEN 1 ELSE 0 END AS BIGINT),
       |         CASE WHEN d2.drifted THEN 'retrain' ELSE 'ingest' END,
       |         c.n2, c.totAll, d2.t2m, CAST($thr AS BIGINT)
       |  FROM d1, d2, cnts c
       |  UNION ALL
       |  SELECT CAST(3 AS BIGINT),
       |         CAST(1 + CASE WHEN d1.drifted THEN 1 ELSE 0 END
       |                + CASE WHEN d2.drifted THEN 1 ELSE 0 END
       |                + CASE WHEN d3.drifted THEN 1 ELSE 0 END AS BIGINT),
       |         CASE WHEN d3.drifted THEN 'retrain' ELSE 'ingest' END,
       |         c.n3, c.totAll + c.n3, d3.t2m, CAST($thr AS BIGINT)
       |  FROM d1, d2, d3, cnts c
       |)
       |ORDER BY log_seq""".stripMargin
  }

  /** Tombstone-aware serving oracle (round 11): the IVF probe with a
    * deleted-id set excluded from the candidates — deletes in an
    * append-only inverted file are markers anti-joined at serve time
    * (IvfIndex.delete/tombstones/compact own the lifecycle; the
    * declared key pins the serving shape on a deterministic delete
    * set). */
  private lazy val ivfDeletedOracle: String =
    s"""WITH $ivfTrainedAssignCtes,
       |dead AS (
       |  SELECT vec_id FROM embeddings WHERE vec_id % 50 = 0
       |),
       |probes AS (
       |  SELECT q_id, q_emb, cell FROM (
       |    SELECT e.vec_id AS q_id, e.embedding AS q_emb, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                          CAST(c.cent AS DOUBLE[])), 6)
       |             DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN c2 c
       |    WHERE e.vec_id < 20)
       |  WHERE rn <= 2
       |), rr AS (
       |  SELECT DISTINCT q_id, n.vec_id AS n_id,
       |         round(list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
       |                                      CAST(n.embedding AS DOUBLE[])), 6) AS sim
       |  FROM probes p JOIN a3 n ON n.cell = p.cell AND n.vec_id <> p.q_id
       |  WHERE n.vec_id NOT IN (SELECT vec_id FROM dead)
       |), r AS (
       |  SELECT q_id, n_id, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
       |  FROM rr
       |)
       |SELECT q_id, n_id, sim, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5
       |ORDER BY q_id, rn""".stripMargin

  /** Filtered-ANN oracle (round 11 — VERDICT r10 #2): the IVF probe
    * with the llm_hard_negatives label-inequality rule applied to the
    * inverted-file members BEFORE the top-k cut — candidates carry
    * their stored label, so the serving plan never re-joins the base
    * table. */
  private lazy val ivfFilteredOracle: String =
    s"""WITH $ivfTrainedAssignCtes,
       |probes AS (
       |  SELECT q_id, q_label, q_emb, cell FROM (
       |    SELECT e.vec_id AS q_id, e.label AS q_label,
       |           e.embedding AS q_emb, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                          CAST(c.cent AS DOUBLE[])), 6)
       |             DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN c2 c
       |    WHERE e.vec_id < 20)
       |  WHERE rn <= 2
       |), rr AS (
       |  SELECT DISTINCT q_id, q_label, n.vec_id AS n_id,
       |         m.label AS n_label,
       |         round(list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
       |                                      CAST(n.embedding AS DOUBLE[])), 6) AS sim
       |  FROM probes p JOIN a3 n ON n.cell = p.cell AND n.vec_id <> p.q_id
       |  JOIN embeddings m ON m.vec_id = n.vec_id
       |  WHERE m.label <> p.q_label
       |), r AS (
       |  SELECT q_id, q_label, n_id, n_label, sim,
       |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
       |  FROM rr
       |)
       |SELECT q_id, q_label, n_id, n_label, sim, CAST(rn AS BIGINT) AS rn
       |FROM r WHERE rn <= 5
       |ORDER BY q_id, rn""".stripMargin

  // ---- shared exact-scatter PCA chain (llm_embedding_pca_var +
  // llm_embedding_center_project — one definition so the two keys'
  // replays cannot drift). Design doctrine in the pca_var key header. ----

  /** DuckDB: centered 64×64 scatter as a 4096-double list from the
    * one-row (n, ql, tl) moment frame. */
  private val pcaSdD: String =
    """list_transform(range(1, 4097), idx ->
      |  CAST(CAST(n AS HUGEINT)
      |         * CAST(ql[CAST((least((idx - 1) // 64 + 1,
      |                              (idx - 1) % 64 + 1) - 1) * 65
      |                  - ((least((idx - 1) // 64 + 1,
      |                            (idx - 1) % 64 + 1) - 1)
      |                     * least((idx - 1) // 64 + 1,
      |                             (idx - 1) % 64 + 1)) // 2
      |                  + (greatest((idx - 1) // 64 + 1,
      |                              (idx - 1) % 64 + 1)
      |                     - least((idx - 1) // 64 + 1,
      |                             (idx - 1) % 64 + 1) + 1) AS INT)
      |               ].q AS HUGEINT)
      |       - CAST(tl[CAST((idx - 1) // 64 + 1 AS INT)] AS HUGEINT)
      |         * CAST(tl[CAST((idx - 1) % 64 + 1 AS INT)] AS HUGEINT)
      |       AS DOUBLE))""".stripMargin

  private def pcaStepD(v: String): String =
    s"""list_transform(range(1, 65), j ->
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform(range(1, 65), k ->
       |      sd[CAST((j - 1) * 64 + k AS INT)]
       |        * $v[CAST(k AS INT)])),
       |    (a, x) -> a + x))""".stripMargin

  private def pcaNormD(w: String): String =
    s"""list_transform($w, x -> x / sqrt(
       |  list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |    list_transform($w, y -> y * y)), (a, x) -> a + x)))"""
      .stripMargin

  /** Deterministic vector-sample modulus for the SAMPLED-scatter PCA
    * twin (round 9 — VERDICT r8 "declare the 100 TB dial"): the exact
    * DECIMAL scatter pays ~2080 integer products per vector — linear
    * and map-side-combinable, but 60 s/1M vectors measured
    * (SCALING.md). The dominant direction of a corpus is a POPULATION
    * statistic; a fixed-rate portable-hash draw over vec_id
    * (re-ingestion-stable, engine-replayable) feeds the SAME
    * scatter/power-iteration chain at 1/m the fact-stage cost, and the
    * oracle replays the identical predicate so the twin stays
    * hash-exact. llm_embedding_pca_var remains the exact twin. */
  private val PcaSampleMod = 4

  /** The sample predicate, both spellings (one definition — the Spark
    * filter and the oracle WHERE can never drift). */
  private[graft] def pcaSampleCol: Column =
    PortableHash.pHash(concat(lit("pcas:"), col("vec_id").cast("string"))) %
      PcaSampleMod === 0
  private def pcaSampleSql: String =
    PortableHash.sql("'pcas:' || CAST(vec_id AS VARCHAR)") +
      s" % $PcaSampleMod = 0"

  /** DuckDB: moments → scatter → 3 power rounds; ends with CTE `p3`
    * carrying (n, tl, sd, v3). `where`: optional predicate over the
    * embeddings scan (the sampled-scatter twin). */
  private def pcaChainCtes(where: String): String = {
    val w = if (where.isEmpty) "" else s"\n  WHERE $where"
    s"""x AS (
       |  SELECT list_transform(embedding, x ->
       |           CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT))
       |           AS xi
       |  FROM embeddings$w
       |), ti AS (
       |  SELECT j, CAST(sum(v) AS HUGEINT) AS tj FROM (
       |    SELECT unnest(range(1, 65)) AS j, unnest(xi) AS v FROM x)
       |  GROUP BY j
       |), qi AS (
       |  SELECT j, k, CAST(sum(v) AS HUGEINT) AS q FROM (
       |    SELECT unnest(flatten(list_transform(range(1, 65), j ->
       |             list_transform(range(j, 65), k -> struct_pack(
       |               j := j, k := k,
       |               v := xi[CAST(j AS INT)] * xi[CAST(k AS INT)])))),
       |           recursive := true)
       |    FROM x)
       |  GROUP BY j, k
       |), one AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM x) AS n,
       |         (SELECT list(struct_pack(j := j, k := k, q := q)
       |                      ORDER BY j, k) FROM qi) AS ql,
       |         (SELECT list(tj ORDER BY j) FROM ti) AS tl
       |), scat AS (
       |  SELECT n, tl, $pcaSdD AS sd FROM one
       |), p1 AS (
       |  SELECT n, tl, sd, ${pcaNormD(pcaStepD(
      "list_transform(range(1, 65), z -> CAST(1 AS DOUBLE))"))} AS v1
       |  FROM scat
       |), p2 AS (
       |  SELECT n, tl, sd, ${pcaNormD(pcaStepD("v1"))} AS v2 FROM p1
       |), p3 AS (
       |  SELECT n, tl, sd, ${pcaNormD(pcaStepD("v2"))} AS v3 FROM p2
       |)""".stripMargin
  }

  /** The exact (unsampled) chain — the existing PCA keys' spelling. */
  private lazy val pcaChainCtes: String = pcaChainCtes("")

  /** Spark twin of [[pcaChainCtes]]: the ONE-ROW frame with columns
    * (n, ql, tl, sd, v1, v2, v3). `e` = embeddings (vec_id, embedding). */
  private[graft] def pcaTopFrame(e: DataFrame): DataFrame = {
    // ONE fact pass (round 13; was ti + qi + n = two explode+groupBy
    // shuffles over per-row STRUCT arrays plus a persisted base and two
    // broadcast crossJoins): each row flattens its 2080 upper-triangle
    // products, its 64 first moments, and a count-1 slot into a single
    // primitive BIGINT array — no struct allocation per element — and
    // ONE posexplode + groupBy(pos) produces every moment exactly
    // (per-element products fit LONG; only the cross-row sums need the
    // DECIMAL(28,0) fold, unchanged). The scatter's ql index arithmetic
    // already walks (j, k) in lexicographic order, which IS pos order,
    // so the (j, k) struct fields were never needed.
    val flat = e.select(expr(
      """transform(embedding, x ->
        |  CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT))"""
        .stripMargin).as("xi"))
      .select(posexplode(expr(
        """concat(
          |  flatten(transform(sequence(1, 64), j ->
          |    transform(sequence(j, 64), k ->
          |      element_at(xi, j) * element_at(xi, k)))),
          |  xi,
          |  array(CAST(1 AS BIGINT)))""".stripMargin)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(sum(col("v").cast("decimal(28,0)")).as("q"))
    val one = flat.agg(
      expr("""transform(sort_array(collect_list(
             |  CASE WHEN pos < 2080 THEN struct(pos, q) END)), e -> e.q)"""
        .stripMargin).as("ql"),
      expr("""transform(sort_array(collect_list(
             |  CASE WHEN pos >= 2080 AND pos < 2144 THEN struct(pos, q)
             |  END)), e -> e.q)""".stripMargin).as("tl"),
      expr("CAST(max(CASE WHEN pos = 2144 THEN q END) AS BIGINT)").as("n"))
    val dec = "DECIMAL(38,0)"
    val sdS =
      s"""transform(sequence(1, 4096), idx ->
         |  CAST(CAST(n AS $dec)
         |         * CAST(element_at(ql,
         |             CAST((least((idx - 1) DIV 64 + 1,
         |                         (idx - 1) % 64 + 1) - 1) * 65
         |               - ((least((idx - 1) DIV 64 + 1,
         |                         (idx - 1) % 64 + 1) - 1)
         |                  * least((idx - 1) DIV 64 + 1,
         |                          (idx - 1) % 64 + 1)) DIV 2
         |               + (greatest((idx - 1) DIV 64 + 1,
         |                           (idx - 1) % 64 + 1)
         |                  - least((idx - 1) DIV 64 + 1,
         |                          (idx - 1) % 64 + 1) + 1) AS INT)
         |             ) AS $dec)
         |       - CAST(element_at(tl, CAST((idx - 1) DIV 64 + 1 AS INT))
         |              AS $dec)
         |         * CAST(element_at(tl, CAST((idx - 1) % 64 + 1 AS INT))
         |                AS $dec)
         |       AS DOUBLE))""".stripMargin
    def stepS(v: String) =
      s"""transform(sequence(1, 64), j ->
         |  aggregate(transform(sequence(1, 64), k ->
         |      element_at(sd, CAST((j - 1) * 64 + k AS INT))
         |        * element_at($v, CAST(k AS INT))),
         |    CAST(0 AS DOUBLE), (a, x) -> a + x))""".stripMargin
    def normS(w: String) =
      s"""transform($w, x -> x / sqrt(
         |  aggregate(transform($w, y -> y * y),
         |    CAST(0 AS DOUBLE), (a, x) -> a + x)))""".stripMargin
    one
      .withColumn("sd", expr(sdS))
      .withColumn("v1", expr(normS(stepS(
        "transform(sequence(1, 64), z -> CAST(1 AS DOUBLE))"))))
      .withColumn("v2", expr(normS(stepS("v1"))))
      .withColumn("v3", expr(normS(stepS("v2"))))
  }

  /** Oracle readout shared by the exact and sampled PCA-variance twins
    * (one definition — the two keys' replays cannot drift): Rayleigh
    * quotient / trace over the chain's final (n, sd, v3) row. */
  private def pcaVarOracle(chain: String): String =
    s"""WITH $chain, fin AS (
       |  SELECT n, sd, v3,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(1, 65), j ->
       |             v3[CAST(j AS INT)]
       |               * list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |                   list_transform(range(1, 65), k ->
       |                     sd[CAST((j - 1) * 64 + k AS INT)]
       |                       * v3[CAST(k AS INT)])),
       |                   (a, x) -> a + x))), (a, x) -> a + x)
       |           AS rayleigh,
       |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
       |           list_transform(range(1, 65), j ->
       |             sd[CAST((j - 1) * 64 + j AS INT)])), (a, x) -> a + x)
       |           AS trace,
       |         list_max(list_transform(v3, x -> abs(x))) AS mx
       |  FROM p3
       |)
       |SELECT n AS n_vectors, CAST(64 AS BIGINT) AS dim,
       |       floor(rayleigh / trace * 1000000) / 1000000
       |         AS var_explained_pc1,
       |       CAST(list_filter(range(1, 65),
       |              j -> abs(v3[CAST(j AS INT)]) = mx)[1] AS BIGINT)
       |         AS lead_dim,
       |       floor(v3[CAST(list_filter(range(1, 65),
       |              j -> abs(v3[CAST(j AS INT)]) = mx)[1] AS INT)]
       |             * 1000000) / 1000000 AS lead_loading
       |FROM fin""".stripMargin

  /** Spark twin of [[pcaVarOracle]] over a [[pcaTopFrame]] result. */
  private def pcaVarReadout(top: DataFrame): DataFrame = {
    val fin = top
      .withColumn("rayleigh", expr(
        """aggregate(transform(sequence(1, 64), j ->
          |    element_at(v3, CAST(j AS INT))
          |      * aggregate(transform(sequence(1, 64), k ->
          |          element_at(sd, CAST((j - 1) * 64 + k AS INT))
          |            * element_at(v3, CAST(k AS INT))),
          |        CAST(0 AS DOUBLE), (a, x) -> a + x)),
          |  CAST(0 AS DOUBLE), (a, x) -> a + x)""".stripMargin))
      .withColumn("trace", expr(
        """aggregate(transform(sequence(1, 64), j ->
          |    element_at(sd, CAST((j - 1) * 64 + j AS INT))),
          |  CAST(0 AS DOUBLE), (a, x) -> a + x)""".stripMargin))
      .withColumn("mx",
        expr("array_max(transform(v3, x -> abs(x)))"))
    fin.select(col("n").as("n_vectors"), lit(64L).as("dim"),
      (floor(col("rayleigh") / col("trace") * 1000000) / 1000000)
        .as("var_explained_pc1"),
      expr(
        """CAST(element_at(filter(sequence(1, 64),
          |  j -> abs(element_at(v3, CAST(j AS INT))) = mx), 1)
          |  AS BIGINT)""".stripMargin).as("lead_dim"),
      (floor(expr(
        """element_at(v3, CAST(element_at(filter(sequence(1, 64),
          |  j -> abs(element_at(v3, CAST(j AS INT))) = mx), 1)
          |  AS INT))""".stripMargin) * 1000000) / 1000000)
        .as("lead_loading"))
  }

  /** Probe the `nprobe` closest cells per query, exact-rerank within
    * them, top-k per query. Candidates ∝ probed-cell population, never
    * the corpus. */
  private[graft] def ivfTopk(
      assigned: DataFrame, cents: DataFrame, queries: DataFrame,
      nprobe: Int, k: Int): DataFrame = {
    val wq = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))
    val probes = queries
      .join(broadcast(cents), lit(true))
      .select(col("q_id"), col("q_emb"), col("cell"),
        round(cosineSim(col("q_emb"), col("cent")), 6).as("sim"))
      .withColumn("rn", row_number().over(wq))
      .where(col("rn") <= nprobe)
      .select(col("q_id"), col("q_emb"), col("cell"))
    val wr = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    probes
      .join(assigned.select(col("cell"), col("vec_id").as("n_id"),
        col("embedding").as("n_emb")), Seq("cell"))
      .where(col("n_id") =!= col("q_id"))
      .select(col("q_id"), col("n_id"),
        round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
      .distinct()
      .withColumn("rn", row_number().over(wr))
      .where(col("rn") <= k)
      .select(col("q_id"), col("n_id"), col("sim"),
        col("rn").cast("long").as("rn"))
      .orderBy("q_id", "rn")
  }

  /** The ONE int8 quantization grid. llm_embedding_quantize (the storage
    * path) and llm_cosine_topk_int8 (the serving path) plus both their
    * SQL twins must quantize identically — these four definitions are the
    * only statement of the formula, so editing the grid cannot decouple
    * the paths. scale = round(max|x|/127, 6); code = round(x/scale),
    * 0 for the all-zero vector. */
  private def quantScale(vec: Column): Column =
    round(array_max(transform(vec, x => abs(x.cast("double")))) / 127, 6)
  private def quantCode(x: Column, scale: Column): Column =
    when(scale === 0, lit(0.0)).otherwise(round(x.cast("double") / scale))
  private val quantScaleSql =
    "round(list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127, 6)"
  private def quantCodeSql(x: String, scale: String): String =
    s"CASE WHEN $scale = 0 THEN 0 ELSE round(CAST($x AS DOUBLE) / $scale) END"

  // -------------------------------------------------------------------
  // Product quantization (Jégou, Douze, Schmid, TPAMI 2011 — the
  // driver-side double-precision variant lives in functions/
  // ProductQuantizer.scala with PqSpec): m=8 subspaces × 8 dims, k=256
  // codes per subspace (8-bit codes — the PQ8 recipe), so a 64-dim
  // float vector (256 B) stores as 8 one-byte codes (8 B, 32×) and
  // queries score candidates by Asymmetric
  // Distance Computation — a per-(query, subspace) lookup table of
  // code dot-products, summed by stored code. The DECLARED chain runs
  // every training / encode / ADC step on an exact integer TICK grid
  // (t = round(x·10⁴) per dimension — the int8 key's fixed-point
  // discipline applied to a whole codebook): squared-L2 assignment
  // distances, centroid re-averages (floor division), LUT entries and
  // ADC scores are all BIGINT arithmetic, so both engines pick the
  // IDENTICAL codebook, codes, and candidate cut — no float compare
  // anywhere before the final exact-cosine re-rank.
  // -------------------------------------------------------------------
  private[graft] val PqM = 8 // subspaces
  private[graft] val PqD = 8 // dims per subspace (PqM·PqD = embedding dim)
  private[graft] val PqK = 256 // codes per subspace (8-bit codes — the PQ8 recipe)

  /** (vec_id, j, sub): one row per vector per subspace; sub = that
    * subspace's PqD ticks. The explode is map-side (×PqM fan-out of an
    * already-narrow frame) — at 100 TB this frame is the PQ build's
    * working set and is ~2.5× the PACKED code size, far below raw
    * vectors. */
  private[graft] def pqSubFrame(e: DataFrame): DataFrame = {
    val ticks = transform(col("embedding"),
      x => round(x.cast("double") * 10000).cast("long"))
    e.select(col("vec_id"), ticks.as("t"))
      .select(col("vec_id"), posexplode(
        array((0 until PqM).map(j => slice(col("t"), j * PqD + 1, PqD)): _*))
        .as(Seq("j", "sub")))
  }

  /** Exact-integer squared L2 between two PqD-tick arrays. */
  private def pqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, v) => acc + v)

  /** Uniform deterministic seeds: per (subspace, hash-bucket) the
    * min-uniform-hash vector's sub-ticks — PqK independent draws per
    * subspace, one map-side-combinable min_by shuffle (the
    * [[ivfSeedScalable]] stage-1 idiom, per subspace). */
  private[graft] def pqSeeds(sv: DataFrame): DataFrame = {
    def ph(prefix: String): Column = PortableHash.pHash(concat(
      lit(prefix), col("j").cast("string"), lit(":"),
      col("vec_id").cast("string")))
    sv.select(col("j"), col("sub"), col("vec_id"),
        (ph("pqb") % PqK).as("c"), ph("pqu").as("uh"))
      .groupBy("j", "c")
      .agg(min_by(col("sub"), struct(col("uh"), col("vec_id"))).as("cent"))
  }

  /** The codebook re-shaped for in-row argmin: ONE row per subspace,
    * code ids and centroids as parallel arrays sorted by code (c is
    * unique per j, so the struct sort is total). PqM rows — broadcast
    * at any corpus size. */
  private def pqCodebookArr(cb: DataFrame): DataFrame = {
    val sorted = array_sort(collect_list(struct(col("c"), col("cent"))))
    cb.groupBy("j").agg(
      transform(sorted, x => x("c")).as("cs"),
      transform(sorted, x => x("cent")).as("cents"))
  }

  /** argmin code assignment of every (vec_id, j) row against its
    * subspace codebook — IN-ROW over the broadcast array codebook
    * (map-side, zero shuffle: the join+groupBy formulation pushed
    * n·PqM·PqK rows through an agg exchange and cost ~4× the whole
    * chain) via the native codegen [[org.apache.spark.sql.graft
    * .PqArgminCode]] (one fused long loop; the HOF formulation
    * evaluated ~2·k·d boxed lambdas per row and was just as slow as
    * the shuffle it replaced). First-min over the code-sorted array ==
    * the oracle's ORDER BY (dist, c) rn=1. Keeps sub for the
    * re-average pass. */
  private[graft] def pqAssign(sv: DataFrame, cb: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.VectorFunctions.pqArgminCode
    sv.join(broadcast(pqCodebookArr(cb)), Seq("j"))
      .select(col("vec_id"), col("j"), col("sub"),
        pqArgminCode(col("sub"), col("cents"), col("cs")).as("code"))
  }

  /** One Lloyd re-average in exact integers: per (j, code, dim) the
    * floor of sum/count — (s − pmod(s, n)) is divisible by n, so `div`
    * is exact and both engines floor identically for negative sums. */
  private[graft] def pqRecenter(a: DataFrame): DataFrame =
    a.select(col("j"), col("code").as("c"),
        posexplode(col("sub")).as(Seq("dim", "t")))
      .groupBy("j", "c", "dim")
      .agg(sum(col("t")).as("sl"), count(lit(1)).as("n"))
      .select(col("j"), col("c"), col("dim"),
        expr("(sl - pmod(sl, n)) div n").as("v"))
      .groupBy("j", "c")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("v")))),
        x => x("v")).as("cent"))

  /** Pack per-subspace codes into the stored-index row shape: one row
    * per vector, codes ordered by subspace — what a real PQ index
    * stores (8 small ints per vector, 32× below the raw floats). */
  private[graft] def pqCodesPacked(assigned: DataFrame): DataFrame =
    assigned.groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("j"), col("code")))),
        x => x("code")).as("codes"))

  /** DuckDB twin of the squared-L2 between list columns `a` and `b`. */
  private def pqDistSql(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, ${PqD + 1}),
       |             i -> (list_extract($a, i) - list_extract($b, i))
       |                * (list_extract($a, i) - list_extract($b, i))))""".stripMargin

  /** DuckDB twin of one [[pqAssign]] pass from codebook CTE `cb` into
    * CTE `out` (columns vec_id, j, sub, code). `src` is the encoded
    * subframe — training rounds encode the training slice, the final
    * corpus encode covers everything (round 11, the ivfAssignCte
    * parameterization applied to PQ). */
  private def pqAssignCte(cb: String, out: String, src: String = "sv"): String =
    s"""$out AS (
       |  SELECT vec_id, j, sub, c AS code FROM (
       |    SELECT $src.vec_id, $src.j, $src.sub, $cb.c,
       |           row_number() OVER (PARTITION BY $src.vec_id, $src.j
       |             ORDER BY ${pqDistSql(s"$src.sub", s"$cb.cent")}, $cb.c) AS rn
       |    FROM $src JOIN $cb ON $src.j = $cb.j) WHERE rn = 1
       |)""".stripMargin

  /** The shared PQ training replay: tick subspaces → hash-bucket seeds
    * → assign → exact-integer re-average into trained codebook `cb`.
    * `trainSrc`/`extraCte`: the ingest twin trains on a base slice
    * (`svb`) while tk/sv still cover the whole corpus for the final
    * encode (round 11 — the ivfBaseTrainedAssignCtes pattern). */
  private def pqTrainCtesFrom(
      trainSrc: String, extraCte: String = ""): String = {
    def ph(prefix: String): String = PortableHash.sql(
      s"'$prefix' || CAST(j AS VARCHAR) || ':' || CAST(vec_id AS VARCHAR)")
    s"""tk AS (
       |  SELECT vec_id, list_transform(embedding, x ->
       |           CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)) AS t
       |  FROM embeddings
       |), sv AS (
       |  SELECT vec_id, j, list_transform(range(1, ${PqD + 1}),
       |           i -> list_extract(t, j * $PqD + i)) AS sub
       |  FROM tk CROSS JOIN (SELECT unnest(range(0, $PqM)) AS j)
       |)$extraCte, sd AS (
       |  SELECT j, c, sub AS cent FROM (
       |    SELECT j, ${ph("pqb")} % $PqK AS c, sub,
       |           row_number() OVER (PARTITION BY j, ${ph("pqb")} % $PqK
       |             ORDER BY ${ph("pqu")}, vec_id) AS rn
       |    FROM $trainSrc) WHERE rn = 1
       |), ${pqAssignCte("sd", "pa1", trainSrc)}, cb AS (
       |  SELECT j, code AS c, list(v ORDER BY dim) AS cent FROM (
       |    SELECT j, code, dim,
       |           (s - ((s % n) + n) % n) // n AS v
       |    FROM (
       |      SELECT j, code, dim, CAST(sum(t) AS BIGINT) AS s,
       |             CAST(count(*) AS BIGINT) AS n
       |      FROM (SELECT j, code, unnest(sub) AS t,
       |                   unnest(range(1, ${PqD + 1})) AS dim FROM pa1)
       |      GROUP BY 1, 2, 3))
       |  GROUP BY 1, 2
       |)""".stripMargin
  }

  private def pqTrainCtes: String = pqTrainCtesFrom("sv")

  /** Base-trained PQ chain for the ingest twin: seeds + Lloyd see only
    * vec_id < `boundary`; the final encode still covers everything. */
  private def pqBaseTrainCtes(boundary: Long): String =
    pqTrainCtesFrom("svb",
      s""", svb AS (
         |  SELECT * FROM sv WHERE vec_id < $boundary
         |)""".stripMargin)

  /** Distinct doc shingles, with an optional WHERE pushed into the doc
    * scan (the est-quality DOC sample — the filter must prune documents
    * BEFORE shingling or the sample saves nothing). */
  private def shingleSqlWhere(docWhere: Option[String]): String = {
    val w = docWhere.map(p => s" WHERE $p").getOrElse("")
    s"""SELECT DISTINCT doc_id,
       |       unnest(list_transform(range(1, len(t) - 1),
       |              i -> array_to_string(t[i:i+2], ' '))) AS s
       |FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents$w""".stripMargin
  }
  private val shingleSql = shingleSqlWhere(None)

  /** Shared by llm_decontaminate and llm_decontaminate_bloom: the bloom
    * prefilter is result-invisible (no false negatives + exact verify),
    * so both plans answer the SAME oracle. */
  private lazy val decontamOracle =
    s"""WITH sh AS (
       |  $shingleSql)
       |), bs AS (
       |  SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0
       |), cs AS (
       |  SELECT doc_id, s FROM sh WHERE doc_id % 97 <> 0
       |), tot AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
       |  FROM cs GROUP BY doc_id
       |), shr AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM cs WHERE s IN (SELECT s FROM bs) GROUP BY doc_id
       |)
       |SELECT tot.doc_id AS doc_id, n_shingles,
       |       coalesce(n_shared, 0) AS n_shared,
       |       round(coalesce(n_shared, 0) * 1.0 / n_shingles, 6) AS contamination,
       |       CAST(CASE WHEN coalesce(n_shared, 0) > 0 THEN 1 ELSE 0 END AS INT)
       |         AS is_contaminated
       |FROM tot LEFT JOIN shr ON tot.doc_id = shr.doc_id
       |ORDER BY tot.doc_id""".stripMargin

  /** Shared by llm_heavy_hitters (CMS plan) and llm_heavy_hitters_mg (MG
    * plan): both sketches only PRUNE candidates — the declared result is
    * the exact φ=0.5% HAVING query either way. */
  private lazy val heavyHittersOracle =
    """WITH tok AS (
      |  SELECT unnest(string_split(text, ' ')) AS token FROM documents
      |), tot AS (
      |  SELECT count(*) AS n FROM tok
      |)
      |SELECT token, CAST(count(*) AS BIGINT) AS cnt
      |FROM tok
      |GROUP BY token
      |HAVING count(*) >= 0.005 * (SELECT n FROM tot)
      |ORDER BY cnt DESC, token""".stripMargin

  /** 16 deterministic random hyperplanes (seed 42) for sign-LSH. Shared by
    * the Spark implementations AND the oracle SQL generators below — the
    * oracle inlines each plane as a DOUBLE[] literal (float→double is
    * exact, and Scala's Double.toString round-trips, so both engines see
    * bit-identical plane values).
    */
  private lazy val lshPlanes: Seq[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(16)(Array.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  private def planeSqlLit(i: Int): String =
    lshPlanes(i).map(f => f.toDouble.toString).mkString("CAST([", ", ", "] AS DOUBLE[])")

  /** Oracle CTE body: one sign bit per hyperplane. Dot accumulation is
    * left-to-right in double on both engines; the sign is robust to any
    * residual ulp noise (|dot| ≪ 1e-12 would be required to flip it).
    */
  private def lshSigSql: String =
    "SELECT vec_id,\n         " + (0 until 16).map(i =>
      s"CASE WHEN list_sum(list_transform(range(1, 65), " +
        s"j -> CAST(embedding[j] AS DOUBLE) * (${planeSqlLit(i)})[j])) > 0 " +
        s"THEN 1 ELSE 0 END AS bit_$i").mkString(",\n         ") +
      "\n  FROM embeddings"

  private def lshBandedSql(nBands: Int, bits: Int): String =
    (0 until nBands).map { b =>
      val key = (0 until bits).map(i => s"bit_${b * bits + i} * ${1 << i}").mkString(" + ")
      s"SELECT vec_id, $b AS band, $key AS band_key FROM sig"
    }.mkString("\n  UNION ALL ")

  /** Spark side: vec_id + 16 sign bits (codegen dot via [[VectorDot]]).
    * Takes any (vec_id, embedding) frame so ScaleSmoke can drive it at
    * synthetic scale.
    */
  private[graft] def lshSig(embDf: DataFrame): DataFrame = {
    val bits = lshPlanes.zipWithIndex.map { case (p, i) =>
      (vectorDot(col("embedding"), typedlit(p)) > 0).cast("int").as(s"bit_$i")
    }
    embDf.select(col("vec_id") +: bits: _*)
  }

  /** Spark side: unpivot the signature into (vec_id, band, band_key). */
  private[graft] def lshBanded(sig: DataFrame, nBands: Int, bits: Int): DataFrame = {
    def key(b: Int): Column =
      (0 until bits).map(i => col(s"bit_${b * bits + i}") * (1 << i)).reduce(_ + _)
    (0 until nBands).map(b =>
      sig.select(col("vec_id"), lit(b).as("band"), key(b).as("band_key")))
      .reduce(_.unionByName(_))
  }

  /** Candidate (a_id < b_id) pairs sharing any LSH band bucket — the
    * prefilter stage of [[qs llm_sim_join_lsh]], exposed for
    * LshPrefilterSpec's recall measurement against brute force.
    */
  private[graft] def lshCandidatePairs(
      s: SparkSession, d: String, nBands: Int, bits: Int): DataFrame = {
    // persist: the self-join's two sides otherwise each recompute all 16
    // signature dot products over the scan. shuffle_hash: same broadcast
    // hygiene as the minhash band join — at corpus scale the banded frame
    // is n×nBands rows and must never be AQE-promoted to broadcast.
    // pre-partitioned on the equi-keys (round 4): both self-join sides
    // read the cached partitioning — zero exchanges in the join.
    val banded = lshBanded(lshSig(emb(s, d)), nBands, bits)
      .repartition(col("band"), col("band_key"))
      .persist().hint("shuffle_hash")
    banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("a_id"), col("y.vec_id").as("b_id"))
      .distinct()
  }

  /** Oracle CTE chain ending in `verified(d1, d2, est_jaccard)`: minhash
    * banding (8 bands × 2 rows, h_i = h1 + i·h2 double-hash family from one
    * md5) → candidate pairs → exact-Jaccard verification over distinct
    * shingles. Shared by llm_minhash_neardup and llm_neardup_prune.
    */
  private lazy val minhashVerifiedCtes: String = minhashVerifiedCtes(None)

  /** Deterministic DOCUMENT sample modulus for the
    * llm_minhash_est_quality READOUT (round 10 — the r9 pair-level
    * 1-in-4 draw pruned the verify/agreement joins but never touched
    * the key's true floor, the full corpus shingle→md5→sketch pass; the
    * estimator statistic doesn't need every document any more than it
    * needed every pair). A 1-in-3 portable-hash draw over doc_id is
    * re-run-stable, engine-independent (the oracle pushes the identical
    * predicate into its doc scan), shrinks the sketch pass by the rate
    * AND the candidate pair set quadratically (~1/9 — the r9 pair draw
    * kept 1/4), while still leaving many pairs per Jaccard bucket at
    * any SF. The EXHAUSTIVE audit lives in ApproxSpec, where a QA sweep
    * belongs. */
  private val EstQualityDocMod = 3
  private def estQualityDocPred: Column =
    PortableHash.pHash(concat(lit("eqd:"), col("doc_id").cast("string"))) %
      EstQualityDocMod === 0
  private def estQualityDocPredSql: String =
    PortableHash.sql("'eqd:' || CAST(doc_id AS VARCHAR)") +
      s" % $EstQualityDocMod = 0"

  /** `d2Min`: incremental mode — only candidate pairs whose HIGHER id is ≥
    * the batch boundary are generated (new-vs-corpus and new-vs-new; the
    * corpus×corpus quadrant is never probed). Mirrors
    * [[minhashVerified(docsDf:*]]'s parameter.
    * `pairSampleMod`: deterministic 1-in-m candidate-pair sample — the
    * verify stage (and everything downstream) sees only pairs whose
    * portable pair-hash ≡ 0 (mod m). For estimator-QUALITY readouts, not
    * result keys: dedup/prune semantics need every verified pair.
    */
  /** Ingest-batch boundary shared by the incremental near-dup keys:
    * the newest ~20% of doc ids are "today's batch", the rest the
    * corpus — data-DERIVED so the split holds at every SF (a literal
    * tuned at one SF inverts at another: 400 splits sf0.01 80/20 but
    * makes the "batch" 92% of the corpus at sf0.1). One text, two
    * evaluators: the SQL rides the oracle as a scalar subquery; the
    * Spark twin computes the same `(max+1)·4/5` floor division
    * driver-side (a 1-row bounded action, the adaptive-probe idiom). */
  private val batchBoundarySql =
    "(SELECT (max(doc_id) + 1) * 4 // 5 FROM documents)"
  private def batchBoundary(docsDf: DataFrame): Long =
    (docsDf.agg(max(col("doc_id"))).head.getLong(0) + 1L) * 4L / 5L

  private def minhashVerifiedCtes(
      d2Min: Option[String],
      pairSampleMod: Option[Int] = None,
      docWhere: Option[String] = None): String = {
    val (h1, h2) = PortableHash.sql2("s")
    val minhs = (0 until 16)
      .map(i => s"min(h1 + $i * h2) AS m_$i")
      .mkString(",\n         ")
    val bandSelects = (0 until 8)
      .map(b => s"SELECT doc_id, $b AS band, m_${2 * b} AS k1, m_${2 * b + 1} AS k2 FROM mh")
      .mkString("\n  UNION ALL ")
    val d2Cond = d2Min.map(m => s"\n   AND b.doc_id >= $m").getOrElse("")
    val sampleCond = pairSampleMod.map(m =>
      "\n   AND " + PortableHash.sql(
        "'pq:' || CAST(a.doc_id AS VARCHAR) || ':' || " +
          "CAST(b.doc_id AS VARCHAR)") + s" % $m = 0").getOrElse("")
    s"""sh AS (
       |  ${shingleSqlWhere(docWhere)})
       |), mh AS (
       |  SELECT doc_id,
       |         $minhs
       |  FROM (SELECT doc_id, $h1 AS h1, $h2 AS h2 FROM sh)
       |  GROUP BY doc_id
       |), bands AS (
       |  $bandSelects
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.k1 = b.k1 AND a.k2 = b.k2
       |   AND a.doc_id < b.doc_id$d2Cond$sampleCond
       |), sz AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
       |), inter AS (
       |  SELECT d1, d2, CAST(count(*) AS BIGINT) AS inter
       |  FROM cand JOIN sh x ON cand.d1 = x.doc_id
       |            JOIN sh y ON cand.d2 = y.doc_id AND x.s = y.s
       |  GROUP BY d1, d2
       |), verified AS (
       |  SELECT d1, d2,
       |         round(inter * 1.0 / (p.n + q.n - inter), 6) AS est_jaccard,
       |         round(inter * 1.0 / least(p.n, q.n), 6) AS containment
       |  FROM inter JOIN sz p ON inter.d1 = p.doc_id
       |             JOIN sz q ON inter.d2 = q.doc_id
       |)""".stripMargin
  }

  private def minhashVerified(s: SparkSession, d: String): DataFrame =
    minhashVerified(docs(s, d))

  /** The verified near-dup pair frame as a MATERIALIZED lake table
    * (round 11 — the co-order-graph precedent applied to the dedup
    * chain): six report/curation keys consume the SAME verified pairs
    * (prune ×2, rate-by-source, threshold curve, source overlap,
    * containment), and each used to re-run the full
    * shingle→minhash→band→verify chain (~2 s each at sf0.1). The frame
    * now builds ONCE per documents fingerprint; `llm_minhash_neardup`
    * deliberately keeps the chain IN-PLAN as the live recompute twin,
    * and every lake-served consumer's oracle still replays the chain
    * from the base table — a stale or drifted stored frame
    * hash-mismatches all of them immediately. Pair-bounded (never
    * corpus²) and re-spread on read (the materialized-frame
    * parallelism lesson, BASELINE.md round 11). */
  private def minhashVerifiedLake(s: SparkSession, d: String): DataFrame = {
    val dir = graft.config.LakeCache.ensure(
      s"$d/documents.parquet",
      "neardup_pairs:v1:shingle3:minhash16:bands8x2:portablehash",
      "graft_neardup_pairs") { tmp =>
      minhashVerified(s, d)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(tmp)
      // release the chain's persisted sketch frames (the caller-that-
      // materializes contract)
      s.catalog.clearCache()
    }
    s.read.parquet(dir).repartition(col("d1"))
  }

  /** Spark twin of [[minhashVerifiedCtes]]: verified near-dup pairs
    * (d1 < d2, exact Jaccard over distinct shingles) from minhash-banded
    * candidates. All 16 minhashes in ONE aggregation pass over the raw
    * shingles (min over multiset == min over set; a seeds-crossJoin would
    * shuffle 16× the data) with ONE md5 per shingle, then unpivoted to 8
    * band keys whose equi-self-join yields candidates. Takes any
    * (doc_id, text) frame so ScaleSmoke can drive it at synthetic scale.
    * `d2Min`: incremental mode — the b-side of the band join is restricted
    * to the NEW batch (doc_id ≥ d2Min) BEFORE the join, so the
    * corpus×corpus quadrant is never probed and the per-ingest cost scales
    * with |batch| × bucket-overlap, not |corpus|².
    *
    * Cache contract: persists two internal frames (distinct shingles,
    * bands) that CANNOT be unpersisted here — they back the returned lazy
    * plan. Bench/Verify release them via `spark.catalog.clearCache()`
    * between queries; any other long-lived caller owns the same duty
    * after materializing the result (ScaleSmoke and the NearDupSpec
    * parity test do).
    */
  private[graft] def minhashVerified(
      docsDf: DataFrame, d2Min: Option[Long] = None,
      hashes: graft.functions.HashStrategy = PortableHash): DataFrame =
    minhashVerifiedWithSketch(docsDf, d2Min, hashes,
      persistSketch = false)._1

  /** [[minhashVerified]] plus the persisted 16-slot SKETCH frame
    * (doc_id, m_0..m_15 — ONE narrow row per doc) — for callers that
    * score the sketch itself (llm_minhash_est_quality): reusing the pin
    * avoids a SECOND full shingle→md5→16-min aggregation pass over the
    * corpus, and joining the sketch instead of the banded unpivot keeps
    * the readout's probe 8× narrower AND doc_id-keyed (the band frame is
    * partitioned on (band, k1, k2) for the candidate join — a doc_id
    * probe against it would re-shuffle 8 rows per doc twice; round-8
    * cont. 4 measured the swap at ~25% of the key's wall). */
  private[graft] def minhashVerifiedWithSketch(
      docsDf: DataFrame, d2Min: Option[Long] = None,
      hashes: graft.functions.HashStrategy = PortableHash,
      pairSampleMod: Option[Int] = None,
      persistSketch: Boolean = true,
      persistFrames: Boolean = true): (DataFrame, DataFrame) = {
    // persistFrames=false (round 10, the est-quality readout): skip ALL
    // block-manager pins. The persists exist so the corpus-scale frames
    // evaluate once across the pipeline's consumers — but they also FIX
    // the cached partitioning (the session's shuffle width) through
    // every downstream stage, so on a SAMPLED readout the plan runs a
    // dozen full-width stages over kilobyte frames and wall time is pure
    // task-launch latency. Unpersisted, the identical subtrees dedup via
    // ReusedExchange (the self-join/verify sides ARE identical when
    // d2Min=None) and AQE coalesces every post-shuffle stage to the
    // data's actual width. NOT for the result keys: in incremental mode
    // the b-side filter breaks subtree identity (ReusedExchange can't
    // fire), and across separate ACTIONS only the block manager reuses.
    def pin(df: DataFrame): DataFrame = if (persistFrames) df.persist() else df
    // persist the PER-DOC distinct shingle SETS (round 13; was the
    // exploded (doc_id, s) frame): the set frame feeds the sketch build
    // (via an in-partition explode — a projection, so the groupBy's
    // doc_id hash-partitioning survives into the cache) and BOTH sides
    // of the verify join, where the exact intersection is now an IN-ROW
    // array_intersect per candidate pair (the ppjoinVerify idiom) and
    // each doc's distinct-shingle count is the array size. The previous
    // exploded form paid a full (doc_id, s)-keyed re-exchange of the
    // shingle frame for the verify equi-join, an edge-sized groupBy for
    // the intersection counts, and two more joins against a separate
    // size aggregate — all gone (guide §2.4).
    val shSets = pin(shingleDfRaw(docsDf)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("s")).as("ss")))
    val sh = shSets.select(col("doc_id"), explode(col("ss")).as("s"))
    val (h1c, h2c) = hashes.hash2(col("s"))
    // persist: the band frame feeds BOTH sides of the candidate self-join,
    // and in incremental mode the b-side filter (doc_id >= d2Min) makes the
    // two subtrees non-identical, so ReusedExchange can never fire — without
    // this the full shingle→md5→16-min sketch pipeline runs once per side.
    // Round 7: the sketch is built from the PERSISTED distinct-shingle
    // frame, not a second raw-shingle pass — min over the distinct set
    // equals min over the multiset (the hash is a pure function of the
    // shingle), the double-hash runs once per DISTINCT shingle, and the
    // groupBy(doc_id) reuses sh's cached hash-partitioning, so the whole
    // sketch aggregation plans ZERO exchanges.
    // the narrow 16-slot sketch persists doc_id-keyed (one row per doc)
    // ONLY when the caller scores the sketch itself (persistSketch —
    // round 10: the r8 unconditional persist materialized a second
    // cached copy of the sketch for EVERY minhash-family key while only
    // llm_minhash_est_quality ever read it; the band frame below is the
    // sole other consumer and it persists its own derivation, so for
    // everyone else the extra cache was pure build+memory overhead —
    // part of the r9 minhash-family cost-delta adjudication)
    val sk0 = sketchFromHashes(
      sh.select(col("doc_id"), h1c.as("h1"), h2c.as("h2")))
    val sk = if (persistSketch && persistFrames) sk0.persist() else sk0
    val bands = pin(bandExplode(sk)
      // partitioned by the band key ONCE at build time (round 4): the
      // candidate self-join's equi-keys are exactly (band, k1, k2), so
      // BOTH sides of the shuffled hash join read the cached partitioning
      // and the join plans ZERO exchanges — in incremental mode this is
      // what keeps per-ingest cost ∝ batch: the corpus band frame is
      // never re-shuffled, only the batch side moves.
      .repartition(col("band"), col("k1"), col("k2")))
    val bSide = d2Min.fold(bands)(m => bands.where(col("doc_id") >= m))
    // Broadcast hygiene (round-3 measured defect): at 500k docs AQE's
    // runtime stats promote the persisted multi-million-row band frame to
    // a broadcast relation and OOM the driver. SHUFFLE_HASH hints live in
    // the logical plan and are honored by both static JoinSelection and
    // every AQE re-plan, so the band/shingle frames can never be built
    // driver-side no matter the caller's autoBroadcastJoinThreshold. The
    // bucket-join shape (equi-join on sketch keys) is unchanged.
    val cand0 = bands.hint("shuffle_hash").as("a")
      .join(bSide.hint("shuffle_hash").as("b"),
        col("a.band") === col("b.band") && col("a.k1") === col("b.k1") &&
          col("a.k2") === col("b.k2") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct()
    // deterministic 1-in-m pair sample BEFORE the exact-verify join —
    // the readout-sampling dial (est-quality audits); one md5 per
    // candidate pair is noise next to the shingle-intersection verify
    // it prunes. The filter commutes with the distinct (pure per-pair
    // predicate), matching the oracle's placement inside the cand CTE.
    val cand = pairSampleMod.fold(cand0)(m =>
      cand0.where(PortableHash.pHash(concat(
        lit("pq:"), col("d1").cast("string"),
        lit(":"), col("d2").cast("string"))) % m === 0))
    // Exact verify IN-ROW (round 13): attach each side's cached shingle
    // SET and intersect per pair — two doc_id-keyed joins where the set
    // frame's cached partitioning is reused, zero aggregation. The
    // inter > 0 filter preserves the old inner-join-on-shared-shingle
    // semantics (a banded candidate whose k1/k2 collision shares no
    // actual shingle must not surface as a 0-similarity pair).
    val verified = cand
      .join(shSets.hint("shuffle_hash").as("x"), col("d1") === col("x.doc_id"))
      .join(shSets.hint("shuffle_hash").as("y"), col("d2") === col("y.doc_id"))
      .select(col("d1"), col("d2"),
        size(array_intersect(col("x.ss"), col("y.ss"))).cast("long")
          .as("inter"),
        size(col("x.ss")).cast("long").as("pn"),
        size(col("y.ss")).cast("long").as("qn"))
      .where(col("inter") > 0)
      .select(col("d1"), col("d2"),
        round(col("inter") * 1.0 / (col("pn") + col("qn") - col("inter")), 6)
          .as("est_jaccard"),
        // overlap coefficient |A∩B| / min(|A|,|B|) — the containment
        // signal for near-SUPERSET detection (Broder 1997's resemblance
        // vs containment): a short doc quoted whole inside a long one
        // has low Jaccard but containment ≈ 1
        round(col("inter") * 1.0 / least(col("pn"), col("qn")), 6)
          .as("containment"))
    (verified, sk)
  }

  /** Per-doc DISTINCT shingle double-hashes (doc_id, h1, h2) — the
    * persistable per-document sketch state a lake registry stores so
    * incremental ingest never re-shingles or re-hashes the corpus
    * (config.SketchRegistry). Same one-wide-shuffle build as
    * [[minhashVerified]]'s internal shingle frame, hashes projected.
    */
  private[graft] def shingleHashes(
      docsDf: DataFrame,
      hashes: graft.functions.HashStrategy = PortableHash): DataFrame = {
    val (h1c, h2c) = hashes.hash2(col("s"))
    shingleDfRaw(docsDf)
      .groupBy(col("doc_id"))
      .agg(collect_set(col("s")).as("ss"))
      .select(col("doc_id"), explode(col("ss")).as("s"))
      .select(col("doc_id"), h1c.as("h1"), h2c.as("h2"))
  }

  /** LSH band keys (doc_id, band, k1, k2) from a shingle-hash frame:
    * 16 Carter-Wegman minhashes in ONE aggregation pass, unpivoted to
    * 8 bands × 2 rows — the ONE banding definition [[minhashVerified]]
    * and config.SketchRegistry share (a registry sketched under a
    * different banding could never candidate-join against live frames).
    */
  private[graft] def bandsFromHashes(shh: DataFrame): DataFrame =
    bandExplode(sketchFromHashes(shh))

  /** The 16-minhash sketch (doc_id, m_0..m_15) in ONE aggregation pass —
    * the narrow per-doc state [[bandExplode]] unpivots and
    * llm_minhash_est_quality joins directly. */
  private[graft] def sketchFromHashes(shh: DataFrame): DataFrame =
    shh.groupBy("doc_id")
      .agg(
        min(col("h1")).as("m_0"),
        (1 until 16).map(i =>
          min(col("h1") + lit(i) * col("h2")).as(s"m_$i")): _*)

  /** Unpivot a 16-slot sketch frame to 8 band keys × 2 rows. */
  private[graft] def bandExplode(sk: DataFrame): DataFrame =
    sk.select(
        col("doc_id"),
        explode(array((0 until 8).map(b =>
          struct(lit(b).as("band"),
            col(s"m_${2 * b}").as("k1"), col(s"m_${2 * b + 1}").as("k2"))): _*))
          .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.k1").as("k1"), col("bk.k2").as("k2"))

  /** Spark side of the per-doc SimHash: explode tokens → portable hash →
    * [[Aggregators.simhash]] majority vote. Shared by llm_simhash and
    * llm_simhash_neardup.
    */
  private def simhashDf(s: SparkSession, d: String): DataFrame =
    simhashDf(docs(s, d))

  /** Symmetrize an oriented pair frame (c1, c2) → both directions as
    * (a, b) in ONE pass over the input: a two-struct explode instead of
    * `e.unionByName(e.swap)` — the union form references the input
    * TWICE, so an unpersisted upstream (here: the whole sketch+verify
    * join pipeline) is evaluated twice when the edge frame materializes
    * (the round-5/round-7 double-evaluation finding, same fix as the
    * graph family's Extras.symmetrize).
    */
  private def symPairs(e0: DataFrame, c1: String, c2: String): DataFrame =
    e0.select(explode(array(
        struct(col(c1).as("a"), col(c2).as("b")),
        struct(col(c2).as("a"), col(c1).as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))

  /** Frame-parameterized body of llm_corpus_build, so ScaleSmoke can
    * drive the E2E corpus pipeline at synthetic scale. `docsDf` needs
    * (doc_id, text, source); `hashes` picks the sketch family
    * ([[graft.functions.FastHash]] off the declared path).
    */
  private[graft] def corpusBuild(
      docsDf: DataFrame,
      hashes: graft.functions.HashStrategy = PortableHash,
      qualityMin: Double = 0.25,
      tokenizer: graft.functions.Tokenizer =
        graft.functions.WhitespaceTokenizer,
      scrubPii: Boolean = false): DataFrame = {
    val e0 = minhashVerified(docsDf, hashes = hashes)
      .where(col("est_jaccard") >= 0.2).select("d1", "d2")
    val edges = symPairs(e0, "d1", "d2").persist()
    val keep = Components.connectedComponents(docsDf, "doc_id", edges)
      .where(col("id") === col("lbl"))
      .select(col("id").as("doc_id"))
    // Real-pipeline stage order: dedup runs on RAW text (a PII span is
    // content for near-dup purposes), then the optional redaction pass
    // rewrites what ships — so quality and the pack budget are computed
    // on the text the model will actually train on.
    val shippedText =
      if (scrubPii) graft.functions.TextNorm.scrubPii(col("text"))
      else col("text")
    val toks = split(shippedText, " ")
    // quality stays word-denominated (stopword ratios are word-level
    // semantics); only the PACK BUDGET is tokenizer-denominated — that is
    // the quantity the training context window consumes.
    // One projection computes n_tok AND quality (round 13): the previous
    // separate quality frame re-scanned + re-split the corpus and joined
    // back on doc_id — a filter on the same row needs no self-join
    // (guide §2.4; doc_id is unique, so inner-join-on-filtered-ids ≡
    // where).
    val kept = docsDf
      .select(col("doc_id"), col("source"),
        tokenizer.countCol(shippedText).as("n_tok"),
        qualityCol(size(toks), stopCountCol(shippedText)).as("quality"))
      .where(col("quality") >= qualityMin)
      .drop("quality")
      .join(keep, Seq("doc_id"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kept
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("source"), col("n_tok"),
        floor((col("cum") - col("n_tok")) * 1.0 / 2048).as("pack_id"))
      .orderBy("doc_id")
  }

  /** The INCREMENTAL corpus build (round 10 — VERDICT r9 #3): the
    * nightly-ingest twin of [[corpusBuild]]. Dedup reads the persisted
    * sketch registry (batch vs stored corpus AND batch vs batch —
    * [[graft.config.SketchRegistry.pairs]], compute ∝ batch), then
    * quality-filters and packs ONLY the batch: a batch doc ships iff it
    * near-dups nothing with a smaller id (the corpus is "already kept";
    * within the batch the smaller id survives — transitively consistent
    * with min-id group survivorship, since a dropped dup's own dups are
    * near its kept ancestor). Packing is per-source over the BATCH's
    * cumulative token budget — each nightly publish is its own pack
    * universe, unioned with the published corpus through the manifested
    * lake protocol (PipelineSpec's concurrent-reader publish proves the
    * union read). The recompute twin llm_corpus_build pays the corpus
    * cost every run; ScaleSmoke times both at 1M docs.
    */
  private[graft] def corpusBuildIncremental(
      s: SparkSession, regDir: String, batchDocs: DataFrame,
      qualityMin: Double = 0.25): DataFrame = {
    val dropped = graft.config.SketchRegistry.pairs(s, regDir, batchDocs)
      .select(col("new_id").as("doc_id")).distinct()
    val toks = split(col("text"), " ")
    val kept = batchDocs
      .where(qualityCol(size(toks), stopCountCol) >= qualityMin)
      // anti-join build side is the dropped-id set (∝ batch dups) —
      // shuffle-hash per the sketch-family broadcast hygiene
      .join(dropped.hint("shuffle_hash"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("source"),
        size(toks).cast("long").as("n_tok"))
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    kept
      .withColumn("cum", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("source"), col("n_tok"),
        floor((col("cum") - col("n_tok")) * 1.0 / 2048).as("pack_id"))
      .orderBy("doc_id")
  }

  /** Strategy-parameterized body (declared path: [[PortableHash]];
    * production path: [[graft.functions.FastHash]] — same 60-bit domain,
    * so the 4×15-bit segment join above it is unchanged).
    */
  private[graft] def simhashDf(
      docsDf: DataFrame,
      hashes: graft.functions.HashStrategy = PortableHash): DataFrame =
    docsDf
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .select(col("doc_id"), hashes.hash(col("token")).as("th"))
      .groupBy("doc_id")
      .agg(Aggregators.simhash(col("th")).as("simhash"))

  /** Oracle twin of [[simhashDf]] (no ORDER BY — used as a CTE body). */
  private lazy val simhashSqlBody: String = {
    val bitTerms = (0 until 60)
      .map(b => s"CASE WHEN sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) > 0" +
        s" THEN CAST(1 AS BIGINT) << $b ELSE CAST(0 AS BIGINT) END")
      .mkString("\n         + ")
    s"""SELECT doc_id,
       |       $bitTerms AS simhash
       |FROM (
       |  SELECT doc_id, ${PortableHash.sql("token")} AS h
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
       |)
       |GROUP BY doc_id""".stripMargin
  }

  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "y", "que"),
    "fr" -> Seq("le", "les", "et", "des", "un"),
    "zh" -> Seq("de0", "shi0", "bu0", "le0", "zai0"))

  private def inList(vals: Seq[String]) = vals.map(v => s"'$v'").mkString("(", ", ", ")")

  // Quality heuristic — ONE definition per engine side, shared by
  // llm_quality_score and llm_corpus_build so the corpus-build survivor
  // set can never drift from the scoring query. Parameterized on the
  // token-count / stopword-count expressions because the two queries
  // compute them under different aliases.
  private def qualitySql(nw: String, stopN: String): String =
    s"round(least($nw / 100.0, 1.0) * 0.5 + $stopN * 0.5 / nullif($nw, 0), 4)"
  private def qualityCol(nw: Column, stopN: Column): Column =
    round(least(nw / 100.0, lit(1.0)) * 0.5 + stopN * 0.5 / nullif(nw, lit(0)), 4)
  private lazy val stopCountSql: String =
    s"len(list_filter(string_split(text, ' '), t -> t IN ${inList(stopwords("en"))}))"
  private def stopCountCol: Column = stopCountCol(col("text"))
  private def stopCountCol(c: Column): Column =
    size(filter(split(c, " "), t => t.isInCollection(stopwords("en"))))

  /** Shared oracle of llm_sim_join_prefix / llm_sim_join_auto: the plain
    * all-shared-shingle-pairs threshold join at τ=0.5. */
  private lazy val simJoinTauOracle: String =
    s"""WITH sh AS (
         |  $shingleSql)
         |), sz AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT d1, d2, inter,
         |       round(inter * 1.0 / (x.n + y.n - inter), 6) AS jaccard
         |FROM pr JOIN sz x ON pr.d1 = x.doc_id JOIN sz y ON pr.d2 = y.doc_id
         |WHERE round(inter * 1.0 / (x.n + y.n - inter), 6) >= 0.5
         |ORDER BY d1, d2""".stripMargin

  val qs: Seq[Q] = Seq(

    Q("llm_text_normalize",
      s"""SELECT doc_id, $normSql AS norm_text
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), normText(col("text")).as("norm_text"))
        .orderBy("doc_id")
    },

    // Markup → text extraction (round 11 — VERDICT r10 #4): the stage
    // between "crawl dump" and the clean `documents` table every other
    // text key assumes — drop script/style/comment containers, strip
    // tags, decode entities, collapse whitespace (C4/CCNet's first
    // move, TextNorm.stripMarkup — chain doctrine and RE2-portability
    // there). The harness corpus ships clean, so the key PLANTS a
    // deterministic HTML wrapper around each document in-plan —
    // identical construction in both engines — then must recover
    // exactly "Doc <id> <text> & <tail> 'q' end": the script body's
    // `1 < 2` pins container-drop-before-tag-strip, the planted
    // `&lt;tail&gt;` pins decode-after-strip, the chr(10)s pin the
    // whitespace collapse. One codegen'd regex pass over the scan; at
    // 100 TB this rides the same corpus pass as normalization.
    Q("llm_markup_extract", {
      val html =
        "'<html><head><title>x</title><style>body { color: #f00; }" +
          "</style>' || chr(10) || '<script type=\"a\">if (1 < 2 && " +
          "j > 0) { emit(\"&amp;\"); }</script></head><body>" +
          "<!-- nav boilerplate --><h1>Doc ' || " +
          "CAST(doc_id AS VARCHAR) || '</h1>' || chr(10) || '<p>' || " +
          "text || '</p><div>&amp; &lt;tail&gt;' || chr(10) || " +
          "'&#39;q&#39;&nbsp;end</div></body></html>'"
      s"""WITH raw AS (
         |  SELECT doc_id, $html AS html FROM documents
         |), ex AS (
         |  SELECT doc_id, ${graft.functions.TextNorm.stripMarkupSql("html")} AS clean
         |  FROM raw
         |)
         |SELECT doc_id, clean,
         |       CAST(len(string_split(clean, ' ')) AS BIGINT) AS n_tok
         |FROM ex ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val html = concat(
        lit("<html><head><title>x</title><style>body { color: #f00; }" +
          "</style>\n<script type=\"a\">if (1 < 2 && j > 0) { " +
          "emit(\"&amp;\"); }</script></head><body>" +
          "<!-- nav boilerplate --><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1>\n<p>"), col("text"),
        lit("</p><div>&amp; &lt;tail&gt;\n&#39;q&#39;&nbsp;end" +
          "</div></body></html>"))
      docs(s, d)
        .select(col("doc_id"),
          graft.functions.TextNorm.stripMarkup(html).as("clean"))
        .select(col("doc_id"), col("clean"),
          size(split(col("clean"), " ")).cast("long").as("n_tok"))
        .orderBy("doc_id")
    },

    // Token-length histogram (round 11): corpus docs bucketed by
    // power-of-two token-length bands with per-band token mass and
    // share — the seq-len planning readout that sizes max_len and
    // predicts packing waste BEFORE a pack run (llm_pack_efficiency is
    // the what-if twin). Bands are an explicit CASE ladder (never
    // floor(log2(n)) — a log boundary ulp must not move a doc across a
    // band between engines). One scan, one bounded groupBy, broadcast
    // 1-row total.
    Q("llm_token_len_hist",
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents
        |), b AS (
        |  SELECT doc_id, n,
        |         CAST(CASE WHEN n < 16 THEN 0 WHEN n < 32 THEN 16
        |              WHEN n < 64 THEN 32 WHEN n < 128 THEN 64
        |              WHEN n < 256 THEN 128 ELSE 256 END AS BIGINT)
        |           AS bucket_lo
        |  FROM t
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS tt FROM b
        |)
        |SELECT bucket_lo, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n) AS BIGINT) AS n_tokens,
        |       round(CAST(sum(n) AS DOUBLE) / tt, 6) AS token_share
        |FROM b CROSS JOIN tot
        |GROUP BY bucket_lo, tt ORDER BY bucket_lo""".stripMargin) { (s, d) =>
      val t = docs(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n"))
      val b = t.select(col("doc_id"), col("n"),
        when(col("n") < 16, 0L).when(col("n") < 32, 16L)
          .when(col("n") < 64, 32L).when(col("n") < 128, 64L)
          .when(col("n") < 256, 128L).otherwise(256L).as("bucket_lo"))
      val tot = b.agg(sum(col("n")).as("tt"))
      b.crossJoin(broadcast(tot))
        .groupBy("bucket_lo", "tt")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
        .select(col("bucket_lo"), col("n_docs"), col("n_tokens"),
          round(col("n_tokens").cast("double") / col("tt"), 6)
            .as("token_share"))
        .orderBy("bucket_lo")
    },

    // Packing-efficiency what-if (round 11): for max_len ∈ {64, 128,
    // 256}, how many docs fit whole, how many chunks the corpus
    // shreds into, and the padded-slot fill ratio — the readout that
    // picks the training sequence length (the llm_ann_ivf_nprobe
    // budget-frame pattern: the corpus length frame is scanned ONCE
    // and the three budgets materialize as a broadcast 3-row frame;
    // chunk counts and padded slots are exact integer arithmetic, one
    // float division per output row).
    Q("llm_pack_efficiency",
      """WITH t AS (
        |  SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n
        |  FROM documents
        |), bud AS (
        |  SELECT CAST(unnest([64, 128, 256]) AS BIGINT) AS max_len
        |)
        |SELECT max_len,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN n <= max_len THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_fit_whole,
        |       CAST(sum((n + max_len - 1) // max_len) AS BIGINT) AS n_chunks,
        |       CAST(sum(n) AS BIGINT) AS n_tokens,
        |       round(CAST(sum(n) AS DOUBLE)
        |             / sum(((n + max_len - 1) // max_len) * max_len), 6)
        |         AS fill_ratio
        |FROM t CROSS JOIN bud
        |GROUP BY max_len ORDER BY max_len""".stripMargin) { (s, d) =>
      val t = docs(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n"))
      val bud = s.range(1)
        .select(explode(array(lit(64L), lit(128L), lit(256L))).as("max_len"))
      t.crossJoin(broadcast(bud))
        .groupBy("max_len")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n") <= col("max_len"), 1L).otherwise(0L))
            .as("n_fit_whole"),
          sum(expr("(n + max_len - 1) DIV max_len")).as("n_chunks"),
          sum(col("n")).as("n_tokens"),
          round(sum(col("n")).cast("double") /
            sum(expr("((n + max_len - 1) DIV max_len) * max_len")), 6)
            .as("fill_ratio"))
        .orderBy("max_len")
    },

    // Per-doc n-gram novelty (round 11): for each doc in doc_id order,
    // the fraction of its DISTINCT 3-grams appearing for the FIRST time
    // in the corpus at this doc — the marginal-novelty curve dataset
    // curation reads to find where a crawl goes stale (novelty decaying
    // to boilerplate ≈ stop ingesting this source; per-source rollup is
    // llm_dedup_rate_by_source's sibling readout). Scale shape: gram
    // explode → map-side-combinable min(doc_id) per gram → one equi
    // join back on the gram key; no window, no all-pairs.
    Q("llm_ngram_novelty",
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        |), g AS (
        |  SELECT DISTINCT doc_id,
        |         array_to_string(toks[p : p + 2], ' ') AS gram
        |  FROM (SELECT doc_id, toks,
        |               unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS p
        |        FROM t WHERE len(toks) >= 3)
        |), first AS (
        |  SELECT gram, CAST(min(doc_id) AS BIGINT) AS fd FROM g GROUP BY gram
        |)
        |SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |       CAST(sum(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_novel,
        |       round(CAST(sum(CASE WHEN f.fd = g.doc_id THEN 1 ELSE 0 END)
        |                  AS DOUBLE) / count(*), 6) AS novelty
        |FROM g JOIN first f ON f.gram = g.gram
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin) { (s, d) =>
      val g = docs(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(toks) - 2),
            |          p -> concat_ws(' ', slice(toks, p, 3)))""".stripMargin))
          .as("gram"))
        .distinct()
      val first = g.groupBy("gram").agg(min(col("doc_id")).as("fd"))
      g.join(first, Seq("gram"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_grams"), 6)
            .as("novelty"))
        .orderBy("doc_id")
    },

    // Link extraction (round 11 — llm_markup_extract's sibling): pull
    // every href out of the planted page — the op that FEEDS a crawl
    // frontier and the host-level link graph (PageRank's input at
    // CommonCrawl scale starts exactly here). Same deterministic
    // in-plan HTML construction; regexp_extract_all with one capture
    // group in both engines, matches in document order. Per doc: link
    // count, the ordered link list, and how many are absolute (the
    // frontier-vs-site-relative split a crawler budgets by). One
    // codegen'd regex pass, no explode needed for the declared readout.
    Q("llm_markup_links", {
      val html =
        "'<html><body><a href=\"https://ex' || " +
          "CAST(doc_id % 7 AS VARCHAR) || '.com/d/' || " +
          "CAST(doc_id AS VARCHAR) || '\">x</a> <p>' || text || " +
          "'</p> <a class=\"nav\" href=\"/home\">home</a> " +
          "<a href=\"https://ex' || CAST(doc_id % 3 AS VARCHAR) || " +
          "'.com/t\">t</a></body></html>'"
      s"""WITH raw AS (
         |  SELECT doc_id, $html AS html FROM documents
         |), ex AS (
         |  SELECT doc_id,
         |         regexp_extract_all(html, 'href="([^"]+)"', 1) AS links
         |  FROM raw
         |)
         |SELECT doc_id, CAST(len(links) AS BIGINT) AS n_links,
         |       array_to_string(links, ' ') AS links_str,
         |       CAST(len(list_filter(links, x -> x LIKE 'http%'))
         |            AS BIGINT) AS n_abs
         |FROM ex ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val html = concat(
        lit("<html><body><a href=\"https://ex"),
        (col("doc_id") % 7).cast("string"),
        lit(".com/d/"), col("doc_id").cast("string"),
        lit("\">x</a> <p>"), col("text"),
        lit("</p> <a class=\"nav\" href=\"/home\">home</a> " +
          "<a href=\"https://ex"),
        (col("doc_id") % 3).cast("string"),
        lit(".com/t\">t</a></body></html>"))
      docs(s, d)
        .select(col("doc_id"),
          regexp_extract_all(html, lit("href=\"([^\"]+)\""), lit(1))
            .as("links"))
        .select(col("doc_id"),
          size(col("links")).cast("long").as("n_links"),
          array_join(col("links"), " ").as("links_str"),
          size(expr("filter(links, x -> x LIKE 'http%')")).cast("long")
            .as("n_abs"))
        .orderBy("doc_id")
    },

    // Document OUTLINE extraction (round 12 — the markup family's
    // structure pass): title, section-heading count + first heading,
    // list-item count from the planted page — the signals a crawl
    // curator uses to separate articles (deep heading outline, few list
    // items) from link farms and nav pages (list-dominated) BEFORE the
    // text-only quality heuristics run. Same discipline as
    // llm_markup_links: identical page construction both engines,
    // extraction mirrored regex-for-regex (RE2-portable, no backrefs),
    // one codegen'd pass over the scan.
    Q("llm_markup_headings", {
      val html =
        "'<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR) || " +
          "'</h1><h2>Overview</h2><p>' || text || '</p>' || " +
          "'<h2>Part ' || CAST(doc_id % 4 AS VARCHAR) || '</h2><ul>' || " +
          "repeat('<li>item</li>', CAST(2 + doc_id % 3 AS INTEGER)) || " +
          "'</ul></body></html>'"
      s"""WITH raw AS (
         |  SELECT doc_id, $html AS html FROM documents
         |)
         |SELECT doc_id,
         |       regexp_extract(html, '<h1>([^<]*)</h1>', 1) AS title,
         |       CAST(len(regexp_extract_all(html, '<h2>([^<]*)</h2>', 1))
         |            AS BIGINT) AS n_h2,
         |       regexp_extract_all(html, '<h2>([^<]*)</h2>', 1)[1]
         |         AS first_h2,
         |       CAST(len(regexp_extract_all(html, '<li>')) AS BIGINT)
         |         AS n_li,
         |       CAST(CASE WHEN len(regexp_extract_all(html, '<li>')) >
         |                      2 * len(regexp_extract_all(html, '<p>'))
         |                 THEN 1 ELSE 0 END AS BIGINT) AS list_dominated
         |FROM raw ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val html = concat(
        lit("<html><body><h1>Doc "), col("doc_id").cast("string"),
        lit("</h1><h2>Overview</h2><p>"), col("text"),
        lit("</p><h2>Part "), (col("doc_id") % 4).cast("string"),
        lit("</h2><ul>"),
        expr("repeat('<li>item</li>', CAST(2 + doc_id % 3 AS INT))"),
        lit("</ul></body></html>"))
      docs(s, d)
        .select(col("doc_id"), html.as("html"))
        .select(col("doc_id"),
          regexp_extract(col("html"), "<h1>([^<]*)</h1>", 1).as("title"),
          size(regexp_extract_all(col("html"),
            lit("<h2>([^<]*)</h2>"), lit(1))).cast("long").as("n_h2"),
          element_at(regexp_extract_all(col("html"),
            lit("<h2>([^<]*)</h2>"), lit(1)), 1).as("first_h2"),
          regexp_count(col("html"), lit("<li>")).cast("long").as("n_li"),
          when(regexp_count(col("html"), lit("<li>")) >
            lit(2) * regexp_count(col("html"), lit("<p>")), 1L)
            .otherwise(0L).as("list_dominated"))
        .orderBy("doc_id")
    },

    // Prefix-duplicate groups (round 11): docs sharing the same
    // normalized 64-char PREFIX — the truncation/pagination artifact
    // class full-hash dedup misses (a crawl cut mid-page hashes
    // differently but is the same document; a templated site shares
    // openers across distinct pages — n_distinct_texts tells the two
    // apart). One normalize pass + one groupBy on the prefix key; the
    // md5(prefix) projection keeps the output narrow.
    Q("llm_prefix_dup_groups",
      s"""WITH n AS (
         |  SELECT doc_id, $normSql AS nt FROM documents
         |), p AS (
         |  SELECT doc_id, substr(nt, 1, 64) AS prefix, md5(nt) AS full_h
         |  FROM n WHERE length(nt) >= 64
         |)
         |SELECT md5(prefix) AS prefix_h, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(count(DISTINCT full_h) AS BIGINT) AS n_distinct_texts,
         |       CAST(min(doc_id) AS BIGINT) AS keep_id
         |FROM p GROUP BY prefix HAVING count(*) >= 2
         |ORDER BY prefix_h""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), normText(col("text")).as("nt"))
        .where(length(col("nt")) >= 64)
        .select(col("doc_id"), substring(col("nt"), 1, 64).as("prefix"),
          md5(col("nt")).as("full_h"))
        .groupBy("prefix")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("full_h")).as("n_distinct_texts"),
          min(col("doc_id")).as("keep_id"))
        .where(col("n_docs") >= 2)
        .select(md5(col("prefix")).as("prefix_h"), col("n_docs"),
          col("n_distinct_texts"), col("keep_id"))
        .orderBy("prefix_h")
    },

    // Content-hash dedup groups over normalized text (R9 pattern at NS scale).
    Q("llm_exact_dedup",
      s"""SELECT md5($normSql) AS h, min(doc_id) AS keep_id,
         |       CAST(count(*) AS BIGINT) AS n_copies
         |FROM documents GROUP BY 1 ORDER BY h""".stripMargin) { (s, d) =>
      docs(s, d)
        .groupBy(md5(normText(col("text"))).as("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("h")
    },

    // Span-level exact dedup (round 7; Lee et al. 2022, "Deduplicating
    // Training Data Makes Language Models Better"): mark every 8-token
    // span that recurs in ≥2 DISTINCT documents — the cross-document
    // repeated-substring signal (boilerplate, license headers, templated
    // text) that DOC-level dedup (llm_exact_dedup) and near-dup pruning
    // both miss when the surrounding text differs. The paper's suffix
    // array is a single-machine structure; the distributed equivalent is
    // exactly this shape: one positional n-gram explode (O(tokens) rows,
    // map-side), one gram aggregate (THE shuffle), one semi-join back to
    // positions. At 100 TB the gram key shuffles as a 64-bit
    // portable_hash with the string kept as residual verify (the
    // llm_heavy_hitters discipline); at harness SF the string key is
    // exact and oracle-transparent. Docs shorter than the span width
    // carry no 8-gram and are skipped by construction (fixture min is 10
    // tokens, FIXTURES.md).
    Q("llm_span_dedup",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT doc_id, CAST(s AS BIGINT) AS pos,
        |         array_to_string(toks[s : s + 7], ' ') AS gram
        |  FROM (SELECT doc_id, toks,
        |               unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS s
        |        FROM t WHERE len(toks) >= 8)
        |),
        |d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2)
        |SELECT doc_id, pos, gram FROM g WHERE gram IN (SELECT gram FROM d)
        |ORDER BY doc_id, pos""".stripMargin) { (s, d) =>
      val grams = docs(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .where(col("n") >= 8)
        .select(col("doc_id"),
          posexplode(transform(sequence(lit(1), col("n") - 7),
            i => concat_ws(" ", slice(col("toks"), i, lit(8))))))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
          col("col").as("gram"))
      val dup = grams.groupBy("gram")
        .agg(countDistinct(col("doc_id")).as("nd"))
        .where(col("nd") >= 2)
        .select("gram")
      grams.join(dup.hint("shuffle_hash"), Seq("gram"), "left_semi")
        .select(col("doc_id"), col("pos"), col("gram"))
        .orderBy("doc_id", "pos")
    },

    // Curriculum ordering (round 7, cont.): the training-ORDER policy —
    // quality bands descending (high-quality first), deterministic
    // hash-shuffle WITHIN each band (ordered data hurts SGD; rand() is
    // irreproducible — the hash bucket is the reshuffle-stable
    // compromise), doc_id as the total tie-break. The ORDER BY IS the
    // deliverable (the driver's compare is row-order-sensitive, so the
    // curriculum itself is hash-verified); at 100 TB this is a
    // range-partitioned sort writing sorted shards — no global
    // row-number bottleneck, which is why the key emits no position
    // column.
    Q("llm_curriculum_order", {
      val nw = "len(string_split(text, ' '))"
      s"""SELECT doc_id, band, bucket, q
         |FROM (
         |  SELECT doc_id,
         |         CAST(least(floor(q * 4), 3) AS BIGINT) AS band,
         |         CAST(${PortableHash.sql("CAST(doc_id AS VARCHAR)")} % 1000
         |              AS BIGINT) AS bucket,
         |         q
         |  FROM (SELECT doc_id,
         |               ${qualitySql(nw, stopCountSql)} AS q
         |        FROM documents)
         |)
         |ORDER BY band DESC, bucket, doc_id""".stripMargin
    }) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"),
          qualityCol(size(split(col("text"), " ")), stopCountCol).as("q"))
        .select(col("doc_id"),
          least(floor(col("q") * 4), lit(3L)).cast("long").as("band"),
          pmod(PortableHash.pHash(col("doc_id").cast("string")), lit(1000L))
            .as("bucket"),
          col("q"))
        .orderBy(col("band").desc, col("bucket"), col("doc_id"))
    },

    // Character-entropy quality signal (round 7, cont.): Shannon entropy
    // of each doc's character distribution — the Gopher-family gibberish
    // detector (mashed-keys text scores low, natural text ~4 bits/char);
    // the CHAR-level complement of the word-level llm_quality_score and
    // the repeat-detector llm_repetition. Computed ENTIRELY in-row: the
    // distinct-char loop runs over ≤ alphabet-size entries per doc, so
    // the whole key is a map-side projection — zero exchanges at any
    // scale. The fold iterates in sorted char order on both engines
    // (pinned-order doctrine) with floor-truncation at 6 dp.
    Q("llm_char_entropy",
      """SELECT doc_id, CAST(len(cs) AS BIGINT) AS n_chars,
        |       floor(list_reduce(list_prepend(0.0,
        |         list_transform(list_sort(list_distinct(cs)), ch ->
        |           - (len(list_filter(cs, x -> x = ch))
        |              / CAST(len(cs) AS DOUBLE))
        |             * ln(len(list_filter(cs, x -> x = ch))
        |                  / CAST(len(cs) AS DOUBLE)) / ln(2.0))),
        |         (a, b) -> a + b) * 1000000) / 1000000 AS entropy_bits
        |FROM (SELECT doc_id, string_split(text, '') AS cs
        |      FROM documents WHERE doc_id < 300)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      docs(s, d).where(col("doc_id") < 300)
        .select(col("doc_id"), split(col("text"), "").as("cs"))
        .select(col("doc_id"), size(col("cs")).cast("long").as("n_chars"),
          (floor(expr(
            """aggregate(sort_array(array_distinct(cs)), 0d, (acc, ch) ->
              |  acc + (- (size(filter(cs, x -> x = ch))
              |            / CAST(size(cs) AS DOUBLE))
              |           * ln(size(filter(cs, x -> x = ch))
              |                / CAST(size(cs) AS DOUBLE)) / ln(2.0d)))"""
              .stripMargin) * 1000000) / lit(1000000)).as("entropy_bits"))
        .orderBy("doc_id")
    },

    // Dataset card (round 7, cont.) — the "datasheets for datasets"
    // one-pager, per source: volume, token mass, quality, language mix
    // with the dominant language, and the exact-duplicate rate. Every
    // column reuses an audited per-key definition (quality =
    // llm_quality_score's formula, dup rate = llm_exact_dedup's md5
    // identity, mode = agg_mode's deterministic argmax) so the card can
    // never drift from the operators it summarizes. avg_quality folds in
    // DECIMAL(18,6) (engine-ordered double sums never decide output);
    // everything else is integer-derived. One fact scan + the bounded
    // per-(source, lang) frame; at 100 TB this is the nightly report
    // that decides which sources ship.
    Q("llm_dataset_card", {
      val nw = "len(string_split(text, ' '))"
      s"""WITH base AS (
         |  SELECT source, lang, text,
         |         CAST($nw AS BIGINT) AS n_tok,
         |         md5(text) AS th,
         |         ${qualitySql(nw, stopCountSql)} AS q
         |  FROM documents
         |), per_lang AS (
         |  SELECT source, lang, CAST(count(*) AS BIGINT) AS c
         |  FROM base GROUP BY 1, 2
         |), top_lang AS (
         |  SELECT source, lang AS top_lang FROM (
         |    SELECT source, lang,
         |           row_number() OVER (PARTITION BY source
         |                              ORDER BY c DESC, lang) AS rn
         |    FROM per_lang) WHERE rn = 1
         |)
         |SELECT b.source,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS total_tokens,
         |       round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE)
         |             / count(*), 6) AS avg_quality,
         |       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |       max(t.top_lang) AS top_lang,
         |       round((count(*) - count(DISTINCT th)) * 1.0 / count(*), 6)
         |         AS exact_dup_rate
         |FROM base b JOIN top_lang t ON b.source = t.source
         |GROUP BY b.source ORDER BY b.source""".stripMargin
    }) { (s, d) =>
      val base = docs(s, d).select(
        col("source"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        md5(col("text")).as("th"),
        qualityCol(size(split(col("text"), " ")), stopCountCol).as("q"))
      val perLang = base.groupBy("source", "lang").agg(count(lit(1)).as("c"))
      val wTop = Window.partitionBy("source").orderBy(col("c").desc, col("lang"))
      val topLang = perLang
        .withColumn("rn", row_number().over(wTop))
        .where(col("rn") === 1)
        .select(col("source"), col("lang").as("top_lang"))
      base.join(broadcast(topLang), Seq("source"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tok")).as("total_tokens"),
          round(sum(col("q").cast("decimal(18,6)")).cast("double")
            / count(lit(1)), 6).as("avg_quality"),
          countDistinct(col("lang")).as("n_langs"),
          max(col("top_lang")).as("top_lang"),
          round((count(lit(1)) - countDistinct(col("th"))) * 1.0
            / count(lit(1)), 6).as("exact_dup_rate"))
        .orderBy("source")
    },

    Q("llm_doc_stats",
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |       round(avg(n_chars), 4) AS avg_chars,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin) {
      (s, d) =>
        docs(s, d)
          .groupBy("lang", "source")
          .agg(
            count(lit(1)).as("n_docs"),
            round(avg(col("n_chars")), 4).as("avg_chars"),
            sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"))
          .orderBy("lang", "source")
    },

    // In-engine BPE tokenizer TRAINING (Sennrich et al. 2016): learn the
    // top-8 merge rules over the corpus — per round, count adjacent
    // symbol pairs weighted by word frequency, take the argmax (count
    // DESC, pair ASC), rewrite every word, repeat. The whole loop stays
    // in-plan: the word table is VOCABULARY-sized (the groupBy collapses
    // the 100 TB corpus to distinct words in one map-side-combinable
    // pass — the only fact-table scan), each round is one tiny aggregate
    // + a TakeOrderedAndProject(1) argmax attached via broadcast
    // crossJoin (no driver collect), and the rewrite is a string
    // replace. Symbols are '|'-delimited so multi-char symbols can never
    // false-match across boundaries, and the replace runs TWICE per
    // round: greedy non-overlapping matching leaves at most isolated
    // blocked matches (two adjacent blocked matches would need three
    // overlapping originals — impossible), so the second pass resolves
    // exactly what delimiter-sharing blocked. Both engines' replace()
    // scans left-to-right non-overlapping, replaying classic BPE's
    // greedy merge order; the oracle rebuilds the identical 8-round CTE
    // chain. BpeSpec checks the result against a driver-side reference
    // BPE trainer on random corpora.
    Q("llm_bpe_train", bpeOracle(8)) { (s, d) => bpeTrain(docs(s, d), 8) },

    // APPLY the learned merges: tokenize the corpus with the trained
    // table and report per-source char-tokens vs BPE-tokens compression —
    // the train→encode loop closed in-engine. The merge table collapses
    // encoding to a VOCABULARY-sized lookup (word → final symbol
    // decomposition) broadcast onto a per-(source, word) count frame: at
    // 100 TB the corpus is scanned once for the counts, the rewrite work
    // is O(vocab · rounds), and no per-document string surgery happens at
    // all — the same word is never re-encoded twice.
    Q("llm_bpe_apply", bpeApplyOracle(8)) { (s, d) =>
      val fin = bpeWords(docs(s, d), 8)
        .select(col("w"),
          size(split(trim(col("repr"), "|"), "\\|")).as("n_syms"))
      val perSourceWord = docs(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("n"))
      perSourceWord.join(broadcast(fin), Seq("w"))
        .groupBy("source")
        .agg(
          sum(col("n") * length(col("w"))).as("char_tokens"),
          sum(col("n") * col("n_syms")).as("bpe_tokens"))
        .select(col("source"), col("char_tokens"), col("bpe_tokens"),
          round(col("char_tokens") * 1.0 / col("bpe_tokens"), 4)
            .as("compression"))
        .orderBy("source")
    },

    // Tokenize → explode → term/document frequencies (UDTF-class op).
    Q("llm_tokenize_tf",
      """SELECT token, CAST(count(*) AS BIGINT) AS tf,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
        .orderBy("token")
    },

    // Heavy hitters over the corpus token stream (round 5; the round-4
    // verdict's #8 demand): tokens whose frequency clears φ = 0.5% of the
    // stream — the frequency report the CMS family was built for, declared
    // through the sketch → candidates → exact-verify plan a 100 TB run
    // would use. Pass 1 builds ONE 64 KB cms sketch + the stream size
    // (map-side partials, no wide shuffle). Pass 2 probes the DISTINCT
    // vocabulary against the broadcast sketch — the distinct is cheap
    // (map-side partial aggregation means its exchange carries only each
    // partition's distinct keys, never the raw stream) and it bounds the
    // sketch decode at one per distinct token. The probe-every-occurrence
    // alternative (no distinct stage) was MEASURED 20× slower at sf0.1
    // (10.1 s vs 0.47 s): cms_query deserializes the 64 KB sketch per
    // evaluated row, so per-occurrence probing turns a 270k-token stream
    // into ~17 GB of decode allocation — per-distinct-key probing is the
    // right shape at every scale. CMS never underestimates, so the
    // candidate set PROVABLY contains every true heavy hitter and is
    // bounded by ~1/(φ − e/w) ≈ 270 tokens whatever the corpus size
    // (broadcast-safe by construction); pass 3 exact-counts only the
    // semi-joined candidate rows and re-applies θ, making the declared
    // result EXACT — the oracle is the plain HAVING query — while the
    // executed plan exercises the SQL-registered cms_* family end to end
    // (ApproxSpec pins the no-sketch plan equal).
    Q("llm_heavy_hitters", heavyHittersOracle) { (s, d) =>
      import org.apache.spark.sql.graft.CmsFunctions.{cmsQuery, cmsSketch}
      val tok = docs(s, d).select(explode(split(col("text"), " ")).as("token"))
      val sk = tok.agg(cmsSketch(col("token")).as("sk"), count(lit(1)).as("n"))
      val cand = tok.distinct()
        .join(broadcast(sk), lit(true))
        .where(cmsQuery(col("sk"), col("token")) >= lit(0.005) * col("n"))
        .select("token")
      tok.join(broadcast(cand), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .join(broadcast(sk.select(col("n"))), lit(true))
        .where(col("cnt") >= lit(0.005) * col("n"))
        .select(col("token"), col("cnt"))
        .orderBy(col("cnt").desc, col("token"))
    },

    // Heavy hitters via the Misra-Gries summary (round 5) — same exact
    // answer and SAME oracle as llm_heavy_hitters, one structural pass
    // fewer: MG carries the heavy items THEMSELVES, so the candidate set
    // falls straight out of the one-row summary — no distinct-vocabulary
    // probe stage at all (the stage the CMS plan needs, and the one its
    // header documents as the 20×-if-done-wrong trap). k = 400 ⇒ any
    // token ≥ φn = 0.5% of the stream is guaranteed present with
    // est ≥ true − n/401, so keeping summary items with
    // est ≥ (φ − 1/401)·n is a PROVABLE superset of the true heavy
    // hitters, ≤ 400 rows whatever the corpus size (broadcast-safe by
    // construction); the exact count over semi-joined candidates + θ
    // re-filter makes the declared result exact.
    Q("llm_heavy_hitters_mg", heavyHittersOracle) { (s, d) =>
      import org.apache.spark.sql.graft.MgFunctions.{mgSketch, mgTopk}
      val tok = docs(s, d).select(explode(split(col("text"), " ")).as("token"))
      val sk = tok.agg(mgSketch(col("token"), 400).as("sk"), count(lit(1)).as("n"))
      val cand = sk
        .select(explode(mgTopk(col("sk"), lit(400))).as("e"), col("n"))
        .where(col("e.est") >= (lit(0.005) - lit(1.0) / 401) * col("n"))
        .select(col("e.item").as("token"))
      tok.join(broadcast(cand), Seq("token"), "left_semi")
        .groupBy("token").agg(count(lit(1)).as("cnt"))
        .join(broadcast(sk.select(col("n"))), lit(true))
        .where(col("cnt") >= lit(0.005) * col("n"))
        .select(col("token"), col("cnt"))
        .orderBy(col("cnt").desc, col("token"))
    },

    // Token counting: whitespace tokens, regex word pieces, BPE-ish estimate.
    Q("llm_token_count",
      """SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws,
        |       CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS BIGINT) AS n_re,
        |       CAST(ceil(n_chars / 4.0) AS BIGINT) AS n_bpe_est
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      docs(s, d).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_ws"),
        size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
          .cast("long").as("n_re"),
        ceil(col("n_chars") / 4.0).as("n_bpe_est"))
        .orderBy("doc_id")
    },

    // Tokenizer fertility by language (round 8, cont. 6): the standard
    // tokenizer-efficiency eval a multilingual corpus runs before
    // training — pieces-per-word ("fertility", Rust et al. 2021) and
    // chars-per-piece per language. A tokenizer tuned on English
    // typically shows fertility ~1.1-1.3 on en and 2x+ on zh/de; the
    // readout decides vocab rebalancing and per-language token budgets
    // (cost = tokens, not chars). Tokenization = the same [a-z]+|[0-9]+
    // piece regex as llm_token_count (the engine-portable stand-in for
    // a trained subword model; llm_bpe_apply is the trained path).
    // Exact: per-doc piece/word/char counts are integers, per-lang sums
    // fold map-side, two divisions at display. Plan: one scan, one
    // bounded groupBy — zero windows, zero joins.
    Q("llm_tokenizer_fertility",
      """WITH c AS (
        |  SELECT lang,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
        |         CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))
        |              AS BIGINT) AS p,
        |         n_chars
        |  FROM documents
        |)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(w) AS BIGINT) AS n_words,
        |       CAST(sum(p) AS BIGINT) AS n_pieces,
        |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
        |       floor(CAST(sum(p) AS DOUBLE) / CAST(sum(w) AS BIGINT)
        |             * 1000000) / 1000000 AS fertility,
        |       floor(CAST(sum(n_chars) AS DOUBLE) / CAST(sum(p) AS BIGINT)
        |             * 1000000) / 1000000 AS chars_per_piece
        |FROM c GROUP BY lang ORDER BY lang""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("w"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+"), lit(0)))
            .cast("long").as("p"),
          col("n_chars"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("w")).as("n_words"),
          sum(col("p")).as("n_pieces"),
          sum(col("n_chars")).as("n_chars"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_pieces"),
          col("n_chars"),
          (floor(col("n_pieces").cast("double") / col("n_words") * 1000000)
            / 1000000).as("fertility"),
          (floor(col("n_chars").cast("double") / col("n_pieces") * 1000000)
            / 1000000).as("chars_per_piece"))
        .orderBy("lang")
    },

    // TF-IDF: top-5 characteristic terms per doc. Ranking uses the
    // ROUNDED score (+ token tie-break) so both engines agree on order.
    Q("llm_tfidf",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
        |), df AS (
        |  SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1
        |), nd AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n FROM documents
        |), sc AS (
        |  SELECT doc_id, token, tf,
        |         round(tf * ln((nd.n + 1) / (df.df + 1)), 6) AS tfidf
        |  FROM tf JOIN df USING (token) CROSS JOIN nd
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |            ORDER BY tfidf DESC, token) AS rn
        |  FROM sc
        |)
        |SELECT doc_id, token, tf, tfidf, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 5 ORDER BY doc_id, rn""".stripMargin) { (s, d) =>
      val tok = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val tf = tok.groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      // df derived FROM tf (one row per (doc, token)) — skips a second
      // explode + count-distinct shuffle over the raw token stream.
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val nd = docs(s, d).agg(count(lit(1)).cast("double").as("n"))
      val w = Window.partitionBy("doc_id").orderBy(col("tfidf").desc, col("token"))
      tf.join(df, Seq("token"))
        .crossJoin(broadcast(nd))
        .select(col("doc_id"), col("token"), col("tf"),
          round(col("tf") * log((col("n") + 1) / (col("df") + 1)), 6).as("tfidf"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("doc_id"), col("token"), col("tf"), col("tfidf"),
          col("rn").cast("long").as("rn"))
        .orderBy("doc_id", "rn")
    },

    // Per-SOURCE distinctive-term signature (round 12): top-3 terms per
    // source by source-grain TF-IDF (source term mass × ln(n_sources+1
    // / sources-containing+1) — llm_tfidf's formula lifted from doc
    // grain to source grain). THE corpus-datasheet line that says what
    // a feed is actually about, and the drift readout a recrawl diffs
    // against the previous snapshot's signature. Source-grain df keeps
    // every frame bounded by (sources × vocab); the only corpus-sized
    // stage is the one (source, token) count, map-side combinable.
    Q("llm_source_signature",
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents
        |), tf AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM tok GROUP BY 1, 2
        |), df AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1
        |), ns AS (
        |  SELECT CAST(count(DISTINCT source) AS DOUBLE) AS n FROM documents
        |), sc AS (
        |  SELECT source, token, tf,
        |         round(tf * ln((ns.n + 1) / (df.df + 1)), 6) AS score
        |  FROM tf JOIN df USING (token) CROSS JOIN ns
        |), r AS (
        |  SELECT *, row_number() OVER (PARTITION BY source
        |            ORDER BY score DESC, token) AS rn
        |  FROM sc
        |)
        |SELECT source, CAST(rn AS BIGINT) AS rn, token, tf, score
        |FROM r WHERE rn <= 3 ORDER BY source, rn""".stripMargin) { (s, d) =>
      val tf = docs(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("token"))
        .groupBy("source", "token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val ns = docs(s, d)
        .agg(countDistinct(col("source")).cast("double").as("n"))
      val w = Window.partitionBy("source")
        .orderBy(col("score").desc, col("token"))
      tf.join(df, Seq("token"))
        .crossJoin(broadcast(ns))
        .select(col("source"), col("token"), col("tf"),
          round(col("tf") * log((col("n") + 1) / (col("df") + 1)), 6)
            .as("score"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("source"), col("rn").cast("long").as("rn"),
          col("token"), col("tf"), col("score"))
        .orderBy("source", "rn")
    },

    // Heuristic quality scoring: length/stopword/alnum ratios.
    Q("llm_quality_score",
      s"""SELECT doc_id,
         |       round(n_chars * 1.0 / nullif(nw, 0), 4) AS avg_tok_len,
         |       round(stop_n * 1.0 / nullif(nw, 0), 4) AS stop_ratio,
         |       round(alnum_n * 1.0 / nullif(n_chars, 0), 4) AS alnum_ratio,
         |       ${qualitySql("nw", "stop_n")} AS quality
         |FROM (
         |  SELECT doc_id, n_chars,
         |         len(string_split(text, ' ')) AS nw,
         |         $stopCountSql AS stop_n,
         |         length(regexp_replace(text, '[^a-z0-9]', '', 'g')) AS alnum_n
         |  FROM documents
         |) ORDER BY doc_id""".stripMargin) { (s, d) =>
      val toks = split(col("text"), " ")
      docs(s, d)
        .select(
          col("doc_id"), col("n_chars"),
          size(toks).as("nw"),
          stopCountCol.as("stop_n"),
          length(regexp_replace(col("text"), "[^a-z0-9]", "")).as("alnum_n"))
        .select(
          col("doc_id"),
          round(col("n_chars") * 1.0 / nullif(col("nw"), lit(0)), 4).as("avg_tok_len"),
          round(col("stop_n") * 1.0 / nullif(col("nw"), lit(0)), 4).as("stop_ratio"),
          round(col("alnum_n") * 1.0 / nullif(col("n_chars"), lit(0)), 4)
            .as("alnum_ratio"),
          qualityCol(col("nw"), col("stop_n")).as("quality"))
        .orderBy("doc_id")
    },

    // Cross-source near-dup overlap matrix (round 11): which feeds
    // MIRROR each other — near-dup pairs at the production τ rolled up
    // by unordered source pair (least/greatest normalization), with the
    // pair count and the max estimated Jaccard per cell. A mirrored
    // crawl shows up as one hot off-diagonal cell; within-source
    // templating stays on the diagonal (llm_dedup_rate_by_source says
    // HOW MUCH to fix per feed, this says WHERE the copies flow
    // between feeds). max(est) not avg(est): max is order-independent
    // (an avg of rounded doubles could flip a 6-dp boundary with
    // partial-aggregation order). Cost beyond the shared chain: two
    // doc_id-keyed joins of the pair frame + a bounded rollup.
    Q("llm_source_overlap",
      s"""WITH $minhashVerifiedCtes
         |SELECT least(a.source, b.source) AS source_a,
         |       greatest(a.source, b.source) AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       max(est_jaccard) AS max_est
         |FROM verified v
         |JOIN documents a ON v.d1 = a.doc_id
         |JOIN documents b ON v.d2 = b.doc_id
         |WHERE v.est_jaccard >= 0.2
         |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin) { (s, d) =>
      val src = docs(s, d).select(col("doc_id"), col("source"))
      minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2)
        .join(src.select(col("doc_id").as("d1"), col("source").as("sa")),
          Seq("d1"))
        .join(src.select(col("doc_id").as("d2"), col("source").as("sb")),
          Seq("d2"))
        .groupBy(least(col("sa"), col("sb")).as("source_a"),
          greatest(col("sa"), col("sb")).as("source_b"))
        .agg(count(lit(1)).as("n_pairs"),
          max(col("est_jaccard")).as("max_est"))
        .orderBy("source_a", "source_b")
    },

    // Embedding similarity LANDSCAPE (round 12): histogram of exact
    // cosine over the LSH-bucketed candidate pairs — the readout that
    // picks llm_semantic_dedup's τ the way llm_neardup_threshold_curve
    // picks the text τ (a bimodal landscape = clean dup/non-dup
    // separation; mass piling just under a proposed τ = the threshold
    // sits on a cliff). Pair-bounded (banded candidates only — never
    // all-pairs); buckets are an explicit 0.2-wide CASE ladder on the
    // 6-dp-rounded sim (identical double both engines, so the compare
    // can never straddle), one bounded groupBy + broadcast total.
    Q("llm_embedding_sim_hist",
      s"""WITH sig AS (
         |  $lshSigSql
         |), banded AS (
         |  ${lshBandedSql(8, 2)}
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |   AND a.vec_id < b.vec_id
         |), sims AS (
         |  SELECT round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
         |                                      CAST(y.embedding AS DOUBLE[])), 6)
         |           AS sim
         |  FROM cand JOIN embeddings x ON x.vec_id = cand.a_id
         |            JOIN embeddings y ON y.vec_id = cand.b_id
         |), h AS (
         |  SELECT CAST(CASE WHEN sim >= 0.8 THEN 8 WHEN sim >= 0.6 THEN 6
         |              WHEN sim >= 0.4 THEN 4 WHEN sim >= 0.2 THEN 2
         |              WHEN sim >= 0.0 THEN 0 WHEN sim >= -0.2 THEN -2
         |              WHEN sim >= -0.4 THEN -4 WHEN sim >= -0.6 THEN -6
         |              WHEN sim >= -0.8 THEN -8 ELSE -10 END AS BIGINT)
         |           AS bucket_lo10,
         |         CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM sims GROUP BY 1
         |), tot AS (SELECT CAST(sum(n_pairs) AS BIGINT) AS t FROM h)
         |SELECT bucket_lo10, n_pairs,
         |       floor(CAST(n_pairs AS DOUBLE) / t * 1000000) / 1000000
         |         AS share
         |FROM h CROSS JOIN tot ORDER BY bucket_lo10""".stripMargin) { (s, d) =>
      val a = emb(s, d).select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = emb(s, d).select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      val sims = lshCandidatePairs(s, d, 8, 2)
        .join(a, Seq("a_id")).join(b, Seq("b_id"))
        .select(round(cosineSim(col("a_emb"), col("b_emb")), 6).as("sim"))
      val bucket = when(col("sim") >= 0.8, 8L).when(col("sim") >= 0.6, 6L)
        .when(col("sim") >= 0.4, 4L).when(col("sim") >= 0.2, 2L)
        .when(col("sim") >= 0.0, 0L).when(col("sim") >= -0.2, -2L)
        .when(col("sim") >= -0.4, -4L).when(col("sim") >= -0.6, -6L)
        .when(col("sim") >= -0.8, -8L).otherwise(-10L)
      val h = sims.groupBy(bucket.as("bucket_lo10"))
        .agg(count(lit(1)).as("n_pairs"))
      // total via a window over the ≤10-row bucket frame (PlanSpec
      // audit: bounded) — a second aggregate would re-evaluate the
      // whole candidate chain (measured 2.7 s vs 1.4 s)
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      h.select(col("bucket_lo10"), col("n_pairs"),
          (floor(col("n_pairs").cast("double")
            / sum(col("n_pairs")).over(wAll) * 1000000)
            / 1000000).as("share"))
        .orderBy("bucket_lo10")
    },

    // Dedup SAVINGS estimate (round 12): the ticket number a dedup run
    // is justified by — token mass before/after keeping one survivor
    // per near-dup group at the production τ, and the share saved
    // (storage, and more importantly training-compute, scales with
    // tokens). Rides the SAME materialized pair frame + CC construction
    // as llm_neardup_prune; cost beyond the chain: one token-count
    // projection joined to the keep flags, three exact BIGINT sums.
    Q("llm_dedup_savings",
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |e0 AS (
         |  SELECT d1, d2 FROM verified WHERE est_jaccard >= 0.2
         |), edges AS (
         |  SELECT d1 AS a, d2 AS b FROM e0 UNION ALL SELECT d2, d1 FROM e0
         |), ${Components.reachMinCte("SELECT doc_id AS id FROM documents", "edges")},
         |keepf AS (
         |  SELECT node AS doc_id, node = min(r) AS is_kept
         |  FROM reach GROUP BY node
         |), tk AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
         |  FROM documents
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN is_kept THEN 0 ELSE 1 END) AS BIGINT)
         |         AS n_pruned,
         |       CAST(sum(toks) AS BIGINT) AS tokens_total,
         |       CAST(sum(CASE WHEN is_kept THEN toks ELSE 0 END) AS BIGINT)
         |         AS tokens_kept,
         |       floor(CAST(sum(CASE WHEN is_kept THEN 0 ELSE toks END)
         |                  AS DOUBLE) / sum(toks) * 1000000) / 1000000
         |         AS savings_share
         |FROM keepf JOIN tk USING (doc_id)""".stripMargin) { (s, d) =>
      val e0 = minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2).select("d1", "d2")
      val edges = symPairs(e0, "d1", "d2").persist()
      val keepf = Components.connectedComponents(docs(s, d), "doc_id", edges)
        .select(col("id").as("doc_id"), (col("id") === col("lbl")).as("is_kept"))
      val tk = docs(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      keepf.join(tk, Seq("doc_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_kept"), 0L).otherwise(1L)).as("n_pruned"),
          sum(col("toks")).as("tokens_total"),
          sum(when(col("is_kept"), col("toks")).otherwise(0L))
            .as("tokens_kept"))
        .select(col("n_docs"), col("n_pruned"), col("tokens_total"),
          col("tokens_kept"),
          (floor((col("tokens_total") - col("tokens_kept")).cast("double")
            / col("tokens_total") * 1000000) / 1000000)
            .as("savings_share"))
    },

    // Cross-LANGUAGE near-dup overlap matrix (round 12 — the lang twin
    // of llm_source_overlap): where near-duplicate mass crosses
    // language labels. An off-diagonal cell is a translation-pair /
    // transliteration / mislabeled-language signal — content a
    // contamination review treats differently from same-language
    // mirrors (a translated eval set leaks across the lang split that
    // llm_split_assign stratifies on). Same shape discipline: unordered
    // lang-pair rollup of the shared verified-pair chain at the
    // production τ, max-not-avg cell stat (max is
    // partial-aggregation-order-independent), two doc_id-keyed joins +
    // a bounded rollup beyond the materialized chain.
    Q("llm_lang_overlap",
      s"""WITH $minhashVerifiedCtes
         |SELECT least(a.lang, b.lang) AS lang_a,
         |       greatest(a.lang, b.lang) AS lang_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs,
         |       max(est_jaccard) AS max_est
         |FROM verified v
         |JOIN documents a ON v.d1 = a.doc_id
         |JOIN documents b ON v.d2 = b.doc_id
         |WHERE v.est_jaccard >= 0.2
         |GROUP BY 1, 2 ORDER BY lang_a, lang_b""".stripMargin) { (s, d) =>
      val lang = docs(s, d).select(col("doc_id"), col("lang"))
      minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2)
        .join(lang.select(col("doc_id").as("d1"), col("lang").as("la")),
          Seq("d1"))
        .join(lang.select(col("doc_id").as("d2"), col("lang").as("lb")),
          Seq("d2"))
        .groupBy(least(col("la"), col("lb")).as("lang_a"),
          greatest(col("la"), col("lb")).as("lang_b"))
        .agg(count(lit(1)).as("n_pairs"),
          max(col("est_jaccard")).as("max_est"))
        .orderBy("lang_a", "lang_b")
    },

    // Near-dup threshold tuning curve (round 11): pair count and
    // would-be-pruned doc count at τ ∈ {0.2, 0.4, 0.6, 0.8} over the
    // SAME banded-minhash verified pairs the dedup keys act on — the
    // readout that picks the production τ (too low collapses distinct
    // docs, too high keeps boilerplate twins). ONE chain pass, one
    // aggregate row: each threshold is a conditional sum / conditional
    // count-distinct over the pair-bounded verified frame — no
    // threshold join, no re-run of the chain per τ, zero-safe when a
    // band is empty. A doc is "pruned at τ" if ANY pair marks it as
    // the d2 (keep-min-id convention — the llm_neardup_prune rule).
    Q("llm_neardup_threshold_curve",
      s"""WITH $minhashVerifiedCtes
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs_verified,
         |       CAST(sum(CASE WHEN est_jaccard >= 0.2 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_pairs_02,
         |       CAST(count(DISTINCT CASE WHEN est_jaccard >= 0.2 THEN d2 END)
         |            AS BIGINT) AS n_pruned_02,
         |       CAST(sum(CASE WHEN est_jaccard >= 0.4 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_pairs_04,
         |       CAST(count(DISTINCT CASE WHEN est_jaccard >= 0.4 THEN d2 END)
         |            AS BIGINT) AS n_pruned_04,
         |       CAST(sum(CASE WHEN est_jaccard >= 0.6 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_pairs_06,
         |       CAST(count(DISTINCT CASE WHEN est_jaccard >= 0.6 THEN d2 END)
         |            AS BIGINT) AS n_pruned_06,
         |       CAST(sum(CASE WHEN est_jaccard >= 0.8 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_pairs_08,
         |       CAST(count(DISTINCT CASE WHEN est_jaccard >= 0.8 THEN d2 END)
         |            AS BIGINT) AS n_pruned_08
         |FROM verified""".stripMargin) { (s, d) =>
      def pairsAt(t: Double) =
        sum(when(col("est_jaccard") >= t, 1L).otherwise(0L))
      def prunedAt(t: Double) =
        countDistinct(when(col("est_jaccard") >= t, col("d2")))
      minhashVerifiedLake(s, d)
        .agg(count(lit(1)).as("n_pairs_verified"),
          pairsAt(0.2).as("n_pairs_02"), prunedAt(0.2).as("n_pruned_02"),
          pairsAt(0.4).as("n_pairs_04"), prunedAt(0.4).as("n_pruned_04"),
          pairsAt(0.6).as("n_pairs_06"), prunedAt(0.6).as("n_pruned_06"),
          pairsAt(0.8).as("n_pairs_08"), prunedAt(0.8).as("n_pruned_08"))
    },

    // Per-source quality profile (round 11): the llm_quality_score
    // components rolled up to source grain — the curation ticket's
    // per-feed panel (WHICH source is short/punctuation-heavy/
    // stopword-poor, next to llm_dedup_rate_by_source's dup rate).
    // Determinism doctrine: NO averaging of per-doc doubles (a
    // source-grain avg() over doubles is order-dependent) — every ratio
    // is ONE division of two exact BIGINT sums, which is also the
    // corpus-weighted rollup a datasheet actually wants; the one
    // per-doc double (quality) enters only as a threshold count, and
    // both engines compute it identically before comparing.
    Q("llm_quality_by_source",
      s"""WITH c AS (
         |  SELECT source, doc_id, n_chars,
         |         len(string_split(text, ' ')) AS nw,
         |         $stopCountSql AS stop_n,
         |         length(regexp_replace(text, '[^a-z0-9]', '', 'g')) AS alnum_n
         |  FROM documents
         |)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(nw) AS BIGINT) AS n_tokens,
         |       round(CAST(sum(n_chars) AS DOUBLE) / sum(nw), 6) AS avg_tok_len,
         |       round(CAST(sum(stop_n) AS DOUBLE) / sum(nw), 6) AS stop_ratio,
         |       round(CAST(sum(alnum_n) AS DOUBLE) / sum(n_chars), 6)
         |         AS alnum_ratio,
         |       CAST(sum(CASE WHEN ${qualitySql("nw", "stop_n")} >= 0.5
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality
         |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("source"), col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).as("nw"),
          stopCountCol.as("stop_n"),
          length(regexp_replace(col("text"), "[^a-z0-9]", "")).as("alnum_n"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).cast("long").as("n_tokens"),
          round(sum(col("n_chars")).cast("double") / sum(col("nw")), 6)
            .as("avg_tok_len"),
          round(sum(col("stop_n")).cast("double") / sum(col("nw")), 6)
            .as("stop_ratio"),
          round(sum(col("alnum_n")).cast("double") / sum(col("n_chars")), 6)
            .as("alnum_ratio"),
          sum(when(qualityCol(col("nw"), col("stop_n")) >= 0.5, 1L)
            .otherwise(0L)).as("n_high_quality"))
        .orderBy("source")
    },

    // Readability panel per source (round 12): Flesch reading ease and
    // Flesch–Kincaid grade from exact integer corpus sums — words,
    // syllable proxy (non-overlapping vowel-group runs, the standard
    // no-dictionary estimator), and the ≥7-char long-word share
    // (LIX/Gunning family signal). CONVENTION, stated because the
    // fixture has no sentence punctuation: sentences := documents (each
    // synthetic doc is one unpunctuated token stream) — on punctuated
    // corpora the sentence count would come from the [.!?]+ splitter
    // and nothing else changes. The corpus-weighted per-source sums ARE
    // the datasheet aggregate (llm_quality_by_source's no-double-
    // averaging doctrine); every displayed double is a linear combo of
    // two exact-integer ratios, FLOOR-scaled. One scan, bounded groupBy.
    Q("llm_readability",
      """WITH c AS (
        |  SELECT source,
        |         len(string_split(text, ' ')) AS nw,
        |         len(regexp_extract_all(text, '[aeiou]+')) AS syl,
        |         len(regexp_extract_all(text, '[a-z0-9]{7,}')) AS lw
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(nw) AS BIGINT) AS n_words,
        |       CAST(sum(syl) AS BIGINT) AS n_syllables,
        |       floor((206.835
        |              - 1.015 * (CAST(sum(nw) AS DOUBLE) / count(*))
        |              - 84.6 * (CAST(sum(syl) AS DOUBLE) / sum(nw)))
        |             * 1000000) / 1000000 AS reading_ease,
        |       floor((0.39 * (CAST(sum(nw) AS DOUBLE) / count(*))
        |              + 11.8 * (CAST(sum(syl) AS DOUBLE) / sum(nw))
        |              - 15.59) * 1000000) / 1000000 AS fk_grade,
        |       floor(CAST(sum(lw) AS DOUBLE) / sum(nw) * 1000000)
        |         / 1000000 AS long_word_share
        |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("nw"),
          regexp_count(col("text"), lit("[aeiou]+")).as("syl"),
          regexp_count(col("text"), lit("[a-z0-9]{7,}")).as("lw"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("nw")).as("n_words"),
          sum(col("syl")).as("n_syllables"),
          sum(col("lw")).as("n_long"))
        .select(col("source"), col("n_docs"), col("n_words"),
          col("n_syllables"),
          (floor((lit(206.835)
            - lit(1.015) * (col("n_words").cast("double") / col("n_docs"))
            - lit(84.6) * (col("n_syllables").cast("double") / col("n_words")))
            * 1000000) / 1000000).as("reading_ease"),
          (floor((lit(0.39) * (col("n_words").cast("double") / col("n_docs"))
            + lit(11.8) * (col("n_syllables").cast("double") / col("n_words"))
            - lit(15.59)) * 1000000) / 1000000).as("fk_grade"),
          (floor(col("n_long").cast("double") / col("n_words") * 1000000)
            / 1000000).as("long_word_share"))
        .orderBy("source")
    },

    // Corpus-trained unigram LM scoring (CCNet-style quality filter): the
    // LM is the corpus itself (p(t) = tf/N), each doc scored by mean token
    // log-probability. Train + score is two aggs and one join on token —
    // at 100 TB the LM table is a broadcast-sized vocab and scoring is one
    // map-side pass.
    Q("llm_lm_score",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), lm AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY token
        |), tot AS (
        |  SELECT CAST(sum(tf) AS DOUBLE) AS n FROM lm
        |)
        |SELECT doc_id,
        |       round(avg(ln(lm.tf / tot.n)), 6) AS avg_logp,
        |       CAST(count(*) AS BIGINT) AS n_tok
        |FROM tok JOIN lm USING (token) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tok = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val lm = tok.groupBy("token").agg(count(lit(1)).as("tf"))
      val tot = lm.agg(sum(col("tf")).cast("double").as("n"))
      tok.join(lm, Seq("token"))
        .crossJoin(broadcast(tot))
        .groupBy("doc_id")
        .agg(
          round(avg(log(col("tf") / col("n"))), 6).as("avg_logp"),
          count(lit(1)).as("n_tok"))
        .orderBy("doc_id")
    },

    // Corpus-trained BIGRAM LM scoring (round 10): the order-2 extension
    // of llm_lm_score — each doc's mean log P(w₂|w₁) under add-one
    // smoothing, P = (c(w₁w₂)+1)/(c(w₁)+V). Shuffled or templated text
    // keeps its unigram distribution (invisible to llm_lm_score) but
    // craters here — the perplexity-style filter CCNet actually ranks
    // with. Plan: bigrams emit IN-ROW from the split array (no
    // self-join); the bigram LM and unigram LM are vocabulary-sized
    // aggregates joined back on their keys; V is a 1-row broadcast.
    // Cast-to-DOUBLE before the division (the bm25 1-ulp lesson);
    // ln + avg + round(6) follows the llm_lm_score precedent.
    Q("llm_bigram_lm_score",
      """WITH bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(t)),
        |           i -> array_to_string(t[i:i+1], ' '))) AS b,
        |         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1
        |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
        |), c2 AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY b
        |), tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), c1 AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS cw FROM tok GROUP BY token
        |), v AS (
        |  SELECT CAST(count(*) AS BIGINT) AS v FROM c1
        |)
        |SELECT doc_id,
        |       round(avg(ln(CAST(cb + 1 AS DOUBLE) / CAST(cw + v AS DOUBLE))), 6)
        |         AS avg_logp2,
        |       CAST(count(*) AS BIGINT) AS n_bigrams
        |FROM bg JOIN c2 USING (b) JOIN c1 ON c1.token = bg.w1 CROSS JOIN v
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      val split = docs(s, d).select(col("doc_id"),
        org.apache.spark.sql.functions.split(col("text"), " ").as("t"))
      // size<2 docs filter BEFORE sequence(1, size-1): Spark's sequence
      // DESCENDS when start > stop (sequence(1,0) = [1,0]) — the filter
      // yields no bigram rows for them, matching DuckDB's empty range
      val bg = split.where(size(col("t")) >= 2)
        .select(col("doc_id"), explode(
          transform(sequence(lit(1), size(col("t")) - 1), i => struct(
            concat(element_at(col("t"), i), lit(" "),
              element_at(col("t"), i + 1)).as("b"),
            element_at(col("t"), i).as("w1")))).as("p"))
        .select(col("doc_id"), col("p.b").as("b"), col("p.w1").as("w1"))
      val c2 = bg.groupBy("b").agg(count(lit(1)).as("cb"))
      val tok = docs(s, d)
        .select(col("doc_id"), explode(org.apache.spark.sql.functions
          .split(col("text"), " ")).as("token"))
      val c1 = tok.groupBy("token").agg(count(lit(1)).as("cw"))
      val v = c1.agg(count(lit(1)).as("v"))
      bg.join(c2, Seq("b"))
        .join(c1, col("token") === col("w1"))
        .crossJoin(broadcast(v))
        .groupBy("doc_id")
        .agg(round(avg(log((col("cb") + 1).cast("double") /
            (col("cw") + col("v")).cast("double"))), 6).as("avg_logp2"),
          count(lit(1)).as("n_bigrams"))
        .orderBy("doc_id")
    },

    // BM25 top-k retrieval (round 5): the classic lexical ranking function
    // (Robertson/Spärck Jones, k1=1.2 b=0.75) for a fixed query term set —
    // the retrieval path a training-data pipeline uses for targeted corpus
    // slicing and eval-set mining. Plan: the token stream is filtered to
    // the query terms BEFORE any shuffle (map-side isin on a 3-element
    // literal list), so the tf aggregation exchanges only matching tokens;
    // doc lengths aggregate map-side per doc; df and the (N, avgdl) stats
    // are 1-to-3-row broadcasts; the final ranking fuses to
    // TakeOrderedAndProject. At 100 TB nothing driver-sized exists and the
    // only wide shuffle carries one row per (matching doc, query term).
    // Every constant is the SAME literal in both engines (writing k1+1 as
    // 2.2 etc.) and tf is cast to DOUBLE before its product (DuckDB would
    // otherwise evaluate BIGINT*2.2 in exact DECIMAL, a 1-ulp divergence
    // from Spark's double×double), so the arithmetic is bit-identical;
    // ln + round(6) follows the llm_lm_score precedent.
    Q("llm_bm25_topk",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |  FROM dl
        |), tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok
        |  WHERE token IN ('hash', 'join', 'window')
        |  GROUP BY doc_id, token
        |), df AS (
        |  SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token
        |)
        |SELECT doc_id,
        |       CAST(count(*) AS BIGINT) AS n_hit,
        |       round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |                 * (CAST(tf AS DOUBLE) * 2.2)
        |                 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS score
        |FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats
        |GROUP BY doc_id
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin) { (s, d) =>
      val qterms = Seq("hash", "join", "window")
      val tok = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(
        count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = tok.where(col("token").isin(qterms: _*))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
      val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
      val contrib = idf * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      tf.join(broadcast(df), Seq("token"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_hit"),
          round(sum(contrib), 6).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // Dirichlet query-likelihood retrieval (round 13, cont.; Zhai &
    // Lafferty 2001, μ=100): the language-modeling scorer next to BM25
    // — score(q,d) = Σ_t ln((tf + μ·p_c(t))/(dl + μ)) ranks EVERY doc
    // (smoothing handles absent terms), where BM25 only scores docs
    // with a hit; the two disagree exactly on short docs and rare-term
    // balance, which is why eval-mining pipelines run both. Decomposed
    // so only PRESENT terms need per-doc rows: score = base(consts) −
    // |q|·ln(dl+μ) + Σ_present [ln(tf+μp) − ln(μp)]; the present-term
    // sum (≤3 rows/doc, engine-order) rides per-row 1e-9-quantized
    // integers (ulcer doctrine), base and the dl term are ONE fixed
    // expression each. Collection stats are 1-row broadcasts; ranking
    // fuses to TakeOrderedAndProject.
    Q("llm_ql_topk",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok
        |  GROUP BY doc_id
        |), cf AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS cf FROM tok
        |  WHERE token IN ('hash', 'join', 'window') GROUP BY token
        |), consts AS (
        |  SELECT CAST((SELECT sum(dl) FROM dl) AS BIGINT) AS ct,
        |         max(CASE WHEN token = 'hash' THEN cf END) AS ch,
        |         max(CASE WHEN token = 'join' THEN cf END) AS cj,
        |         max(CASE WHEN token = 'window' THEN cf END) AS cw
        |  FROM cf
        |), tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok
        |  WHERE token IN ('hash', 'join', 'window')
        |  GROUP BY doc_id, token
        |), z AS (
        |  SELECT doc_id,
        |         CAST(sum(CAST(round(
        |           (ln(CAST(tf AS DOUBLE)
        |                + 100.0 * cf.cf / consts.ct)
        |            - ln(100.0 * cf.cf / consts.ct)) * 1000000000)
        |           AS BIGINT)) AS BIGINT) AS sz
        |  FROM tf JOIN cf USING (token) CROSS JOIN consts
        |  GROUP BY doc_id
        |)
        |SELECT doc_id,
        |       floor((ln(100.0 * ch / ct) + ln(100.0 * cj / ct)
        |              + ln(100.0 * cw / ct)
        |              - 3 * ln(CAST(dl AS DOUBLE) + 100.0)
        |              + CAST(coalesce(sz, 0) AS DOUBLE) / 1000000000)
        |             * 1000000) / 1000000 AS score
        |FROM dl LEFT JOIN z USING (doc_id) CROSS JOIN consts
        |ORDER BY score DESC, doc_id
        |LIMIT 20""".stripMargin) { (s, d) =>
      val qterms = Seq("hash", "join", "window")
      val tok = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val cf = tok.where(col("token").isin(qterms: _*))
        .groupBy("token").agg(count(lit(1)).as("cf"))
      val consts = cf
        .agg(max(when(col("token") === "hash", col("cf"))).as("ch"),
          max(when(col("token") === "join", col("cf"))).as("cj"),
          max(when(col("token") === "window", col("cf"))).as("cw"))
        .crossJoin(dl.agg(sum(col("dl")).as("ct")))
      val tf = tok.where(col("token").isin(qterms: _*))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val z = tf.join(broadcast(cf), Seq("token"))
        .crossJoin(broadcast(consts))
        .groupBy("doc_id")
        .agg(sum(expr(
          """CAST(round((ln(CAST(tf AS DOUBLE) + 100.0 * cf / ct)
            |             - ln(100.0 * cf / ct)) * 1000000000) AS BIGINT)"""
            .stripMargin)).as("sz"))
      dl.join(z, Seq("doc_id"), "left")
        .crossJoin(broadcast(consts))
        .select(col("doc_id"),
          (floor((expr("ln(100.0 * ch / ct) + ln(100.0 * cj / ct)"
            + " + ln(100.0 * cw / ct)")
            - lit(3) * expr("ln(CAST(dl AS DOUBLE) + 100.0)")
            + coalesce(col("sz"), lit(0L)).cast("double") / 1000000000L)
            * 1000000) / 1000000).as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    },

    // Reciprocal-rank fusion (round 13, cont.; Cormack/Clarke/Buettcher
    // 2009, k=60): fuse the BM25 and query-likelihood top-50 lists into
    // one ranking by Σ 1/(60 + rank) — the standard no-tuning hybrid
    // that beats either scorer alone because their failure modes are
    // disjoint (BM25 misses hit-less docs entirely; QL over-rewards
    // short docs). Ranks come from the two scorers' own deterministic
    // (score DESC, doc_id) orders over their bounded top-50 frames (the
    // rank windows ride 50-row frames, never the corpus); the fused
    // score is a fixed two-term expression of exact integer ranks, one
    // FLOOR-scaled display.
    Q("llm_rrf_fusion",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok
        |  GROUP BY doc_id
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |  FROM dl
        |), tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok
        |  WHERE token IN ('hash', 'join', 'window')
        |  GROUP BY doc_id, token
        |), df AS (
        |  SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token
        |), bm AS (
        |  SELECT doc_id,
        |         round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |                   * (CAST(tf AS DOUBLE) * 2.2)
        |                   / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
        |           AS score
        |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
        |  CROSS JOIN stats GROUP BY doc_id
        |), bmr AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |              AS BIGINT) AS ra
        |  FROM (SELECT doc_id, score FROM bm
        |        ORDER BY score DESC, doc_id LIMIT 50)
        |), cfq AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS cf FROM tok
        |  WHERE token IN ('hash', 'join', 'window') GROUP BY token
        |), consts AS (
        |  SELECT CAST((SELECT sum(dl) FROM dl) AS BIGINT) AS ct,
        |         max(CASE WHEN token = 'hash' THEN cf END) AS ch,
        |         max(CASE WHEN token = 'join' THEN cf END) AS cj,
        |         max(CASE WHEN token = 'window' THEN cf END) AS cw
        |  FROM cfq
        |), z AS (
        |  SELECT doc_id,
        |         CAST(sum(CAST(round(
        |           (ln(CAST(tf AS DOUBLE) + 100.0 * cfq.cf / consts.ct)
        |            - ln(100.0 * cfq.cf / consts.ct)) * 1000000000)
        |           AS BIGINT)) AS BIGINT) AS sz
        |  FROM tf JOIN cfq USING (token) CROSS JOIN consts
        |  GROUP BY doc_id
        |), qls AS (
        |  SELECT doc_id,
        |         floor((ln(100.0 * ch / ct) + ln(100.0 * cj / ct)
        |                + ln(100.0 * cw / ct)
        |                - 3 * ln(CAST(dl AS DOUBLE) + 100.0)
        |                + CAST(coalesce(sz, 0) AS DOUBLE) / 1000000000)
        |               * 1000000) / 1000000 AS score
        |  FROM dl LEFT JOIN z USING (doc_id) CROSS JOIN consts
        |), qlr AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |              AS BIGINT) AS rb
        |  FROM (SELECT doc_id, score FROM qls
        |        ORDER BY score DESC, doc_id LIMIT 50)
        |)
        |SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, ra, rb,
        |       floor((coalesce(1.0 / (60 + ra), 0.0)
        |              + coalesce(1.0 / (60 + rb), 0.0)) * 1000000)
        |         / 1000000 AS rrf
        |FROM bmr a FULL JOIN qlr b ON a.doc_id = b.doc_id
        |ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      val qterms = Seq("hash", "join", "window")
      val tok = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(
        count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = tok.where(col("token").isin(qterms: _*))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
      val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
      val contrib = idf * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      val bm = tf.join(broadcast(df), Seq("token"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(round(sum(contrib), 6).as("score"))
      val wRank = Window.orderBy(col("score").desc, col("doc_id"))
      val bmr = bm.orderBy(col("score").desc, col("doc_id")).limit(50)
        .withColumn("ra", row_number().over(wRank).cast("long"))
        .select("doc_id", "ra")
      val cfq = tok.where(col("token").isin(qterms: _*))
        .groupBy("token").agg(count(lit(1)).as("cf"))
      val consts = cfq
        .agg(max(when(col("token") === "hash", col("cf"))).as("ch"),
          max(when(col("token") === "join", col("cf"))).as("cj"),
          max(when(col("token") === "window", col("cf"))).as("cw"))
        .crossJoin(dl.agg(sum(col("dl")).as("ct")))
      val z = tf.join(broadcast(cfq), Seq("token"))
        .crossJoin(broadcast(consts))
        .groupBy("doc_id")
        .agg(sum(expr(
          """CAST(round((ln(CAST(tf AS DOUBLE) + 100.0 * cf / ct)
            |             - ln(100.0 * cf / ct)) * 1000000000) AS BIGINT)"""
            .stripMargin)).as("sz"))
      val qls = dl.join(z, Seq("doc_id"), "left")
        .crossJoin(broadcast(consts))
        .select(col("doc_id"),
          (floor((expr("ln(100.0 * ch / ct) + ln(100.0 * cj / ct)"
            + " + ln(100.0 * cw / ct)")
            - lit(3) * expr("ln(CAST(dl AS DOUBLE) + 100.0)")
            + coalesce(col("sz"), lit(0L)).cast("double") / 1000000000L)
            * 1000000) / 1000000).as("score"))
      val qlr = qls.orderBy(col("score").desc, col("doc_id")).limit(50)
        .withColumn("rb", row_number().over(wRank).cast("long"))
        .select(col("doc_id").as("qdoc"), col("rb"))
      bmr.join(qlr, col("doc_id") === col("qdoc"), "full_outer")
        .select(coalesce(col("doc_id"), col("qdoc")).as("doc_id"),
          col("ra"), col("rb"),
          (floor((coalesce(lit(1.0) / (lit(60) + col("ra")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("rb")), lit(0.0)))
            * 1000000) / 1000000).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
    },

    // Within-doc repetition ratio (pretraining boilerplate/spam filter):
    // 1 − distinct/total word-3-grams. Pure per-doc aggregation — no join,
    // embarrassingly parallel at any scale.
    Q("llm_repetition",
      s"""SELECT doc_id,
         |       CAST(count(*) AS BIGINT) AS n_shingles,
         |       CAST(count(DISTINCT s) AS BIGINT) AS n_uniq,
         |       round(1.0 - count(DISTINCT s) * 1.0 / count(*), 6) AS rep_ratio
         |FROM (
         |  SELECT doc_id,
         |         unnest(list_transform(range(1, len(t) - 1),
         |                i -> array_to_string(t[i:i+2], ' '))) AS s
         |  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
         |)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
      shingleDfRaw(docs(s, d))
        .groupBy("doc_id")
        .agg(
          count(lit(1)).as("n_shingles"),
          countDistinct(col("s")).as("n_uniq"),
          round(lit(1.0) - countDistinct(col("s")) * 1.0 / count(lit(1)), 6)
            .as("rep_ratio"))
        .orderBy("doc_id")
    },

    // Deterministic stratified sampling for training-data mixes: keep rate
    // per source stratum, selection by content-independent hash bucket
    // (portable_hash(doc_id) mod 100) — re-runs and retries select the SAME
    // rows (no rand()), and the filter is a map-side predicate that scales
    // to any corpus size with zero shuffle.
    Q("llm_sample_mix", {
      val rate = """CASE WHEN source IN ('src0', 'src1') THEN 100
                   |            WHEN source LIKE 'src1%' THEN 50
                   |            ELSE 20 END""".stripMargin
      s"""SELECT doc_id, source, CAST(h % 100 AS BIGINT) AS bucket
         |FROM (
         |  SELECT doc_id, source,
         |         ${PortableHash.sql("CAST(doc_id AS VARCHAR)")} AS h,
         |         $rate AS rate
         |  FROM documents
         |)
         |WHERE h % 100 < rate
         |ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val rate = when(col("source").isin("src0", "src1"), 100)
        .when(col("source").like("src1%"), 50)
        .otherwise(20)
      docs(s, d)
        .select(col("doc_id"), col("source"),
          PortableHash.pHash(col("doc_id").cast("string")).as("h"), rate.as("rate"))
        .where(pmod(col("h"), lit(100)) < col("rate"))
        .select(col("doc_id"), col("source"),
          pmod(col("h"), lit(100)).cast("long").as("bucket"))
        .orderBy("doc_id")
    },

    // WEIGHTED sampling without replacement (round 8, cont. 3) — the
    // third leg of training-mix control: sample_mix keeps a RATE,
    // cap_per_source a hard k PER source; this draws ONE global k where
    // each doc's inclusion odds scale with an integer weight (upsample
    // rare languages, downsample the dominant one). A-ES (Efraimidis &
    // Spirakis 2006) ranks docs by u^(1/w); since max of w iid uniforms
    // IS u^(1/w) in distribution (inverse-CDF), integer weights turn the
    // key into greatest(h_1..h_w) of SEEDED portable hashes — exact
    // integer comparison, no transcendentals in a compare position
    // (§7.4), rerun-stable, engine-portable. Plan: map-side key + global
    // top-k = TakeOrderedAndProject (per-partition heaps, no shuffle) —
    // the same 100 TB shape as topk_global.
    Q("llm_sample_weighted", {
      val hs = (1 to 6)
        .map(i => PortableHash.sqlSeeded(i, "CAST(doc_id AS VARCHAR)"))
      s"""SELECT doc_id, lang, source,
         |       CASE lang WHEN 'en' THEN ${hs(0)}
         |                 WHEN 'de' THEN greatest(${hs(0)}, ${hs(1)})
         |                 WHEN 'es' THEN greatest(${hs(0)}, ${hs(1)},
         |                                         ${hs(2)})
         |                 WHEN 'fr' THEN greatest(${hs(0)}, ${hs(1)},
         |                                         ${hs(2)}, ${hs(3)})
         |                 ELSE greatest(${hs(0)}, ${hs(1)}, ${hs(2)},
         |                               ${hs(3)}, ${hs(4)}, ${hs(5)})
         |       END AS wkey
         |FROM documents
         |ORDER BY wkey DESC, doc_id LIMIT 100""".stripMargin
    }) { (s, d) =>
      val h = (1 to 6)
        .map(i => PortableHash.pHashSeeded(i, col("doc_id").cast("string")))
      val wkey = when(col("lang") === "en", h(0))
        .when(col("lang") === "de", greatest(h(0), h(1)))
        .when(col("lang") === "es", greatest(h(0), h(1), h(2)))
        .when(col("lang") === "fr", greatest(h(0), h(1), h(2), h(3)))
        .otherwise(greatest(h(0), h(1), h(2), h(3), h(4), h(5)))
      docs(s, d)
        .select(col("doc_id"), col("lang"), col("source"), wkey.as("wkey"))
        .orderBy(col("wkey").desc, col("doc_id"))
        .limit(100)
    },

    // Temperature (α=0.5) sampling — the multilingual-balance recipe
    // (UniMax / mT5-style): per-language sampling probability ∝ n^α,
    // renormalized over a half-corpus budget and capped at one epoch, so
    // dominant languages are DOWN-weighted and tail languages up-weighted
    // relative to proportional sampling. Rates are DATA-DRIVEN (derived
    // in-plan from corpus counts — llm_sample_mix's rates are authored
    // constants), folded in pinned language order (the source_mix_kl
    // fold idiom: engine-ordered double sums never decide output), made
    // integral as permille thresholds, and applied with the deterministic
    // portable-hash bucket — so both engines pick the IDENTICAL doc set.
    // At 100 TB: two fact scans (count + filter), both map-side; the
    // language-rate frame is bounded and broadcast.
    Q("llm_sample_temperature",
      s"""WITH c AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY lang
         |), s AS (
         |  SELECT list_reduce(list(sqrt(CAST(n_docs AS DOUBLE)) ORDER BY lang),
         |                     (a, b) -> a + b) AS w_sum,
         |         CAST(sum(n_docs) AS BIGINT) AS total
         |  FROM c
         |), r AS (
         |  SELECT lang, n_docs,
         |         sqrt(CAST(n_docs AS DOUBLE)) / w_sum AS share,
         |         CAST(least(1000, floor(
         |           sqrt(CAST(n_docs AS DOUBLE)) / w_sum
         |           * floor(CAST(total AS DOUBLE) / 2) / n_docs * 1000))
         |           AS BIGINT) AS rate_permille
         |  FROM c CROSS JOIN s
         |), p AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS picked
         |  FROM (
         |    SELECT d.lang
         |    FROM documents d JOIN r USING (lang)
         |    WHERE ${PortableHash.sql("CAST(doc_id AS VARCHAR)")} % 1000
         |          < r.rate_permille
         |  ) GROUP BY lang
         |)
         |SELECT r.lang, r.n_docs,
         |       floor(r.share * 1000000) / 1000000 AS share,
         |       r.rate_permille, COALESCE(p.picked, 0) AS picked
         |FROM r LEFT JOIN p USING (lang)
         |ORDER BY lang""".stripMargin) { (s, d) =>
      val c = docs(s, d).groupBy("lang").agg(count(lit(1)).as("n_docs"))
        .persist() // feeds the pinned fold AND the per-lang rate rows
      val sTot = c.agg(
        expr("""aggregate(sort_array(collect_list(struct(lang, n_docs))),
               | 0d, (a, e) -> a + sqrt(CAST(e.n_docs AS DOUBLE)))"""
          .stripMargin).as("w_sum"),
        sum(col("n_docs")).as("total"))
      val rates = c.crossJoin(broadcast(sTot))
        .select(col("lang"), col("n_docs"),
          (sqrt(col("n_docs").cast("double")) / col("w_sum")).as("share"),
          least(lit(1000L), floor(
            sqrt(col("n_docs").cast("double")) / col("w_sum")
              * floor(col("total").cast("double") / 2) / col("n_docs")
              * 1000)).as("rate_permille"))
      val picked = docs(s, d)
        .select(col("lang"),
          pmod(PortableHash.pHash(col("doc_id").cast("string")), lit(1000L))
            .as("b"))
        .join(broadcast(rates.select("lang", "rate_permille")), Seq("lang"))
        .where(col("b") < col("rate_permille"))
        .groupBy("lang").agg(count(lit(1)).as("picked"))
      rates.join(broadcast(picked), Seq("lang"), "left")
        .select(col("lang"), col("n_docs"),
          (floor(col("share") * 1000000) / 1000000).as("share"),
          col("rate_permille"),
          coalesce(col("picked"), lit(0L)).as("picked"))
        .orderBy("lang")
    },

    // Deterministic train/val/test split (round 5): the assignment every
    // training run needs before anything else. Split by content-stable
    // hash bucket — portable_hash(doc_id) mod 100 → 98/1/1 — so the
    // assignment is (a) reproducible across reruns and engines (no
    // rand()), (b) a pure map-side projection with ZERO shuffle at any
    // corpus size, and (c) leak-proof under re-ingestion: a document
    // keeps its split forever because the hash depends only on its id,
    // not on arrival order or partition layout. The summary proves the
    // stratification: per (source, split) counts — val/test land within
    // binomial noise of 1% per source.
    Q("llm_split_assign",
      s"""SELECT source, split, CAST(count(*) AS BIGINT) AS n_docs
         |FROM (
         |  SELECT source,
         |         CASE WHEN b < 98 THEN 'train'
         |              WHEN b = 98 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM (
         |    SELECT source,
         |           ${PortableHash.sql("CAST(doc_id AS VARCHAR)")} % 100 AS b
         |    FROM documents
         |  )
         |)
         |GROUP BY source, split
         |ORDER BY source, split""".stripMargin) { (s, d) =>
      val b = pmod(PortableHash.pHash(col("doc_id").cast("string")), lit(100))
      docs(s, d)
        .select(col("source"),
          when(b < 98, "train").when(b === 98, "val").otherwise("test")
            .as("split"))
        .groupBy("source", "split")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "split")
    },

    // HARD per-source cap (round 5) — the other half of training-mix
    // control: llm_sample_mix keeps a RATE per source; this keeps at most
    // k=15 docs per source however large the source is ("no single crawl
    // may contribute more than k"), selected by portable_hash order so
    // the draw is uniform-ish, rerun-stable, and engine-portable. Plan:
    // one window per source (WindowGroupLimit pushes the rank filter),
    // no join, no global sort before the capped output.
    Q("llm_sample_cap_per_source",
      s"""SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
         |FROM (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY ${PortableHash.sql("CAST(doc_id AS VARCHAR)")},
         |                    doc_id) AS rn
         |  FROM documents
         |)
         |WHERE rn <= 15
         |ORDER BY source, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source")
        .orderBy(PortableHash.pHash(col("doc_id").cast("string")), col("doc_id"))
      docs(s, d)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 15)
        .select(col("doc_id"), col("source"), col("rn").cast("long").as("rn"))
        .orderBy("source", "rn")
    },

    // Greedy sequence packing (pretraining shard assembly): documents fill
    // fixed 2048-token packs in doc_id order within each source shard —
    // pack_id = floor(running-tokens-before-doc / budget), one window
    // cumsum per shard. Each source partitions independently, so packing
    // parallelizes across shards at any scale.
    Q("llm_pack_sequences",
      """SELECT doc_id, source, n_tok,
        |       CAST(floor((cum - n_tok) * 1.0 / 2048) AS BIGINT) AS pack_id
        |FROM (
        |  SELECT doc_id, source, n_tok,
        |         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |  FROM (
        |    SELECT doc_id, source,
        |           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |    FROM documents
        |  )
        |)
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("source"), col("n_tok"),
          floor((col("cum") - col("n_tok")) * 1.0 / 2048).as("pack_id"))
        .orderBy("doc_id")
    },

    // Same packing as llm_pack_sequences, but budgeted in SUBWORD tokens
    // (greedy longest-match over the inlined vocab — graft.functions
    // .SubwordTokenizer): the tokenizer-real accounting a training pipeline
    // needs. Whitespace counting under-counts by the subword fan-out, so
    // the same 2048 budget yields MORE packs here (TokenizerSpec plants
    // CJK/compound text where the divergence is extreme). The oracle runs
    // the identical greedy strip loop as a recursive CTE.
    Q("llm_pack_sequences_bpe",
      s"""WITH RECURSIVE ${graft.functions.SubwordTokenizer.ntokCtes},
         |cum AS (
         |  SELECT d.doc_id, d.source, n.n_tok,
         |         sum(n.n_tok) OVER (PARTITION BY d.source ORDER BY d.doc_id) AS cum
         |  FROM documents d JOIN sw_ntok n ON d.doc_id = n.doc_id
         |)
         |SELECT doc_id, source, n_tok,
         |       CAST(floor((cum - n_tok) * 1.0 / 2048) AS BIGINT) AS pack_id
         |FROM cum ORDER BY doc_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      docs(s, d)
        .select(col("doc_id"), col("source"),
          graft.functions.SubwordTokenizer.countCol(col("text")).as("n_tok"))
        .withColumn("cum", sum(col("n_tok")).over(w))
        .select(col("doc_id"), col("source"), col("n_tok"),
          floor((col("cum") - col("n_tok")) * 1.0 / 2048).as("pack_id"))
        .orderBy("doc_id")
    },

    // Sliding-window chunking (round 7): the context-window prep step
    // between cleaning and packing — cut each document into 64-token
    // windows at stride 48 (16-token overlap, the RAG/pretraining default
    // shape), so long documents become trainable/retrievable units that
    // preserve cross-boundary context. Chunk starts are generated
    // ARITHMETICALLY (sequence(0, n_tok-1, stride) → explode) off ONE
    // per-doc token array — no per-token explode and regroup, so the row
    // count entering the shuffle-free stage is O(chunks), not O(tokens),
    // and the whole plan is narrow (scan → project → generate): chunking
    // 100 TB is embarrassingly parallel with zero exchanges. The tail
    // chunk keeps whatever remains past the last full window (every
    // token is covered; chunk_tokens < 64 only on the tail). The oracle
    // replays the same starts with range(0, n, 48) + 1-based list
    // slicing — llm_tokenize_tf's split parity.
    // Length-band curation filter (round 8, cont. 4): flag documents
    // outside the exact [p5, p95] length band per source — the standard
    // too-short/too-long pre-filter (truncated scrapes, concatenation
    // bugs) with DATA-DRIVEN thresholds instead of authored constants.
    // The thresholds come from RankFence.quantilesFenced (exact
    // quantile_disc elements under the (n_chars, doc_id) total order, NO
    // global sort — the agg_percentiles_fenced machinery on its second
    // table); classification is a map-side comparison, band counts one
    // bounded groupBy. The oracle replays the identical
    // max(1, ceil(q·n)) rank arithmetic.
    Q("llm_length_filter",
      """WITH r AS (
        |  SELECT n_chars, row_number() OVER (ORDER BY n_chars, doc_id) AS rn,
        |         CAST(count(*) OVER () AS BIGINT) AS n
        |  FROM documents
        |), th AS (
        |  SELECT
        |    max(CASE WHEN rn = greatest(1, CAST(ceil(5 / 100.0 * n)
        |                                        AS BIGINT))
        |             THEN n_chars END) AS p5,
        |    max(CASE WHEN rn = greatest(1, CAST(ceil(95 / 100.0 * n)
        |                                        AS BIGINT))
        |             THEN n_chars END) AS p95
        |  FROM r
        |)
        |SELECT source,
        |       CASE WHEN n_chars < p5 THEN '1_short'
        |            WHEN n_chars > p95 THEN '3_long'
        |            ELSE '2_ok' END AS band,
        |       CAST(count(*) AS BIGINT) AS n_docs, p5, p95
        |FROM documents CROSS JOIN th
        |GROUP BY source, band, p5, p95
        |ORDER BY source, band""".stripMargin) { (s, d) =>
      val th = RankFence.quantilesFenced(
        docs(s, d).select(col("n_chars"), col("doc_id")),
        Seq(RankFence.OrderCol("n_chars"), RankFence.OrderCol("doc_id")),
        Seq(5 / 100.0, 95 / 100.0))
      val p5 = th(0)._3.asInstanceOf[Number].longValue
      val p95 = th(1)._3.asInstanceOf[Number].longValue
      docs(s, d)
        .select(col("source"),
          when(col("n_chars") < p5, "1_short")
            .when(col("n_chars") > p95, "3_long")
            .otherwise("2_ok").as("band"))
        .groupBy("source", "band")
        .agg(count(lit(1)).as("n_docs"))
        .select(col("source"), col("band"), col("n_docs"),
          lit(p5).as("p5"), lit(p95).as("p95"))
        .orderBy("source", "band")
    },

    // Largest-remainder quota allocation (round 8, cont. 4 — Hamilton's
    // method): split a fixed sample budget (1000 slots) across sources
    // proportionally to their doc counts, exactly — base_s = ⌊c_s·B/N⌋,
    // then the B − Σbase leftover slots go to the largest REMAINDERS
    // (c_s·B − base_s·N, an exact integer numerator — no fraction ever
    // materializes). This is the missing piece between llm_sample_mix
    // (rates) and llm_sample_cap_per_source (hard caps): a quota that
    // sums EXACTLY to the budget, the number a sampling job is actually
    // given. Integer arithmetic end to end; the remainder ranking is a
    // count-ahead self-join over the bounded source frame (no window at
    // all), ties broken by source name.
    Q("llm_quota_allocate",
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
        |  FROM documents GROUP BY source
        |), t AS (
        |  SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c
        |), b AS (
        |  SELECT source, n_docs,
        |         (n_docs * 1000) // total AS base,
        |         n_docs * 1000 - ((n_docs * 1000) // total) * total AS rem,
        |         total
        |  FROM c CROSS JOIN t
        |), l AS (
        |  SELECT CAST(1000 - sum(base) AS BIGINT) AS leftover FROM b
        |), r AS (
        |  SELECT x.source, x.n_docs, x.base, x.rem,
        |         CAST(count(y.source) AS BIGINT) AS n_ahead
        |  FROM b x LEFT JOIN b y
        |    ON y.rem > x.rem OR (y.rem = x.rem AND y.source < x.source)
        |  GROUP BY x.source, x.n_docs, x.base, x.rem
        |)
        |SELECT source, n_docs, base, rem,
        |       CASE WHEN n_ahead < leftover THEN base + 1 ELSE base END
        |         AS quota
        |FROM r CROSS JOIN l ORDER BY source""".stripMargin) { (s, d) =>
      val c = docs(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
        .persist() // bounded source frame feeds totals + both rank sides
      val t = c.agg(sum(col("n_docs")).as("total"))
      val b = c.crossJoin(broadcast(t))
        .select(col("source"), col("n_docs"),
          expr("(n_docs * 1000) div total").as("base"),
          expr("n_docs * 1000 - ((n_docs * 1000) div total) * total")
            .as("rem"))
        .persist()
      val lo = b.agg((lit(1000L) - sum(col("base"))).as("leftover"))
      val ahead = b.as("x")
        .join(b.as("y"),
          col("y.rem") > col("x.rem") ||
            (col("y.rem") === col("x.rem") &&
              col("y.source") < col("x.source")), "left")
        .groupBy(col("x.source").as("source"), col("x.n_docs").as("n_docs"),
          col("x.base").as("base"), col("x.rem").as("rem"))
        .agg(count(col("y.source")).as("n_ahead"))
      ahead.crossJoin(broadcast(lo))
        .select(col("source"), col("n_docs"), col("base"), col("rem"),
          when(col("n_ahead") < col("leftover"), col("base") + 1)
            .otherwise(col("base")).as("quota"))
        .orderBy("source")
    },

    // Prefix-cache savings (round 8, cont. 4): group documents by their
    // first-32-token prefix and report, per duplicate-prefix group, the
    // tokens a prefix-caching inference/training stack saves —
    // (n_docs − 1) · prefix_tokens. Templated corpora (boilerplate
    // headers, shared system prompts, scraped mirrors) make this the ROI
    // readout that decides whether prefix caching or prefix-dedup is
    // worth running at all; a curation pipeline runs it BEFORE packing.
    // Plan: map-side prefix hash + ONE groupBy shuffle on the hash, then
    // top-k via TakeOrderedAndProject; groups sharing an exact prefix
    // string necessarily share token count, so max(ptok) is a constant
    // pick, not a choice.
    Q("llm_prefix_cache_savings",
      """WITH p AS (
        |  SELECT md5(array_to_string(string_split(text, ' ')[1 : 32], ' '))
        |           AS prefix_hash,
        |         CAST(least(len(string_split(text, ' ')), 32) AS BIGINT)
        |           AS pt
        |  FROM documents
        |), g AS (
        |  SELECT prefix_hash, CAST(count(*) AS BIGINT) AS n_docs,
        |         max(pt) AS prefix_tokens
        |  FROM p GROUP BY prefix_hash
        |)
        |SELECT prefix_hash, n_docs, prefix_tokens,
        |       (n_docs - 1) * prefix_tokens AS saved_tokens
        |FROM g WHERE n_docs >= 2
        |ORDER BY saved_tokens DESC, prefix_hash LIMIT 20""".stripMargin) {
      (s, d) =>
        docs(s, d)
          .select(
            md5(concat_ws(" ", slice(split(col("text"), " "), 1, 32)))
              .as("prefix_hash"),
            least(size(split(col("text"), " ")), lit(32)).cast("long")
              .as("pt"))
          .groupBy("prefix_hash")
          .agg(count(lit(1)).as("n_docs"), max(col("pt")).as("prefix_tokens"))
          .where(col("n_docs") >= 2)
          .select(col("prefix_hash"), col("n_docs"), col("prefix_tokens"),
            ((col("n_docs") - 1) * col("prefix_tokens")).as("saved_tokens"))
          .orderBy(col("saved_tokens").desc, col("prefix_hash"))
          .limit(20)
    },

    // Sentence-budget chunking report (round 8, cont. 4): split each doc
    // into SENTENCES ('[.!?] +' — RE2/Java-agreeing, no lookbehind),
    // greedy-pack consecutive sentences into chunks of ≤ 40 tokens, and
    // report per-doc sentence/token/chunk counts — the SEMANTIC-chunking
    // budget readout (llm_chunk_sliding cuts mid-sentence at fixed
    // stride; RAG/embedding pipelines budget whole sentences and need to
    // know the chunk count a budget implies BEFORE materializing chunks).
    // The greedy pack is a NON-ASSOCIATIVE scan (chunk boundary depends
    // on the running fill) — same array-accumulator fold doctrine as
    // etl_clamped_ledger, here zero-exchange (pure map over the doc).
    // An over-budget single sentence occupies its own chunk (cur > 0
    // guard) rather than phantom-incrementing. Empty-text guard: Spark
    // split('') = [] but DuckDB = [''] — filtered/CASE'd identically.
    Q("llm_chunk_sentence_budget",
      """WITH t AS (
        |  SELECT doc_id,
        |         list_transform(string_split_regex(text, '[.!?] +'),
        |           s -> [CASE WHEN s = '' THEN CAST(0 AS BIGINT)
        |                      ELSE CAST(len(string_split(s, ' ')) AS BIGINT)
        |                 END, CAST(0 AS BIGINT)]) AS sl
        |  FROM documents WHERE length(text) > 0
        |), f AS (
        |  SELECT doc_id, CAST(len(sl) AS BIGINT) AS n_sentences,
        |         list_reduce(list_prepend(
        |             [CAST(0 AS BIGINT), CAST(0 AS BIGINT)], sl),
        |           (a, x) -> [a[1] + x[1], CAST(0 AS BIGINT)])[1]
        |           AS total_tokens,
        |         list_reduce(list_prepend(
        |             [CAST(1 AS BIGINT), CAST(0 AS BIGINT)], sl),
        |           (a, x) -> CASE WHEN a[2] + x[1] > 40 AND a[2] > 0
        |                          THEN [a[1] + 1, x[1]]
        |                          ELSE [a[1], a[2] + x[1]] END)[1] AS n_chunks
        |  FROM t
        |)
        |SELECT doc_id, n_sentences, total_tokens, n_chunks
        |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      docs(s, d)
        .where(length(col("text")) > 0)
        .select(col("doc_id"),
          expr(
            """transform(split(text, '[.!?] +'), s ->
              |  CASE WHEN s = '' THEN CAST(0 AS BIGINT)
              |       ELSE CAST(size(split(s, ' ')) AS BIGINT) END)"""
              .stripMargin).as("sl"))
        .select(col("doc_id"),
          size(col("sl")).cast("long").as("n_sentences"),
          expr("aggregate(sl, CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("total_tokens"),
          expr(
            """element_at(aggregate(sl,
              |  array(CAST(1 AS BIGINT), CAST(0 AS BIGINT)),
              |  (a, x) -> CASE WHEN element_at(a, 2) + x > 40
              |                  AND element_at(a, 2) > 0
              |                 THEN array(element_at(a, 1) + 1, x)
              |                 ELSE array(element_at(a, 1),
              |                            element_at(a, 2) + x) END), 1)"""
              .stripMargin).as("n_chunks"))
        .orderBy("doc_id")
    },

    Q("llm_chunk_sliding",
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        |x AS (
        |  SELECT doc_id, len(toks) AS n, toks,
        |         unnest(range(0, greatest(len(toks), 1), 48)) AS start
        |  FROM t
        |)
        |SELECT doc_id, CAST(start // 48 AS BIGINT) AS chunk_id,
        |       array_to_string(toks[start + 1 : start + 64], ' ') AS chunk,
        |       CAST(least(64, n - start) AS BIGINT) AS chunk_tokens
        |FROM x ORDER BY doc_id, chunk_id""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .withColumn("start",
          explode(sequence(lit(0), greatest(col("n") - 1, lit(0)), lit(48))))
        .select(col("doc_id"),
          (col("start") / 48).cast("long").as("chunk_id"),
          concat_ws(" ", slice(col("toks"), col("start") + 1, lit(64)))
            .as("chunk"),
          least(lit(64), col("n") - col("start")).cast("long")
            .as("chunk_tokens"))
        .orderBy("doc_id", "chunk_id")
    },

    // n-gram language ID: stopword votes per language, argmax with a fixed
    // tie-break ladder (identical CASE in both engines → deterministic).
    Q("llm_lang_id", {
      val counts = stopwords.keys.toSeq.sorted
        .map(l => s"len(list_filter(t, x -> x IN ${inList(stopwords(l))})) AS c_$l")
        .mkString(",\n         ")
      val ladder = Seq("en", "de", "es", "fr", "zh")
        .map(l => s"WHEN c_$l = mx THEN '$l'").mkString(" ")
      s"""SELECT doc_id, lang,
         |       CASE WHEN mx = 0 THEN 'und' $ladder END AS pred_lang
         |FROM (
         |  SELECT doc_id, lang,
         |         greatest(c_de, c_en, c_es, c_fr, c_zh) AS mx,
         |         c_de, c_en, c_es, c_fr, c_zh
         |  FROM (
         |    SELECT doc_id, lang, $counts
         |    FROM (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents)
         |  )
         |) ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val withCounts = stopwords.keys.toSeq.sorted.foldLeft(
        docs(s, d).select(col("doc_id"), col("lang"), split(col("text"), " ").as("t"))) {
        case (df, l) =>
          df.withColumn(s"c_$l",
            size(expr(s"filter(t, x -> x IN ${inList(stopwords(l))})")))
      }
      val mx = greatest(col("c_de"), col("c_en"), col("c_es"), col("c_fr"), col("c_zh"))
      val pred = Seq("en", "de", "es", "fr", "zh").foldLeft(
        when(mx === 0, "und")) { case (w, l) => w.when(col(s"c_$l") === mx, l) }
      withCounts
        .select(col("doc_id"), col("lang"), pred.as("pred_lang"))
        .orderBy("doc_id")
    },

    // Language-LABEL noise audit (round 12): the llm_lang_id heuristic
    // disagreeing with the stored lang label, rolled up per source —
    // the labeling-QA readout that finds the feed whose language tags
    // are wrong (mislabeled lang corrupts the stratified split, the
    // sampling mix, and every per-lang panel downstream). Exactly the
    // lang_id chain (shared stopword tables and argmax ladder — the
    // audit cannot disagree with the classifier it audits) plus one
    // bounded per-source rollup; 'und' predictions are counted
    // separately, never as mismatches (no evidence ≠ contrary
    // evidence).
    Q("llm_lang_mismatch", {
      val counts = stopwords.keys.toSeq.sorted
        .map(l => s"len(list_filter(t, x -> x IN ${inList(stopwords(l))})) AS c_$l")
        .mkString(",\n         ")
      val ladder = Seq("en", "de", "es", "fr", "zh")
        .map(l => s"WHEN c_$l = mx THEN '$l'").mkString(" ")
      s"""WITH p AS (
         |  SELECT source, lang,
         |         CASE WHEN mx = 0 THEN 'und' $ladder END AS pred_lang
         |  FROM (
         |    SELECT source, lang,
         |           greatest(c_de, c_en, c_es, c_fr, c_zh) AS mx,
         |           c_de, c_en, c_es, c_fr, c_zh
         |    FROM (
         |      SELECT source, lang, $counts
         |      FROM (SELECT source, lang, string_split(text, ' ') AS t
         |            FROM documents)
         |    )
         |  )
         |)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN pred_lang = 'und' THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_und,
         |       CAST(sum(CASE WHEN pred_lang <> 'und'
         |                      AND pred_lang <> lang THEN 1 ELSE 0 END)
         |            AS BIGINT) AS n_mismatch,
         |       floor(CAST(sum(CASE WHEN pred_lang <> 'und'
         |                           AND pred_lang <> lang THEN 1 ELSE 0 END)
         |                  AS DOUBLE)
         |             / greatest(sum(CASE WHEN pred_lang <> 'und'
         |                            THEN 1 ELSE 0 END), 1)
         |             * 1000000) / 1000000 AS mismatch_rate
         |FROM p GROUP BY source ORDER BY source""".stripMargin
    }) { (s, d) =>
      val withCounts = stopwords.keys.toSeq.sorted.foldLeft(
        docs(s, d).select(col("source"), col("lang"),
          split(col("text"), " ").as("t"))) {
        case (df, l) =>
          df.withColumn(s"c_$l",
            size(expr(s"filter(t, x -> x IN ${inList(stopwords(l))})")))
      }
      val mx = greatest(col("c_de"), col("c_en"), col("c_es"),
        col("c_fr"), col("c_zh"))
      val pred = Seq("en", "de", "es", "fr", "zh").foldLeft(
        when(mx === 0, "und")) { case (w, l) => w.when(col(s"c_$l") === mx, l) }
      val mism = when(col("pred_lang") =!= "und" &&
        col("pred_lang") =!= col("lang"), 1L).otherwise(0L)
      withCounts
        .select(col("source"), col("lang"), pred.as("pred_lang"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("pred_lang") === "und", 1L).otherwise(0L))
            .as("n_und"),
          sum(mism).as("n_mismatch"),
          (floor(sum(mism).cast("double")
            / greatest(sum(when(col("pred_lang") =!= "und", 1L)
              .otherwise(0L)), lit(1L)) * 1000000) / 1000000)
            .as("mismatch_rate"))
        .orderBy("source")
    },

    // Cohen's kappa rater agreement (round 13, cont.): chance-corrected
    // agreement between the stored lang LABEL and the llm_lang_id
    // heuristic — the one-number labeling-QA summary above
    // llm_lang_mismatch's per-source rates (raw agreement flatters a
    // skewed label mix; kappa subtracts what marginals alone would
    // score). Shares the exact stopword/argmax chain (the audit cannot
    // disagree with the classifier it audits); 'und' predictions are
    // abstentions, excluded from both marginals. All counts exact
    // BIGINT over the bounded 5×5 confusion domain; po/pe/kappa are
    // FLOOR-scaled displays of exact-integer ratios (n·d and n² stay
    // <10¹⁰ at sf0.1 — no overflow until ~10⁹ docs, where the counts
    // would move to the pe expression's DOUBLE anyway).
    Q("dq_rater_agreement", {
      val counts = stopwords.keys.toSeq.sorted
        .map(l => s"len(list_filter(t, x -> x IN ${inList(stopwords(l))})) AS c_$l")
        .mkString(",\n         ")
      val ladder = Seq("en", "de", "es", "fr", "zh")
        .map(l => s"WHEN c_$l = mx THEN '$l'").mkString(" ")
      s"""WITH p AS (
         |  SELECT lang,
         |         CASE WHEN mx = 0 THEN 'und' $ladder END AS pred_lang
         |  FROM (
         |    SELECT lang, greatest(c_de, c_en, c_es, c_fr, c_zh) AS mx,
         |           c_de, c_en, c_es, c_fr, c_zh
         |    FROM (
         |      SELECT lang, $counts
         |      FROM (SELECT lang, string_split(text, ' ') AS t FROM documents)
         |    )
         |  ) WHERE mx <> 0
         |), nd AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END)
         |              AS BIGINT) AS d
         |  FROM p
         |), rm AS (
         |  SELECT lang AS k, CAST(count(*) AS BIGINT) AS r FROM p GROUP BY lang
         |), cm AS (
         |  SELECT pred_lang AS k, CAST(count(*) AS BIGINT) AS c
         |  FROM p GROUP BY pred_lang
         |), pe AS (
         |  SELECT CAST(coalesce(sum(r * c), 0) AS BIGINT) AS pe_num
         |  FROM rm JOIN cm USING (k)
         |)
         |SELECT n AS n_rated, d AS n_agree,
         |       floor(CAST(d AS DOUBLE) / n * 1000000) / 1000000 AS po,
         |       floor(CAST(pe_num AS DOUBLE) / (n * n) * 1000000) / 1000000
         |         AS pe,
         |       floor(CAST(n * d - pe_num AS DOUBLE)
         |             / nullif(n * n - pe_num, 0) * 1000000) / 1000000
         |         AS kappa
         |FROM nd CROSS JOIN pe""".stripMargin
    }) { (s, d) =>
      val withCounts = stopwords.keys.toSeq.sorted.foldLeft(
        docs(s, d).select(col("lang"), split(col("text"), " ").as("t"))) {
        case (df, l) =>
          df.withColumn(s"c_$l",
            size(expr(s"filter(t, x -> x IN ${inList(stopwords(l))})")))
      }
      val mx = greatest(col("c_de"), col("c_en"), col("c_es"),
        col("c_fr"), col("c_zh"))
      val pred = Seq("en", "de", "es", "fr", "zh").foldLeft(
        when(mx === 0, "und")) { case (w, l) => w.when(col(s"c_$l") === mx, l) }
      val p = withCounts
        .select(col("lang"), pred.as("pred_lang"))
        .where(col("pred_lang") =!= "und")
      val nd = p.agg(count(lit(1)).as("n"),
        sum(when(col("lang") === col("pred_lang"), 1L).otherwise(0L)).as("d"))
      val rm = p.groupBy(col("lang").as("k")).agg(count(lit(1)).as("r"))
      val cm = p.groupBy(col("pred_lang").as("k2")).agg(count(lit(1)).as("c"))
      val pe = rm.join(cm, col("k") === col("k2"))
        .agg(coalesce(sum(col("r") * col("c")), lit(0L)).as("pe_num"))
      nd.crossJoin(pe).select(
        col("n").as("n_rated"), col("d").as("n_agree"),
        (floor(col("d").cast("double") / col("n") * 1000000) / 1000000)
          .as("po"),
        (floor(col("pe_num").cast("double") / (col("n") * col("n")) * 1000000)
          / 1000000).as("pe"),
        (floor((col("n") * col("d") - col("pe_num")).cast("double")
          / nullif(col("n") * col("n") - col("pe_num"), lit(0L)) * 1000000)
          / 1000000).as("kappa"))
    },

    // Word-3-gram Jaccard similarity over candidate pairs that share a
    // shingle (the scale-safe pattern: equi-join on shingle, never O(n²)).
    Q("llm_ngram_jaccard",
      s"""WITH sh AS (
         |  $shingleSql WHERE doc_id < 100)
         |), sz AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
         |), pr AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, CAST(count(*) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT d1, d2, inter,
         |       round(inter * 1.0 / (x.n + y.n - inter), 6) AS jaccard
         |FROM pr JOIN sz x ON pr.d1 = x.doc_id JOIN sz y ON pr.d2 = y.doc_id
         |WHERE inter >= 2
         |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      val sh = shingleDf(docs(s, d).where(col("doc_id") < 100))
      val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pr = sh.as("a")
        .join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .agg(count(lit(1)).as("inter"))
      pr.join(sz.as("x"), col("d1") === col("x.doc_id"))
        .join(sz.as("y"), col("d2") === col("y.doc_id"))
        .where(col("inter") >= 2)
        .select(
          col("d1"), col("d2"), col("inter"),
          round(col("inter") * 1.0 / (col("x.n") + col("y.n") - col("inter")), 6)
            .as("jaccard"))
        .orderBy("d1", "d2")
    },

    // Prefix-filtered set-similarity join (All-Pairs / PPJoin): the EXACT
    // alternative to the LSH candidate stage — no false negatives by the
    // prefix-filter lemma, so (unlike minhash banding) the result needs no
    // recall argument: it IS the brute-force threshold join, with candidate
    // generation reduced from every-shared-shingle pairs to rare-prefix-token
    // pairs. At 100 TB the wins compound: the prefix explode emits
    // (1-τ)·|doc| tokens per doc instead of |doc|, the equi-join lands on
    // the RAREST tokens (document frequency ascending = lowest join fanout),
    // the length filter prunes skewed-size pairs before the shuffle, and the
    // verify is one in-row array_intersect per surviving candidate. Oracle:
    // the straightforward all-shared-shingle-pairs threshold join — the two
    // plans must agree exactly (same doctrine as decontaminate_bloom).
    Q("llm_sim_join_prefix", simJoinTauOracle) { (s, d) =>
      prefixJaccardJoin(docs(s, d), 0.5)
    },

    // The ADAPTIVE twin (same oracle — the branch choice is result-
    // invisible by construction): observe the prefix candidate count,
    // verify per-pair only when the prefix actually pruned, otherwise
    // take the shared-shingle aggregation. On the 31-word harness corpus
    // the fallback branch fires (prefix tokens are common); NearDupSpec
    // forces BOTH branches on the same corpus and pins equality.
    Q("llm_sim_join_auto", simJoinTauOracle) { (s, d) =>
      simJoinThresholdAuto(docs(s, d), 0.5)
    },

    // PMI collocation mining (round 5): the R11 text-analysis report for
    // "which word pairs belong together" — adjacent-bigram counts vs
    // their margins, pmi = ln(p(a,b)/(p(a)·p(b))) over the bigram space.
    // Plan shape: one explode pass → three hash aggregates off the SAME
    // bigram frame (margins derived from the pair counts, not a second
    // corpus scan) → broadcast margin joins (vocabulary-sized, the
    // bounded side) → global top-20. All counts integer until the one
    // rounded ln at the end, so both engines agree bit-for-bit.
    Q("llm_pmi_bigrams",
      """WITH tok AS (
        |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
        |), bg AS (
        |  SELECT t[i] AS a, t[i + 1] AS b
        |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i
        |        FROM tok WHERE len(t) >= 2)
        |), nab AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS nab FROM bg GROUP BY a, b
        |), na AS (
        |  SELECT a, CAST(count(*) AS BIGINT) AS na FROM bg GROUP BY a
        |), nb AS (
        |  SELECT b, CAST(count(*) AS BIGINT) AS nb FROM bg GROUP BY b
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM bg
        |)
        |SELECT a, b, nab,
        |       round(ln((CAST(nab AS DOUBLE) * CAST(n AS DOUBLE)) /
        |                (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))), 6) AS pmi
        |FROM nab JOIN na USING (a) JOIN nb USING (b) CROSS JOIN tot
        |WHERE nab >= 5
        |ORDER BY pmi DESC, a, b LIMIT 20""".stripMargin) { (s, d) =>
      val bg = docs(s, d)
        .select(split(col("text"), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(expr(
          "explode(transform(sequence(0, size(t) - 2)," +
            " i -> struct(t[i] AS a, t[i + 1] AS b))) AS p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val nab = bg.groupBy("a", "b").agg(count(lit(1)).as("nab"))
      val na = nab.groupBy("a").agg(sum(col("nab")).as("na"))
      val nb = nab.groupBy("b").agg(sum(col("nab")).as("nb"))
      val tot = nab.agg(sum(col("nab")).as("n"))
      nab.join(broadcast(na), Seq("a"))
        .join(broadcast(nb), Seq("b"))
        .crossJoin(broadcast(tot))
        .where(col("nab") >= 5)
        .select(
          col("a"), col("b"), col("nab"),
          round(
            log((col("nab").cast("double") * col("n").cast("double")) /
              (col("na").cast("double") * col("nb").cast("double"))),
            6).as("pmi"))
        .orderBy(col("pmi").desc, col("a"), col("b"))
        .limit(20)
    },

    // Windowed co-occurrence PMI (round 9, cont.): unordered token
    // pairs within a ±3 window, pair-normalized (a < b lexicographic,
    // a ≠ b) — the distributional-semantics association llm_pmi_bigrams
    // cannot see (bigram PMI finds COLLOCATIONS, adjacency-bound;
    // window PMI finds TOPICAL association — "join … shuffle" three
    // tokens apart scores here, never there). The classic
    // count-based word-vector input (PPMI matrices) and the phrase/
    // stop-list diagnostic beside it. Marginals are PAIR-side (token's
    // appearances across extracted pairs) so the statistic is
    // self-consistent within the pair universe; ln() rides compare-free
    // (rounded before the ORDER BY cut, the pmi_bigrams contract).
    //
    // Scale shape: identical to llm_pmi_bigrams — the window fan-out
    // (≤3 pairs/token) is IN-ROW via a nested transform (no self-join
    // on position), then two-phase map-side counts; marginals derive
    // from the pair frame, broadcast back.
    Q("llm_cooccur_window",
      """WITH tok AS (
        |  SELECT string_split(text, ' ') AS t FROM documents
        |), pr AS (
        |  SELECT a, b FROM (
        |    SELECT unnest(flatten(list_transform(range(1, len(t)), i ->
        |             list_transform(range(i + 1, least(i + 4, len(t) + 1)),
        |               j -> struct_pack(a := least(t[i], t[j]),
        |                                b := greatest(t[i], t[j]))))),
        |           recursive := true)
        |    FROM tok WHERE len(t) >= 2)
        |  WHERE a <> b
        |), nab AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS nab FROM pr GROUP BY a, b
        |), marg AS (
        |  SELECT tk, CAST(count(*) AS BIGINT) AS m FROM (
        |    SELECT unnest([a, b]) AS tk FROM pr) GROUP BY tk
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n FROM pr
        |)
        |SELECT a, b, nab,
        |       round(ln((CAST(nab AS DOUBLE) * CAST(n AS DOUBLE)) /
        |                (CAST(ma.m AS DOUBLE) * CAST(mb.m AS DOUBLE))), 6)
        |         AS pmi
        |FROM nab JOIN marg ma ON nab.a = ma.tk
        |         JOIN marg mb ON nab.b = mb.tk CROSS JOIN tot
        |WHERE nab >= 5
        |ORDER BY pmi DESC, a, b LIMIT 20""".stripMargin) { (s, d) =>
      val pr = docs(s, d)
        .select(split(col("text"), " ").as("t"))
        .where(size(col("t")) >= 2)
        .select(expr(
          """explode(flatten(transform(sequence(0, size(t) - 2), i ->
            |  transform(sequence(i + 1, least(i + 3, size(t) - 1)), j ->
            |    struct(least(t[i], t[j]) AS a,
            |           greatest(t[i], t[j]) AS b))))) AS p""".stripMargin))
        .where(col("p.a") =!= col("p.b"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      val nab = pr.groupBy("a", "b").agg(count(lit(1)).as("nab"))
      val marg = pr
        .select(explode(array(col("a"), col("b"))).as("tk"))
        .groupBy("tk").agg(count(lit(1)).as("m"))
      val tot = pr.agg(count(lit(1)).as("n"))
      nab.join(broadcast(marg.select(col("tk").as("a"), col("m").as("ma"))),
          Seq("a"))
        .join(broadcast(marg.select(col("tk").as("b"), col("m").as("mb"))),
          Seq("b"))
        .crossJoin(broadcast(tot))
        .where(col("nab") >= 5)
        .select(col("a"), col("b"), col("nab"),
          round(log((col("nab").cast("double") * col("n").cast("double")) /
            (col("ma").cast("double") * col("mb").cast("double"))), 6)
            .as("pmi"))
        .orderBy(col("pmi").desc, col("a"), col("b"))
        .limit(20)
    },

    // Benchmark decontamination (round 4): flag training docs sharing any
    // 3-token shingle with the benchmark set (here: doc_id % 97 == 0, the
    // deterministic stand-in for a held-out eval suite). The real-pipeline
    // shape: benchmark suites are BOUNDED (a few M shingles however big
    // the corpus gets — nation-table-like, unlike customer/supplier), so
    // the benchmark shingle set broadcasts and the corpus shingle stream
    // is scanned ONCE map-side with no shuffle before the per-doc count —
    // the decontamination pass costs one corpus scan at 100 TB.
    Q("llm_decontaminate", decontamOracle) { (s, d) =>
      val sh = shingleDf(docs(s, d))
      val bs = sh.where(col("doc_id") % 97 === 0).select("s").distinct()
      val cs = sh.where(col("doc_id") % 97 =!= 0)
      val tot = cs.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      val shr = cs.join(broadcast(bs), Seq("s"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      tot.join(shr, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("n_shingles"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          round(coalesce(col("n_shared"), lit(0L)) * 1.0 / col("n_shingles"), 6)
            .as("contamination"),
          (coalesce(col("n_shared"), lit(0L)) > 0).cast("int").as("is_contaminated"))
        .orderBy("doc_id")
    },

    // Cross-doc boilerplate span mining (round 5): the C4-style recipe —
    // spans (3-token shingles here) recurring across MANY DISTINCT
    // documents are navigation chrome / license headers / templates, and
    // the pipeline strips or down-weights them. Distinct-per-doc
    // shingling first (one explode), then doc-frequency is a two-phase
    // map-side-partial aggregate and the report fuses to
    // TakeOrderedAndProject — one corpus scan, one shuffle whose rows
    // are (shingle, partial df), no per-doc state. Complements
    // llm_repetition (WITHIN-doc repeats) with the ACROSS-doc signal.
    Q("llm_boilerplate_spans",
      s"""WITH sh AS (
         |  $shingleSql)
         |)
         |SELECT s, CAST(count(*) AS BIGINT) AS df
         |FROM sh GROUP BY s HAVING count(*) >= 5
         |ORDER BY df DESC, s LIMIT 30""".stripMargin) { (s, d) =>
      shingleDf(docs(s, d))
        .groupBy("s").agg(count(lit(1)).as("df"))
        .where(col("df") >= 5)
        .orderBy(col("df").desc, col("s"))
        .limit(30)
    },

    // Bloom-pruned decontamination (round 5) — same answer (and SAME
    // oracle) as llm_decontaminate, the plan a BIG benchmark set needs.
    // llm_decontaminate broadcasts the benchmark shingles as a hash
    // relation, which stops fitting first as suites grow; here the set
    // compresses to a fixed 128 KB Bloom filter (an uncorrelated scalar
    // subquery — computed once, read in place per probe), the corpus
    // shingle stream is pruned MAP-SIDE
    // by bloom_contains (no false negatives ⇒ survivors ⊇ true matches),
    // and only the surviving sliver pays the exact SHUFFLE_HASH
    // semi-join that removes false positives. At 100 TB: one corpus
    // scan, a shuffle sized to (matches + ~0.3% fp), and no
    // benchmark-sized broadcast.
    Q("llm_decontaminate_bloom", decontamOracle) { (s, d) =>
      import org.apache.spark.sql.graft.BloomFunctions.{bloomBuild, bloomContains}
      val sh = shingleDf(docs(s, d))
      val bs = sh.where(col("doc_id") % 97 === 0).select("s").distinct()
      val cs = sh.where(col("doc_id") % 97 =!= 0)
      // the built filter is ONE bounded value — deliver it through an
      // uncorrelated scalar subquery: Spark computes it once per
      // execution and every per-row probe reads the cached result in
      // place (plan construction stays LAZY — no job just to build the
      // DataFrame). The crossJoin-a-1-row-frame alternative was the trap
      // the sketch family keeps hitting: every probed row would extract
      // (copy) the 128 KB column value out of the joined row — 131 KB ×
      // corpus shingles of pure memcpy before any probing.
      bs.createOrReplaceTempView("graft_decontam_bs")
      val pref = cs.where(bloomContains(
        expr("(SELECT bloom_build(s) FROM graft_decontam_bs)"), col("s")))
      val tot = cs.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      val shr = pref.join(bs.hint("shuffle_hash"), Seq("s"), "left_semi")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
      tot.join(shr, Seq("doc_id"), "left")
        .select(
          col("doc_id"), col("n_shingles"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          round(coalesce(col("n_shared"), lit(0L)) * 1.0 / col("n_shingles"), 6)
            .as("contamination"),
          (coalesce(col("n_shared"), lit(0L)) > 0).cast("int").as("is_contaminated"))
        .orderBy("doc_id")
    },

    // Global top-10 most-similar embedding pairs — native codegen cosine
    // over a broadcast self-join; TakeOrderedAndProject caps the result.
    Q("llm_cosine_topk",
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |ORDER BY sim DESC, a_id, b_id LIMIT 10""".stripMargin) { (s, d) =>
      // The 2k-row parquet is a single split; without a repartition the
      // whole O(n^2) nested-loop probe runs in ONE task. Spreading the probe
      // side across the cluster is the same move that matters at 100 TB.
      val a = embWithNorm(s, d, "a").repartition(probeFanout(s))
      val b = embWithNorm(s, d, "b")
      a.join(broadcast(b), col("a_id") < col("b_id"))
        .select(
          col("a_id"), col("b_id"),
          round(pairCos("a", "b"), 6).as("sim"))
        .orderBy(col("sim").desc, col("a_id"), col("b_id"))
        .limit(10)
    },

    // The int8 SERVING path, oracle-checked end-to-end (round 5): the
    // same global top-10 as llm_cosine_topk but computed over
    // llm_embedding_quantize's dequantized vectors — what a store
    // holding int8 codes + per-vector scale actually serves. Both
    // engines quantize on the identical 6dp grid, so the oracle is
    // exact, not recall-approximate (the recall-vs-float question is
    // ArrayOutputSpec's separate ≥0.9 proof).
    Q("llm_cosine_topk_int8",
      s"""WITH dq AS (
         |  SELECT vec_id,
         |         list_transform(embedding, x ->
         |           (${quantCodeSql("x", "scale")}) * scale) AS deq
         |  FROM (SELECT vec_id, embedding, $quantScaleSql AS scale
         |        FROM embeddings)
         |)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |       round(list_cosine_similarity(a.deq, b.deq), 6) AS sim
         |FROM dq a JOIN dq b ON a.vec_id < b.vec_id
         |ORDER BY sim DESC, a_id, b_id LIMIT 10""".stripMargin) { (s, d) =>
      val base = emb(s, d)
        .withColumn("scale", quantScale(col("embedding")))
        .withColumn("deq", transform(col("embedding"),
          x => quantCode(x, col("scale")) * col("scale")))
        .withColumn("nrm", sqrt(expr(
          "aggregate(transform(deq, x -> x * x), 0D, (acc, x) -> acc + x)")))
        .select(col("vec_id"), col("deq"), col("nrm"))
      val a = base.select(col("vec_id").as("a_id"), col("deq").as("a_deq"),
        col("nrm").as("a_n")).repartition(probeFanout(s))
      val b = base.select(col("vec_id").as("b_id"), col("deq").as("b_deq"),
        col("nrm").as("b_n"))
      // zero-norm guard (pairCos's established invariant): NULL sim, not
      // 0/0 — a NaN would sort ABOVE every real double and flood the
      // descending top-10 if an all-zero vector ever entered the fixture
      val denom = col("a_n") * col("b_n")
      a.join(broadcast(b), col("a_id") < col("b_id"))
        .select(
          col("a_id"), col("b_id"),
          round(
            expr("aggregate(zip_with(a_deq, b_deq, (x, y) -> x * y)," +
              " 0D, (acc, v) -> acc + v)") / when(denom =!= 0, denom),
            6).as("sim"))
        .orderBy(col("sim").desc, col("a_id"), col("b_id"))
        .limit(10)
    },

    // The SQL-registration surface proven through the driver gate
    // (round 5, cont.): the same cosine retrieval expressed in PURE SQL
    // via the GraftExtensions-injected `cosine_sim` — a user who only
    // speaks spark.sql gets the codegen'd native expression, and this
    // key pins that path end-to-end against the DuckDB oracle (until
    // now the injected functions were spec-proven but not
    // oracle-declared). Anchored top-10 for vec 0; the Expression
    // accumulates in double over the float inputs, matching the
    // oracle's DOUBLE[] cast to the rounded 6 decimals like every
    // cosine key.
    Q("llm_cosine_sql",
      """SELECT b.vec_id AS b_id,
        |       round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
        |FROM embeddings q JOIN embeddings b ON q.vec_id = 0 AND b.vec_id <> 0
        |ORDER BY sim DESC, b_id LIMIT 10""".stripMargin) { (s, d) =>
      Tables(s, d, "embeddings").createOrReplaceTempView("emb_sql")
      s.sql("""SELECT b.vec_id AS b_id,
              |       round(cosine_sim(q.embedding, b.embedding), 6) AS sim
              |FROM emb_sql q JOIN emb_sql b ON q.vec_id = 0 AND b.vec_id <> 0
              |ORDER BY sim DESC, b_id LIMIT 10""".stripMargin)
    },

    // k-NN per query vector (brute force; the LSH variant is llm_ann_lsh).
    // Ranking uses the *rounded* similarity so both engines agree on ties.
    Q("llm_knn_per_query",
      """WITH q AS (
        |  SELECT vec_id AS q_id, embedding AS q_emb FROM embeddings WHERE vec_id < 20
        |), s AS (
        |  SELECT q_id, c.vec_id AS n_id,
        |         round(list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])), 6) AS sim
        |  FROM q JOIN embeddings c ON c.vec_id <> q_id
        |), r AS (
        |  SELECT q_id, n_id, sim,
        |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
        |  FROM s
        |)
        |SELECT q_id, n_id, sim, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5
        |ORDER BY q_id, rn""".stripMargin) { (s, d) =>
      val q = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = emb(s, d).select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        .repartition(probeFanout(s))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      c.join(broadcast(q), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"), col("sim"), col("rn").cast("long").as("rn"))
        .orderBy("q_id", "rn")
    },

    // Hard-negative mining (round 7, cont.) — the contrastive-training
    // data op (SimCSE/DPR recipe): for each anchor, the top-3 MOST
    // similar vectors carrying a DIFFERENT label — maximally confusing
    // negatives, where random negatives teach nothing. Same broadcast-
    // anchors + probe-fanout + WindowGroupLimit shape as llm_knn_per_query
    // with the label-inequality predicate fused into the join; at 100 TB
    // the scale path swaps the brute probe for the IVF/LSH bucket join
    // (llm_ann_ivf) with the label filter unchanged.
    Q("llm_hard_negatives",
      """WITH q AS (
        |  SELECT vec_id AS q_id, label AS q_label, embedding AS q_emb
        |  FROM embeddings WHERE vec_id < 20
        |), s AS (
        |  SELECT q_id, q_label, c.vec_id AS n_id, c.label AS n_label,
        |         round(list_cosine_similarity(CAST(q_emb AS DOUBLE[]),
        |                                      CAST(c.embedding AS DOUBLE[])), 6) AS sim
        |  FROM q JOIN embeddings c ON c.label <> q_label
        |), r AS (
        |  SELECT q_id, q_label, n_id, n_label, sim,
        |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
        |  FROM s
        |)
        |SELECT q_id, q_label, n_id, n_label, sim, CAST(rn AS BIGINT) AS rn
        |FROM r WHERE rn <= 3
        |ORDER BY q_id, rn""".stripMargin) { (s, d) =>
      val q = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"))
      val c = emb(s, d).select(col("vec_id").as("n_id"),
        col("label").as("n_label"), col("embedding").as("n_emb"))
        .repartition(probeFanout(s))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      c.join(broadcast(q), col("n_label") =!= col("q_label"))
        .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
          col("sim"), col("rn").cast("long").as("rn"))
        .orderBy("q_id", "rn")
    },

    // All pairs above a similarity threshold — dedup-graph edges. DECLARED
    // brute-force baseline; the sub-quadratic scale twin at the SAME τ is
    // llm_sim_join_threshold_lsh below (union-of-bands sign-LSH).
    Q("llm_sim_join_threshold",
      """SELECT a.vec_id AS a_id, b.vec_id AS b_id,
        |       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
        |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      // The 2k-row parquet is a single split; without a repartition the
      // whole O(n^2) nested-loop probe runs in ONE task. Spreading the probe
      // side across the cluster is the same move that matters at 100 TB.
      val a = embWithNorm(s, d, "a").repartition(probeFanout(s))
      val b = embWithNorm(s, d, "b")
      a.join(broadcast(b), col("a_id") < col("b_id"))
        .select(
          col("a_id"), col("b_id"),
          round(pairCos("a", "b"), 6).as("sim"))
        .where(col("sim") >= 0.35)
        .orderBy("a_id", "b_id")
    },

    // Semantic dedup (round 5) — the SemDeDup recipe (Abbas et al. 2023):
    // partition the embedding space into K clusters, then prune within
    // each cluster any vector whose cosine to an EARLIER cluster member
    // clears τ; only within-cluster pairs are ever compared, so the
    // pairwise cost drops from O(n²) to O(Σ|cluster|²) and the join
    // shuffles on the cluster id — an equi-key, never all-pairs. This
    // declared key fixes the K=8 centroids deterministically (the 8
    // lowest vec_ids) so the oracle is exact; the Lloyd-refined-centroid
    // variant of the same partitioning is llm_ann_ivf's. At 100 TB the
    // centroid set stays a bounded broadcast (K grows ∝ √n, not n:
    // kept bounded per partition-plan, it is never corpus-sized), the
    // assignment pass is map-side, and rn=1 fuses to a WindowGroupLimit
    // over K rows per vector.
    Q("llm_semantic_dedup",
      """WITH seeds AS (
        |  SELECT vec_id AS seed_id, embedding AS seed_emb
        |  FROM embeddings WHERE vec_id < 8
        |), sims AS (
        |  SELECT e.vec_id, s.seed_id,
        |         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                      CAST(s.seed_emb AS DOUBLE[])), 6) AS sim
        |  FROM embeddings e CROSS JOIN seeds s
        |), assign AS (
        |  SELECT vec_id, seed_id AS cluster FROM (
        |    SELECT vec_id, seed_id,
        |           row_number() OVER (PARTITION BY vec_id
        |                              ORDER BY sim DESC, seed_id) AS rn
        |    FROM sims)
        |  WHERE rn = 1
        |), dup AS (
        |  SELECT DISTINCT a.vec_id
        |  FROM assign a JOIN assign b ON a.cluster = b.cluster
        |                             AND b.vec_id < a.vec_id
        |  JOIN embeddings ea ON ea.vec_id = a.vec_id
        |  JOIN embeddings eb ON eb.vec_id = b.vec_id
        |  WHERE round(list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
        |                                     CAST(eb.embedding AS DOUBLE[])), 6) >= 0.35
        |)
        |SELECT a.vec_id, a.cluster FROM assign a
        |WHERE a.vec_id NOT IN (SELECT vec_id FROM dup)
        |ORDER BY a.vec_id""".stripMargin) { (s, d) =>
      val seeds = emb(s, d).where(col("vec_id") < 8).select(
        col("vec_id").as("seed_id"), col("embedding").as("seed_emb"),
        sqrt(vectorDot(col("embedding"), col("embedding"))).as("seed_norm"))
      val e = embWithNorm(s, d, "a").repartition(probeFanout(s))
      val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("seed_id"))
      // persist: the assignment feeds THREE consumers (both sides of the
      // within-cluster pair join + the anti-join's keep side) — without it
      // each consumer replans the n×K cosine pass from the scan. The
      // repartition on cluster means both pair-join sides read the cached
      // partitioning directly (zero exchanges into the join), the same
      // cache-the-partitioning move the minhash band frame uses.
      val assign = e.crossJoin(broadcast(seeds))
        .select(col("a_id").as("vec_id"), col("a_emb"), col("a_norm"),
          col("seed_id"),
          round(pairCos("a", "seed"), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vec_id"), col("seed_id").as("cluster"),
          col("a_emb"), col("a_norm"))
        .repartition(col("cluster"))
        .persist()
      val lhs = assign.select(col("vec_id").as("x_id"), col("cluster"),
        col("a_emb").as("x_emb"), col("a_norm").as("x_norm"))
      val rhs = assign.select(col("vec_id").as("y_id"),
        col("cluster").as("y_cluster"),
        col("a_emb").as("y_emb"), col("a_norm").as("y_norm"))
      val dup = lhs
        .join(rhs, col("cluster") === col("y_cluster") && col("y_id") < col("x_id"))
        .where(round(pairCos("x", "y"), 6) >= 0.35)
        .select(col("x_id")).distinct()
      assign.join(dup, col("vec_id") === col("x_id"), "left_anti")
        .select("vec_id", "cluster")
        .orderBy("vec_id")
    },

    // Per-label mean embedding — the custom typed Aggregator, with a pure
    // SQL explode twin as the oracle. The DECLARED output joins the vector
    // as comma-separated micro-integers (round(round(m,6)·10⁶): the inner
    // round is the proven-portable 6-dp quantization, the outer one kills
    // binary-representation noise before the BIGINT cast) — the driver's
    // comparator cannot hash ARRAY cells and double→string formatting
    // differs between engines. ArrayOutputSpec covers the array form.
    Q("llm_centroid_udaf",
      """WITH ex AS (
        |  SELECT label,
        |         unnest(embedding) AS v,
        |         unnest(range(1, len(embedding) + 1)) AS dim
        |  FROM embeddings
        |), a AS (
        |  SELECT label, dim, avg(CAST(v AS DOUBLE)) AS m FROM ex GROUP BY label, dim
        |)
        |SELECT label,
        |       array_to_string(list(CAST(round(round(m, 6) * 1000000) AS BIGINT)
        |                            ORDER BY dim), ',') AS centroid
        |FROM a GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      emb(s, d)
        .groupBy("label")
        .agg(Aggregators.centroid(col("embedding")).as("c"))
        .select(
          col("label"),
          concat_ws(",", transform(col("c"),
            x => round(round(x, 6) * 1000000).cast("long"))).as("centroid"))
        .orderBy("label")
    },

    // Symmetric int8 embedding quantization (round 5) — the 4× storage /
    // bandwidth path for vector corpora at 100 TB (serve the int8 column,
    // keep per-vector scale for dequant; brute-force and IVF rerank both
    // read 4× less). Per vector: scale = max|x|/127 (rounded 6dp so both
    // engines quantize the IDENTICAL grid), q = round(x/scale) ∈ [-127,
    // 127], plus the reconstruction MSE as the quality audit. Pure
    // higher-order-function chain — one narrow map-side pass, no shuffle
    // before the output sort, stays in codegen.
    Q("llm_embedding_quantize",
      s"""WITH sc AS (
         |  SELECT vec_id, $quantScaleSql AS scale
         |  FROM embeddings
         |)
         |SELECT e.vec_id AS vec_id, sc.scale AS scale,
         |       array_to_string(list_transform(e.embedding, x ->
         |         CAST(${quantCodeSql("x", "sc.scale")} AS BIGINT)),
         |         ',') AS q8,
         |       round(list_sum(list_transform(e.embedding, x ->
         |         pow(CAST(x AS DOUBLE)
         |             - (${quantCodeSql("x", "sc.scale")}) * sc.scale, 2)))
         |         / len(e.embedding), 6) AS mse
         |FROM embeddings e JOIN sc ON e.vec_id = sc.vec_id
         |ORDER BY e.vec_id""".stripMargin) { (s, d) =>
      emb(s, d)
        .withColumn("scale", quantScale(col("embedding")))
        .select(
          col("vec_id"), col("scale"),
          concat_ws(",",
            transform(col("embedding"),
              x => quantCode(x, col("scale")).cast("long"))).as("q8"),
          round(
            aggregate(
              transform(col("embedding"),
                x => pow(x.cast("double")
                  - quantCode(x, col("scale")) * col("scale"), 2)),
              lit(0.0), (a, x) => a + x) / size(col("embedding")),
            6).as("mse"))
        .orderBy("vec_id")
    },

    // Near-dup GROUPS: EXACT connected components over the cosine-threshold
    // similarity graph — min-label propagation iterated to FIXPOINT
    // ([[Components.connectedComponents]]; O(diameter) rounds, the round
    // count is data-determined so both engines land on the same labels).
    // The edge stage here is the declared brute-force O(n²) semantics at
    // τ=0.35; the moderate-τ sub-quadratic edge generator is the
    // llm_sim_join_threshold_lsh union-of-bands scheme (8×2 banding —
    // plug its verified pairs in as `edges` for the scale path), the
    // high-τ twin is llm_dedup_groups_lsh below, and the text-side
    // flagship is llm_neardup_prune (minhash-bucketed edges).
    Q("llm_dedup_groups",
      s"""WITH RECURSIVE $dedupGroupsCtes
         |SELECT node AS vec_id, min(r) AS group_id FROM reach
         |GROUP BY node ORDER BY vec_id""".stripMargin) { (s, d) =>
      cosineDedupGroups(s, d).orderBy("vec_id")
    },

    // The scale-safe variant of llm_dedup_groups for the HIGH-similarity
    // dedup regime (τ=0.8, where real near-duplicate embeddings live):
    // edges come from the banded sign-LSH prefilter (equi-join on band
    // keys — never O(n²) pairs) verified with exact cosine, then exact
    // connected components. At τ≥0.8 per-bit agreement is ≥0.80 so the
    // 4×4 banding's per-pair recall is ≥0.92 (≈1.0 at the 0.95+ sims of
    // actual near-dups) — LshPrefilterSpec proves candidate⊇brute at this
    // τ on planted clusters; NearDupSpec proves group equality. On the
    // harness corpus (max pairwise sim ≈0.51) the true answer is all
    // singletons — both engines compute it from the same empty edge set.
    Q("llm_dedup_groups_lsh",
      s"""WITH RECURSIVE $lshDedupGroupsCtes
         |SELECT node AS vec_id, min(r) AS group_id FROM reach
         |GROUP BY node ORDER BY vec_id""".stripMargin) { (s, d) =>
      lshDedupGroups(s, d).orderBy("vec_id")
    },

    // Near-dup cluster-size distribution over the LSH-bucketed group
    // chain (round 10 — VERDICT r9 #2): the same curation-ticket
    // histogram as llm_dedup_cluster_sizes, but its groups come from
    // llm_dedup_groups_lsh's banded-prefilter edges (equi-join on band
    // keys, exact-cosine verify of CANDIDATES only) — the report a
    // 100 TB dedup run actually prints, with no all-pairs stage
    // anywhere in the plan (PlanSpec pins the absence of any
    // nested-loop/cartesian join). The brute twin stays declared as the
    // small-corpus AUDIT; at the τ=0.8 near-dup regime the 4×4 banding's
    // per-pair recall is ≥0.92 (LshPrefilterSpec), so the two reports
    // agree wherever the audit can afford to run. Shared chain + shared
    // oracle CTEs with llm_dedup_groups_lsh — the keys cannot drift.
    Q("llm_dedup_cluster_sizes_lsh",
      s"""WITH RECURSIVE $lshDedupGroupsCtes, g AS (
         |  SELECT node AS vec_id, min(r) AS group_id FROM reach GROUP BY node
         |), cs AS (
         |  SELECT group_id, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM g GROUP BY group_id
         |)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |       CAST(sum(cluster_size) AS BIGINT) AS n_vecs
         |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin) {
      (s, d) =>
      lshDedupGroups(s, d)
        .groupBy("group_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size")).cast("long").as("n_vecs"))
        .orderBy("cluster_size")
    },

    // Near-dup group DENSITY audit (round 12): per multi-member group
    // of the TEXT near-dup chain, member count, verified internal edge
    // count, and edge density 2E/(n(n−1)) — the readout that separates
    // a genuine duplicate clique (density ≈ 1: every member verifies
    // against every other) from a CHAINED group (density → 0: the
    // transitive closure glued near-dups through bridge docs — the
    // classic over-merge failure a dedup ticket investigates before
    // keeping one survivor per group). Rides the SAME materialized
    // verified-pair frame and CC construction as llm_neardup_prune
    // (one definition — the audit cannot disagree with the dedup it
    // audits); cost beyond the shared chain: one edge→group equi-join
    // + two bounded aggregates. Every verified edge is intra-group by
    // CC construction, so the d1 endpoint's group IS the edge's group.
    Q("llm_dedup_group_density",
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |e0 AS (
         |  SELECT d1, d2 FROM verified WHERE est_jaccard >= 0.2
         |), edges AS (
         |  SELECT d1 AS a, d2 AS b FROM e0 UNION ALL SELECT d2, d1 FROM e0
         |), ${Components.reachMinCte("SELECT doc_id AS id FROM documents", "edges")},
         |g AS (
         |  SELECT node AS doc_id, min(r) AS group_id FROM reach GROUP BY node
         |), gs AS (
         |  SELECT group_id, CAST(count(*) AS BIGINT) AS n_members
         |  FROM g GROUP BY group_id
         |), ge AS (
         |  SELECT ga.group_id, CAST(count(*) AS BIGINT) AS n_edges
         |  FROM e0 JOIN g ga ON e0.d1 = ga.doc_id
         |  GROUP BY ga.group_id
         |)
         |SELECT gs.group_id AS group_id, n_members,
         |       CAST(coalesce(n_edges, 0) AS BIGINT) AS n_edges,
         |       floor(CAST(coalesce(n_edges, 0) AS DOUBLE) * 2
         |             / (n_members * (n_members - 1)) * 1000000) / 1000000
         |         AS density
         |FROM gs LEFT JOIN ge ON gs.group_id = ge.group_id
         |WHERE n_members >= 2
         |ORDER BY gs.group_id""".stripMargin) { (s, d) =>
      val e0 = minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2).select("d1", "d2")
      val edges = symPairs(e0, "d1", "d2").persist()
      val g = Components.connectedComponents(docs(s, d), "doc_id", edges)
        .select(col("id").as("doc_id"), col("lbl").as("group_id"))
      val gs = g.groupBy("group_id").agg(count(lit(1)).as("n_members"))
      val ge = e0.join(g.withColumnRenamed("doc_id", "d1"), Seq("d1"))
        .groupBy("group_id").agg(count(lit(1)).as("n_edges"))
      gs.join(ge, Seq("group_id"), "left")
        .where(col("n_members") >= 2)
        .select(col("group_id"), col("n_members"),
          coalesce(col("n_edges"), lit(0L)).as("n_edges"),
          (floor(coalesce(col("n_edges"), lit(0L)).cast("double") * 2
            / (col("n_members") * (col("n_members") - 1)) * 1000000)
            / 1000000).as("density"))
        .orderBy("group_id")
    },

    // ------------------------------------------------------------------
    // Hash-seeded sketch ops. Round 1 these had no oracle (xxhash64 has no
    // DuckDB equivalent); they now hash through [[graft.functions
    // .PortableHash]] (md5-prefix 60-bit, identical in both engines), so
    // every one is fully DuckDB-oracle-checked. ScalaTest specs with
    // planted duplicates still cover the sketch semantics.
    // ------------------------------------------------------------------

    // MinHash near-dup: 16 seeded min-shingle-hashes per doc; LSH banding
    // with b=8 bands × r=2 rows — a candidate needs BOTH minhashes of some
    // band equal (P ≈ J² per band), which keeps buckets tiny on corpora
    // with shared vocabulary (r=1 degenerates: every doc sharing a global
    // min-shingle lands in one bucket → quadratic candidates). Recall for
    // real near-dups (J ≥ 0.8): 1-(1-J²)⁸ ≈ 1. The banding+verify pipeline
    // lives in [[minhashVerified]]/[[minhashVerifiedCtes]], shared with
    // llm_neardup_prune.
    Q("llm_minhash_neardup",
      s"""WITH $minhashVerifiedCtes
         |SELECT d1, d2, est_jaccard
         |FROM verified WHERE est_jaccard >= 0.2
         |ORDER BY est_jaccard DESC, d1, d2 LIMIT 50""".stripMargin) { (s, d) =>
      minhashVerified(s, d)
        .where(col("est_jaccard") >= 0.2)
        .select("d1", "d2", "est_jaccard")
        .orderBy(col("est_jaccard").desc, col("d1"), col("d2"))
        .limit(50)
    },

    // Containment / near-superset detection (Broder 1997: resemblance vs
    // CONTAINMENT): among the minhash-banded candidate pairs, score by
    // the overlap coefficient |A∩B|/min(|A|,|B|) instead of Jaccard — a
    // short document quoted wholesale inside a longer one scores ≈1 here
    // while its Jaccard can sit far below any near-dup threshold. The
    // quote/subset signal a pretraining pipeline needs BESIDE near-dup
    // dedup (e.g. boilerplate-wrapped reposts). Same bucketed sketch
    // plan as llm_minhash_neardup: band equi-join candidates, exact
    // shingle-intersection verify — never O(n²) pairs.
    Q("llm_containment",
      s"""WITH $minhashVerifiedCtes
         |SELECT d1, d2, containment, est_jaccard
         |FROM verified WHERE containment >= 0.5
         |ORDER BY containment DESC, d1, d2 LIMIT 50""".stripMargin) { (s, d) =>
      minhashVerifiedLake(s, d)
        .where(col("containment") >= 0.5)
        .select("d1", "d2", "containment", "est_jaccard")
        .orderBy(col("containment").desc, col("d1"), col("d2"))
        .limit(50)
    },

    // Incremental ingest dedup (R9's dedup-on-reimport × NS near-dup):
    // the newest ~20% of doc ids ([[batchBoundary]], data-derived so the
    // split holds at every SF) are "today's batch"; each is checked
    // against the whole corpus (and earlier batch members) via minhash
    // banding, but the corpus×corpus quadrant is never probed — the
    // b-side of the band join is pre-filtered to the batch, so per-ingest
    // cost scales with the batch, not the corpus². Output: one row per
    // detected (earlier_doc, new_doc) near-dup pair.
    Q("llm_incremental_neardup",
      s"""WITH ${minhashVerifiedCtes(Some(batchBoundarySql))}
         |SELECT d1 AS dup_of, d2 AS new_id, est_jaccard
         |FROM verified WHERE est_jaccard >= 0.2
         |ORDER BY new_id, dup_of""".stripMargin) { (s, d) =>
      minhashVerified(docs(s, d), Some(batchBoundary(docs(s, d))))
        .where(col("est_jaccard") >= 0.2)
        .select(col("d1").as("dup_of"), col("d2").as("new_id"), col("est_jaccard"))
        .orderBy("new_id", "dup_of")
    },

    // REGISTRY-backed incremental ingest dedup (round 9 — VERDICT r8 #1,
    // the 100 TB nightly-ingest hot path): the same batch-vs-corpus
    // near-dup check as llm_incremental_neardup, but the corpus half
    // comes from config.SketchRegistry's PERSISTED lake state (shingle
    // double-hashes, LSH band keys, set sizes) instead of being
    // re-shingled/re-hashed/re-sketched every run — per-run COMPUTE is
    // ∝ batch, not corpus (that key's join was already ∝ batch; its
    // sketch pass was not). The registry builds once per corpus
    // fingerprint (stage-then-rename, content-invalidated); the
    // declared plan sketches ONLY the batch above the DERIVED
    // `(max+1)·4/5` boundary ([[batchBoundary]] — the literal 400 this
    // comment once named split 80/20 at sf0.01 but inverted at sf0.1,
    // the round-9 lesson in SCALING.md) and band-joins it against the
    // stored keys. SAME oracle shape as the recompute twin
    // — the driver enforces that stored-state reads and live recompute
    // can never drift (hash-verify vs string-verify is the registry's
    // documented ~2⁻¹²⁰/pair tradeoff; identical results on any real
    // corpus). ScaleSmoke measures the flat-ingest-cost claim.
    // Registry state audit (round 11): the monitoring query a lake
    // operator runs against the persisted sketch registry — doc count,
    // shingle-row and band-row cardinality, and the shingle-set size
    // profile, all read from the STORED tables and oracle-verified
    // against a fresh recompute over the base tables, so a corrupted /
    // stale / half-ingested registry hash-mismatches here before any
    // dedup answer goes wrong. Boundary is the same DATA-DERIVED split
    // the registry itself was built on (the r9 literal-400 lesson).
    Q("llm_dedup_registry_stats",
      s"""WITH sh AS (
         |  ${shingleSqlWhere(Some(s"doc_id < $batchBoundarySql"))})
         |), t AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |  FROM sh GROUP BY doc_id
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(n) AS BIGINT) AS n_shingle_rows,
         |       CAST(count(*) * 8 AS BIGINT) AS n_band_rows,
         |       CAST(min(n) AS BIGINT) AS min_shingles,
         |       CAST(max(n) AS BIGINT) AS max_shingles,
         |       round(CAST(sum(n) AS DOUBLE) / count(*), 6)
         |         AS avg_shingles_per_doc
         |FROM t""".stripMargin) { (s, d) =>
      val dir = graft.config.SketchRegistry.ensureCorpusRegistry(
        s, d, batchBoundary(docs(s, d)))
      val nb = s.read.parquet(s"$dir/bands")
        .agg(count(lit(1)).as("n_band_rows"))
      s.read.parquet(s"$dir/sizes")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n")).as("n_shingle_rows"),
          min(col("n")).as("min_shingles"),
          max(col("n")).as("max_shingles"),
          round(sum(col("n")).cast("double") / count(lit(1)), 6)
            .as("avg_shingles_per_doc"))
        .crossJoin(broadcast(nb))
        .select(col("n_docs"), col("n_shingle_rows"), col("n_band_rows"),
          col("min_shingles"), col("max_shingles"),
          col("avg_shingles_per_doc"))
    },

    Q("llm_incremental_neardup_registry",
      s"""WITH ${minhashVerifiedCtes(Some(batchBoundarySql))}
         |SELECT d1 AS dup_of, d2 AS new_id, est_jaccard
         |FROM verified WHERE est_jaccard >= 0.2
         |ORDER BY new_id, dup_of""".stripMargin) { (s, d) =>
      val bound = batchBoundary(docs(s, d))
      val dir = graft.config.SketchRegistry.ensureCorpusRegistry(s, d, bound)
      graft.config.SketchRegistry
        .pairs(s, dir, docs(s, d).where(col("doc_id") >= bound))
        .orderBy("new_id", "dup_of")
    },

    // End-to-end training-corpus DEDUP: minhash candidates → exact-Jaccard
    // verify → EXACT connected components over the ≥0.2 near-dup graph
    // (fixpoint — [[Components.connectedComponents]]) → keep the min-id doc
    // of each group. One row per document with its group and keep flag —
    // the operator a 100 TB pretraining pipeline actually runs: every
    // stage is an equi-join/agg (band keys, shingles, ids), never O(n²)
    // pairs; duplicate CHAINS of any depth collapse to one group.
    Q("llm_neardup_prune",
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |e0 AS (
         |  SELECT d1, d2 FROM verified WHERE est_jaccard >= 0.2
         |), edges AS (
         |  SELECT d1 AS a, d2 AS b FROM e0 UNION ALL SELECT d2, d1 FROM e0
         |), ${Components.reachMinCte("SELECT doc_id AS id FROM documents", "edges")}
         |SELECT node AS doc_id, min(r) AS group_id, node = min(r) AS is_kept
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin) { (s, d) =>
      val e0 = minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2).select("d1", "d2")
      val edges = symPairs(e0, "d1", "d2").persist()
      Components.connectedComponents(docs(s, d), "doc_id", edges)
        .select(col("id").as("doc_id"), col("lbl").as("group_id"),
          (col("id") === col("lbl")).as("is_kept"))
        .orderBy("doc_id")
    },

    // Per-source duplication rate (round 10): the same minhash near-dup
    // groups as llm_neardup_prune, rolled up by SOURCE — the curation
    // ticket that says WHICH feed to fix (the cluster-size histogram
    // says how bad duplication is; this says where it comes from —
    // a mirrored crawl shows up as one source with a 40% dup rate, not
    // as a corpus-wide smear). Cost beyond the shared group chain: one
    // bounded group-size aggregate + the doc_id-keyed source join +
    // a bounded per-source rollup.
    Q("llm_dedup_rate_by_source",
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |e0 AS (
         |  SELECT d1, d2 FROM verified WHERE est_jaccard >= 0.2
         |), edges AS (
         |  SELECT d1 AS a, d2 AS b FROM e0 UNION ALL SELECT d2, d1 FROM e0
         |), ${Components.reachMinCte("SELECT doc_id AS id FROM documents", "edges")},
         |g AS (
         |  SELECT node AS doc_id, min(r) AS group_id FROM reach GROUP BY node
         |), grpsz AS (
         |  SELECT group_id, CAST(count(*) AS BIGINT) AS gsz FROM g GROUP BY 1
         |)
         |SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN grpsz.gsz >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_in_dup_clusters,
         |       floor(CAST(sum(CASE WHEN grpsz.gsz >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |             / count(*) * 1000000) / 1000000 AS dup_rate
         |FROM g JOIN grpsz USING (group_id) JOIN documents d USING (doc_id)
         |GROUP BY d.source ORDER BY d.source""".stripMargin) { (s, d) =>
      val e0 = minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2).select("d1", "d2")
      val edges = symPairs(e0, "d1", "d2").persist()
      // the group frame feeds TWO consumers (the size aggregate and the
      // source join) — unpinned, the whole minhash+CC chain executes
      // twice (measured: 5.9 s vs llm_neardup_prune's 3.8 on the shared
      // chain)
      val g = Components.connectedComponents(docs(s, d), "doc_id", edges)
        .select(col("id").as("doc_id"), col("lbl").as("group_id"))
        .persist()
      val sz = g.groupBy("group_id").agg(count(lit(1)).as("gsz"))
      val dup = sum(when(col("gsz") >= 2, 1L).otherwise(0L))
      g.join(sz, Seq("group_id"))
        .join(docs(s, d).select(col("doc_id"), col("source")), Seq("doc_id"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), dup.as("n_in_dup_clusters"),
          (floor(dup.cast("double") / count(lit(1)) * 1000000) / 1000000)
            .as("dup_rate"))
        .orderBy("source")
    },

    // QUALITY-aware survivor pick (round 9, cont.): the same near-dup
    // groups as llm_neardup_prune, but each group keeps its
    // HIGHEST-QUALITY member (the shared llm_quality_score heuristic;
    // ties → smallest id) instead of the smallest id. Min-id keep is
    // arbitrary-but-deterministic; production dedup keeps the best
    // writing of a duplicated text (the cleanest crawl of a mirrored
    // page), and the swap is exactly one ranking expression — this key
    // pins that the survivor POLICY is pluggable without touching the
    // group machinery. Plan cost beyond llm_neardup_prune: one map-side
    // quality projection joined doc_id-keyed + one row_number over the
    // GROUP partitioning (groups scale with the corpus — never an O(1)
    // partition).
    Q("llm_neardup_prune_quality",
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |e0 AS (
         |  SELECT d1, d2 FROM verified WHERE est_jaccard >= 0.2
         |), edges AS (
         |  SELECT d1 AS a, d2 AS b FROM e0 UNION ALL SELECT d2, d1 FROM e0
         |), ${Components.reachMinCte("SELECT doc_id AS id FROM documents", "edges")},
         |g AS (
         |  SELECT node AS doc_id, min(r) AS group_id FROM reach GROUP BY node
         |), q AS (
         |  SELECT doc_id,
         |         ${qualitySql("len(string_split(text, ' '))", stopCountSql)}
         |           AS quality
         |  FROM documents
         |)
         |SELECT doc_id, group_id, quality,
         |       row_number() OVER (PARTITION BY group_id
         |         ORDER BY quality DESC, doc_id) = 1 AS is_kept
         |FROM g JOIN q USING (doc_id) ORDER BY doc_id""".stripMargin) {
      (s, d) =>
      val e0 = minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2).select("d1", "d2")
      val edges = symPairs(e0, "d1", "d2").persist()
      val groups = Components.connectedComponents(docs(s, d), "doc_id", edges)
        .select(col("id").as("doc_id"), col("lbl").as("group_id"))
      val q = docs(s, d).select(col("doc_id"),
        qualityCol(size(split(col("text"), " ")), stopCountCol).as("quality"))
      val w = Window.partitionBy("group_id")
        .orderBy(col("quality").desc, col("doc_id"))
      groups.join(q, Seq("doc_id"))
        .withColumn("is_kept", row_number().over(w) === 1)
        .select("doc_id", "group_id", "quality", "is_kept")
        .orderBy("doc_id")
    },

    // The FULL corpus build, end-to-end in one declared plan — what a
    // 100 TB pretraining data pipeline actually ships: minhash near-dup
    // prune (keep each group's min id) → quality filter (the
    // llm_quality_score heuristic at τ=0.25, ~60% survival on the
    // harness corpus) → pack survivors into 2048-token sequences per
    // source shard. Every stage is the already-audited operator plan:
    // banded candidates (never O(n²)), fixpoint CC over touched nodes,
    // one shared documents scan feeding dedup/quality/packing, one
    // window exchange per source shard for the packing.
    Q("llm_corpus_build",
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |e0 AS (
         |  SELECT d1, d2 FROM verified WHERE est_jaccard >= 0.2
         |), edges AS (
         |  SELECT d1 AS a, d2 AS b FROM e0 UNION ALL SELECT d2, d1 FROM e0
         |), ${Components.reachMinCte("SELECT doc_id AS id FROM documents", "edges")},
         |keep AS (
         |  SELECT node AS doc_id FROM reach GROUP BY node HAVING node = min(r)
         |), q AS (
         |  SELECT doc_id,
         |         ${qualitySql("len(string_split(text, ' '))", stopCountSql)} AS quality
         |  FROM documents
         |), kept AS (
         |  SELECT d.doc_id, d.source,
         |         CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents d
         |  JOIN keep ON keep.doc_id = d.doc_id
         |  JOIN q ON q.doc_id = d.doc_id
         |  WHERE q.quality >= 0.25
         |)
         |SELECT doc_id, source, n_tok,
         |       CAST(floor((cum - n_tok) * 1.0 / 2048) AS BIGINT) AS pack_id
         |FROM (
         |  SELECT doc_id, source, n_tok,
         |         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
         |  FROM kept
         |)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      corpusBuild(docs(s, d))
    },

    // The INCREMENTAL corpus build (round 10 — VERDICT r9 #3, the actual
    // nightly pipeline at 100 TB): registry-backed near-dup of the new
    // batch against the stored corpus (compute ∝ batch — the
    // llm_incremental_neardup_registry machinery), quality filter, and
    // pack of ONLY the batch's survivors, while the recompute twin
    // llm_corpus_build re-sketches the whole corpus every run. Keep
    // policy: a batch doc ships iff nothing with a smaller id (corpus or
    // earlier-in-batch) near-dups it — transitively consistent with the
    // full build's min-id survivorship. Oracle: the same d2Min-bounded
    // verified-pairs CTE chain, NOT-IN drop, quality, pack — replayed
    // end-to-end.
    Q("llm_corpus_build_incremental",
      s"""WITH ${minhashVerifiedCtes(Some(batchBoundarySql))},
         |dropped AS (
         |  SELECT DISTINCT d2 AS doc_id FROM verified WHERE est_jaccard >= 0.2
         |), kept AS (
         |  SELECT doc_id, source,
         |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents
         |  WHERE doc_id >= $batchBoundarySql
         |    AND ${qualitySql("len(string_split(text, ' '))", stopCountSql)}
         |        >= 0.25
         |    AND doc_id NOT IN (SELECT doc_id FROM dropped)
         |)
         |SELECT doc_id, source, n_tok,
         |       CAST(floor((cum - n_tok) * 1.0 / 2048) AS BIGINT) AS pack_id
         |FROM (
         |  SELECT doc_id, source, n_tok,
         |         sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
         |  FROM kept
         |)
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val bound = batchBoundary(docs(s, d))
      val dir = graft.config.SketchRegistry.ensureCorpusRegistry(s, d, bound)
      corpusBuildIncremental(
        s, dir, docs(s, d).where(col("doc_id") >= bound))
    },

    // SimHash per doc via the typed Aggregator over 60-bit portable token
    // hashes (bits 60-63 always vote negative → 0 in both engines). The
    // oracle folds the same per-bit majority vote in pure SQL: one
    // conditional-sum aggregate per bit, recombined with shifts.
    Q("llm_simhash",
      s"""$simhashSqlBody
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      simhashDf(s, d).orderBy("doc_id")
    },

    // SimHash Hamming near-dup join (Manku et al., WWW'07 web-dedup
    // design): split the 60-bit simhash into 4 × 15-bit segments — by
    // pigeonhole, ANY pair with Hamming distance ≤ 3 shares at least one
    // segment verbatim, so the segment equi-join is a COMPLETE (not
    // probabilistic) prefilter for the ≤3 regime; candidates are verified
    // with bit_count(xor). The only shuffle is on the 15-bit segment key.
    Q("llm_simhash_neardup",
      s"""WITH s AS (
         |  $simhashSqlBody
         |), seg AS (
         |  SELECT doc_id, i, (simhash >> (i * 15)) & 32767 AS sk
         |  FROM s, (SELECT unnest([0, 1, 2, 3]) AS i)
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         |  FROM seg a JOIN seg b ON a.i = b.i AND a.sk = b.sk
         |   AND a.doc_id < b.doc_id
         |)
         |SELECT d1, d2,
         |       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
         |FROM cand JOIN s x ON cand.d1 = x.doc_id
         |          JOIN s y ON cand.d2 = y.doc_id
         |WHERE bit_count(xor(x.simhash, y.simhash)) <= 3
         |ORDER BY d1, d2""".stripMargin) { (s, d) =>
      val sh = simhashDf(s, d)
      val seg = sh.select(col("doc_id"),
          explode(array((0 until 4).map(i => struct(lit(i).as("i"),
            shiftright(col("simhash"), i * 15).bitwiseAND(32767).as("sk"))): _*))
            .as("g"))
        .select(col("doc_id"), col("g.i").as("i"), col("g.sk").as("sk"))
      val cand = seg.as("a")
        .join(seg.as("b"),
          col("a.i") === col("b.i") && col("a.sk") === col("b.sk") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
        .distinct()
      val hamming =
        expr("bit_count(x.simhash ^ y.simhash)").cast("long")
      cand
        .join(sh.as("x"), col("d1") === col("x.doc_id"))
        .join(sh.as("y"), col("d2") === col("y.doc_id"))
        .select(col("d1"), col("d2"), hamming.as("hamming"))
        .where(col("hamming") <= 3)
        .orderBy("d1", "d2")
    },

    // Winnowing document fingerprint: char-8-gram portable hashes, min per
    // 4-window, distinct sorted — all built-in higher-order fns, no UDF.
    // The fingerprint set is emitted comma-joined (BIGINT→string is
    // engine-identical; ARRAY cells are unhashable for the driver).
    Q("llm_fingerprint",
      s"""WITH g AS (
         |  SELECT doc_id,
         |         CASE WHEN length(text) >= 8
         |              THEN list_transform(range(1, length(text) - 6),
         |                   i -> ${PortableHash.sql("text[i:i+7]")})
         |              ELSE [] END AS h
         |  FROM documents
         |), f AS (
         |  SELECT doc_id,
         |         CASE WHEN len(h) >= 4
         |              THEN list_sort(list_distinct(list_transform(
         |                   range(0, len(h) - 3),
         |                   j -> list_aggregate(h[j+1:j+4], 'min'))))
         |              ELSE list_sort(list_distinct(h)) END AS fp
         |  FROM g
         |)
         |SELECT doc_id,
         |       coalesce(array_to_string(fp, ','), '') AS fingerprint,
         |       CAST(len(fp) AS BIGINT) AS n_fp
         |FROM f ORDER BY doc_id""".stripMargin) { (s, d) =>
      val grams = when(length(col("text")) >= 8,
        transform(
          sequence(lit(1), length(col("text")) - 7),
          i => PortableHash.pHash(col("text").substr(i, lit(8)))))
        .otherwise(array())
      docs(s, d)
        .select(col("doc_id"), grams.as("h"))
        .select(
          col("doc_id"),
          when(size(col("h")) >= 4,
            array_sort(array_distinct(transform(
              sequence(lit(0), size(col("h")) - 4),
              j => array_min(slice(col("h"), j + 1, lit(4)))))))
            .otherwise(array_sort(array_distinct(col("h")))).as("fp"))
        .select(col("doc_id"),
          concat_ws(",", col("fp")).as("fingerprint"),
          size(col("fp")).cast("long").as("n_fp"))
        .orderBy("doc_id")
    },

    // LSH-bucketed approximate kNN: 16 deterministic hyperplanes → sign
    // bits → 2 bands of 8 bits → candidates share a band bucket → exact
    // cosine re-rank, top-5 per query. The scale path for llm_knn_per_query.
    // Oracle: the same hyperplanes inlined as DOUBLE[] literals.
    Q("llm_ann_lsh",
      s"""WITH sig AS (
         |  $lshSigSql
         |), banded AS (
         |  ${lshBandedSql(2, 8)}
         |), cand AS (
         |  SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
         |  FROM banded q JOIN banded n
         |    ON q.band = n.band AND q.band_key = n.band_key
         |  WHERE q.vec_id < 20 AND n.vec_id <> q.vec_id
         |), rr AS (
         |  SELECT q_id, n_id,
         |         round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
         |                                      CAST(ne.embedding AS DOUBLE[])), 6) AS sim
         |  FROM cand JOIN embeddings qe ON qe.vec_id = cand.q_id
         |            JOIN embeddings ne ON ne.vec_id = cand.n_id
         |), r AS (
         |  SELECT q_id, n_id, sim,
         |         row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
         |  FROM rr
         |)
         |SELECT q_id, n_id, sim, CAST(rn AS BIGINT) AS rn FROM r WHERE rn <= 5
         |ORDER BY q_id, rn""".stripMargin) { (s, d) =>
      // persist: probe (vec_id<20) and build sides otherwise each recompute
      // the 16-dot signature pass (the filter breaks exchange reuse).
      // Pre-partitioned on the bucket equi-keys — the candidate join reads
      // the cached partitioning on both sides, zero exchanges.
      val banded = lshBanded(lshSig(emb(s, d)), 2, 8)
        .repartition(col("band"), col("band_key")).persist()
      // Candidate id pairs via equi-join on (band, bucket); embeddings are
      // re-attached afterwards so the distinct dedups ids, not vectors.
      val cand = banded.where(col("vec_id") < 20).select(
          col("vec_id").as("q_id"), col("band"), col("band_key"))
        .join(banded.select(col("vec_id").as("n_id"), col("band"), col("band_key")),
          Seq("band", "band_key"))
        .where(col("n_id") =!= col("q_id"))
        .select("q_id", "n_id")
        .distinct()
      val q = emb(s, d).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = emb(s, d).select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      cand
        .join(broadcast(q), Seq("q_id"))
        .join(c, Seq("n_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"), col("sim"), col("rn").cast("long").as("rn"))
        .orderBy("q_id", "rn")
    },

    // ANN quality readout (round 7, cont.): recall@5 of the LSH path
    // against the brute-force ground truth, per query — the measurement
    // that decides whether a banding config is shippable BEFORE anyone
    // trusts llm_ann_lsh's output (LshPrefilterSpec measures recall in
    // tests; this makes it a first-class, oracle-checked report). Plan:
    // the exact side is the llm_knn_per_query broadcast-probe plan, the
    // approximate side the llm_ann_lsh bucketed plan; both top-5 frames
    // are O(queries·5) rows, so the hit join and the per-query fold are
    // report-scale. At 100 TB the exact side caps to a SAMPLE of
    // queries (recall is an estimate either way) — the structure is
    // unchanged. Both sides rank on ROUNDED sims with n_id tie-breaks,
    // so the top-5 cuts agree cross-engine.
    // Retrieval-eval MRR + nDCG (round 8, cont. 4): llm_ann_recall says
    // how MUCH of the exact top-5 the LSH index returns; this says how
    // EARLY — reciprocal rank of the first relevant hit and binary
    // nDCG@10 over the approximate ranking (relevance = membership in
    // the exact top-5), the two ranking-quality numbers a RAG/retrieval
    // pipeline reports alongside recall. Same audited plans on both
    // sides (bucketed LSH candidates, broadcast query side, exact
    // brute-force ground truth); rank positions are integers; the only
    // floats are 1/rank and 1/log2(rank+1), folded in PINNED rank order
    // (log2 is ≤1-ulp across libm builds — the psi/ln precedent — and
    // the micro-floor display absorbs it).
    Q("llm_ann_mrr",
      s"""WITH sig AS (
         |  $lshSigSql
         |), banded AS (
         |  ${lshBandedSql(2, 8)}
         |), cand AS (
         |  SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
         |  FROM banded q JOIN banded n
         |    ON q.band = n.band AND q.band_key = n.band_key
         |  WHERE q.vec_id < 20 AND n.vec_id <> q.vec_id
         |), rr AS (
         |  SELECT q_id, n_id,
         |         round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
         |                                      CAST(ne.embedding AS DOUBLE[])), 6) AS sim
         |  FROM cand JOIN embeddings qe ON qe.vec_id = cand.q_id
         |            JOIN embeddings ne ON ne.vec_id = cand.n_id
         |), lsh AS (
         |  SELECT q_id, n_id, rn FROM (
         |    SELECT q_id, n_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY sim DESC, n_id) AS rn
         |    FROM rr) WHERE rn <= 10
         |), ex AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |                                        CAST(c.embedding AS DOUBLE[])), 6)
         |             DESC, c.vec_id) AS rn
         |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 20
         |), exact AS (
         |  SELECT q_id, n_id FROM ex WHERE rn <= 5
         |), hits AS (
         |  SELECT l.q_id, CAST(l.rn AS BIGINT) AS rn
         |  FROM lsh l JOIN exact e ON l.q_id = e.q_id AND l.n_id = e.n_id
         |), per AS (
         |  SELECT q.q_id,
         |         coalesce(min(h.rn), CAST(0 AS BIGINT)) AS first_rel_rank,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |             coalesce(list(CAST(1 AS DOUBLE)
         |                           / log2(CAST(h.rn + 1 AS DOUBLE))
         |                           ORDER BY h.rn)
         |                        FILTER (WHERE h.rn IS NOT NULL),
         |                      CAST([] AS DOUBLE[]))),
         |           (a, x) -> a + x) AS dcg
         |  FROM (SELECT DISTINCT q_id FROM exact) q
         |       LEFT JOIN hits h ON h.q_id = q.q_id
         |  GROUP BY q.q_id
         |), idcg AS (
         |  SELECT list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |             list_transform(range(1, 6),
         |               i -> CAST(1 AS DOUBLE) / log2(CAST(i + 1 AS DOUBLE)))),
         |           (a, x) -> a + x) AS v
         |)
         |SELECT q_id, first_rel_rank,
         |       CASE WHEN first_rel_rank = 0 THEN 0.0
         |            ELSE floor(1000000.0 / first_rel_rank) / 1000000 END
         |         AS reciprocal_rank,
         |       floor(dcg / v * 1000000) / 1000000 AS ndcg10
         |FROM per CROSS JOIN idcg ORDER BY q_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val q = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = emb(s, d).select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        .repartition(probeFanout(s))
      val exact = c.join(broadcast(q), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5).select("q_id", "n_id")
        .persist() // feeds the hit join AND the query-id spine
      val banded = lshBanded(lshSig(emb(s, d)), 2, 8)
        .repartition(col("band"), col("band_key")).persist()
      val cand = banded.where(col("vec_id") < 20).select(
          col("vec_id").as("q_id"), col("band"), col("band_key"))
        .join(banded.select(col("vec_id").as("n_id"), col("band"),
          col("band_key")), Seq("band", "band_key"))
        .where(col("n_id") =!= col("q_id"))
        .select("q_id", "n_id")
        .distinct()
      val qe = emb(s, d).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val ne = emb(s, d).select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      val lsh = cand
        .join(broadcast(qe), Seq("q_id"))
        .join(ne, Seq("n_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 10)
        .select(col("q_id"), col("n_id"), col("rn").cast("long").as("rn"))
      val hits = lsh.join(exact, Seq("q_id", "n_id")).select("q_id", "rn")
      val per = exact.select("q_id").distinct()
        .join(hits, Seq("q_id"), "left")
        .groupBy("q_id")
        .agg(coalesce(min(col("rn")), lit(0L)).as("first_rel_rank"),
          expr(
            """aggregate(array_sort(collect_list(rn)), CAST(0 AS DOUBLE),
              |  (a, r) -> a + CAST(1 AS DOUBLE)
              |                  / log2(CAST(r + 1 AS DOUBLE)))"""
              .stripMargin).as("dcg"))
      val idcg = expr(
        """aggregate(sequence(1, 5), CAST(0 AS DOUBLE),
          |  (a, i) -> a + CAST(1 AS DOUBLE) / log2(CAST(i + 1 AS DOUBLE)))"""
          .stripMargin)
      per.select(col("q_id"), col("first_rel_rank"),
          when(col("first_rel_rank") === 0, lit(0.0))
            .otherwise(floor(lit(1000000.0) / col("first_rel_rank")) / 1000000)
            .as("reciprocal_rank"),
          (floor(col("dcg") / idcg * 1000000) / 1000000).as("ndcg10"))
        .orderBy("q_id")
    },

    Q("llm_ann_recall",
      s"""WITH sig AS (
         |  $lshSigSql
         |), banded AS (
         |  ${lshBandedSql(2, 8)}
         |), cand AS (
         |  SELECT DISTINCT q.vec_id AS q_id, n.vec_id AS n_id
         |  FROM banded q JOIN banded n
         |    ON q.band = n.band AND q.band_key = n.band_key
         |  WHERE q.vec_id < 20 AND n.vec_id <> q.vec_id
         |), rr AS (
         |  SELECT q_id, n_id,
         |         round(list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]),
         |                                      CAST(ne.embedding AS DOUBLE[])), 6) AS sim
         |  FROM cand JOIN embeddings qe ON qe.vec_id = cand.q_id
         |            JOIN embeddings ne ON ne.vec_id = cand.n_id
         |), lsh AS (
         |  SELECT q_id, n_id FROM (
         |    SELECT q_id, n_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY sim DESC, n_id) AS rn
         |    FROM rr) WHERE rn <= 5
         |), ex AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |                                        CAST(c.embedding AS DOUBLE[])), 6)
         |             DESC, c.vec_id) AS rn
         |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 20
         |), exact AS (
         |  SELECT q_id, n_id FROM ex WHERE rn <= 5
         |)
         |SELECT e.q_id, CAST(count(l.n_id) AS BIGINT) AS n_hit,
         |       round(CAST(count(l.n_id) AS DOUBLE) / 5, 6) AS recall
         |FROM exact e LEFT JOIN lsh l
         |  ON l.q_id = e.q_id AND l.n_id = e.n_id
         |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      // exact ground truth: the llm_knn_per_query plan
      val q = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = emb(s, d).select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        .repartition(probeFanout(s))
      val exact = c.join(broadcast(q), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5).select("q_id", "n_id")
      // approximate side: the llm_ann_lsh bucketed plan
      val banded = lshBanded(lshSig(emb(s, d)), 2, 8)
        .repartition(col("band"), col("band_key")).persist()
      val cand = banded.where(col("vec_id") < 20).select(
          col("vec_id").as("q_id"), col("band"), col("band_key"))
        .join(banded.select(col("vec_id").as("n_id"), col("band"), col("band_key")),
          Seq("band", "band_key"))
        .where(col("n_id") =!= col("q_id"))
        .select("q_id", "n_id")
        .distinct()
      val qe = emb(s, d).select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val ne = emb(s, d).select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      val lsh = cand
        .join(broadcast(qe), Seq("q_id"))
        .join(ne, Seq("n_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"), lit(1).as("hit"))
      exact.join(lsh, Seq("q_id", "n_id"), "left")
        .groupBy("q_id")
        .agg(count(col("hit")).as("n_hit"),
          round(count(col("hit")).cast("double") / lit(5), 6).as("recall"))
        .orderBy("q_id")
    },

    // The banded-LSH prefilter as a FIRST-CLASS similarity join: candidates
    // from 4 bands × 4 bits (higher recall than 2×8 at moderate sims), then
    // exact cosine verify at τ=0.4 — the documented scale default for
    // llm_sim_join_threshold (SCALING.md §LSH; LshPrefilterSpec measures
    // recall vs the brute-force edge set). The only shuffle is on the band
    // key — never O(n²) pairs.
    Q("llm_sim_join_lsh",
      s"""WITH sig AS (
         |  $lshSigSql
         |), banded AS (
         |  ${lshBandedSql(4, 4)}
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |   AND a.vec_id < b.vec_id
         |), v AS (
         |  SELECT a_id, b_id,
         |         round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
         |                                      CAST(y.embedding AS DOUBLE[])), 6) AS sim
         |  FROM cand JOIN embeddings x ON x.vec_id = cand.a_id
         |            JOIN embeddings y ON y.vec_id = cand.b_id
         |)
         |SELECT a_id, b_id, sim FROM v WHERE sim >= 0.4
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val cand = lshCandidatePairs(s, d, 4, 4)
      val a = emb(s, d).select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = emb(s, d).select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
        .select(col("a_id"), col("b_id"),
          round(cosineSim(col("a_emb"), col("b_emb")), 6).as("sim"))
        .where(col("sim") >= 0.4)
        .orderBy("a_id", "b_id")
    },

    // The MODERATE-τ similarity join's sub-quadratic path (round 5; the
    // round-4 verdict's #2 demand): same τ=0.35 semantics as the declared
    // brute-force llm_sim_join_threshold, behind a UNION-OF-BANDS sign-LSH
    // prefilter — 8 bands × 2 bits over the shared 16 hyperplanes. Why the
    // band shape flips vs the high-τ 4×4 scheme: per-bit agreement at
    // sim=0.35 is only p ≈ 1 - acos(0.35)/π ≈ 0.61, so wide bands lose the
    // match (4-bit band hit rate p⁴ ≈ 0.14); r=2 keeps the per-band hit at
    // p² ≈ 0.38 and L=8 bands amplify pair recall to 1-(1-p²)^8 ≈ 0.98 AT
    // the τ boundary (higher above it) — LshPrefilterSpec measures ≥0.9 on
    // planted moderate-sim pairs. Scale posture: candidate work grows as
    // n^(1+ρ) with ρ = ln(1/p₁)/ln(1/p₂) ≈ 0.7 (p₂=0.5 for random pairs)
    // once the band width is dialed r ∝ log n with L rescaled for recall —
    // sub-quadratic where brute force is n², with the same banded-equi-join
    // plan shape (persisted signature, zero-exchange self-join,
    // shuffle-hash hygiene) as every other sketch family here. The oracle
    // replays the identical bands, so the key is exact, not
    // recall-approximate.
    Q("llm_sim_join_threshold_lsh",
      s"""WITH sig AS (
         |  $lshSigSql
         |), banded AS (
         |  ${lshBandedSql(8, 2)}
         |), cand AS (
         |  SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM banded a JOIN banded b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |   AND a.vec_id < b.vec_id
         |), v AS (
         |  SELECT a_id, b_id,
         |         round(list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
         |                                      CAST(y.embedding AS DOUBLE[])), 6) AS sim
         |  FROM cand JOIN embeddings x ON x.vec_id = cand.a_id
         |            JOIN embeddings y ON y.vec_id = cand.b_id
         |)
         |SELECT a_id, b_id, sim FROM v WHERE sim >= 0.35
         |ORDER BY a_id, b_id""".stripMargin) { (s, d) =>
      val cand = lshCandidatePairs(s, d, 8, 2)
      val a = emb(s, d).select(col("vec_id").as("a_id"), col("embedding").as("a_emb"))
      val b = emb(s, d).select(col("vec_id").as("b_id"), col("embedding").as("b_emb"))
      cand.join(a, Seq("a_id")).join(b, Seq("b_id"))
        .select(col("a_id"), col("b_id"),
          round(cosineSim(col("a_emb"), col("b_emb")), 6).as("sim"))
        .where(col("sim") >= 0.35)
        .orderBy("a_id", "b_id")
    },

    // IVF approximate kNN, SERVED from the persisted index (round 10 —
    // VERDICT r9 #1): a 16-cell coarse quantizer trained with two
    // deterministic Lloyd iterations from k-means‖-style seeds (round 9:
    // uniform per-bucket hash draws → one cost round → exact-integer
    // cost-weighted oversample → per-cell re-seed), but the training
    // runs ONCE per corpus fingerprint into config.IvfIndex's lake
    // state (centroids + inverted file) — the declared plan READS the
    // stored index, probes each query's 2 nearest cells, and
    // exact-reranks only those candidates. Per-query cost is the probe,
    // never the training (~6 corpus passes — what r7..r9 paid inside
    // every execution). Cross-engine determinism: assignment ranks by
    // the 6-dp ROUNDED similarity (tie-break cell), each trained
    // centroid is 6-dp-rounded then float-quantized, and the seeding
    // draw is pure integer arithmetic — the oracle replays seeding +
    // both Lloyd iterations as chained CTEs, so a stored index that
    // drifted from the live recipe hash-mismatches immediately (and the
    // recompute twin llm_ann_ivf_train answers the SAME oracle with
    // training kept in-plan).
    Q("llm_ann_ivf", ivfTopkOracle) { (s, d) =>
      val dir = graft.config.IvfIndex.ensure(s, d)
      val cents = graft.config.IvfIndex.centroids(s, dir)
      // the inverted file stores (vec_id, embedding, cell) partitioned
      // by cell — serving never touches the base table, and the probe
      // join's cell keys dynamic-partition-prune the scan to the
      // nprobe cells actually probed
      val assigned = graft.config.IvfIndex.assignments(s, dir)
      val queries = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ivfTopk(assigned, cents, queries, nprobe = 2, k = 5)
    },

    // The RECOMPUTE twin of llm_ann_ivf (the near-dup registry
    // precedent): identical semantics, identical oracle, but k-means‖
    // seeding + Lloyd training stay INSIDE the declared plan — the
    // stored index and the live recipe can never drift unnoticed,
    // because both keys must hash-match the same replayed CTE chain.
    Q("llm_ann_ivf_train", ivfTopkOracle) { (s, d) =>
      // persisted: the k-means‖ seed chain + 2 Lloyd rounds + the final
      // assignment make ~6 passes over the corpus — one materialization
      // feeds them all (at 100 TB this is the difference between one
      // object-store scan and six)
      val e = emb(s, d).select(col("vec_id"), col("embedding")).persist()
      val cents = ivfTrain(e, ivfSeedScalable(e), lloydRounds = 2)
      val queries = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ivfTopk(ivfAssign(e, cents), cents, queries, nprobe = 2, k = 5)
    },

    // INGEST-INCREMENTAL IVF serving (round 11 — VERDICT r10 #1): the
    // coarse quantizer is STATIC-TRAINED state (here: on the vec_id <
    // 400 base corpus, once per fingerprint) and new vectors are only
    // ASSIGNED against the stored centroids — the plan reads the stored
    // base inverted file, assigns the batch in-plan (compute ∝ batch,
    // the llm_incremental_neardup_registry read-only posture; the
    // mutating append is config.IvfIndex.ingest, spec+ScaleSmoke-proven
    // ∝ batch), unions base+delta, and serves the standard probe.
    // Because assignment is per-vector independent, base-assign ∪
    // batch-assign ≡ assign-everything — the oracle replays base-only
    // training then assigns the WHOLE corpus, so a served base+delta
    // state that drifted from the static recipe hash-mismatches.
    // Retrain-on-drift stays a deliberate act: a parameter change moves
    // the fingerprint, and llm_embedding_drift is the trigger readout.
    Q("llm_ann_ivf_ingest",
      ivfTopkOracleFrom(ivfBaseTrainedAssignCtes(400L))) { (s, d) =>
      val dir = graft.config.IvfIndex.ensureBase(s, d, 400L)
      val cents = graft.config.IvfIndex.centroids(s, dir)
      val stored = graft.config.IvfIndex.assignments(s, dir)
        .select(col("vec_id"), col("embedding"), col("cell"))
      val batch = emb(s, d).where(col("vec_id") >= 400)
        .select(col("vec_id"), col("embedding"))
      val queries = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ivfTopk(stored.unionByName(ivfAssign(batch, cents)), cents,
        queries, nprobe = 2, k = 5)
    },

    // IVF retrieval eval (round 11 — VERDICT r10 #3): recall@5 of the
    // STORED-index probe path against brute-force exact cosine, per
    // query — the deployment's "is nprobe=2 enough" dial as an
    // oracle-verified number, completing the recall dashboard next to
    // llm_ann_recall (LSH) and llm_pq_recall (PQ). On the harness
    // fixture the answer is HONEST and low (~0.3 mean at sf0.01: the
    // queries are diffuse, so a 2-of-16-cell probe misses most true
    // neighbors) — which is exactly why the readout must exist: it is
    // the number that tells a deployment to raise nprobe or grow cells.
    // ApproxSpec pins the CONSISTENCY law instead of an absolute floor:
    // this key's recall must equal the overlap of the two declared
    // twins (llm_ann_ivf ∩ llm_knn_per_query) / 5.
    Q("llm_ann_ivf_recall", ivfRecallOracle) { (s, d) =>
      val dir = graft.config.IvfIndex.ensure(s, d)
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val queries = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val ivf5 = ivfTopk(
        graft.config.IvfIndex.assignments(s, dir)
          .select(col("vec_id"), col("embedding"), col("cell")),
        graft.config.IvfIndex.centroids(s, dir),
        queries, nprobe = 2, k = 5)
        .select(col("q_id").as("p_qid"), col("n_id").as("p_nid"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        .repartition(probeFanout(s))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val exact = c.join(broadcast(queries), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"))
      exact.join(ivf5,
          col("p_qid") === col("q_id") && col("p_nid") === col("n_id"),
          "left")
        .groupBy("q_id")
        .agg(count(col("p_nid")).as("n_hit"),
          round(count(col("p_nid")).cast("double") / 5, 6).as("recall"))
        .orderBy("q_id")
    },

    // Label-separability matrix (round 11): pairwise cosine between the
    // ground-truth label centroids — the readout that says whether the
    // embedding space actually SEPARATES the labels a curation plan
    // wants to stratify on (high off-diagonal similarity = the labels
    // are not distinguishable in this embedding; llm_cluster_purity is
    // the unsupervised twin). Exact-integer discipline rides the
    // llm_ann_ivf_train centroid contract: per-label means on the 6-dp
    // grid + float quantization (ivfCentCte's replay), then an 8×8
    // bounded self-join of the centroid frame — broadcast-sized at any
    // corpus scale; the only corpus-sized stage is one map-side
    // combinable per-label sum.
    Q("llm_label_centroid_sim",
      """WITH lc AS (
        |  SELECT label, list(CAST(round(m, 6) AS FLOAT) ORDER BY dim) AS cent
        |  FROM (
        |    SELECT label, dim, avg(CAST(v AS DOUBLE)) AS m FROM (
        |      SELECT label, unnest(embedding) AS v,
        |             unnest(range(1, len(embedding) + 1)) AS dim
        |      FROM embeddings)
        |    GROUP BY label, dim)
        |  GROUP BY label
        |)
        |SELECT a.label AS label_a, b.label AS label_b,
        |       round(list_cosine_similarity(CAST(a.cent AS DOUBLE[]),
        |                                    CAST(b.cent AS DOUBLE[])), 6) AS sim
        |FROM lc a JOIN lc b ON a.label < b.label
        |ORDER BY label_a, label_b""".stripMargin) { (s, d) =>
      def toFloat(c: Column): Column = transform(c, x => x.cast("float"))
      val lc = emb(s, d)
        .groupBy("label")
        .agg(graft.functions.Aggregators.centroid(col("embedding")).as("c"))
        .select(col("label"),
          toFloat(transform(col("c"), x => round(x, 6))).as("cent"))
      lc.as("a")
        .join(broadcast(lc.as("b")), col("a.label") < col("b.label"))
        .select(col("a.label").as("label_a"), col("b.label").as("label_b"),
          round(cosineSim(col("a.cent"), col("b.cent")), 6).as("sim"))
        .orderBy("label_a", "label_b")
    },

    // TOMBSTONE-AWARE IVF serving (round 11 — the DELETE verb of the
    // index lifecycle, completing build / ingest / delete / compact):
    // an append-only inverted file deletes by MARKER, not rewrite —
    // IvfIndex.delete appends ids to a tombstone table, serving
    // anti-joins it, IvfIndex.compact folds markers into the file when
    // the dead fraction grows (all three spec-proven in IvfSpec with
    // the serve-equivalence and compact-preserves-answers laws). The
    // DECLARED key pins the serving shape on a deterministic delete set
    // (vec_id % 50 = 0 — GDPR-style removals a real corpus accrues):
    // the stored index is READ as-is, the tombstone frame anti-joins
    // the probed candidates, top-5 re-ranks among survivors.
    Q("llm_ann_ivf_deleted", ivfDeletedOracle) { (s, d) =>
      val dir = graft.config.IvfIndex.ensure(s, d)
      val cents = graft.config.IvfIndex.centroids(s, dir)
      val dead = emb(s, d).where(col("vec_id") % 50 === 0)
        .select(col("vec_id"))
      val live = graft.config.IvfIndex.assignments(s, dir)
        .select(col("vec_id"), col("embedding"), col("cell"))
        .join(dead, Seq("vec_id"), "left_anti")
      val queries = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      ivfTopk(live, cents, queries, nprobe = 2, k = 5)
    },

    // nprobe TUNING CURVE (round 11): mean recall@5 of the stored-IVF
    // probe at nprobe ∈ {1, 2, 4} — llm_ann_ivf_recall says the single
    // operating point is low on this fixture; THIS key is the curve a
    // deployment reads to pick the budget (more probed cells = more
    // exact re-ranks = higher recall; candidate sets nest, so the curve
    // is non-decreasing — ApproxSpec pins the law). Plan: ONE probe
    // pass keeps each query's 4 nearest cells with their probe rank,
    // one candidate join against the stored inverted file, then the 3
    // budgets materialize as a broadcast 3-row frame joined on
    // pr <= nprobe — the candidate fan-out is paid once, not per
    // budget.
    Q("llm_ann_ivf_nprobe", ivfNprobeOracle) { (s, d) =>
      val dir = graft.config.IvfIndex.ensure(s, d)
      val cents = graft.config.IvfIndex.centroids(s, dir)
      val inv = graft.config.IvfIndex.assignments(s, dir)
        .select(col("cell"), col("vec_id").as("n_id"),
          col("embedding").as("n_emb"))
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val queries = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val wq = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))
      val pr = queries.join(broadcast(cents), lit(true))
        .select(col("q_id"), col("q_emb"), col("cell"),
          round(cosineSim(col("q_emb"), col("cent")), 6).as("sim"))
        .withColumn("pr", row_number().over(wq))
        .where(col("pr") <= 4)
        .select(col("q_id"), col("q_emb"), col("cell"), col("pr"))
      val cand = pr.join(inv, Seq("cell"))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("pr"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
      val bud = s.range(1)
        .select(explode(array(lit(1L), lit(2L), lit(4L))).as("nprobe"))
      val w5 = Window.partitionBy("nprobe", "q_id")
        .orderBy(col("sim").desc, col("n_id"))
      val t5 = cand.join(broadcast(bud), col("pr") <= col("nprobe"))
        .withColumn("rn", row_number().over(w5))
        .where(col("rn") <= 5)
        .select(col("nprobe").as("t_np"), col("q_id").as("t_qid"),
          col("n_id").as("t_nid"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        .repartition(probeFanout(s))
      val we = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val exact = c.join(broadcast(queries), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(we))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"))
      exact.crossJoin(broadcast(bud))
        .join(t5,
          col("t_np") === col("nprobe") && col("t_qid") === col("q_id") &&
            col("t_nid") === col("n_id"), "left")
        .groupBy("nprobe", "q_id")
        .agg(count(col("t_nid")).as("h"))
        .groupBy("nprobe")
        .agg(count(lit(1)).as("n_queries"),
          round(avg(col("h").cast("double")) / 5, 6).as("mean_recall"))
        .orderBy("nprobe")
    },

    // RECALL-TARGETED serving (round 12 — VERDICT r11 #5; round 13 —
    // VERDICT r12 #4: the pick is now PERSISTED). The call a deployment
    // makes is "give me ≥ floor recall as cheaply as possible"; r12
    // answered it by recomputing the whole recall curve INSIDE every
    // serve — the documented "curve on an offline sample, pick stored
    // in index meta" deployment dial existed only as prose. The curve
    // now runs once per index PUBLISH ([[graft.config.IvfIndex.build]]
    // writes the `autoprobe` table via ivfAutoprobeState — build,
    // retrain and compact all refresh it), and this key's serving plan
    // reads the stored pick as a broadcast 1-row frame next to the
    // probed candidates: no curve fan-out, no brute-force exact half,
    // ONE embeddings scan (the 20 bounded query rows — PlanSpec pins
    // it). The oracle still replays curve-and-pick end-to-end from the
    // same training chain, so a stored pick that drifted from the curve
    // it claims to summarize hash-mismatches immediately.
    Q("llm_ann_ivf_autoprobe", ivfAutoprobeOracle) { (s, d) =>
      val dir = graft.config.IvfIndex.ensure(s, d)
      val cents = graft.config.IvfIndex.centroids(s, dir)
      val inv = graft.config.IvfIndex.assignments(s, dir)
        .select(col("cell"), col("vec_id").as("n_id"),
          col("embedding").as("n_emb"))
      val queries = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val wq = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))
      val pr = queries.join(broadcast(cents), lit(true))
        .select(col("q_id"), col("q_emb"), col("cell"),
          round(cosineSim(col("q_emb"), col("cent")), 6).as("sim"))
        .withColumn("pr", row_number().over(wq))
        .where(col("pr") <= 4)
        .select(col("q_id"), col("q_emb"), col("cell"), col("pr"))
      val cand = pr.join(inv, Seq("cell"))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("pr"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
      val pick = graft.config.IvfIndex.autoprobe(s, dir)
        .where(col("picked")).select(col("nprobe").as("np"))
      val wr = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      cand.crossJoin(broadcast(pick))
        .where(col("pr") <= col("np"))
        .withColumn("rn", row_number().over(wr))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"), col("sim"),
          col("rn").cast("long").as("rn"), col("np").as("nprobe_used"))
        .orderBy("q_id", "rn")
    },

    // Top-k vocabulary coverage (round 13): the share of all corpus
    // tokens covered by the top-100 / top-1000 most frequent words —
    // the working-set readout behind vocabulary sizing and stopword
    // policy (llm_vocab_coverage asks "does a GIVEN vocab cover the
    // corpus"; this asks "how small could it be"). Vocabulary-bounded:
    // one rank window over the word-frequency frame, exact BIGINT
    // conditional sums, two display divisions.
    Q("llm_ngram_coverage",
      """WITH tf AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w
        |), rk AS (
        |  SELECT c, CAST(row_number() OVER (ORDER BY c DESC, w)
        |              AS BIGINT) AS i
        |  FROM tf
        |)
        |SELECT CAST(count(*) AS BIGINT) AS vocab,
        |       CAST(sum(c) AS BIGINT) AS n_tokens,
        |       round(CAST(sum(CASE WHEN i <= 100 THEN c ELSE 0 END)
        |                  AS DOUBLE) / sum(c), 6) AS top100_coverage,
        |       round(CAST(sum(CASE WHEN i <= 1000 THEN c ELSE 0 END)
        |                  AS DOUBLE) / sum(c), 6) AS top1000_coverage
        |FROM rk""".stripMargin) { (s, d) =>
      val tf = docs(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("c"))
      val wr = Window.orderBy(col("c").desc, col("w"))
      tf.withColumn("i", row_number().over(wr).cast("long"))
        .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
          round(sum(when(col("i") <= 100, col("c")).otherwise(0L))
            .cast("double") / sum(col("c")), 6).as("top100_coverage"),
          round(sum(when(col("i") <= 1000, col("c")).otherwise(0L))
            .cast("double") / sum(col("c")), 6).as("top1000_coverage"))
    },

    // Chunk-level exact dedup rate (round 13): split every doc into
    // non-overlapping 32-token chunks, fingerprint each, and report
    // per-source how much of the CHUNK population is repeated — the
    // pre-indexing readout for RAG pipelines, where the unit of
    // retrieval (and of wasted index space) is the chunk, not the doc
    // (llm_exact_dedup answers at doc grain; boilerplate repeats at
    // chunk grain long before whole docs do). One scan, one in-row
    // chunk explode, one md5 per chunk, bounded per-source aggregate.
    Q("llm_chunk_dedup_rate",
      """WITH ch AS (
        |  SELECT source,
        |         md5(array_to_string(t[k * 32 + 1 : k * 32 + 32], ' '))
        |           AS fp
        |  FROM (SELECT source, string_split(text, ' ') AS t FROM documents),
        |       LATERAL (SELECT unnest(range(0, (len(t) + 31) // 32)) AS k)
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
        |       CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
        |       round(1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*), 6)
        |         AS dup_rate
        |FROM ch GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("source"), split(col("text"), " ").as("t"))
        .select(col("source"), explode(
          transform(
            sequence(lit(0), expr("(size(t) + 31) div 32 - 1")),
            k => md5(array_join(slice(col("t"), k * 32 + 1, lit(32)), " "))))
          .as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_chunks"),
          countDistinct(col("fp")).as("n_distinct"),
          round(lit(1.0) - countDistinct(col("fp")).cast("double") /
            count(lit(1)), 6).as("dup_rate"))
        .orderBy("source")
    },

    // Context-window fit profile (round 13): how much of each source
    // fits in 32/64/128-token budgets — the packing-planner's first
    // question (what share of the corpus needs chunking at all, per
    // context budget) before llm_pack_sequences commits to a budget.
    // One scan, exact integer token counts and bucket sums.
    Q("llm_ctx_fit_profile",
      """WITH n AS (
        |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT)
        |           AS n_tok
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(CASE WHEN n_tok <= 32 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS fit_32,
        |       CAST(sum(CASE WHEN n_tok <= 64 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS fit_64,
        |       CAST(sum(CASE WHEN n_tok <= 128 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS fit_128,
        |       round(CAST(sum(CASE WHEN n_tok <= 64 THEN 1 ELSE 0 END)
        |                  AS DOUBLE) / count(*), 6) AS fit_64_share
        |FROM n GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("n_tok") <= 32, 1L).otherwise(0L)).as("fit_32"),
          sum(when(col("n_tok") <= 64, 1L).otherwise(0L)).as("fit_64"),
          sum(when(col("n_tok") <= 128, 1L).otherwise(0L)).as("fit_128"),
          round(sum(when(col("n_tok") <= 64, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("fit_64_share"))
        .orderBy("source")
    },

    // Vocabulary concentration per source (round 13): Gini over each
    // source's token-frequency distribution — the single-number
    // companion to llm_zipf_slope (a slope says power-law SHAPE; Gini
    // says how much of the source is a handful of tokens — boilerplate
    // screams here before any quality model runs). Vocabulary-bounded:
    // ranks ride a per-source window over the (source, word) frame;
    // Σi·xᵢ and Σxᵢ are exact BIGINT; one float division per source.
    Q("llm_vocab_gini",
      """WITH tf AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT source, unnest(string_split(text, ' ')) AS w
        |    FROM documents) GROUP BY 1, 2
        |), rk AS (
        |  SELECT source, c,
        |         CAST(row_number() OVER (PARTITION BY source
        |              ORDER BY c, w) AS BIGINT) AS i
        |  FROM tf
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS vocab,
        |       CAST(sum(c) AS BIGINT) AS n_tokens,
        |       round((2.0 * sum(i * c) - (count(*) + 1) * sum(c))
        |             / (CAST(count(*) AS DOUBLE) * sum(c)), 6) AS gini
        |FROM rk GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val tf = docs(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val wr = Window.partitionBy("source").orderBy(col("c"), col("w"))
      tf.withColumn("i", row_number().over(wr).cast("long"))
        .groupBy("source")
        .agg(count(lit(1)).as("vocab"), sum(col("c")).as("n_tokens"),
          round((lit(2.0) * sum(col("i") * col("c")) -
            (count(lit(1)) + 1) * sum(col("c"))) /
            (count(lit(1)).cast("double") * sum(col("c"))), 6).as("gini"))
        .orderBy("source")
    },

    // Token-pattern profile per source (round 13): numeric-token,
    // capitalized-token and punctuation densities — the surface-pattern
    // fingerprint that separates tabular/boilerplate-heavy sources from
    // prose BEFORE any model-based scoring (a source whose tokens are
    // 30% numerals is telemetry, not training text). One scan + one
    // token explode; all counts exact BIGINT, ratios display-only.
    Q("llm_pattern_profile",
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents
        |), tc AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
        |         CAST(sum(CASE WHEN regexp_matches(w, '^[0-9]+$')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric,
        |         CAST(sum(CASE WHEN regexp_matches(w, '^[A-Z]')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_capitalized
        |  FROM tok GROUP BY source
        |), dc AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(length(regexp_replace(text, '[^.,;:!?]', '', 'g')))
        |              AS BIGINT) AS n_punct,
        |         CAST(sum(length(text)) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY source
        |)
        |SELECT source, n_docs, n_tokens, n_numeric, n_capitalized, n_punct,
        |       round(CAST(n_numeric AS DOUBLE) / n_tokens, 6)
        |         AS numeric_ratio,
        |       round(CAST(n_capitalized AS DOUBLE) / n_tokens, 6)
        |         AS capitalized_ratio,
        |       round(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio
        |FROM tc JOIN dc USING (source) ORDER BY source""".stripMargin) {
      (s, d) =>
      val tc = docs(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("w").rlike("^[0-9]+$"), 1L).otherwise(0L))
            .as("n_numeric"),
          sum(when(col("w").rlike("^[A-Z]"), 1L).otherwise(0L))
            .as("n_capitalized"))
      val dc = docs(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(length(regexp_replace(col("text"), "[^.,;:!?]", "")))
            .cast("long").as("n_punct"),
          sum(length(col("text"))).cast("long").as("n_chars"))
      tc.join(dc, Seq("source"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_numeric"), col("n_capitalized"), col("n_punct"),
          round(col("n_numeric").cast("double") / col("n_tokens"), 6)
            .as("numeric_ratio"),
          round(col("n_capitalized").cast("double") / col("n_tokens"), 6)
            .as("capitalized_ratio"),
          round(col("n_punct").cast("double") / col("n_chars"), 6)
            .as("punct_ratio"))
        .orderBy("source")
    },

    // MMR diversity rerank (round 13; Carbonell & Goldstein 1998): the
    // retrieval operator between ANN and the context window — plain
    // top-k hands an LLM five near-copies of the same passage; maximal
    // marginal relevance re-picks iteratively by
    // λ·sim(q,c) − (1−λ)·max_{s∈S} sim(c,s), trading relevance against
    // redundancy with what is already selected. Served from the STORED
    // IVF index: candidates are the probe's top-8 per query (the
    // llm_ann_ivf machinery at k=8), the candidate-pair sim matrix is
    // bounded (≤8×8 per query), and the 4 selection rounds unroll as
    // plain frame ops — no driver-side loop state, every score a
    // 6-dp-rounded double composed identically in both engines, ties
    // broken by n_id. λ = 0.7.
    Q("llm_mmr_rerank", mmrRerankOracle) { (s, d) =>
      val dir = graft.config.IvfIndex.ensure(s, d)
      val inv = graft.config.IvfIndex.assignments(s, dir)
        .select(col("vec_id"), col("embedding"), col("cell"))
      val queries = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      // sims ride as exact 1e-6 integers: 0.7·sim − 0.3·mx lands on
      // the 7th decimal, EXACTLY on the round-to-6 boundary whenever
      // the 7th digit is 5 — a decimal-vs-binary rounding coin-flip
      // between engines. score = (7·sim₆ − 3·mx₆)/10⁷ is pure integer
      // arithmetic with ONE exact int→double cast, no rounding at all.
      val cand = ivfTopk(inv, graft.config.IvfIndex.centroids(s, dir),
        queries, nprobe = 2, k = 8)
        .withColumn("s6", round(col("sim") * 1000000).cast("long"))
        .persist()
      val ce = inv.select(col("vec_id"), col("embedding"))
      // bounded candidate-pair sim matrix (≤ 8·7 rows per query)
      val cs = cand.as("a").join(cand.as("b"),
          col("a.q_id") === col("b.q_id") && col("a.n_id") =!= col("b.n_id"))
        .join(ce.as("ea"), col("a.n_id") === col("ea.vec_id"))
        .join(ce.as("eb"), col("b.n_id") === col("eb.vec_id"))
        .select(col("a.q_id").as("cq"), col("a.n_id").as("i"),
          col("b.n_id").as("j"),
          round(round(cosineSim(col("ea.embedding"), col("eb.embedding")), 6)
            * 1000000).cast("long").as("s6p"))
      // The four MMR selection rounds run DRIVER-SIDE over the collected
      // candidate/sim frames (round 13; the adaptive-probe / RankFence
      // idiom): both frames are bounded by the QUERY'S OWN constants —
      // ≤ 20 queries × 8 candidates and ≤ 20 × 8·7 sims at every SF —
      // never by the data, so the collect is a constant-size action. The
      // previous in-cluster loop paid one localCheckpoint job + anti-join
      // + aggregate + window per round over ≤ 160-row frames — pure
      // scheduling overhead (guide §5: the driver should do no DATA work;
      // this is not data work). Arithmetic is replayed exactly: integer
      // s6·7 − 3·mx6, ties to the smallest n_id, one int→double cast.
      val candRows = cand.select("q_id", "n_id", "s6", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val simRows = cs.collect()
        .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      val simByQI = simRows.groupBy(_._1).map { case (k, v) =>
        k -> v.map(_._2).toMap
      }
      val out = scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Long)]()
      candRows.groupBy(_._1).toSeq.foreach { case (q, rows) =>
        val selected = scala.collection.mutable.ArrayBuffer[Long]()
        rows.find(_._4 == 1L).foreach { r =>
          selected += r._2
          out += ((q, r._2, (r._3 * 7).toDouble / 10000000, 1L))
        }
        for (k <- 2 to 4) {
          val rem = rows.filter(r => !selected.contains(r._2))
          // inner-join semantics of the oracle's mx CTE: a remaining
          // candidate participates iff it has a sim row vs some selected
          val scored = rem.flatMap { r =>
            val sims = simByQI.getOrElse((q, r._2), Map.empty)
            val mx = selected.flatMap(sims.get)
            if (mx.isEmpty) None
            else Some((r._2, r._3 * 7 - mx.max * 3))
          }
          if (scored.nonEmpty) {
            val (nId, sm) = scored.minBy { case (n, m) => (-m, n) }
            selected += nId
            out += ((q, nId, sm.toDouble / 10000000, k.toLong))
          }
        }
      }
      import s.implicits._
      out.toSeq.toDF("q_id", "n_id", "score", "mmr_rank")
        .orderBy("q_id", "mmr_rank")
    },

    // ROUGE-1 over the VERIFIED near-dup pairs (round 13): unigram
    // overlap precision/recall/F1 for every stored pair — the lexical
    // readout that separates true re-crawls (F1 ≈ 1) from
    // template-share pairs (high Jaccard on shingle SETS, lower
    // token-frequency overlap) when deciding what a dedup pass may
    // safely drop. Rides the materialized pair frame (never re-runs
    // the minhash chain — the lake-report doctrine) plus ONE
    // token-frequency scan of the corpus; overlap = Σ min(tf₁, tf₂)
    // in exact BIGINT, three display divisions per pair.
    Q("llm_rouge1_pairs", rouge1PairsOracle) { (s, d) =>
      val pairs = minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2).select("d1", "d2").persist()
      val tf = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c")).persist()
      val ln = tf.groupBy("doc_id").agg(sum(col("c")).as("n"))
      val ov = pairs
        .join(tf.as("a"), col("d1") === col("a.doc_id"))
        .join(tf.as("b"),
          col("d2") === col("b.doc_id") && col("a.w") === col("b.w"))
        .groupBy("d1", "d2")
        .agg(sum(least(col("a.c"), col("b.c"))).as("ov"))
      pairs
        .join(ov, Seq("d1", "d2"), "left")
        .join(ln.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
        .join(ln.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
        .select(col("d1"), col("d2"),
          coalesce(col("ov"), lit(0L)).as("overlap"), col("n1"), col("n2"),
          round(coalesce(col("ov"), lit(0L)).cast("double") / col("n1"), 6)
            .as("rouge1_precision"),
          round(coalesce(col("ov"), lit(0L)).cast("double") / col("n2"), 6)
            .as("rouge1_recall"),
          round(lit(2.0) * coalesce(col("ov"), lit(0L)) /
            (col("n1") + col("n2")), 6).as("rouge1_f1"))
        .orderBy("d1", "d2")
    },

    // BLEU-2 over the VERIFIED near-dup pairs (round 13, cont.): the
    // machine-translation cousin of llm_rouge1_pairs — clipped unigram
    // AND bigram precision with the brevity penalty, d1 as candidate
    // and d2 as reference. ROUGE's recall view asks "how much of the
    // reference survives"; BLEU's precision view asks "how much of the
    // candidate is licensed" — a pair that scores high on one and low
    // on the other is an asymmetric containment (excerpt/expansion),
    // exactly the case where dropping the wrong side of a dup pair
    // loses content. Rides the materialized pair frame + the same
    // token-frequency scan shape (one extra bigram-frequency pass);
    // clipped overlaps are exact BIGINT Σ min(tf₁,tf₂); bp and
    // bleu2 = bp·√(p1·p2) are per-row float expressions on exact
    // integers, identically composed, FLOOR-scaled.
    Q("llm_bleu_pairs",
      s"""WITH $minhashVerifiedCtes,
         |tf AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents) GROUP BY 1, 2
         |), bt AS (
         |  SELECT doc_id, toks[CAST(x AS INT)] || ' ' ||
         |         toks[CAST(x AS INT) + 1] AS bg
         |  FROM (
         |    SELECT doc_id, toks, unnest(range(1, len(toks))) AS x
         |    FROM (SELECT doc_id, string_split(text, ' ') AS toks
         |          FROM documents))
         |), bf AS (
         |  SELECT doc_id, bg, CAST(count(*) AS BIGINT) AS c
         |  FROM bt GROUP BY 1, 2
         |), ln AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY 1
         |), pr AS (
         |  SELECT d1, d2 FROM verified WHERE est_jaccard >= 0.2
         |), o1 AS (
         |  SELECT p.d1, p.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS o1
         |  FROM pr p JOIN tf a ON a.doc_id = p.d1
         |  JOIN tf b ON b.doc_id = p.d2 AND b.w = a.w
         |  GROUP BY 1, 2
         |), o2 AS (
         |  SELECT p.d1, p.d2, CAST(sum(least(a.c, b.c)) AS BIGINT) AS o2
         |  FROM pr p JOIN bf a ON a.doc_id = p.d1
         |  JOIN bf b ON b.doc_id = p.d2 AND b.bg = a.bg
         |  GROUP BY 1, 2
         |)
         |SELECT p.d1, p.d2, l1.n AS n1, l2.n AS n2,
         |       coalesce(u.o1, 0) AS clip1, coalesce(g.o2, 0) AS clip2,
         |       floor(CASE WHEN l1.n >= l2.n THEN 1.0
         |                  ELSE exp(1.0 - CAST(l2.n AS DOUBLE) / l1.n) END
         |             * 1000000) / 1000000 AS bp,
         |       floor(CASE WHEN coalesce(u.o1, 0) = 0
         |                    OR coalesce(g.o2, 0) = 0 OR l1.n < 2 THEN 0.0
         |                  ELSE (CASE WHEN l1.n >= l2.n THEN 1.0
         |                             ELSE exp(1.0 - CAST(l2.n AS DOUBLE)
         |                                      / l1.n) END)
         |                       * sqrt(CAST(u.o1 AS DOUBLE) / l1.n
         |                              * (CAST(g.o2 AS DOUBLE)
         |                                 / (l1.n - 1))) END
         |             * 1000000) / 1000000 AS bleu2
         |FROM pr p
         |LEFT JOIN o1 u ON u.d1 = p.d1 AND u.d2 = p.d2
         |LEFT JOIN o2 g ON g.d1 = p.d1 AND g.d2 = p.d2
         |JOIN ln l1 ON l1.doc_id = p.d1
         |JOIN ln l2 ON l2.doc_id = p.d2
         |ORDER BY p.d1, p.d2""".stripMargin) { (s, d) =>
      val pairs = minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2).select("d1", "d2").persist()
      val tf = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val bf = docs(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          """transform(slice(toks, 1, size(toks) - 1),
            |  (x, i) -> concat(x, ' ', element_at(toks, i + 2)))"""
            .stripMargin)).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      val ln = tf.groupBy("doc_id").agg(sum(col("c")).as("n"))
      def clipped(f: DataFrame, k: String, out: String) = pairs
        .join(f.as("a"), col("d1") === col("a.doc_id"))
        .join(f.as("b"),
          col("d2") === col("b.doc_id") && col(s"a.$k") === col(s"b.$k"))
        .groupBy("d1", "d2")
        .agg(sum(least(col("a.c"), col("b.c"))).as(out))
      val bpE = when(col("n1") >= col("n2"), lit(1.0))
        .otherwise(exp(lit(1.0) - col("n2").cast("double") / col("n1")))
      pairs
        .join(clipped(tf, "w", "o1"), Seq("d1", "d2"), "left")
        .join(clipped(bf, "bg", "o2"), Seq("d1", "d2"), "left")
        .join(ln.select(col("doc_id").as("d1"), col("n").as("n1")), Seq("d1"))
        .join(ln.select(col("doc_id").as("d2"), col("n").as("n2")), Seq("d2"))
        .select(col("d1"), col("d2"), col("n1"), col("n2"),
          coalesce(col("o1"), lit(0L)).as("clip1"),
          coalesce(col("o2"), lit(0L)).as("clip2"),
          (floor(bpE * 1000000) / 1000000).as("bp"),
          (floor(when(coalesce(col("o1"), lit(0L)) === 0 ||
              coalesce(col("o2"), lit(0L)) === 0 || col("n1") < 2, lit(0.0))
            .otherwise(bpE * sqrt(col("o1").cast("double") / col("n1")
              * (col("o2").cast("double") / (col("n1") - 1))))
            * 1000000) / 1000000).as("bleu2"))
        .orderBy("d1", "d2")
    },

    // MAINTENANCE-DECISION AUDIT (round 13 — VERDICT r12 #8): the
    // maintenance loop's own dashboard, oracle-verified. The served
    // frame is the STORED maintlog of a maintained deployment index
    // (IvfIndex.ensureMaintained replays build → ingest → drift-retrain
    // → post-retrain ingest once per corpus fingerprint); the oracle
    // recomputes every decision — exact integer micro-moments, the T²
    // drift statistic in the same left-to-right summation order as the
    // engine's loop, the threshold compare, the chained baselines
    // across the retrain, and the generation/count bookkeeping — from
    // the base parquet alone. A maintenance loop that logged a wrong
    // decision, a wrong baseline, or a wrong count hash-mismatches
    // here; this is llm_dedup_registry_stats' stored-state-under-
    // recompute-oracle doctrine applied to the policy loop itself.
    Q("llm_ivf_maintain_audit", ivfMaintainAuditOracle) { (s, d) =>
      val dir = graft.config.IvfIndex.ensureMaintained(s, d)
      graft.config.IvfIndex.maintlog(s, dir)
        .select(col("log_seq"), col("gen_seq"), col("action"),
          col("batch_n"), col("total_n"), col("drift_t2_micro"),
          col("drift_t2_threshold_micro"))
        .orderBy("log_seq")
    },

    // FILTERED ANN on the served IVF path (round 11 — VERDICT r10 #2):
    // per-query top-5 under a metadata predicate — the single most
    // common real retrieval shape (RAG tenant/source filters, curation
    // within a stratum). The v3 inverted file stores the label NEXT TO
    // each vector, so the filter applies to the probed cells' members
    // directly — no base-table re-join anywhere in the serving plan
    // (the base embeddings scan feeds only the 20 bounded query rows),
    // and a CONSTANT predicate would push down into the cell-partitioned
    // parquet scan. The predicate here is llm_hard_negatives' label
    // inequality (per-query, so it rides the candidate join); ApproxSpec
    // pins recall vs the brute filtered truth.
    Q("llm_ann_ivf_filtered", ivfFilteredOracle) { (s, d) =>
      val dir = graft.config.IvfIndex.ensure(s, d)
      val cents = graft.config.IvfIndex.centroids(s, dir)
      val inv = graft.config.IvfIndex.assignments(s, dir)
        .select(col("cell"), col("vec_id").as("n_id"),
          col("label").as("n_label"), col("embedding").as("n_emb"))
      val queries = emb(s, d).where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("embedding").as("q_emb"))
      val wq = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))
      val probes = queries.join(broadcast(cents), lit(true))
        .select(col("q_id"), col("q_label"), col("q_emb"), col("cell"),
          round(cosineSim(col("q_emb"), col("cent")), 6).as("sim"))
        .withColumn("rn", row_number().over(wq))
        .where(col("rn") <= 2)
        .select(col("q_id"), col("q_label"), col("q_emb"), col("cell"))
      val wr = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      probes.join(inv, Seq("cell"))
        .where(col("n_id") =!= col("q_id") &&
          col("n_label") =!= col("q_label"))
        .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .distinct()
        .withColumn("rn", row_number().over(wr))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("q_label"), col("n_id"), col("n_label"),
          col("sim"), col("rn").cast("long").as("rn"))
        .orderBy("q_id", "rn")
    },

    // Clustering purity (round 8, cont. 6; round 10: SERVED from the
    // persisted index): the EVALUATION readout for the k-means/IVF
    // machinery — read every embedding's stored cell assignment (the
    // exact llm_ann_ivf training chain's inverted file; shared oracle
    // CTEs so the replay cannot drift) and score each cluster by the
    // fraction of its members carrying the majority ground-truth label,
    // plus the size-weighted overall purity. This is what decides
    // whether embedding clusters are usable as curation/topic buckets.
    // Majority pick = max(struct(cnt, -label)) == the oracle's
    // row_number(cnt DESC, label) — deterministic under ties. Plan: the
    // stored (vec_id, cell) inverted file joins the base table's label
    // vec_id-keyed → one (cell, label) count → bounded cell-frame folds;
    // training cost lives in the once-per-fingerprint index build, not
    // in this readout.
    Q("llm_cluster_purity", {
      s"""WITH $ivfTrainedAssignCtes,
         |lab AS (
         |  SELECT a3.cell, e.label FROM a3
         |  JOIN embeddings e USING (vec_id)
         |), cnt AS (
         |  SELECT cell, label, CAST(count(*) AS BIGINT) AS c
         |  FROM lab GROUP BY 1, 2
         |), pick AS (
         |  SELECT cell, label AS majority_label, c AS majority_n FROM (
         |    SELECT cell, label, c, row_number() OVER (
         |      PARTITION BY cell ORDER BY c DESC, label) AS rn
         |    FROM cnt) WHERE rn = 1
         |), sz AS (
         |  SELECT cell, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY cell
         |), tot AS (
         |  SELECT CAST(sum(majority_n) AS BIGINT) AS mt FROM pick
         |), tn AS (
         |  SELECT CAST(sum(n) AS BIGINT) AS nt FROM sz
         |)
         |SELECT s.cell, s.n, p.majority_label, p.majority_n,
         |       floor(CAST(p.majority_n AS DOUBLE) / s.n * 1000000)
         |         / 1000000 AS purity,
         |       floor(CAST(mt AS DOUBLE) / nt * 1000000) / 1000000
         |         AS overall_purity
         |FROM sz s JOIN pick p USING (cell) CROSS JOIN tot CROSS JOIN tn
         |ORDER BY s.cell""".stripMargin
    }) { (s, d) =>
      val e = emb(s, d)
      val dir = graft.config.IvfIndex.ensure(s, d)
      val cnt = graft.config.IvfIndex.assignments(s, dir)
        .select(col("vec_id"), col("cell")) // vectors pruned at the scan
        .join(e.select(col("vec_id"), col("label")), Seq("vec_id"))
        .groupBy("cell", "label").agg(count(lit(1)).as("c"))
        .persist() // feeds the majority pick AND the size fold
      val pick = cnt.groupBy("cell")
        .agg(max(struct(col("c").as("cc"), (-col("label")).as("nl")))
          .as("m"))
        .select(col("cell"), (-col("m.nl")).as("majority_label"),
          col("m.cc").as("majority_n"))
      val sz = cnt.groupBy("cell").agg(sum(col("c")).as("n"))
      val tot = pick.agg(sum(col("majority_n")).as("mt"))
      val tn = sz.agg(sum(col("n")).as("nt"))
      sz.join(pick, Seq("cell"))
        .crossJoin(broadcast(tot)).crossJoin(broadcast(tn))
        .select(col("cell"), col("n"), col("majority_label"),
          col("majority_n"),
          (floor(col("majority_n").cast("double") / col("n") * 1000000)
            / 1000000).as("purity"),
          (floor(col("mt").cast("double") / col("nt") * 1000000)
            / 1000000).as("overall_purity"))
        .orderBy("cell")
    },

    // PCA variance diagnostics (round 8, cont. 6): how much of the
    // embedding corpus' variance the TOP principal component carries —
    // the anisotropy readout (Mu & Viswanath 2018: dominant components
    // make cosine similarities degenerate; a high var_explained says
    // "mean-center / project before ANN"). EXACT distributed stage:
    // components snap to a 1e-7 integer grid (floats have 7 significant
    // digits), so the moment sums T_j = Σx_j and Q_jk = Σx_j·x_k are
    // exact integers whatever the partitioning/order — ACCUMULATED in
    // DECIMAL(38,0) (oracle HUGEINT): a 1M-vector ScaleSmoke run caught
    // BIGINT sums overflowing at ~1e20 (per-row products stay BIGINT;
    // the 1e-7 grid bounds them below 2^63 for |x| ≤ 100). The CENTERED
    // scatter S = n·Q − T·Tᵀ assembles in the same wide types. The bounded stage: S is a
    // 64×64 = 4096-cell ONE-ROW frame; 3 power-iteration rounds from
    // the all-ones vector (deterministic sign) + the Rayleigh quotient
    // run as IN-ROW array folds written operator-for-operator
    // identically in both engines — no driver math, no CSE assumptions.
    // Scale shape: the only fact-sized stage is one explode of 2080
    // upper-triangle products per vector into a map-side-combinable
    // groupBy — 4096 rows per partition reach the shuffle however many
    // vectors; everything after is O(dim²) per corpus.
    Q("llm_embedding_pca_var", pcaVarOracle(pcaChainCtes)) { (s, d) =>
      pcaVarReadout(pcaTopFrame(
        emb(s, d).select(col("vec_id"), col("embedding"))))
    },

    // SAMPLED-scatter PCA twin (round 9 — the declared 100 TB dial the
    // r8 verdict asked for): the SAME moment/scatter/power-iteration
    // chain, fed by a fixed-rate deterministic portable-hash draw over
    // vec_id (1-in-PcaSampleMod; re-ingestion-stable — a re-imported
    // vector lands on the same side of the predicate, so the model is
    // reproducible run-to-run and engine-to-engine). Everything after
    // the one sampled fact stage is exact on the sample, and the oracle
    // replays the identical predicate. The scatter cost drops by the
    // rate (the only fact-proportional stage); llm_embedding_pca_var
    // stays as the exact twin for audits. n_vectors reports the SAMPLE
    // size — consumers see what the model was fit on.
    Q("llm_embedding_pca_var_sampled",
      pcaVarOracle(pcaChainCtes(pcaSampleSql))) { (s, d) =>
      pcaVarReadout(pcaTopFrame(
        emb(s, d).select(col("vec_id"), col("embedding"))
          .where(pcaSampleCol)))
    },

    // Center + project-out-PC1 transform (round 8, cont. 6): the FIX the
    // llm_embedding_pca_var diagnostic prescribes, applied per vector —
    // x_c = x - mean, proj = v.x_c (the anisotropy component), residual
    // = ||x_c - proj*v|| (what similarity search actually has to work
    // with after the dominant direction is removed; Mu & Viswanath
    // 2018's all-but-the-top). The bounded model (n, T, v3 — one row)
    // BROADCASTS to the embeddings fact and the transform is pure
    // map-side in-row arithmetic: centered components stay EXACT
    // integers via cross-multiplication (xc*n = x_int*n - T, never a
    // float mean), one double assembly per vector folded in pinned
    // dimension order. Scale shape: model build = the shared PCA chain;
    // application = zero-shuffle map over any corpus size.
    Q("llm_embedding_center_project", {
      s"""WITH $pcaChainCtes, xv AS (
         |  SELECT vec_id, list_transform(embedding, x ->
         |           CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT))
         |           AS xi
         |  FROM embeddings
         |), r AS (
         |  SELECT vec_id,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |           list_transform(range(1, 65), j ->
         |             v3[CAST(j AS INT)]
         |               * (CAST(CAST(xi[CAST(j AS INT)] AS HUGEINT) * n
         |                       - tl[CAST(j AS INT)]
         |                       AS DOUBLE) / n / 10000000))),
         |           (a, x) -> a + x) AS proj,
         |         list_reduce(list_prepend(CAST(0 AS DOUBLE),
         |           list_transform(range(1, 65), j ->
         |             (CAST(CAST(xi[CAST(j AS INT)] AS HUGEINT) * n
         |                   - tl[CAST(j AS INT)]
         |                   AS DOUBLE) / n / 10000000)
         |             * (CAST(CAST(xi[CAST(j AS INT)] AS HUGEINT) * n
         |                     - tl[CAST(j AS INT)]
         |                     AS DOUBLE) / n / 10000000))),
         |           (a, x) -> a + x) AS cnorm2
         |  FROM xv CROSS JOIN p3
         |)
         |SELECT vec_id,
         |       floor(proj * 1000000) / 1000000 AS proj_pc1,
         |       floor(sqrt(cnorm2 - proj * proj) * 1000000) / 1000000
         |         AS residual_norm
         |FROM r ORDER BY vec_id""".stripMargin
    }) { (s, d) =>
      val model = pcaTopFrame(
        emb(s, d).select(col("vec_id"), col("embedding")))
        .select("n", "tl", "v3")
      val xv = emb(s, d).select(col("vec_id"), expr(
        """transform(embedding, x ->
          |  CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT))"""
          .stripMargin).as("xi"))
      val r = xv.crossJoin(broadcast(model))
        .select(col("vec_id"),
          expr(
            """aggregate(transform(sequence(1, 64), j ->
              |    element_at(v3, CAST(j AS INT))
              |      * (CAST(CAST(element_at(xi, CAST(j AS INT))
              |                   AS DECIMAL(38,0)) * n
              |              - element_at(tl, CAST(j AS INT)) AS DOUBLE)
              |         / n / 10000000)),
              |  CAST(0 AS DOUBLE), (a, x) -> a + x)""".stripMargin)
            .as("proj"),
          expr(
            """aggregate(transform(sequence(1, 64), j ->
              |    (CAST(CAST(element_at(xi, CAST(j AS INT))
              |               AS DECIMAL(38,0)) * n
              |          - element_at(tl, CAST(j AS INT)) AS DOUBLE)
              |     / n / 10000000)
              |    * (CAST(CAST(element_at(xi, CAST(j AS INT))
              |               AS DECIMAL(38,0)) * n
              |            - element_at(tl, CAST(j AS INT)) AS DOUBLE)
              |       / n / 10000000)),
              |  CAST(0 AS DOUBLE), (a, x) -> a + x)""".stripMargin)
            .as("cnorm2"))
      r.select(col("vec_id"),
          (floor(col("proj") * 1000000) / 1000000).as("proj_pc1"),
          (floor(sqrt(col("cnorm2") - col("proj") * col("proj")) * 1000000)
            / 1000000).as("residual_norm"))
        .orderBy("vec_id")
    },

    // Embedding anisotropy (round 13, cont.): mean pairwise cosine over
    // ALL vector pairs + the mean-direction norm — Ethayarajh (2019)'s
    // anisotropy readout: a healthy embedding space has near-zero mean
    // pairwise cosine, a collapsed one clusters in a cone (cosine
    // ranking loses contrast, every ANN/dedup threshold silently
    // shifts). THE scale trick: the naive readout is an O(n²) pair
    // join; the identity Σ_{i≠j} uᵢ·uⱼ = ‖Σu‖² − Σ‖u‖² makes it ONE
    // map-side pass + one 65-column aggregate — no join at any SF.
    // Unit-normalized vectors re-quantize to a 1e-6 tick grid
    // (per-row IEEE ops on identical inputs, the shared-grid
    // doctrine), so the per-dim sums are exact BIGINT, the per-row
    // norm² fold is exact DECIMAL/HUGEINT, and ‖Σq‖² assembles in a
    // FIXED left-to-right 64-term double expression — bit-identical
    // both engines, FLOOR-scaled displays.
    Q("llm_embedding_anisotropy", {
      val sums = (1 to 64)
        .map(j => s"CAST(sum(qi[$j]) AS BIGINT) AS s$j")
        .mkString(",\n         |         ")
        .stripMargin
      val s2 = (1 to 64)
        .map(j => s"CAST(s$j AS DOUBLE) * CAST(s$j AS DOUBLE)")
        .mkString(" + ")
      s"""WITH nv AS (
         |  SELECT xi,
         |         list_reduce(list_prepend(CAST(0 AS HUGEINT),
         |             list_transform(xi, v -> CAST(v AS HUGEINT) * v)),
         |           (a, b) -> a + b) AS n2
         |  FROM (
         |    SELECT list_transform(embedding, v ->
         |             CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT))
         |             AS xi
         |    FROM embeddings)
         |), q AS (
         |  SELECT list_transform(xi, v ->
         |           CAST(round(CAST(v AS DOUBLE)
         |                      / sqrt(CAST(n2 AS DOUBLE)) * 1000000)
         |                AS BIGINT)) AS qi
         |  FROM nv WHERE n2 > 0
         |), s AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n,
         |         CAST(sum(list_reduce(list_prepend(CAST(0 AS HUGEINT),
         |             list_transform(qi, v -> CAST(v AS HUGEINT) * v)),
         |           (a, b) -> a + b)) AS DOUBLE) AS dd,
         |         $sums
         |  FROM q
         |)
         |SELECT n AS n_vecs,
         |       floor(sqrt($s2) / n / 1000000 * 1000000) / 1000000
         |         AS mean_vec_norm,
         |       floor(($s2 - dd) / (CAST(n AS DOUBLE) * (n - 1))
         |             / 1000000) / 1000000
         |         AS mean_pairwise_cos
         |FROM s""".stripMargin
    }) { (s, d) =>
      val s2 = (1 to 64)
        .map(j => s"CAST(s$j AS DOUBLE) * CAST(s$j AS DOUBLE)")
        .mkString(" + ")
      val nv = emb(s, d)
        .select(expr(
          """transform(embedding, v ->
            |  CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT))"""
            .stripMargin).as("xi"))
        .withColumn("n2", expr(
          """aggregate(
            |  transform(xi, v -> CAST(v AS DECIMAL(19,0))
            |                     * CAST(v AS DECIMAL(19,0))),
            |  CAST(0 AS DECIMAL(38,0)), (a, v) -> a + v)""".stripMargin))
      val q = nv.where(col("n2") > 0)
        .select(expr(
          """transform(xi, v ->
            |  CAST(round(CAST(v AS DOUBLE)
            |             / sqrt(CAST(n2 AS DOUBLE)) * 1000000) AS BIGINT))"""
            .stripMargin).as("qi"))
      val aggs = Seq(
        count(lit(1)).as("n"),
        sum(expr(
          """aggregate(
            |  transform(qi, v -> CAST(v AS DECIMAL(19,0))
            |                     * CAST(v AS DECIMAL(19,0))),
            |  CAST(0 AS DECIMAL(38,0)), (a, v) -> a + v)""".stripMargin))
          .cast("double").as("dd")) ++
        (1 to 64).map(j => sum(expr(s"element_at(qi, $j)")).as(s"s$j"))
      q.agg(aggs.head, aggs.tail: _*)
        .select(col("n").as("n_vecs"),
          (floor(expr(s"sqrt($s2)") / col("n") / 1000000 * 1000000)
            / 1000000).as("mean_vec_norm"),
          (floor(expr(s"($s2) - dd")
            / (col("n").cast("double") * (col("n") - 1))
            / 1000000) / 1000000).as("mean_pairwise_cos"))
    },

    // Winnowing fingerprints (round 13, cont.; Schleimer, Wilkerson &
    // Aiken 2003 — the MOSS scheme): over each doc's word-3-gram hash
    // sequence, every window of w=4 consecutive grams contributes its
    // RIGHTMOST-minimal hash; the distinct selected positions are the
    // doc's fingerprint sketch. The guarantee plain 0-mod-p sampling
    // (llm_fingerprint's scheme) lacks: any shared run of w+k−1 = 6
    // tokens is CAUGHT by construction — no unlucky gap — at the same
    // ~2/(w+1) density. Selection is a pure per-row expression (3 leads
    // + one fixed CASE ladder, rightmost tie-break = the CASE's
    // evaluation order, identical both engines) over ONE doc-partitioned
    // sort — no self-join; the cross-doc sharing join rides the
    // fingerprint-domain frame. Integer hashes end-to-end, one
    // FLOOR-scaled density per source.
    Q("llm_winnowing",
      s"""WITH g AS (
         |  SELECT doc_id, source, x AS p,
         |         toks[CAST(x AS INT)] || ' ' || toks[CAST(x AS INT) + 1]
         |           || ' ' || toks[CAST(x AS INT) + 2] AS gr
         |  FROM (
         |    SELECT doc_id, source, toks,
         |           unnest(range(1, len(toks) - 1)) AS x
         |    FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
         |          FROM documents))
         |), hh AS (
         |  SELECT doc_id, source, p, ${PortableHash.sql("gr")} AS h FROM g
         |), w AS (
         |  SELECT doc_id, source, p, h,
         |         lead(h, 1) OVER win AS h1, lead(h, 2) OVER win AS h2,
         |         lead(h, 3) OVER win AS h3, lead(p, 3) OVER win AS p3
         |  FROM hh WINDOW win AS (PARTITION BY doc_id ORDER BY p)
         |), sel AS (
         |  SELECT DISTINCT doc_id, source,
         |         CASE WHEN h3 <= h2 AND h3 <= h1 AND h3 <= h THEN p + 3
         |              WHEN h2 <= h1 AND h2 <= h THEN p + 2
         |              WHEN h1 <= h THEN p + 1 ELSE p END AS sp,
         |         CASE WHEN h3 <= h2 AND h3 <= h1 AND h3 <= h THEN h3
         |              WHEN h2 <= h1 AND h2 <= h THEN h2
         |              WHEN h1 <= h THEN h1 ELSE h END AS fh
         |  FROM w WHERE p3 IS NOT NULL
         |), gs AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_grams,
         |         CAST(sum(CASE WHEN p3 IS NOT NULL THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_windows
         |  FROM w GROUP BY source
         |), fd AS (
         |  SELECT fh, CAST(count(DISTINCT doc_id) AS BIGINT) AS nd
         |  FROM sel GROUP BY fh
         |), ss AS (
         |  SELECT s.source, CAST(count(*) AS BIGINT) AS n_selected,
         |         CAST(sum(CASE WHEN fd.nd >= 2 THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_shared
         |  FROM sel s JOIN fd ON s.fh = fd.fh GROUP BY s.source
         |)
         |SELECT source, n_grams, n_windows, n_selected, n_shared,
         |       floor(CAST(n_selected AS DOUBLE) / n_grams * 1000000)
         |         / 1000000 AS density
         |FROM gs JOIN ss USING (source) ORDER BY source""".stripMargin) {
      (s, d) =>
      val g = docs(s, d)
        .select(col("doc_id"), col("source"),
          split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 3)
        .select(col("doc_id"), col("source"), explode(expr(
          """transform(sequence(1, size(toks) - 2), j -> struct(
            |  j AS p,
            |  concat(element_at(toks, j), ' ', element_at(toks, j + 1),
            |         ' ', element_at(toks, j + 2)) AS gr))""".stripMargin))
          .as("x"))
        .select(col("doc_id"), col("source"), col("x.p").as("p"),
          col("x.gr").as("gr"))
      val hh = g.withColumn("h", PortableHash.pHash(col("gr"))).drop("gr")
      val win = Window.partitionBy("doc_id").orderBy("p")
      val w = hh
        .withColumn("h1", lead(col("h"), 1).over(win))
        .withColumn("h2", lead(col("h"), 2).over(win))
        .withColumn("h3", lead(col("h"), 3).over(win))
        .withColumn("p3", lead(col("p"), 3).over(win))
      val spE = when(col("h3") <= col("h2") && col("h3") <= col("h1") &&
          col("h3") <= col("h"), col("p") + 3)
        .when(col("h2") <= col("h1") && col("h2") <= col("h"), col("p") + 2)
        .when(col("h1") <= col("h"), col("p") + 1)
        .otherwise(col("p"))
      val fhE = when(col("h3") <= col("h2") && col("h3") <= col("h1") &&
          col("h3") <= col("h"), col("h3"))
        .when(col("h2") <= col("h1") && col("h2") <= col("h"), col("h2"))
        .when(col("h1") <= col("h"), col("h1"))
        .otherwise(col("h"))
      val sel = w.where(col("p3").isNotNull)
        .select(col("doc_id"), col("source"), spE.as("sp"), fhE.as("fh"))
        .distinct()
      val gs = w.groupBy("source").agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("p3").isNotNull, 1L).otherwise(0L)).as("n_windows"))
      val fd = sel.groupBy("fh")
        .agg(countDistinct(col("doc_id")).as("nd"))
      val ss = sel.join(fd, Seq("fh"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_selected"),
          sum(when(col("nd") >= 2, 1L).otherwise(0L)).as("n_shared"))
      gs.join(ss, Seq("source"))
        .select(col("source"), col("n_grams"), col("n_windows"),
          col("n_selected"), col("n_shared"),
          (floor(col("n_selected").cast("double") / col("n_grams")
            * 1000000) / 1000000).as("density"))
        .orderBy("source")
    },

    // Heaps'-law vocabulary growth (round 13, cont.): cumulative vocab
    // vs cumulative tokens at 10 corpus checkpoints + the fitted growth
    // exponent β per checkpoint (V ≈ K·N^β; β≈0.5 healthy prose, →1
    // means unbounded novel tokens: IDs/noise, →0 means a saturated/
    // templated corpus) — the companion curve to llm_ngram_coverage's
    // working-set view and the vocab-budget forecaster (extrapolate V
    // at the 100 TB corpus from the deciles' β). NO fact-scale global
    // window: each word collapses to its FIRST doc (one groupBy), docs
    // to token counts (map-side), deciles are pure integer arithmetic
    // doc_id·10 div (max+1), and the cumulative/display windows ride
    // the 10-row decile frame. ln() only in the β display.
    Q("llm_heaps_law",
      """WITH dt AS (
        |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tn
        |  FROM documents
        |), b AS (
        |  SELECT CAST(max(doc_id) + 1 AS BIGINT) AS bb FROM dt
        |), td AS (
        |  SELECT CAST(doc_id * 10 // bb AS BIGINT) AS dec,
        |         CAST(count(*) AS BIGINT) AS nd,
        |         CAST(sum(tn) AS BIGINT) AS toks
        |  FROM dt CROSS JOIN b GROUP BY 1
        |), fw AS (
        |  SELECT w, CAST(min(doc_id) AS BIGINT) AS fd FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) GROUP BY w
        |), vd AS (
        |  SELECT CAST(fd * 10 // bb AS BIGINT) AS dec,
        |         CAST(count(*) AS BIGINT) AS nw
        |  FROM fw CROSS JOIN b GROUP BY 1
        |), j AS (
        |  SELECT coalesce(t.dec, v.dec) AS dec,
        |         coalesce(nd, 0) AS nd, coalesce(toks, 0) AS toks,
        |         coalesce(nw, 0) AS nw
        |  FROM td t FULL JOIN vd v ON t.dec = v.dec
        |), c0 AS (
        |  SELECT dec,
        |         CAST(sum(nd) OVER wo AS BIGINT) AS n_docs,
        |         CAST(sum(toks) OVER wo AS BIGINT) AS n_tokens,
        |         CAST(sum(nw) OVER wo AS BIGINT) AS vocab
        |  FROM j
        |  WINDOW wo AS (ORDER BY dec ROWS UNBOUNDED PRECEDING)
        |), c AS (
        |  SELECT dec, n_docs, n_tokens, vocab,
        |         CAST(first_value(n_tokens) OVER wf AS BIGINT) AS n0,
        |         CAST(first_value(vocab) OVER wf AS BIGINT) AS v0
        |  FROM c0
        |  WINDOW wf AS (ORDER BY dec ROWS BETWEEN UNBOUNDED PRECEDING
        |                AND UNBOUNDED FOLLOWING)
        |)
        |SELECT dec AS checkpoint, n_docs, n_tokens, vocab,
        |       floor((ln(CAST(vocab AS DOUBLE)) - ln(CAST(v0 AS DOUBLE)))
        |             / nullif(ln(CAST(n_tokens AS DOUBLE))
        |                      - ln(CAST(n0 AS DOUBLE)), 0)
        |             * 1000000) / 1000000 AS heaps_beta
        |FROM c ORDER BY dec""".stripMargin) { (s, d) =>
      val dt = docs(s, d)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tn"))
      val b = dt.agg((max(col("doc_id")) + 1).cast("long").as("bb"))
      val td = dt.crossJoin(broadcast(b))
        .select(expr("doc_id * 10 div bb").cast("long").as("dec"), col("tn"))
        .groupBy("dec")
        .agg(count(lit(1)).as("nd"), sum(col("tn")).as("toks"))
      val fw = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(min(col("doc_id")).as("fd"))
      val vd = fw.crossJoin(broadcast(b))
        .select(expr("fd * 10 div bb").cast("long").as("dec"))
        .groupBy("dec").agg(count(lit(1)).as("nw"))
      val j = td.as("t").join(vd.as("v"),
          col("t.dec") === col("v.dec"), "full_outer")
        .select(coalesce(col("t.dec"), col("v.dec")).as("dec"),
          coalesce(col("nd"), lit(0L)).as("nd"),
          coalesce(col("toks"), lit(0L)).as("toks"),
          coalesce(col("nw"), lit(0L)).as("nw"))
      val wo = Window.orderBy("dec")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = Window.orderBy("dec")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val c = j.select(col("dec"),
          sum(col("nd")).over(wo).as("n_docs"),
          sum(col("toks")).over(wo).as("n_tokens"),
          sum(col("nw")).over(wo).as("vocab"))
        .withColumn("n0", first(col("n_tokens")).over(wf))
        .withColumn("v0", first(col("vocab")).over(wf))
      c.select(col("dec").as("checkpoint"), col("n_docs"),
          col("n_tokens"), col("vocab"),
          (floor((log(col("vocab").cast("double"))
            - log(col("v0").cast("double")))
            / nullif(log(col("n_tokens").cast("double"))
              - log(col("n0").cast("double")), lit(0.0))
            * 1000000) / 1000000).as("heaps_beta"))
        .orderBy("checkpoint")
    },

    // Pairwise Jensen-Shannon divergence between source unigram
    // distributions (round 13, cont.): the symmetric, bounded corpus
    // mixing map — llm_source_mix_kl prices one source against the
    // corpus (asymmetric, unbounded); JSD gives every source PAIR a
    // [0, ln2] distance, the input to "which feeds are redundant"
    // mixing decisions. Float doctrine for a VOCAB-sized sum: each
    // common-word term is computed in ONE identical expression and
    // quantized per row to 1e-12-tick integers (the ulcer doctrine —
    // engine-order float summation over 10⁴⁺ words can drift in the
    // last ulp; an integer sum cannot), the zero-side mass folds in
    // CLOSED FORM ((1−Σp_common)/2·ln2 per side — no per-word term for
    // words the other source lacks). One tf self-join on word (word-dim
    // × bounded source domain), bounded pair report.
    Q("llm_jsd_sources", {
      val term = """CAST(round((CAST(ca AS DOUBLE) / na / 2
        * ln(2.0 * (CAST(ca AS DOUBLE) / na)
             / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb))
        + CAST(cb AS DOUBLE) / nb / 2
        * ln(2.0 * (CAST(cb AS DOUBLE) / nb)
             / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb)))
        * 1000000000000) AS BIGINT)""".replaceAll("\\s+", " ")
      val jsd = """(CAST(coalesce(stq, 0) AS DOUBLE) / 1000000000000
        + CAST(na - coalesce(sca, 0) AS DOUBLE) / na / 2 * ln(2.0)
        + CAST(nb - coalesce(scb, 0) AS DOUBLE) / nb / 2 * ln(2.0))"""
        .replaceAll("\\s+", " ")
      s"""WITH tf AS (
         |  SELECT source, w, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS w
         |    FROM documents) GROUP BY 1, 2
         |), tot AS (
         |  SELECT source, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY 1
         |), jj AS (
         |  SELECT a.source AS s1, b.source AS s2, a.c AS ca, b.c AS cb,
         |         ta.n AS na, tb.n AS nb
         |  FROM tf a JOIN tf b ON a.w = b.w AND a.source < b.source
         |  JOIN tot ta ON ta.source = a.source
         |  JOIN tot tb ON tb.source = b.source
         |), com AS (
         |  SELECT s1, s2, CAST(count(*) AS BIGINT) AS cw,
         |         CAST(sum($term) AS BIGINT) AS stq,
         |         CAST(sum(ca) AS BIGINT) AS sca,
         |         CAST(sum(cb) AS BIGINT) AS scb
         |  FROM jj GROUP BY 1, 2
         |), pr AS (
         |  SELECT a.source AS s1, b.source AS s2, a.n AS na, b.n AS nb
         |  FROM tot a JOIN tot b ON a.source < b.source
         |)
         |SELECT s1, s2, coalesce(cw, 0) AS n_common,
         |       floor($jsd * 1000000) / 1000000 AS jsd_nats,
         |       floor($jsd / ln(2.0) * 1000000) / 1000000 AS jsd_norm
         |FROM pr LEFT JOIN com USING (s1, s2)
         |ORDER BY s1, s2""".stripMargin
    }) { (s, d) =>
      val term = """CAST(round((CAST(ca AS DOUBLE) / na / 2
        * ln(2.0 * (CAST(ca AS DOUBLE) / na)
             / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb))
        + CAST(cb AS DOUBLE) / nb / 2
        * ln(2.0 * (CAST(cb AS DOUBLE) / nb)
             / (CAST(ca AS DOUBLE) / na + CAST(cb AS DOUBLE) / nb)))
        * 1000000000000) AS BIGINT)""".replaceAll("\\s+", " ")
      val jsd = """(CAST(coalesce(stq, 0) AS DOUBLE) / 1000000000000
        + CAST(na - coalesce(sca, 0) AS DOUBLE) / na / 2 * ln(2.0)
        + CAST(nb - coalesce(scb, 0) AS DOUBLE) / nb / 2 * ln(2.0))"""
        .replaceAll("\\s+", " ")
      val tf = docs(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      val tot = tf.groupBy("source").agg(sum(col("c")).as("n"))
      val jj = tf.as("a")
        .join(tf.as("b"),
          col("a.w") === col("b.w") && col("a.source") < col("b.source"))
        .select(col("a.source").as("s1"), col("b.source").as("s2"),
          col("a.c").as("ca"), col("b.c").as("cb"))
        .join(tot.select(col("source").as("s1"), col("n").as("na")),
          Seq("s1"))
        .join(tot.select(col("source").as("s2"), col("n").as("nb")),
          Seq("s2"))
      val com = jj.groupBy("s1", "s2")
        .agg(count(lit(1)).as("cw"), sum(expr(term)).as("stq"),
          sum(col("ca")).as("sca"), sum(col("cb")).as("scb"))
      val pr = tot.as("x")
        .join(tot.as("y"), col("x.source") < col("y.source"))
        .select(col("x.source").as("s1"), col("y.source").as("s2"),
          col("x.n").as("na"), col("y.n").as("nb"))
      pr.join(com, Seq("s1", "s2"), "left")
        .select(col("s1"), col("s2"),
          coalesce(col("cw"), lit(0L)).as("n_common"),
          (floor(expr(jsd) * 1000000) / 1000000).as("jsd_nats"),
          (floor(expr(jsd) / expr("ln(2.0)") * 1000000) / 1000000)
            .as("jsd_norm"))
        .orderBy("s1", "s2")
    },

    // Cross-split exact leakage (round 13, cont.): val/test docs whose
    // EXACT text fingerprint also appears in train under the pinned
    // hash-split rule — the leak llm_split_novelty's trigram novelty
    // blurs over and llm_decontaminate (benchmark overlap) doesn't look
    // for: verbatim duplicates straddling the split boundary inflate
    // eval scores one-for-one. One fingerprint pass (PortableHash of
    // the full text — both engines), one distinct train-hash set, one
    // semi-mark join per eval split; exact counts, bounded 2-row
    // report.
    Q("llm_cross_split_dups", {
      val split = s"""CASE WHEN ${PortableHash.sql(
        "CAST(doc_id AS VARCHAR)")} % 100 < 98 THEN 'train'
        |              WHEN ${PortableHash.sql(
        "CAST(doc_id AS VARCHAR)")} % 100 = 98 THEN 'val'
        |              ELSE 'test' END""".stripMargin
      s"""WITH fp AS (
         |  SELECT doc_id, $split AS split,
         |         ${PortableHash.sql("text")} AS h
         |  FROM documents
         |), tr AS (
         |  SELECT DISTINCT h FROM fp WHERE split = 'train'
         |)
         |SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN h IN (SELECT h FROM tr)
         |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked,
         |       round(CAST(sum(CASE WHEN h IN (SELECT h FROM tr)
         |                          THEN 1 ELSE 0 END) AS DOUBLE)
         |             / count(*), 6) AS leak_rate
         |FROM fp WHERE split <> 'train'
         |GROUP BY split ORDER BY split""".stripMargin
    }) { (s, d) =>
      val b = pmod(PortableHash.pHash(col("doc_id").cast("string")), lit(100))
      val fp = docs(s, d).select(
        when(b < 98, "train").when(b === 98, "val").otherwise("test")
          .as("split"),
        PortableHash.pHash(col("text")).as("h"))
      val tr = fp.where(col("split") === "train")
        .select(col("h").as("th")).distinct()
        .withColumn("m", lit(1))
      fp.where(col("split") =!= "train")
        .join(tr, col("h") === col("th"), "left")
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("m").isNotNull, 1L).otherwise(0L)).as("n_leaked"))
        .select(col("split"), col("n_docs"), col("n_leaked"),
          round(col("n_leaked").cast("double") / col("n_docs"), 6)
            .as("leak_rate"))
        .orderBy("split")
    },

    // Davies-Bouldin clustering quality (round 13, cont.): per label,
    // the worst-case (sᵢ + sⱼ)/dᵢⱼ ratio against every other cluster —
    // compact, well-separated clusters score low; the internal-validity
    // readout llm_cluster_purity (external) can't give when no truth
    // labels exist. Plan shape: per-dim centroid sums are ONE
    // posexplode groupBy over the bounded (label × 64) domain; each
    // row's distance TO ITS OWN centroid is an in-row 64-term fold
    // (exact tick integers xi·n − s, the center_project idiom)
    // quantized per row to 1e-6 ticks so the per-label scatter sum is
    // exact BIGINT (ulcer doctrine); centroid-pair distances and the
    // max-ratio fold ride the BOUNDED label-pair domain. No pair join
    // ever touches the vectors.
    Q("llm_cluster_db_index",
      """WITH xv AS (
        |  SELECT label,
        |         list_transform(embedding, v ->
        |           CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT))
        |           AS xi
        |  FROM embeddings
        |), dims AS (SELECT unnest(range(1, 65)) AS i
        |), cent AS (
        |  SELECT label, i,
        |         CAST(sum(xi[CAST(i AS INT)]) AS BIGINT) AS s
        |  FROM xv, dims GROUP BY label, i
        |), nl AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n FROM xv GROUP BY label
        |), cl AS (
        |  SELECT c.label, list(s ORDER BY i) AS sv, max(n.n) AS n
        |  FROM cent c JOIN nl n ON c.label = n.label GROUP BY c.label
        |), dq AS (
        |  SELECT x.label,
        |         CAST(round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, 65), j ->
        |             (CAST(x.xi[CAST(j AS INT)] * c.n - c.sv[CAST(j AS INT)]
        |                   AS DOUBLE) / c.n / 10000000)
        |             * (CAST(x.xi[CAST(j AS INT)] * c.n - c.sv[CAST(j AS INT)]
        |                     AS DOUBLE) / c.n / 10000000))),
        |           (a, b) -> a + b)) * 1000000) AS BIGINT) AS d6
        |  FROM xv x JOIN cl c ON x.label = c.label
        |), sc AS (
        |  SELECT label, CAST(sum(d6) AS BIGINT) AS sd
        |  FROM dq GROUP BY label
        |), scat AS (
        |  SELECT s.label, CAST(s.sd AS DOUBLE) / n.n / 1000000 AS si, n.n
        |  FROM sc s JOIN nl n ON s.label = n.label
        |), cd AS (
        |  SELECT a.label AS la, b.label AS lb,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, 65), j ->
        |             ((CAST(a.sv[CAST(j AS INT)] AS DOUBLE) / a.n
        |               - CAST(b.sv[CAST(j AS INT)] AS DOUBLE) / b.n)
        |              / 10000000)
        |             * ((CAST(a.sv[CAST(j AS INT)] AS DOUBLE) / a.n
        |                 - CAST(b.sv[CAST(j AS INT)] AS DOUBLE) / b.n)
        |                / 10000000))),
        |           (a, b) -> a + b)) AS dij
        |  FROM cl a JOIN cl b ON a.label <> b.label
        |), r AS (
        |  SELECT cd.la AS label,
        |         max((x.si + y.si) / dij) AS ri
        |  FROM cd JOIN scat x ON x.label = cd.la
        |  JOIN scat y ON y.label = cd.lb
        |  GROUP BY cd.la
        |)
        |SELECT CAST(s.label AS BIGINT) AS label, CAST(s.n AS BIGINT)
        |         AS n_vecs,
        |       floor(s.si * 1000000) / 1000000 AS scatter,
        |       floor(r.ri * 1000000) / 1000000 AS db_ratio
        |FROM scat s JOIN r ON s.label = r.label
        |ORDER BY label""".stripMargin) { (s, d) =>
      val xv = emb(s, d).select(col("label"), expr(
        """transform(embedding, v ->
          |  CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT))"""
          .stripMargin).as("xi"))
      val cent = xv.select(col("label"), posexplode(col("xi")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("col")).as("s"))
      val nl = xv.groupBy("label").agg(count(lit(1)).as("n"))
      val cl = cent.groupBy("label")
        .agg(expr("transform(sort_array(collect_list(struct(pos, s)))," +
          " x -> x.s)").as("sv"))
        .join(nl, Seq("label"))
      val dq = xv.join(cl.select(col("label"), col("sv"), col("n")),
          Seq("label"))
        .select(col("label"), expr(
          """CAST(round(sqrt(aggregate(transform(sequence(1, 64), j ->
            |  (CAST(element_at(xi, j) * n - element_at(sv, j) AS DOUBLE)
            |   / n / 10000000)
            |  * (CAST(element_at(xi, j) * n - element_at(sv, j) AS DOUBLE)
            |     / n / 10000000)),
            |  CAST(0 AS DOUBLE), (a, b) -> a + b)) * 1000000) AS BIGINT)"""
            .stripMargin).as("d6"))
      val scat = dq.groupBy("label").agg(sum(col("d6")).as("sd"))
        .join(nl, Seq("label"))
        .select(col("label"),
          (col("sd").cast("double") / col("n") / 1000000).as("si"), col("n"))
      val cd = cl.select(col("label").as("la"), col("sv").as("asv"),
          col("n").as("an"))
        .join(cl.select(col("label").as("lb"), col("sv").as("bsv"),
          col("n").as("bn")), col("la") =!= col("lb"))
        .select(col("la"), col("lb"), expr(
          """sqrt(aggregate(transform(sequence(1, 64), j ->
            |  ((CAST(element_at(asv, j) AS DOUBLE) / an
            |    - CAST(element_at(bsv, j) AS DOUBLE) / bn) / 10000000)
            |  * ((CAST(element_at(asv, j) AS DOUBLE) / an
            |      - CAST(element_at(bsv, j) AS DOUBLE) / bn) / 10000000)),
            |  CAST(0 AS DOUBLE), (a, b) -> a + b))""".stripMargin).as("dij"))
      val r = cd
        .join(scat.select(col("label").as("la"), col("si").as("sia")),
          Seq("la"))
        .join(scat.select(col("label").as("lb"), col("si").as("sib")),
          Seq("lb"))
        .groupBy(col("la").as("label"))
        .agg(max((col("sia") + col("sib")) / col("dij")).as("ri"))
      scat.join(r, Seq("label"))
        .select(col("label").cast("long").as("label"),
          col("n").as("n_vecs"),
          (floor(col("si") * 1000000) / 1000000).as("scatter"),
          (floor(col("ri") * 1000000) / 1000000).as("db_ratio"))
        .orderBy("label")
    },

    // Calinski-Harabasz index (round 13, cont.): between-cluster over
    // within-cluster variance, (BCSS/(k−1))/(WCSS/(n−k)) — the
    // variance-ratio companion to llm_cluster_db_index (DB prices the
    // WORST pair; CH prices the whole partition, and is the criterion
    // k-selection sweeps maximize). Same bounded centroid machinery:
    // per-dim sums via ONE posexplode groupBy; WCSS = per-row squared
    // distance to own centroid, exact-tick fold quantized per row to
    // 1e-6 (ulcer doctrine) so the sum is exact BIGINT; BCSS = per-label
    // nᵢ·‖cᵢ−g‖² over the bounded label domain, same quantization. One
    // fixed final expression.
    Q("llm_calinski_harabasz",
      """WITH xv AS (
        |  SELECT label,
        |         list_transform(embedding, v ->
        |           CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT))
        |           AS xi
        |  FROM embeddings
        |), dims AS (SELECT unnest(range(1, 65)) AS i
        |), cent AS (
        |  SELECT label, i,
        |         CAST(sum(xi[CAST(i AS INT)]) AS BIGINT) AS s
        |  FROM xv, dims GROUP BY label, i
        |), nl AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n FROM xv GROUP BY label
        |), cl AS (
        |  SELECT c.label, list(s ORDER BY i) AS sv, max(n.n) AS nn
        |  FROM cent c JOIN nl n ON c.label = n.label GROUP BY c.label
        |), gl AS (
        |  SELECT list(gs ORDER BY i) AS gv FROM (
        |    SELECT i, CAST(sum(s) AS BIGINT) AS gs FROM cent GROUP BY i)
        |), tot AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n,
        |         CAST(count(DISTINCT label) AS BIGINT) AS k
        |  FROM xv
        |), w2 AS (
        |  SELECT CAST(sum(CAST(round(list_reduce(list_prepend(
        |           CAST(0 AS DOUBLE),
        |           list_transform(range(1, 65), j ->
        |             (CAST(x.xi[CAST(j AS INT)] * c.nn - c.sv[CAST(j AS INT)]
        |                   AS DOUBLE) / c.nn / 10000000)
        |             * (CAST(x.xi[CAST(j AS INT)] * c.nn - c.sv[CAST(j AS INT)]
        |                     AS DOUBLE) / c.nn / 10000000))),
        |           (a, b) -> a + b) * 1000000) AS BIGINT)) AS BIGINT) AS swc
        |  FROM xv x JOIN cl c ON x.label = c.label
        |), b2 AS (
        |  SELECT CAST(sum(CAST(round(CAST(c.nn AS DOUBLE)
        |           * list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |             list_transform(range(1, 65), j ->
        |               ((CAST(c.sv[CAST(j AS INT)] AS DOUBLE) / c.nn
        |                 - CAST(gv[CAST(j AS INT)] AS DOUBLE) / tot.n)
        |                / 10000000)
        |               * ((CAST(c.sv[CAST(j AS INT)] AS DOUBLE) / c.nn
        |                   - CAST(gv[CAST(j AS INT)] AS DOUBLE) / tot.n)
        |                  / 10000000))),
        |             (a, b) -> a + b) * 1000000) AS BIGINT)) AS BIGINT) AS sbc
        |  FROM cl c CROSS JOIN gl CROSS JOIN tot
        |)
        |SELECT n, k,
        |       floor(CAST(swc AS DOUBLE) / 1000000 * 1000000) / 1000000
        |         AS wcss,
        |       floor(CAST(sbc AS DOUBLE) / 1000000 * 1000000) / 1000000
        |         AS bcss,
        |       floor((CAST(sbc AS DOUBLE) / 1000000 / (k - 1))
        |             / (CAST(swc AS DOUBLE) / 1000000 / (n - k))
        |             * 1000000) / 1000000 AS ch_index
        |FROM tot CROSS JOIN w2 CROSS JOIN b2""".stripMargin) { (s, d) =>
      val xv = emb(s, d).select(col("label"), expr(
        """transform(embedding, v ->
          |  CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT))"""
          .stripMargin).as("xi"))
      val cent = xv.select(col("label"), posexplode(col("xi")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("col")).as("s"))
      val nl = xv.groupBy("label").agg(count(lit(1)).as("n"))
      val cl = cent.groupBy("label")
        .agg(expr("transform(sort_array(collect_list(struct(pos, s)))," +
          " x -> x.s)").as("sv"))
        .join(nl.select(col("label"), col("n").as("nn")), Seq("label"))
      val gl = cent.groupBy("pos").agg(sum(col("s")).as("gs"))
        .agg(expr("transform(sort_array(collect_list(struct(pos, gs)))," +
          " x -> x.gs)").as("gv"))
      val tot = xv.agg(count(lit(1)).as("n"),
        countDistinct(col("label")).as("k"))
      val w2 = xv.join(cl, Seq("label"))
        .agg(sum(expr(
          """CAST(round(aggregate(transform(sequence(1, 64), j ->
            |  (CAST(element_at(xi, j) * nn - element_at(sv, j) AS DOUBLE)
            |   / nn / 10000000)
            |  * (CAST(element_at(xi, j) * nn - element_at(sv, j) AS DOUBLE)
            |     / nn / 10000000)),
            |  CAST(0 AS DOUBLE), (a, b) -> a + b) * 1000000) AS BIGINT)"""
            .stripMargin)).as("swc"))
      val b2 = cl.crossJoin(broadcast(gl))
        .crossJoin(broadcast(tot.select(col("n").as("tn"))))
        .agg(sum(expr(
          """CAST(round(CAST(nn AS DOUBLE)
            |  * aggregate(transform(sequence(1, 64), j ->
            |      ((CAST(element_at(sv, j) AS DOUBLE) / nn
            |        - CAST(element_at(gv, j) AS DOUBLE) / tn) / 10000000)
            |      * ((CAST(element_at(sv, j) AS DOUBLE) / nn
            |          - CAST(element_at(gv, j) AS DOUBLE) / tn) / 10000000)),
            |    CAST(0 AS DOUBLE), (a, b) -> a + b) * 1000000) AS BIGINT)"""
            .stripMargin)).as("sbc"))
      tot.crossJoin(w2).crossJoin(b2)
        .select(col("n"), col("k"),
          (floor(col("swc").cast("double") / 1000000 * 1000000) / 1000000)
            .as("wcss"),
          (floor(col("sbc").cast("double") / 1000000 * 1000000) / 1000000)
            .as("bcss"),
          (floor((col("sbc").cast("double") / 1000000 / (col("k") - 1))
            / (col("swc").cast("double") / 1000000 / (col("n") - col("k")))
            * 1000000) / 1000000).as("ch_index"))
    },

    // Simplified silhouette (round 13, cont.; Hruschka et al.'s
    // centroid-based variant): per label, mean of sᵢ = (bᵢ−aᵢ)/max(aᵢ,bᵢ)
    // where aᵢ = distance to OWN centroid and bᵢ = min distance to any
    // OTHER centroid — the per-POINT cohesion/separation readout the
    // two partition-level indices (DB, CH) average away, at O(n·k)
    // instead of true silhouette's O(n²). Every per-row distance is the
    // exact-tick 64-term fold (center_project idiom) against the
    // BROADCAST 10-row centroid frame; aᵢ, bᵢ and sᵢ compose per row
    // and sᵢ quantizes to 1e-6 integers so the per-label mean rides an
    // exact BIGINT sum (ulcer doctrine).
    Q("llm_silhouette_simplified",
      """WITH xv AS (
        |  SELECT vec_id, label,
        |         list_transform(embedding, v ->
        |           CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT))
        |           AS xi
        |  FROM embeddings
        |), dims AS (SELECT unnest(range(1, 65)) AS i
        |), cent AS (
        |  SELECT label, i,
        |         CAST(sum(xi[CAST(i AS INT)]) AS BIGINT) AS s
        |  FROM xv, dims GROUP BY label, i
        |), nl AS (
        |  SELECT label, CAST(count(*) AS BIGINT) AS n FROM xv GROUP BY label
        |), cl AS (
        |  SELECT c.label AS clabel, list(s ORDER BY i) AS sv, max(n.n) AS nn
        |  FROM cent c JOIN nl n ON c.label = n.label GROUP BY c.label
        |), dist AS (
        |  SELECT x.vec_id, x.label, c.clabel,
        |         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
        |           list_transform(range(1, 65), j ->
        |             (CAST(x.xi[CAST(j AS INT)] * c.nn - c.sv[CAST(j AS INT)]
        |                   AS DOUBLE) / c.nn / 10000000)
        |             * (CAST(x.xi[CAST(j AS INT)] * c.nn - c.sv[CAST(j AS INT)]
        |                     AS DOUBLE) / c.nn / 10000000))),
        |           (a, b) -> a + b)) AS dd
        |  FROM xv x CROSS JOIN cl c
        |), ab AS (
        |  SELECT vec_id, label,
        |         max(CASE WHEN label = clabel THEN dd END) AS a,
        |         min(CASE WHEN label <> clabel THEN dd END) AS b
        |  FROM dist GROUP BY vec_id, label
        |), sq AS (
        |  SELECT label,
        |         CAST(round((b - a) / greatest(a, b) * 1000000) AS BIGINT)
        |           AS s6
        |  FROM ab WHERE greatest(a, b) > 0
        |)
        |SELECT CAST(label AS BIGINT) AS label,
        |       CAST(count(*) AS BIGINT) AS n_vecs,
        |       floor(CAST(sum(s6) AS DOUBLE) / count(*)) / 1000000
        |         AS mean_silhouette
        |FROM sq GROUP BY label ORDER BY label""".stripMargin) { (s, d) =>
      val xv = emb(s, d).select(col("vec_id"), col("label"), expr(
        """transform(embedding, v ->
          |  CAST(round(CAST(v AS DOUBLE) * 10000000) AS BIGINT))"""
          .stripMargin).as("xi"))
      val cent = xv.select(col("label"), posexplode(col("xi")))
        .groupBy(col("label"), col("pos"))
        .agg(sum(col("col")).as("s"))
      val nl = xv.groupBy("label").agg(count(lit(1)).as("n"))
      val cl = cent.groupBy("label")
        .agg(expr("transform(sort_array(collect_list(struct(pos, s)))," +
          " x -> x.s)").as("sv"))
        .join(nl.select(col("label"), col("n").as("nn")), Seq("label"))
        .select(col("label").as("clabel"), col("sv"), col("nn"))
      val dist = xv.crossJoin(broadcast(cl))
        .select(col("vec_id"), col("label"), col("clabel"), expr(
          """sqrt(aggregate(transform(sequence(1, 64), j ->
            |  (CAST(element_at(xi, j) * nn - element_at(sv, j) AS DOUBLE)
            |   / nn / 10000000)
            |  * (CAST(element_at(xi, j) * nn - element_at(sv, j) AS DOUBLE)
            |     / nn / 10000000)),
            |  CAST(0 AS DOUBLE), (a, b) -> a + b))""".stripMargin).as("dd"))
      val ab = dist.groupBy("vec_id", "label")
        .agg(max(when(col("label") === col("clabel"), col("dd"))).as("a"),
          min(when(col("label") =!= col("clabel"), col("dd"))).as("b"))
      val sq = ab.where(greatest(col("a"), col("b")) > 0)
        .select(col("label"),
          round((col("b") - col("a")) / greatest(col("a"), col("b"))
            * 1000000).cast("long").as("s6"))
      sq.groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n_vecs"),
          (floor(sum(col("s6")).cast("double") / count(lit(1))) / 1000000)
            .as("mean_silhouette"))
        .orderBy("label")
    },

    // Held-out bigram perplexity by split (round 13, cont.): train an
    // add-one-smoothed bigram LM on the train split alone, score ALL
    // three splits — the in-sample vs held-out perplexity gap is the
    // memorization/generalization readout (llm_bigram_lm_score trains
    // and scores on the same corpus, so it cannot see overfit; a val
    // perplexity far above train means the LM memorized its training
    // bigrams, exactly what a data pipeline must know before trusting
    // LM-based quality scores). Same pinned hash split as
    // llm_split_assign; the per-bigram ln((c₂+1)/(c₁+V)) quantizes per
    // row to 1e-9 integers so per-split sums are exact BIGINT (ulcer
    // doctrine); one exp per split row.
    Q("llm_bigram_perplexity_split", {
      val split = s"""CASE WHEN ${PortableHash.sql(
        "CAST(doc_id AS VARCHAR)")} % 100 < 98 THEN 'train'
        |              WHEN ${PortableHash.sql(
        "CAST(doc_id AS VARCHAR)")} % 100 = 98 THEN 'val'
        |              ELSE 'test' END""".stripMargin
      s"""WITH bg AS (
         |  SELECT $split AS split,
         |         toks[CAST(x AS INT)] AS w1,
         |         toks[CAST(x AS INT) + 1] AS w2
         |  FROM (
         |    SELECT doc_id, toks, unnest(range(1, len(toks))) AS x
         |    FROM (SELECT doc_id, string_split(text, ' ') AS toks
         |          FROM documents))
         |), cb AS (
         |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg
         |  WHERE split = 'train' GROUP BY w1, w2
         |), c1 AS (
         |  SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bg
         |  WHERE split = 'train' GROUP BY w1
         |), v AS (
         |  SELECT CAST(count(*) AS BIGINT) AS v FROM c1
         |), z AS (
         |  SELECT split,
         |         CAST(count(*) AS BIGINT) AS n_bigrams,
         |         CAST(sum(CAST(round(ln(
         |           (CAST(coalesce(cb.c2, 0) + 1 AS DOUBLE))
         |           / (CAST(coalesce(c1.c1, 0) AS DOUBLE) + v.v))
         |           * 1000000000) AS BIGINT)) AS BIGINT) AS sl
         |  FROM bg LEFT JOIN cb USING (w1, w2)
         |  LEFT JOIN c1 USING (w1) CROSS JOIN v
         |  GROUP BY split
         |)
         |SELECT split, n_bigrams,
         |       floor(CAST(sl AS DOUBLE) / n_bigrams / 1000000000 * 1000000)
         |         / 1000000 AS avg_logp,
         |       floor(exp(-(CAST(sl AS DOUBLE) / n_bigrams / 1000000000))
         |             * 10000) / 10000 AS perplexity
         |FROM z ORDER BY split""".stripMargin
    }) { (s, d) =>
      val b = pmod(PortableHash.pHash(col("doc_id").cast("string")), lit(100))
      val bg = docs(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 2)
        .select(
          when(b < 98, "train").when(b === 98, "val").otherwise("test")
            .as("split"),
          explode(expr(
            """transform(slice(toks, 1, size(toks) - 1),
              |  (x, i) -> struct(x AS w1,
              |                   element_at(toks, i + 2) AS w2))"""
              .stripMargin)).as("g"))
        .select(col("split"), col("g.w1").as("w1"), col("g.w2").as("w2"))
      val train = bg.where(col("split") === "train")
      val cb = train.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
      val v = c1.agg(count(lit(1)).as("v"))
      val z = bg
        .join(cb, Seq("w1", "w2"), "left")
        .join(c1, Seq("w1"), "left")
        .crossJoin(broadcast(v))
        .groupBy("split")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(round(log(
            (coalesce(col("c2"), lit(0L)) + 1).cast("double")
              / (coalesce(col("c1"), lit(0L)).cast("double") + col("v")))
            * 1000000000).cast("long")).as("sl"))
      z.select(col("split"), col("n_bigrams"),
          (floor(col("sl").cast("double") / col("n_bigrams") / 1000000000L
            * 1000000) / 1000000).as("avg_logp"),
          (floor(exp(-(col("sl").cast("double") / col("n_bigrams")
            / 1000000000L)) * 10000) / 10000).as("perplexity"))
        .orderBy("split")
    },

    // Rank-biased overlap + Kendall τ between the two lexical scorers
    // (round 13, cont.; Webber/Moffat/Zobel 2010): how much do BM25 and
    // query-likelihood actually AGREE on this corpus — the measurement
    // that justifies (or kills) running llm_rrf_fusion at all (RBO≈1 ⇒
    // fusion is redundant; low RBO with good individual recall ⇒ fusion
    // buys diversity). RBO@50, p=0.9, via the per-doc closed form: a
    // doc in both top-50s contributes coef(m) = (1−p)·Σ_{d=m}^{50}
    // p^{d−1}/d with m = max(ra, rb) — the 50-row coefficient table is
    // an in-row fold, per-doc coefs quantize to 1e-12 integers so the
    // sum is exact (ulcer doctrine). Kendall τ rides the ≤50-row common
    // set (bounded pair join, exact integer concordance counts). Ranks
    // come from the scorers' own pinned (score DESC, doc_id) orders.
    Q("llm_rbo_scorers",
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents
        |), dl AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok
        |  GROUP BY doc_id
        |), stats AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
        |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
        |  FROM dl
        |), tf AS (
        |  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf FROM tok
        |  WHERE token IN ('hash', 'join', 'window')
        |  GROUP BY doc_id, token
        |), df AS (
        |  SELECT token, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY token
        |), bm AS (
        |  SELECT doc_id,
        |         round(sum(ln(1 + (n_docs - df + 0.5) / (df + 0.5))
        |                   * (CAST(tf AS DOUBLE) * 2.2)
        |                   / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
        |           AS score
        |  FROM tf JOIN df USING (token) JOIN dl USING (doc_id)
        |  CROSS JOIN stats GROUP BY doc_id
        |), bmr AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |              AS BIGINT) AS ra
        |  FROM (SELECT doc_id, score FROM bm
        |        ORDER BY score DESC, doc_id LIMIT 50)
        |), cfq AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS cf FROM tok
        |  WHERE token IN ('hash', 'join', 'window') GROUP BY token
        |), consts AS (
        |  SELECT CAST((SELECT sum(dl) FROM dl) AS BIGINT) AS ct,
        |         max(CASE WHEN token = 'hash' THEN cf END) AS ch,
        |         max(CASE WHEN token = 'join' THEN cf END) AS cj,
        |         max(CASE WHEN token = 'window' THEN cf END) AS cw
        |  FROM cfq
        |), z AS (
        |  SELECT doc_id,
        |         CAST(sum(CAST(round(
        |           (ln(CAST(tf AS DOUBLE) + 100.0 * cfq.cf / consts.ct)
        |            - ln(100.0 * cfq.cf / consts.ct)) * 1000000000)
        |           AS BIGINT)) AS BIGINT) AS sz
        |  FROM tf JOIN cfq USING (token) CROSS JOIN consts
        |  GROUP BY doc_id
        |), qls AS (
        |  SELECT doc_id,
        |         floor((ln(100.0 * ch / ct) + ln(100.0 * cj / ct)
        |                + ln(100.0 * cw / ct)
        |                - 3 * ln(CAST(dl AS DOUBLE) + 100.0)
        |                + CAST(coalesce(sz, 0) AS DOUBLE) / 1000000000)
        |               * 1000000) / 1000000 AS score
        |  FROM dl LEFT JOIN z USING (doc_id) CROSS JOIN consts
        |), qlr AS (
        |  SELECT doc_id,
        |         CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |              AS BIGINT) AS rb
        |  FROM (SELECT doc_id, score FROM qls
        |        ORDER BY score DESC, doc_id LIMIT 50)
        |), common AS (
        |  SELECT a.doc_id, ra, rb, greatest(ra, rb) AS m
        |  FROM bmr a JOIN qlr b ON a.doc_id = b.doc_id
        |), coef AS (
        |  SELECT m,
        |         CAST(round(0.1 * list_reduce(list_prepend(
        |             CAST(0 AS DOUBLE),
        |             list_transform(range(CAST(m AS INT), 51), d ->
        |               pow(0.9, d - 1) / d)),
        |           (a, b) -> a + b) * 1000000000000) AS BIGINT) AS c12
        |  FROM (SELECT unnest(range(1, 51)) AS m)
        |), rbo AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_common,
        |         CAST(coalesce(sum(c12), 0) AS BIGINT) AS s12
        |  FROM common JOIN coef USING (m)
        |), tau AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(CASE WHEN (a.ra < b.ra) = (a.rb < b.rb)
        |                       THEN 1 ELSE -1 END) AS BIGINT) AS s
        |  FROM common a JOIN common b ON a.doc_id < b.doc_id
        |)
        |SELECT n_common,
        |       floor(CAST(s12 AS DOUBLE) / 1000000000000 * 1000000)
        |         / 1000000 AS rbo,
        |       floor(CAST(s AS DOUBLE) / nullif(n_pairs, 0) * 1000000)
        |         / 1000000 AS kendall_tau
        |FROM rbo CROSS JOIN tau""".stripMargin) { (s, d) =>
      val qterms = Seq("hash", "join", "window")
      val tok = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      val dl = tok.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      val stats = dl.agg(
        count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = tok.where(col("token").isin(qterms: _*))
        .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      val df = tf.groupBy("token").agg(count(lit(1)).cast("double").as("df"))
      val idf = log(lit(1) + (col("n_docs") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
      val contrib = idf * (col("tf") * lit(2.2)) /
        (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))
      val bm = tf.join(broadcast(df), Seq("token"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .groupBy("doc_id")
        .agg(round(sum(contrib), 6).as("score"))
      val wRank = Window.orderBy(col("score").desc, col("doc_id"))
      val bmr = bm.orderBy(col("score").desc, col("doc_id")).limit(50)
        .withColumn("ra", row_number().over(wRank).cast("long"))
        .select("doc_id", "ra")
      val cfq = tok.where(col("token").isin(qterms: _*))
        .groupBy("token").agg(count(lit(1)).as("cf"))
      val consts = cfq
        .agg(max(when(col("token") === "hash", col("cf"))).as("ch"),
          max(when(col("token") === "join", col("cf"))).as("cj"),
          max(when(col("token") === "window", col("cf"))).as("cw"))
        .crossJoin(dl.agg(sum(col("dl")).as("ct")))
      val z = tf.join(broadcast(cfq), Seq("token"))
        .crossJoin(broadcast(consts))
        .groupBy("doc_id")
        .agg(sum(expr(
          """CAST(round((ln(CAST(tf AS DOUBLE) + 100.0 * cf / ct)
            |             - ln(100.0 * cf / ct)) * 1000000000) AS BIGINT)"""
            .stripMargin)).as("sz"))
      val qls = dl.join(z, Seq("doc_id"), "left")
        .crossJoin(broadcast(consts))
        .select(col("doc_id"),
          (floor((expr("ln(100.0 * ch / ct) + ln(100.0 * cj / ct)"
            + " + ln(100.0 * cw / ct)")
            - lit(3) * expr("ln(CAST(dl AS DOUBLE) + 100.0)")
            + coalesce(col("sz"), lit(0L)).cast("double") / 1000000000L)
            * 1000000) / 1000000).as("score"))
      val qlr = qls.orderBy(col("score").desc, col("doc_id")).limit(50)
        .withColumn("rb", row_number().over(wRank).cast("long"))
        .select(col("doc_id").as("qdoc"), col("rb"))
      val common = bmr.join(qlr, col("doc_id") === col("qdoc"))
        .select(col("doc_id"), col("ra"), col("rb"),
          greatest(col("ra"), col("rb")).as("m"))
        .localCheckpoint()
      val coefDf = s.range(1, 51).select(col("id").as("m"), expr(
        """CAST(round(0.1 * aggregate(
          |  transform(sequence(CAST(m AS INT), 50), d ->
          |    pow(0.9, d - 1) / d),
          |  CAST(0 AS DOUBLE), (a, b) -> a + b) * 1000000000000)
          |AS BIGINT)""".stripMargin).as("c12"))
      val rbo = common.join(broadcast(coefDf), Seq("m"))
        .agg(count(lit(1)).as("n_common"),
          coalesce(sum(col("c12")), lit(0L)).as("s12"))
      val tau = common.as("a")
        .join(common.as("b"), col("a.doc_id") < col("b.doc_id"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when((col("a.ra") < col("b.ra")) === (col("a.rb") < col("b.rb")),
            1L).otherwise(-1L)).as("s"))
      rbo.crossJoin(tau)
        .select(col("n_common"),
          (floor(col("s12").cast("double") / 1000000000000L * 1000000)
            / 1000000).as("rbo"),
          (floor(col("s").cast("double") / nullif(col("n_pairs"), lit(0L))
            * 1000000) / 1000000).as("kendall_tau"))
    },

    // Per-source token-length quantiles (round 13, cont.): p10/p50/p90
    // of document token counts by source — the curation readout that
    // decides per-source chunking and length-filter policy (a global
    // histogram — llm_token_len_hist — hides that one feed is all
    // tweets and another all books; the same length filter cannot
    // serve both). Token counts exact integers; quantiles via the
    // pinned interpolated percentile pair; bounded per-source report.
    Q("llm_len_quantiles_source",
      """WITH n AS (
        |  SELECT source,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tn
        |  FROM documents
        |)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(min(tn) AS BIGINT) AS min_tokens,
        |       round(quantile_cont(CAST(tn AS DOUBLE), 0.1), 4) AS p10,
        |       round(quantile_cont(CAST(tn AS DOUBLE), 0.5), 4) AS p50,
        |       round(quantile_cont(CAST(tn AS DOUBLE), 0.9), 4) AS p90,
        |       CAST(max(tn) AS BIGINT) AS max_tokens
        |FROM n GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      docs(s, d)
        .select(col("source"),
          size(split(col("text"), " ")).cast("long").as("tn"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          min(col("tn")).as("min_tokens"),
          round(percentile(col("tn").cast("double"), lit(0.1)), 4).as("p10"),
          round(percentile(col("tn").cast("double"), lit(0.5)), 4).as("p50"),
          round(percentile(col("tn").cast("double"), lit(0.9)), 4).as("p90"),
          max(col("tn")).as("max_tokens"))
        .orderBy("source")
    },

    // Term burstiness (round 13, cont.; Church & Gale 1995): for the
    // top-20 corpus words, the variance-to-mean ratio of their per-doc
    // term frequency — the topicality separator (function words spread
    // evenly, VMR≈1-2; topical words clump into the few docs about
    // that topic, VMR≫1) that a stopword list derived from raw
    // frequency alone gets wrong. Per-word moments (Σtf, Σtf²) are
    // exact BIGINT over the doc dimension — zero-occurrence docs enter
    // via the closed form (they add n−df zeros: only the doc COUNT is
    // needed, never a dense join); the top-20 cut orders by (cf DESC,
    // word); one float expression per word row.
    Q("llm_term_burstiness",
      """WITH tf AS (
        |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
        |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |    FROM documents) GROUP BY 1, 2
        |), nd AS (
        |  SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM tf
        |), wm AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS df,
        |         CAST(sum(c) AS BIGINT) AS s,
        |         CAST(sum(c * c) AS BIGINT) AS q
        |  FROM tf GROUP BY w
        |), top AS (
        |  SELECT w, df, s, q FROM wm ORDER BY s DESC, w LIMIT 20
        |)
        |SELECT w AS word, df AS n_docs_with, s AS corpus_freq,
        |       floor(CAST(s AS DOUBLE) / n * 10000) / 10000 AS mean_tf,
        |       floor((CAST(q AS DOUBLE) * n - CAST(s AS DOUBLE) * s)
        |             / (CAST(n AS DOUBLE) * (n - 1)) * n / s * 1000000)
        |         / 1000000 AS burstiness
        |FROM top CROSS JOIN nd
        |ORDER BY corpus_freq DESC, word""".stripMargin) { (s, d) =>
      val tf = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val nd = tf.agg(countDistinct(col("doc_id")).as("n"))
      val wm = tf.groupBy("w")
        .agg(count(lit(1)).as("df"), sum(col("c")).as("s"),
          sum(col("c") * col("c")).as("q"))
      val top = wm.orderBy(col("s").desc, col("w")).limit(20)
      top.crossJoin(broadcast(nd))
        .select(col("w").as("word"), col("df").as("n_docs_with"),
          col("s").as("corpus_freq"),
          (floor(col("s").cast("double") / col("n") * 10000) / 10000)
            .as("mean_tf"),
          (floor((col("q").cast("double") * col("n")
            - col("s").cast("double") * col("s"))
            / (col("n").cast("double") * (col("n") - 1)) * col("n")
            / col("s") * 1000000) / 1000000).as("burstiness"))
        .orderBy(col("corpus_freq").desc, col("word"))
    },

    // Dedup content loss (round 13, cont.): which VOCABULARY vanishes if
    // the near-dup prune drops every non-canonical cluster member —
    // llm_dedup_savings prices the token savings; this prices the other
    // side of the trade (words whose EVERY occurrence lives in pruned
    // docs are gone from the training set entirely — near-dups are
    // near, not identical, and the diff can carry unique terms).
    // Rides the same verified-pair CC keeper rule (min doc id per
    // cluster); per-word kept/total occurrence counts are exact BIGINT
    // over the word dimension; bounded 1-row report.
    Q("llm_dedup_content_loss",
      s"""WITH RECURSIVE $minhashVerifiedCtes,
         |e0 AS (
         |  SELECT d1, d2 FROM verified WHERE est_jaccard >= 0.2
         |), edges AS (
         |  SELECT d1 AS a, d2 AS b FROM e0 UNION ALL SELECT d2, d1 FROM e0
         |), ${Components.reachMinCte("SELECT doc_id AS id FROM documents",
        "edges")},
         |keepf AS (
         |  SELECT node AS doc_id, node = min(r) AS is_kept
         |  FROM reach GROUP BY node
         |), tfw AS (
         |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
         |    FROM documents) GROUP BY 1, 2
         |), wv AS (
         |  SELECT w, CAST(sum(c) AS BIGINT) AS occ,
         |         CAST(sum(CASE WHEN is_kept THEN c ELSE 0 END) AS BIGINT)
         |           AS kept_occ
         |  FROM tfw JOIN keepf USING (doc_id) GROUP BY w
         |)
         |SELECT CAST(count(*) AS BIGINT) AS vocab_total,
         |       CAST(sum(CASE WHEN kept_occ = 0 THEN 1 ELSE 0 END)
         |            AS BIGINT) AS vocab_lost,
         |       round(CAST(sum(CASE WHEN kept_occ = 0 THEN 1 ELSE 0 END)
         |                  AS DOUBLE) / count(*), 6) AS lost_vocab_share,
         |       CAST(sum(CASE WHEN kept_occ = 0 THEN occ ELSE 0 END)
         |            AS BIGINT) AS lost_occurrences,
         |       CAST(sum(occ) AS BIGINT) AS total_occurrences
         |FROM wv""".stripMargin) { (s, d) =>
      val e0 = minhashVerifiedLake(s, d)
        .where(col("est_jaccard") >= 0.2).select("d1", "d2")
      val edges = symPairs(e0, "d1", "d2").persist()
      val keepf = Components.connectedComponents(docs(s, d), "doc_id", edges)
        .select(col("id").as("doc_id"),
          (col("id") === col("lbl")).as("is_kept"))
      val tfw = docs(s, d)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      val wv = tfw.join(keepf, Seq("doc_id"))
        .groupBy("w")
        .agg(sum(col("c")).as("occ"),
          sum(when(col("is_kept"), col("c")).otherwise(0L)).as("kept_occ"))
      wv.agg(count(lit(1)).as("vocab_total"),
          sum(when(col("kept_occ") === 0, 1L).otherwise(0L)).as("vocab_lost"),
          round(sum(when(col("kept_occ") === 0, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("lost_vocab_share"),
          sum(when(col("kept_occ") === 0, col("occ")).otherwise(0L))
            .as("lost_occurrences"),
          sum(col("occ")).as("total_occurrences"))
    },

    // Source diversity (round 13, cont.): how many EFFECTIVE sources
    // does the corpus mix really have — Shannon entropy (in nats + its
    // exp = perplexity-of-the-mix) and inverse Simpson 1/Σp², the two
    // standard effective-number readouts (20 nominal sources behind an
    // 80%-one-feed mix behave like ~2 — every per-source guarantee is
    // theater until this number says otherwise). Exact BIGINT counts;
    // Σp² is an exact-integer ratio (Σnᵢ²/N²); the entropy terms
    // quantize per source to 1e-12 integers (bounded domain, exact
    // sum — ulcer doctrine), one exp at display.
    Q("llm_source_diversity",
      """WITH c AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents
        |  GROUP BY source
        |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM c)
        |SELECT CAST(count(*) AS BIGINT) AS n_sources,
        |       max(t) AS n_docs,
        |       floor(CAST(sum(CAST(round(
        |           -(CAST(n AS DOUBLE) / t) * ln(CAST(n AS DOUBLE) / t)
        |           * 1000000000000) AS BIGINT)) AS DOUBLE) / 1000000000000
        |             * 1000000) / 1000000 AS shannon_nats,
        |       floor(exp(CAST(sum(CAST(round(
        |           -(CAST(n AS DOUBLE) / t) * ln(CAST(n AS DOUBLE) / t)
        |           * 1000000000000) AS BIGINT)) AS DOUBLE) / 1000000000000)
        |             * 10000) / 10000 AS effective_sources_exp,
        |       floor(CAST(max(t) AS DOUBLE) * max(t)
        |             / sum(n * n) * 10000) / 10000
        |         AS effective_sources_simpson
        |FROM c CROSS JOIN tot""".stripMargin) { (s, d) =>
      val c = docs(s, d).groupBy("source").agg(count(lit(1)).as("n"))
      val tot = c.agg(sum(col("n")).as("t"))
      val term = round(-(col("n").cast("double") / col("t"))
        * log(col("n").cast("double") / col("t")) * 1000000000000L)
        .cast("long")
      c.crossJoin(broadcast(tot))
        .agg(count(lit(1)).as("n_sources"), max(col("t")).as("n_docs"),
          (floor(sum(term).cast("double") / 1000000000000L * 1000000)
            / 1000000).as("shannon_nats"),
          (floor(exp(sum(term).cast("double") / 1000000000000L) * 10000)
            / 10000).as("effective_sources_exp"),
          (floor(max(col("t")).cast("double") * max(col("t"))
            / sum(col("n") * col("n")) * 10000) / 10000)
            .as("effective_sources_simpson"))
    },

    // Word-level entropy rate (round 13, cont.): unigram entropy H(W),
    // conditional bigram entropy H(W₂|W₁), and the redundancy
    // 1 − H(W₂|W₁)/H(W) — the information-theoretic compressibility
    // readout at the WORD grain (llm_char_entropy reads bytes; training
    // value lives in word-level surprise, and a corpus whose H(W₂|W₁)
    // collapses far below H(W) is templated text dressed as prose).
    // H(W₂|W₁) = Σ c₂·ln(c₁(w₁)/c₂)/N over bigrams — every term a
    // per-row float on exact integer counts quantized to 1e-9 (ulcer
    // doctrine), exact BIGINT sums, two divisions at display.
    Q("llm_ngram_entropy_rate",
      """WITH bg AS (
        |  SELECT toks[CAST(x AS INT)] AS w1, toks[CAST(x AS INT) + 1] AS w2
        |  FROM (
        |    SELECT toks, unnest(range(1, len(toks))) AS x
        |    FROM (SELECT string_split(text, ' ') AS toks FROM documents))
        |), c2 AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY 1, 2
        |), c1 AS (
        |  SELECT w1, CAST(sum(c) AS BIGINT) AS c1 FROM c2 GROUP BY w1
        |), n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM c2
        |), hu AS (
        |  SELECT CAST(sum(CAST(round(
        |           c1 * ln(CAST(n.n AS DOUBLE) / c1) * 1000000000)
        |           AS BIGINT)) AS BIGINT) AS s
        |  FROM c1 CROSS JOIN n
        |), hc AS (
        |  SELECT CAST(sum(CAST(round(
        |           c * ln(CAST(c1.c1 AS DOUBLE) / c) * 1000000000)
        |           AS BIGINT)) AS BIGINT) AS s
        |  FROM c2 JOIN c1 USING (w1)
        |)
        |SELECT n.n AS n_bigrams,
        |       floor(CAST(hu.s AS DOUBLE) / n.n / 1000000000 * 1000000)
        |         / 1000000 AS h_unigram,
        |       floor(CAST(hc.s AS DOUBLE) / n.n / 1000000000 * 1000000)
        |         / 1000000 AS h_cond_bigram,
        |       floor((1 - (CAST(hc.s AS DOUBLE) / n.n / 1000000000)
        |              / (CAST(hu.s AS DOUBLE) / n.n / 1000000000)) * 1000000)
        |         / 1000000 AS redundancy
        |FROM n CROSS JOIN hu CROSS JOIN hc""".stripMargin) { (s, d) =>
      val bg = docs(s, d)
        .select(split(col("text"), " ").as("toks"))
        .where(size(col("toks")) >= 2)
        .select(explode(expr(
          """transform(slice(toks, 1, size(toks) - 1),
            |  (x, i) -> struct(x AS w1,
            |                   element_at(toks, i + 2) AS w2))"""
            .stripMargin)).as("g"))
        .select(col("g.w1").as("w1"), col("g.w2").as("w2"))
      val c2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val c1 = c2.groupBy("w1").agg(sum(col("c")).as("c1"))
      val n = c2.agg(sum(col("c")).as("n"))
      val hu = c1.crossJoin(broadcast(n))
        .agg(sum(round(col("c1")
          * log(col("n").cast("double") / col("c1")) * 1000000000)
          .cast("long")).as("s")).select(col("s").as("su"))
      val hc = c2.join(c1, Seq("w1"))
        .agg(sum(round(col("c")
          * log(col("c1").cast("double") / col("c")) * 1000000000)
          .cast("long")).as("s")).select(col("s").as("sc"))
      n.crossJoin(hu).crossJoin(hc)
        .select(col("n").as("n_bigrams"),
          (floor(col("su").cast("double") / col("n") / 1000000000L
            * 1000000) / 1000000).as("h_unigram"),
          (floor(col("sc").cast("double") / col("n") / 1000000000L
            * 1000000) / 1000000).as("h_cond_bigram"),
          (floor((lit(1) - (col("sc").cast("double") / col("n")
            / 1000000000L) / (col("su").cast("double") / col("n")
            / 1000000000L)) * 1000000) / 1000000).as("redundancy"))
    },

    // Fingerprint collision audit (round 13, cont.): distinct texts vs
    // distinct PortableHash fingerprints — the layer every exact-dedup
    // and registry key TRUSTS, audited (a collision merges two distinct
    // documents into one dedup identity silently; at 60-bit hashes the
    // birthday bound says ~n²/2⁶¹ expected collisions — this key is the
    // measurement that the bound holds, and the canary that fires if
    // the hash is ever weakened). Exact distinct counts; collisions =
    // n_distinct_texts − n_distinct_hashes.
    Q("llm_hash_collision_audit",
      s"""WITH t AS (
         |  SELECT DISTINCT text FROM documents
         |), h AS (
         |  SELECT DISTINCT ${PortableHash.sql("text")} AS h FROM documents
         |)
         |SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
         |       CAST((SELECT count(*) FROM t) AS BIGINT) AS n_distinct_texts,
         |       CAST((SELECT count(*) FROM h) AS BIGINT) AS n_distinct_hashes,
         |       CAST((SELECT count(*) FROM t)
         |            - (SELECT count(*) FROM h) AS BIGINT)
         |         AS n_collisions""".stripMargin) { (s, d) =>
      val n = docs(s, d).agg(count(lit(1)).as("n_docs"))
      val t = docs(s, d).select(col("text")).distinct()
        .agg(count(lit(1)).as("n_distinct_texts"))
      val h = docs(s, d).select(PortableHash.pHash(col("text")).as("h"))
        .distinct().agg(count(lit(1)).as("n_distinct_hashes"))
      n.crossJoin(t).crossJoin(h)
        .select(col("n_docs"), col("n_distinct_texts"),
          col("n_distinct_hashes"),
          (col("n_distinct_texts") - col("n_distinct_hashes"))
            .as("n_collisions"))
    },

    // Multimodal column plumbing: binary payload + mime + typed metadata
    // carried through ops. The decode step is a clearly-marked deterministic
    // STUB (this container has no image/audio codecs); schema, partitioning
    // and batch shape are real and unit-tested. Fake features hash the
    // utf-8 SOURCE TEXT of the payload via PortableHash so the oracle can
    // replay them; output joined with ',' (ARRAY cells are unhashable for
    // the driver's comparator).
    Q("llm_multimodal_col", {
      val feats = (0 until 8)
        .map(i => s"(${PortableHash.sqlSeeded(i, "text")} % 256)")
        .mkString(",\n                         ")
      s"""SELECT doc_id,
         |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
         |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
         |            ELSE 'video/mp4' END AS mime,
         |       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |       array_to_string([$feats], ',') AS fake_features
         |FROM documents ORDER BY doc_id""".stripMargin
    }) { (s, d) =>
      val mm = docs(s, d).select(
        col("doc_id"),
        col("text"),
        Multimodal.mediaStruct(col("doc_id"), col("text"), col("source"))
          .as("media"))
      // STUB decode: a real pipeline would mapInArrow/mapPartitions to a
      // codec here; we extract deterministic fake "features" from the text
      // behind the payload bytes.
      mm.select(
        col("doc_id"),
        col("media.mime").as("mime"),
        octet_length(col("media.payload")).cast("long").as("n_bytes"),
        concat_ws(",", array((0 until 8).map(i =>
          pmod(PortableHash.pHashSeeded(i, col("text")), lit(256))): _*))
          .as("fake_features"))
        .orderBy("doc_id")
    },

    // REAL media-header decode under the oracle gate (round 11): r10
    // left the MediaHeaderCodec spec-only ("no oracle for binary by
    // design") — but the binary can be PLANTED: each doc gets an
    // in-plan synthetic PNG whose IHDR encodes doc_id-derived
    // dimensions (hex-string construction → unhex), and the declared
    // plan must recover exactly those planted values THROUGH the real
    // codec (Multimodal.decodeFeatures + MediaHeaderCodec — the same
    // mapPartitions batch shape a production Arrow-UDF codec runs; the
    // oracle states the planted ground truth directly, so any parse
    // defect in signature/IHDR/offset/channel logic hash-mismatches).
    // The typed mapPartitions is the documented production shape for
    // codec work, bounded by doc count — not a per-row scalar UDF in a
    // relational hot path.
    Q("llm_media_header_parse",
      """SELECT doc_id, 'image/png' AS mime, CAST(33 AS BIGINT) AS n_bytes,
        |       CAST(100 + doc_id % 900 AS BIGINT) AS width,
        |       CAST(50 + doc_id % 500 AS BIGINT) AS height,
        |       CAST(8 AS BIGINT) AS bit_depth,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(1 AS BIGINT) AS parsed
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // PNG signature + IHDR length/tag, then 4-byte BE width/height,
      // depth 8, color type 2 (truecolor, 3 channels), filler + CRC
      // slot — 33 bytes, the minimal header the codec contract reads
      val hexp = concat(lit("89504E470D0A1A0A0000000D49484452"),
        lpad(hex(lit(100) + col("doc_id") % 900), 8, "0"),
        lpad(hex(lit(50) + col("doc_id") % 500), 8, "0"),
        lit("0802000000"), lit("00000000"))
      val mediaDs = docs(s, d)
        .select(col("doc_id"),
          struct(unhex(hexp).as("payload"), lit("image/png").as("mime"),
            map(lit("planted"), lit("true")).as("meta")).as("media"))
        .as[Multimodal.MediaRow](
          org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
      Multimodal.decodeFeatures(mediaDs, Multimodal.MediaHeaderCodec)
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          element_at(col("features"), 1).cast("long").as("width"),
          element_at(col("features"), 2).cast("long").as("height"),
          element_at(col("features"), 3).cast("long").as("bit_depth"),
          element_at(col("features"), 4).cast("long").as("channels"),
          element_at(col("features"), 7).cast("long").as("parsed"))
        .orderBy("doc_id")
    },

    // JPEG header decode under the oracle gate (round 12 — VERDICT r11
    // #4: the PNG planting precedent applied to the remaining codecs,
    // moving them from spec-only to hash-verified). In-plan minimal
    // JPEG: SOI, then one SOF0 segment (len 17: precision 8,
    // doc_id-derived height/width, 3 components), EOI — the marker-walk
    // path of MediaHeaderCodec.jpeg must recover exactly the planted
    // dimensions through the same typed mapPartitions batch shape.
    Q("llm_media_header_jpeg",
      """SELECT doc_id, 'image/jpeg' AS mime, CAST(23 AS BIGINT) AS n_bytes,
        |       CAST(100 + doc_id % 900 AS BIGINT) AS width,
        |       CAST(50 + doc_id % 500 AS BIGINT) AS height,
        |       CAST(8 AS BIGINT) AS bit_depth,
        |       CAST(3 AS BIGINT) AS channels,
        |       CAST(1 AS BIGINT) AS parsed
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // FFD8 (SOI), FFC0 (SOF0) len=0x11, precision 8, height(2 BE),
      // width(2 BE), ncomp=3 + 3×3 component specs, FFD9 (EOI)
      val hexp = concat(lit("FFD8FFC0001108"),
        lpad(hex(lit(50) + col("doc_id") % 500), 4, "0"),
        lpad(hex(lit(100) + col("doc_id") % 900), 4, "0"),
        lit("03011100021100031100FFD9"))
      val mediaDs = docs(s, d)
        .select(col("doc_id"),
          struct(unhex(hexp).as("payload"), lit("image/jpeg").as("mime"),
            map(lit("planted"), lit("true")).as("meta")).as("media"))
        .as[Multimodal.MediaRow](
          org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
      Multimodal.decodeFeatures(mediaDs, Multimodal.MediaHeaderCodec)
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          element_at(col("features"), 1).cast("long").as("width"),
          element_at(col("features"), 2).cast("long").as("height"),
          element_at(col("features"), 3).cast("long").as("bit_depth"),
          element_at(col("features"), 4).cast("long").as("channels"),
          element_at(col("features"), 7).cast("long").as("parsed"))
        .orderBy("doc_id")
    },

    // WAV/RIFF header decode under the oracle gate (round 12 — the
    // audio member of the planting family): RIFF/WAVE with a 16-byte
    // `fmt ` chunk carrying doc_id-derived little-endian channel count,
    // sample rate and bit depth, plus a `data` chunk header whose size
    // over the byte rate gives an exact integer duration. The
    // little-endian fields are planted as per-case hex literals (the
    // same CASE ladders the oracle states), so any LE/offset/word-align
    // defect in the RIFF walk hash-mismatches.
    Q("llm_media_header_wav",
      """SELECT doc_id, 'audio/wav' AS mime, CAST(44 AS BIGINT) AS n_bytes,
        |       CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 22050
        |            ELSE 44100 END AS BIGINT) AS sample_rate,
        |       CAST(1 + doc_id % 2 AS BIGINT) AS channels,
        |       CAST(8 + (doc_id % 3) * 8 AS BIGINT) AS bits,
        |       CAST(1 + doc_id % 5 AS BIGINT) AS duration_sec,
        |       CAST(1 AS BIGINT) AS parsed
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val m3 = col("doc_id") % 3
      val srHex = when(m3 === 0, "401F0000") // 8000
        .when(m3 === 1, "22560000") // 22050
        .otherwise("44AC0000") // 44100
      val chHex = when(col("doc_id") % 2 === 0, "0100").otherwise("0200")
      val bitsHex = when(m3 === 0, "0800").when(m3 === 1, "1000")
        .otherwise("1800")
      // data-chunk size = 32000 (the planted byte rate) × duration —
      // LE literals per duration case
      val dataHex = when(col("doc_id") % 5 === 0, "007D0000") // 32000
        .when(col("doc_id") % 5 === 1, "00FA0000") // 64000
        .when(col("doc_id") % 5 === 2, "00770100") // 96000
        .when(col("doc_id") % 5 === 3, "00F40100") // 128000
        .otherwise("00710200") // 160000
      val hexp = concat(
        lit("52494646"), lit("24000000"), lit("57415645"), // RIFF/WAVE
        lit("666D7420"), lit("10000000"), lit("0100"), // fmt , 16, PCM
        chHex, srHex, lit("007D0000"), lit("0400"), bitsHex,
        lit("64617461"), dataHex) // data chunk header
      val mediaDs = docs(s, d)
        .select(col("doc_id"),
          struct(unhex(hexp).as("payload"), lit("audio/wav").as("mime"),
            map(lit("planted"), lit("true")).as("meta")).as("media"))
        .as[Multimodal.MediaRow](
          org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
      Multimodal.decodeFeatures(mediaDs, Multimodal.MediaHeaderCodec)
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          element_at(col("features"), 1).cast("long").as("sample_rate"),
          element_at(col("features"), 2).cast("long").as("channels"),
          element_at(col("features"), 3).cast("long").as("bits"),
          element_at(col("features"), 4).cast("long").as("duration_sec"),
          element_at(col("features"), 7).cast("long").as("parsed"))
        .orderBy("doc_id")
    },

    // MP4/ISO-BMFF header decode under the oracle gate (round 12 — the
    // video member): ftyp, then a moov whose mvhd (version 0) carries a
    // constant timescale and a doc_id-derived tick duration, plus 1–3
    // empty trak boxes — the box-tree walk (sizes big-endian, 64-bit
    // largesize and to-EOF cases exercised by MultimodalSpec) must
    // recover timescale, exact integer seconds, and the track count.
    Q("llm_media_header_mp4",
      """SELECT doc_id, 'video/mp4' AS mime,
        |       CAST(60 + (doc_id % 3) * 8 AS BIGINT) AS n_bytes,
        |       CAST(600 AS BIGINT) AS timescale,
        |       CAST(1 + doc_id % 10 AS BIGINT) AS duration_sec,
        |       CAST(1 + doc_id % 3 AS BIGINT) AS n_tracks,
        |       CAST(1 AS BIGINT) AS parsed
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      val nTrakM = col("doc_id") % 3 // 0..2 → 1..3 traks
      val moovHex = when(nTrakM === 0, "0000002C")
        .when(nTrakM === 1, "00000034").otherwise("0000003C")
      val trak = "000000087472616B"
      val trakHex = when(nTrakM === 0, trak)
        .when(nTrakM === 1, trak * 2).otherwise(trak * 3)
      val hexp = concat(
        lit("000000106674797069736F6D00000000"), // ftyp isom
        moovHex, lit("6D6F6F76"), // moov
        lit("0000001C6D766864"), lit("00000000"), // mvhd v0+flags
        lit("00000000"), lit("00000000"), // ctime, mtime
        lit("00000258"), // timescale 600
        lpad(hex((lit(1) + col("doc_id") % 10) * 600), 8, "0"), // ticks
        trakHex)
      val mediaDs = docs(s, d)
        .select(col("doc_id"),
          struct(unhex(hexp).as("payload"), lit("video/mp4").as("mime"),
            map(lit("planted"), lit("true")).as("meta")).as("media"))
        .as[Multimodal.MediaRow](
          org.apache.spark.sql.Encoders.product[Multimodal.MediaRow])
      Multimodal.decodeFeatures(mediaDs, Multimodal.MediaHeaderCodec)
        .select(col("doc_id"), col("mime"), col("n_bytes"),
          element_at(col("features"), 1).cast("long").as("timescale"),
          element_at(col("features"), 2).cast("long").as("duration_sec"),
          element_at(col("features"), 3).cast("long").as("n_tracks"),
          element_at(col("features"), 7).cast("long").as("parsed"))
        .orderBy("doc_id")
    },

    // Per-source language-mix KL divergence (round 7, cont.): how far
    // each source's language distribution sits from the corpus-wide mix,
    // in bits — the data-balance audit a pretraining recipe runs before
    // setting sampling weights (llm_sample_mix rebalances; this MEASURES
    // the imbalance it should correct; KL(source‖corpus) is finite by
    // construction since the corpus marginal dominates every source).
    // agg_entropy float doctrine: the ≤|langs| per-source terms fold in
    // a PINNED lang-sorted in-row order, each term the identical
    // p·ln(p/q)/ln2 expression on exact-integer-derived ratios, so
    // pre-display doubles are bit-identical; FLOOR-scaled. Plan: ONE
    // documents scan to the O(sources × langs) frame; the lang marginal
    // and grand total re-aggregate that 100-row frame (no second fact
    // pass — PlanSpec pins the single scan), and the marginal/total ride
    // back in as bounded-domain broadcasts.
    Q("llm_source_mix_kl",
      """WITH c AS (
        |  SELECT source, lang, CAST(count(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2
        |), s AS (
        |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_docs FROM c GROUP BY source
        |), g AS (
        |  SELECT lang, CAST(sum(cnt) AS BIGINT) AS gcnt FROM c GROUP BY lang
        |), tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS total FROM c
        |), terms AS (
        |  SELECT source, lang,
        |         (CAST(cnt AS DOUBLE) / CAST(n_docs AS DOUBLE))
        |         * ln((CAST(cnt AS DOUBLE) / CAST(n_docs AS DOUBLE))
        |              / (CAST(gcnt AS DOUBLE) / CAST(total AS DOUBLE)))
        |         / ln(2.0) AS term
        |  FROM c JOIN s USING (source) JOIN g USING (lang) CROSS JOIN tot
        |)
        |SELECT source, max(n_docs) AS n_docs, CAST(count(*) AS BIGINT) AS n_langs,
        |       floor(list_reduce(list(term ORDER BY lang), (a, b) -> a + b)
        |             * 1000000) / 1000000 AS kl_bits
        |FROM terms JOIN s USING (source)
        |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val c = docs(s, d)
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("cnt"))
        .persist() // feeds the source frame, the lang marginal, and the total
      val gm = c.groupBy("lang").agg(sum(col("cnt")).as("gcnt"))
      val tot = c.agg(sum(col("cnt")).as("total"))
      c.join(broadcast(gm), Seq("lang"))
        .crossJoin(broadcast(tot))
        .groupBy("source")
        .agg(
          expr("sort_array(collect_list(struct(lang, cnt, gcnt, total)))")
            .as("ls"),
          sum(col("cnt")).as("n_docs"),
          count(lit(1)).as("n_langs"))
        .select(col("source"), col("n_docs"), col("n_langs"),
          (floor(expr(
            """aggregate(ls, 0d, (acc, e) ->
              |  acc + ((CAST(e.cnt AS DOUBLE) / CAST(n_docs AS DOUBLE))
              |         * ln((CAST(e.cnt AS DOUBLE) / CAST(n_docs AS DOUBLE))
              |              / (CAST(e.gcnt AS DOUBLE) / CAST(e.total AS DOUBLE)))
              |         / ln(2.0d)))""".stripMargin) * 1000000)
            / lit(1000000)).as("kl_bits"))
        .orderBy("source")
    },

    // Token-trigram vocabulary coverage curve (round 7, cont.): what
    // fraction of corpus trigram occurrences the top-k most frequent
    // trigrams cover — the coverage/OOV readout behind vocabulary sizing
    // (a BPE vocab build asks exactly this of its merge candidates; the
    // fixture's 31-word unigram soup saturates instantly, trigrams give
    // the real Zipf tail: 2% → 15% → 76% at k=100/1k/10k). Plan: one
    // positional explode (map-side) → ONE gram aggregate (the shuffle);
    // the counts frame is persisted and feeds the rank window + the
    // totals row; the ranked frame is vocab-sized, so the global rank
    // window and the 3-row k-report are report-scale. Integer counts
    // divided once, FLOOR-scaled.
    Q("llm_vocab_coverage",
      """WITH t AS (SELECT string_split(text, ' ') AS toks FROM documents),
        |g AS (
        |  SELECT array_to_string(toks[p : p + 2], ' ') AS gram
        |  FROM (SELECT toks, unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS p
        |        FROM t WHERE len(toks) >= 3)
        |), c AS (
        |  SELECT gram, CAST(count(*) AS BIGINT) AS cnt FROM g GROUP BY gram
        |), r AS (
        |  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, gram) AS rn FROM c
        |), tot AS (
        |  SELECT CAST(sum(cnt) AS BIGINT) AS total,
        |         CAST(count(*) AS BIGINT) AS vocab
        |  FROM c
        |), ks AS (SELECT unnest([100, 1000, 10000]) AS k)
        |SELECT CAST(k AS BIGINT) AS k,
        |       least(CAST(k AS BIGINT), vocab) AS vocab_used,
        |       CAST(sum(CASE WHEN rn <= k THEN cnt ELSE 0 END) AS BIGINT) AS covered,
        |       total,
        |       floor(CAST(sum(CASE WHEN rn <= k THEN cnt ELSE 0 END) AS DOUBLE)
        |             / CAST(total AS DOUBLE) * 1000000) / 1000000 AS coverage
        |FROM r CROSS JOIN ks CROSS JOIN tot
        |GROUP BY k, total, vocab ORDER BY k""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val c = docs(s, d)
        .select(split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .where(col("n") >= 3)
        .select(explode(transform(sequence(lit(1), col("n") - 2),
          i => concat_ws(" ", slice(col("toks"), i, lit(3))))).as("gram"))
        .groupBy("gram").agg(count(lit(1)).as("cnt"))
        .persist() // feeds the rank window AND the totals row
      val r = c.select(col("cnt"),
        row_number().over(Window.orderBy(col("cnt").desc, col("gram"))).as("rn"))
      val ks = c.agg(sum(col("cnt")).as("total"), count(lit(1)).as("vocab"))
        .select(col("total"), col("vocab"),
          explode(array(lit(100), lit(1000), lit(10000))).as("k"))
      r.crossJoin(broadcast(ks))
        .groupBy("k", "total", "vocab")
        .agg(sum(when(col("rn") <= col("k"), col("cnt")).otherwise(0L))
          .as("covered"))
        .select(col("k").cast("long").as("k"),
          least(col("k").cast("long"), col("vocab")).as("vocab_used"),
          col("covered"), col("total"),
          (floor(col("covered").cast("double") / col("total").cast("double")
            * 1000000) / lit(1000000)).as("coverage"))
        .orderBy("k")
    },

    // Train→test span novelty (round 7, cont.): the memorization /
    // generalization readout — what fraction of the test split's token
    // trigrams never occur in the train split (the split is the
    // llm_split_assign portable-hash rule, so the measurement is
    // leak-proof under re-ingestion; llm_decontaminate removes benchmark
    // overlap, this MEASURES residual train-test overlap). Plan: one
    // positional explode over ONE documents scan (the gram frame is
    // persisted — train distinct and test probe both read it), then a
    // shuffled left join per the span_dedup hygiene (the train gram set
    // is corpus-sized: never broadcast), 5-row report. Integer counts,
    // FLOOR-scaled rate.
    Q("llm_split_novelty", {
      val ph = graft.functions.PortableHash.sql("CAST(doc_id AS VARCHAR)")
      s"""WITH s AS (
         |  SELECT doc_id, lang, text, $ph % 100 AS b FROM documents
         |), t AS (
         |  SELECT doc_id, lang, b, string_split(text, ' ') AS toks FROM s
         |), g AS (
         |  SELECT lang, b, array_to_string(toks[p : p + 2], ' ') AS gram
         |  FROM (SELECT lang, b, toks,
         |               unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS p
         |        FROM t WHERE len(toks) >= 3)
         |), train AS (SELECT DISTINCT gram AS tg FROM g WHERE b < 90),
         |test AS (SELECT lang, gram FROM g WHERE b >= 90)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_test_spans,
         |       CAST(count(CASE WHEN tg IS NULL THEN 1 END) AS BIGINT) AS n_novel,
         |       floor(CAST(count(CASE WHEN tg IS NULL THEN 1 END) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE) * 1000000) / 1000000 AS novelty
         |FROM test LEFT JOIN train ON gram = tg
         |GROUP BY lang ORDER BY lang""".stripMargin
    }) { (s, d) =>
      val b = pmod(PortableHash.pHash(col("doc_id").cast("string")), lit(100))
      val g = docs(s, d)
        .select(col("lang"), b.as("b"), split(col("text"), " ").as("toks"))
        .withColumn("n", size(col("toks")))
        .where(col("n") >= 3)
        .select(col("lang"), col("b"),
          explode(transform(sequence(lit(1), col("n") - 2),
            i => concat_ws(" ", slice(col("toks"), i, lit(3))))).as("gram"))
        .persist() // feeds the train distinct AND the test probe
      val train = g.where(col("b") < 90).select(col("gram").as("tg")).distinct()
      g.where(col("b") >= 90).select("lang", "gram")
        .join(train.hint("shuffle_hash"), col("gram") === col("tg"), "left")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_test_spans"),
          count(when(col("tg").isNull, 1)).as("n_novel"))
        .select(col("lang"), col("n_test_spans"), col("n_novel"),
          (floor(col("n_novel").cast("double")
            / col("n_test_spans").cast("double") * 1000000)
            / lit(1000000)).as("novelty"))
        .orderBy("lang")
    },

    // Minhash estimator quality (round 7, cont.): over a deterministic
    // 1-in-3 DOCUMENT sample ([[EstQualityDocMod]] — a QA statistic, not
    // a result key), for every banded candidate pair the 16-slot minhash
    // AGREEMENT estimate k/16 vs the exact shingle Jaccard the verify
    // pass computes — the llm_ann_recall of the dedup family (it answers
    // "are 16 minhashes enough at my τ?", i.e. whether the verify pass
    // can ever be dropped). Bucketed
    // by exact-Jaccard 0.2-band. Float doctrine: everything is INTEGER
    // micro-units until one final division — est = k·62500 µ (k/16
    // exactly), exact = round(j·1e6) µ, error = |est−exact| µ; per-bucket
    // sums are exact BIGINTs, so both engines divide identical integers
    // (FLOOR to whole µ, then /1e6). Plan: the verified pairs come from
    // the audited minhash pipeline; the agreement join reads the 8-row-
    // per-doc band frame (persisted — both pair sides probe it,
    // shuffle-hash-hinted per the sketch-family broadcast hygiene);
    // the bucket report is 5 rows.
    Q("llm_minhash_est_quality", {
      val slots = (0 until 16)
        .map(i => s"(CASE WHEN p.m_$i = q.m_$i THEN 1 ELSE 0 END)")
        .mkString(" + ")
      s"""WITH ${minhashVerifiedCtes(None, None, Some(estQualityDocPredSql))},
         |agree AS (
         |  SELECT v.d1, v.d2,
         |         CAST(round(v.est_jaccard * 1000000) AS BIGINT) AS exact_u,
         |         CAST(($slots) * 62500 AS BIGINT) AS est_u
         |  FROM verified v JOIN mh p ON v.d1 = p.doc_id
         |                  JOIN mh q ON v.d2 = q.doc_id
         |), u AS (
         |  SELECT least(CAST(floor(exact_u / 200000.0) AS BIGINT), 4) AS bucket,
         |         exact_u, est_u, abs(est_u - exact_u) AS err_u
         |  FROM agree
         |)
         |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
         |       floor(CAST(sum(est_u) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE)) / 1000000 AS mean_est,
         |       floor(CAST(sum(exact_u) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE)) / 1000000 AS mean_exact,
         |       floor(CAST(sum(err_u) AS DOUBLE)
         |             / CAST(count(*) AS DOUBLE)) / 1000000 AS mean_abs_err
         |FROM u GROUP BY bucket ORDER BY bucket""".stripMargin
    }) { (s, d) =>
      // reuse the pipeline's own persisted SKETCH frame (round-7 cont.
      // fix: a separate build here was a SECOND full shingle→md5→sketch
      // pass; round-8 cont. 4: join the 1-row-per-doc sketch on doc_id
      // instead of re-shuffling the 8-rows-per-doc band frame twice off
      // its (band, k1, k2) partitioning — the slot agreement is a
      // map-side 16-term comparison ladder, no groupBy at all; round 10:
      // the DECLARED readout estimates over a deterministic 1-in-3
      // DOCUMENT sample — the r9 pair-level draw left the corpus sketch
      // pass, the key's actual floor, untouched; the exhaustive sweep
      // stays in ApproxSpec)
      val (mhv, sk) = minhashVerifiedWithSketch(
        docs(s, d).where(estQualityDocPred), persistFrames = false)
      val kExpr = (0 until 16)
        .map(i => when(col(s"a.m_$i") === col(s"b.m_$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      val agree = mhv
        .join(sk.hint("shuffle_hash").as("a"), col("d1") === col("a.doc_id"))
        .join(sk.hint("shuffle_hash").as("b"), col("d2") === col("b.doc_id"))
        .select(col("d1"), col("d2"), col("est_jaccard"), kExpr.as("k"))
      val u = agree.select(
        round(col("est_jaccard") * 1000000).cast("long").as("exact_u"),
        (col("k") * 62500L).as("est_u"))
        .withColumn("err_u", abs(col("est_u") - col("exact_u")))
        .withColumn("bucket",
          least(floor(col("exact_u") / 200000.0).cast("long"), lit(4L)))
      u.groupBy("bucket")
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("est_u")).as("se"), sum(col("exact_u")).as("sx"),
          sum(col("err_u")).as("sr"))
        .select(col("bucket"), col("n_pairs"),
          (floor(col("se").cast("double") / col("n_pairs").cast("double"))
            / lit(1000000)).as("mean_est"),
          (floor(col("sx").cast("double") / col("n_pairs").cast("double"))
            / lit(1000000)).as("mean_exact"),
          (floor(col("sr").cast("double") / col("n_pairs").cast("double"))
            / lit(1000000)).as("mean_abs_err"))
        .orderBy("bucket")
    },

    // Per-label embedding drift (round 7, cont.): cosine between each
    // label's centroid and the corpus-wide centroid — the
    // embedding-space monitoring readout (a label whose centroid swings
    // away from the global mean signals distribution shift in that
    // slice; llm_centroid_udaf computes centroids, this SCORES them).
    // Float doctrine taken all the way: every float sum in the pipeline
    // is a PINNED-ORDER in-row fold — per-(label, dim) sums fold
    // vec_id-sorted values, the global dim sums fold the label sums
    // label-sorted, and the dot/norm reductions fold dim-ascending — so
    // both engines execute identical IEEE op sequences and the
    // pre-display doubles are bit-exact (a plain grouped sum would
    // accumulate in engine/partition order). Plan: one embeddings scan →
    // posexplode (map-side) → ONE (label, dim) shuffle; everything after
    // is a 640-row/10-row frame.
    // Embedding-space outlier mining (round 8, cont. 4): the 20 vectors
    // FARTHEST (lowest cosine) from the corpus centroid — the embedding
    // complement of llm_quality_score's text heuristics (mislabeled,
    // off-domain, or garbage items sit far from the mean direction; this
    // is the standard first-pass filter before semantic dedup). Centroid
    // dims are pinned vec_id-order folds (the llm_embedding_drift
    // doctrine), then snapped to FLOAT so the probe side runs the same
    // native float-array dot as every other cosine op (both engines
    // round-to-nearest-float identically); per-vector sim is one
    // broadcast map-side dot + round(6) (the llm_cosine_topk-proven
    // cross-engine spelling), bottom-k via TakeOrderedAndProject. ONE
    // (dim) shuffle for the centroid + one embeddings scan for the probe.
    Q("llm_embedding_outliers",
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), comp AS (
        |  SELECT i, list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b) AS gx,
        |         CAST(count(*) AS BIGINT) AS gn
        |  FROM e GROUP BY i
        |), gvec AS (
        |  SELECT list(CAST(CAST(gx / gn AS FLOAT) AS DOUBLE) ORDER BY i) AS g
        |  FROM comp
        |)
        |SELECT vec_id, label,
        |       round(list_cosine_similarity(CAST(embedding AS DOUBLE[]), g), 6)
        |         AS sim
        |FROM embeddings CROSS JOIN gvec
        |ORDER BY sim, vec_id LIMIT 20""".stripMargin) { (s, d) =>
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("i"), col("xf").cast("double").as("x"))
      val comp = e.groupBy("i")
        .agg(
          expr("""aggregate(transform(sort_array(collect_list(struct(vec_id, x))),
                 |  e -> e.x), 0d, (a, b) -> a + b)""".stripMargin).as("gx"),
          count(lit(1)).as("gn"))
        .select(col("i"), (col("gx") / col("gn")).as("cv"))
      val gvec = comp.groupBy()
        .agg(expr(
          """transform(sort_array(collect_list(struct(i, cv))),
            |  e -> CAST(e.cv AS FLOAT))""".stripMargin).as("gf"))
      Tables(s, d, "embeddings")
        .crossJoin(broadcast(gvec))
        .select(col("vec_id"), col("label"),
          round(vectorDot(col("embedding"), col("gf"))
            / nullif(sqrt(vectorDot(col("embedding"), col("embedding")))
              * sqrt(vectorDot(col("gf"), col("gf"))), lit(0.0)), 6)
            .as("sim"))
        .orderBy(col("sim"), col("vec_id"))
        .limit(20)
    },

    Q("llm_embedding_drift",
      """WITH e AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |         CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings
        |), comp AS (
        |  SELECT label, i,
        |         list_reduce(list(x ORDER BY vec_id), (a, b) -> a + b) AS sx,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM e GROUP BY label, i
        |), gcomp AS (
        |  SELECT i, list_reduce(list(sx ORDER BY label), (a, b) -> a + b) AS gx,
        |         CAST(list_reduce(list(n ORDER BY label), (a, b) -> a + b)
        |              AS BIGINT) AS gn
        |  FROM comp GROUP BY i
        |), vecs AS (
        |  SELECT label, max(comp.n) AS n_vecs,
        |         list(comp.sx / comp.n ORDER BY comp.i) AS c,
        |         list(gcomp.gx / gcomp.gn ORDER BY comp.i) AS g
        |  FROM comp JOIN gcomp USING (i) GROUP BY label
        |)
        |SELECT label, n_vecs,
        |       floor(list_reduce(list_transform(range(1, 65), k -> c[k] * g[k]),
        |                         (a, b) -> a + b)
        |             / sqrt(list_reduce(list_transform(range(1, 65),
        |                                k -> c[k] * c[k]), (a, b) -> a + b))
        |             / sqrt(list_reduce(list_transform(range(1, 65),
        |                                k -> g[k] * g[k]), (a, b) -> a + b))
        |             * 1000000) / 1000000 AS drift_cos
        |FROM vecs ORDER BY label""".stripMargin) { (s, d) =>
      val e = Tables(s, d, "embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("i", "xf")))
        .select(col("vec_id"), col("label"), col("i"),
          col("xf").cast("double").as("x"))
      val comp = e.groupBy("label", "i")
        .agg(
          expr("""aggregate(transform(sort_array(collect_list(struct(vec_id, x))),
                 |  e -> e.x), 0d, (a, b) -> a + b)""".stripMargin).as("sx"),
          count(lit(1)).as("n"))
        .persist() // feeds the global dim sums AND the per-label arrays
      val gcomp = comp.groupBy("i")
        .agg(
          expr("""aggregate(transform(sort_array(collect_list(struct(label, sx))),
                 |  e -> e.sx), 0d, (a, b) -> a + b)""".stripMargin).as("gx"),
          sum(col("n")).as("gn"))
      val vecs = comp.join(broadcast(gcomp), Seq("i"))
        .groupBy("label")
        .agg(max(col("n")).as("n_vecs"),
          expr("""transform(sort_array(collect_list(named_struct('i', i, 'cv', sx / n))),
                 |  e -> e.cv)""".stripMargin).as("c"),
          expr("""transform(sort_array(collect_list(named_struct('i', i, 'gv', gx / gn))),
                 |  e -> e.gv)""".stripMargin).as("g"))
      def fold(arr: String) =
        s"aggregate($arr, 0d, (a, b) -> a + b)"
      vecs.select(col("label"), col("n_vecs"),
          (floor(expr(
            s"""${fold("zip_with(c, g, (p, q) -> p * q)")}
               | / sqrt(${fold("transform(c, p -> p * p)")})
               | / sqrt(${fold("transform(g, p -> p * p)")})""".stripMargin)
            * 1000000) / lit(1000000)).as("drift_cos"))
        .orderBy("label")
    },

    // ------------------------------------------------------------------
    // Round 9: corpus-report operators over the curation chain.

    // Vocabulary richness per source (round 9): type-token ratio + hapax
    // share — the lexical-diversity panel of a corpus datasheet (low TTR
    // / low hapax flags templated or boilerplate-heavy sources BEFORE
    // they dominate a training mix). Plan: one corpus scan → (source,
    // term) counts (two-phase map-side partial) → bounded per-source
    // aggregate. Zero windows, zero joins — scale cost is the one
    // (source, term) shuffle, same asymptote as llm_tfidf's df stage.
    Q("llm_ttr_hapax",
      """WITH tf AS (
        |  SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY source, w
        |)
        |SELECT source,
        |       CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |       CAST(count(*) AS BIGINT) AS n_types,
        |       CAST(count(*) FILTER (WHERE cnt = 1) AS BIGINT) AS n_hapax,
        |       floor(count(*) * 1.0 / sum(cnt) * 1000000) / 1000000 AS ttr,
        |       floor(count(*) FILTER (WHERE cnt = 1) * 1.0 / count(*)
        |             * 1000000) / 1000000 AS hapax_ratio
        |FROM tf GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val tf = docs(s, d)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("cnt"))
      tf.groupBy("source")
        .agg(sum(col("cnt")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          count(when(col("cnt") === 1, 1)).as("n_hapax"))
        .select(col("source"), col("n_tokens"), col("n_types"), col("n_hapax"),
          (floor(col("n_types") * lit(1.0) / col("n_tokens") * 1000000)
            / 1000000).as("ttr"),
          (floor(col("n_hapax") * lit(1.0) / col("n_types") * 1000000)
            / 1000000).as("hapax_ratio"))
        .orderBy("source")
    },

    // Zipf rank-frequency fit (round 9): OLS slope of ln(count) on
    // ln(rank) over the global top-100 terms — natural text sits near
    // −1; a flat slope flags synthetic/templated corpora and a cliff
    // flags boilerplate dominance (the distributional sibling of
    // llm_ttr_hapax). Plan: term counts (map-side partial) → fused
    // TakeOrderedAndProject top-100 → ONE in-row pinned-order fold
    // computes Σx/Σy/Σxy/Σxx and the closed-form OLS — no window, no
    // driver collect; the only fact-sized stage is the token groupBy.
    // Float doctrine: identical ln() expressions folded in the same
    // rank order on both engines, FLOOR-scaled display (agg_entropy's
    // contract).
    Q("llm_zipf_slope",
      """WITH tf AS (
        |  SELECT w, CAST(count(*) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        |  GROUP BY w
        |), top AS (
        |  SELECT w, cnt FROM tf ORDER BY cnt DESC, w LIMIT 100
        |), fold AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |         list_reduce(list_prepend(
        |             CAST([0.0, 0.0, 0.0, 0.0, 0.0] AS DOUBLE[]),
        |             list([CAST(cnt AS DOUBLE)] ORDER BY cnt DESC, w)),
        |           (a, b) -> [a[1] + 1.0,
        |                      a[2] + ln(a[1] + 1.0),
        |                      a[3] + ln(b[1]),
        |                      a[4] + ln(a[1] + 1.0) * ln(b[1]),
        |                      a[5] + ln(a[1] + 1.0) * ln(a[1] + 1.0)]) AS f
        |  FROM top
        |)
        |SELECT n_terms,
        |       floor((n_terms * f[4] - f[2] * f[3])
        |             / (n_terms * f[5] - f[2] * f[2]) * 1000000) / 1000000
        |         AS zipf_slope,
        |       floor((f[3] - (n_terms * f[4] - f[2] * f[3])
        |                     / (n_terms * f[5] - f[2] * f[2]) * f[2])
        |             / n_terms * 1000000) / 1000000 AS intercept
        |FROM fold""".stripMargin) { (s, d) =>
      val tf = docs(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("cnt"))
      val top = tf.orderBy(col("cnt").desc, col("w")).limit(100)
      val folded = top.agg(
        count(lit(1)).as("n_terms"),
        expr("""aggregate(
               |  transform(sort_array(collect_list(struct(-cnt AS nc, w, cnt))),
               |            e -> CAST(e.cnt AS DOUBLE)),
               |  array(0d, 0d, 0d, 0d, 0d),
               |  (a, b) -> array(a[0] + 1d,
               |                  a[1] + ln(a[0] + 1d),
               |                  a[2] + ln(b),
               |                  a[3] + ln(a[0] + 1d) * ln(b),
               |                  a[4] + ln(a[0] + 1d) * ln(a[0] + 1d)))"""
          .stripMargin).as("f"))
      val slope = (col("n_terms") * col("f")(3) - col("f")(1) * col("f")(2)) /
        (col("n_terms") * col("f")(4) - col("f")(1) * col("f")(1))
      folded.select(col("n_terms"),
        (floor(slope * 1000000) / 1000000).as("zipf_slope"),
        (floor((col("f")(2) - slope * col("f")(1)) / col("n_terms") * 1000000)
          / 1000000).as("intercept"))
    },

    // Lexicon redaction audit (round 9): the PII-redaction PLAN SHAPE —
    // per-row global regex match/replace, per-source hit and removed-char
    // accounting — exercised against a lexicon that actually occurs in
    // the harness corpus so the oracle check is non-vacuous (real PII
    // regexes drop in unchanged; the word-salad corpus contains no
    // emails/phones, and an all-zero answer would pin nothing).
    // chars_redacted comes from length(text) − length(regexp_replace):
    // one pass, no explode. Map-side only until the bounded per-source
    // aggregate — the cheapest possible shape at 100 TB.
    Q("llm_redact_lexicon",
      """SELECT source,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(*) FILTER (WHERE hits > 0) AS BIGINT) AS docs_with_hits,
        |       CAST(sum(hits) AS BIGINT) AS total_hits,
        |       CAST(sum(chars) AS BIGINT) AS chars_redacted
        |FROM (
        |  SELECT source,
        |         len(regexp_extract_all(text, '\b(key|value|table)\b', 1)) AS hits,
        |         length(text) - length(regexp_replace(text, '\b(key|value|table)\b', '', 'g')) AS chars
        |  FROM documents)
        |GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      val pat = "\\b(key|value|table)\\b"
      docs(s, d).select(col("source"),
          size(regexp_extract_all(col("text"), lit(pat), lit(1))).as("hits"),
          (length(col("text")) -
            length(regexp_replace(col("text"), pat, ""))).as("chars"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("hits") > 0, 1)).as("docs_with_hits"),
          sum(col("hits")).cast("long").as("total_hits"),
          sum(col("chars")).cast("long").as("chars_redacted"))
        .orderBy("source")
    },

    // Token-balanced shard audit (round 9): the training-data loader
    // contract — documents land in N=16 shards by deterministic portable
    // hash (re-ingestion-stable, the llm_split_assign discipline), and
    // the audit reports each shard's doc/token mass plus its balance
    // ratio vs the uniform share (ratio → 1 everywhere means the loader
    // streams shards without stragglers). Plan: map-side shard/token
    // projection → bounded 16-row groupBy → broadcast 1-row total. At
    // 100 TB the same hash IS the physical layout key
    // (write.partitionBy(shard)); a skewed ratio here predicts a skewed
    // training node before any data moves.
    Q("llm_shard_assign", {
      val h = graft.functions.PortableHash.sql(
        "'shard:' || CAST(doc_id AS VARCHAR)")
      s"""WITH a AS (
         |  SELECT $h % 16 AS shard,
         |         len(string_split(text, ' ')) AS toks
         |  FROM documents
         |), sh AS (
         |  SELECT shard, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(toks) AS BIGINT) AS n_tokens
         |  FROM a GROUP BY shard
         |), t AS (
         |  SELECT CAST(sum(n_tokens) AS BIGINT) AS tot,
         |         CAST(count(*) AS BIGINT) AS n_shards
         |  FROM sh
         |)
         |SELECT shard, n_docs, n_tokens,
         |       floor(n_tokens * n_shards * 1.0 / tot * 1000000) / 1000000
         |         AS balance
         |FROM sh CROSS JOIN t ORDER BY shard""".stripMargin
    }) { (s, d) =>
      val a = docs(s, d).select(
        (graft.functions.PortableHash.pHash(
          concat(lit("shard:"), col("doc_id").cast("string"))) % 16)
          .as("shard"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      val sh = a.groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      val t = sh.agg(sum(col("n_tokens")).as("tot"),
        count(lit(1)).as("n_shards"))
      sh.crossJoin(broadcast(t))
        .select(col("shard"), col("n_docs"), col("n_tokens"),
          (floor(col("n_tokens") * col("n_shards") * lit(1.0) / col("tot")
            * 1000000) / 1000000).as("balance"))
        .orderBy("shard")
    },

    // Shard-balance SKEW audit (round 12): the one-row verdict on
    // llm_shard_assign's layout — max/min/mean token mass per shard and
    // the max-over-mean straggler ratio. THE number that predicts
    // data-parallel training step time (a step waits for the heaviest
    // shard; ratio 1.15 = 15% of every step idles the other workers).
    // One bounded fold over the 16-row shard frame beyond the shared
    // assign chain; exact integer masses, one division at display.
    Q("llm_shard_balance", {
      val h = graft.functions.PortableHash.sql(
        "'shard:' || CAST(doc_id AS VARCHAR)")
      s"""WITH a AS (
         |  SELECT $h % 16 AS shard,
         |         len(string_split(text, ' ')) AS toks
         |  FROM documents
         |), sh AS (
         |  SELECT shard, CAST(sum(toks) AS BIGINT) AS n_tokens
         |  FROM a GROUP BY shard
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_shards,
         |       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         |       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
         |       CAST(min(n_tokens) AS BIGINT) AS min_tokens,
         |       floor(max(n_tokens) * count(*) * 1.0 / sum(n_tokens)
         |             * 1000000) / 1000000 AS max_over_mean
         |FROM sh""".stripMargin
    }) { (s, d) =>
      docs(s, d)
        .select(
          (graft.functions.PortableHash.pHash(
            concat(lit("shard:"), col("doc_id").cast("string"))) % 16)
            .as("shard"),
          size(split(col("text"), " ")).cast("long").as("toks"))
        .groupBy("shard").agg(sum(col("toks")).as("n_tokens"))
        .agg(count(lit(1)).as("n_shards"),
          sum(col("n_tokens")).as("total_tokens"),
          max(col("n_tokens")).as("max_tokens"),
          min(col("n_tokens")).as("min_tokens"))
        .select(col("n_shards"), col("total_tokens"), col("max_tokens"),
          col("min_tokens"),
          (floor(col("max_tokens") * col("n_shards") * lit(1.0)
            / col("total_tokens") * 1000000) / 1000000).as("max_over_mean"))
    },

    // Near-dup cluster-size distribution (round 9; round 10: explicitly
    // the small-corpus AUDIT twin — the PRODUCTION report is
    // llm_dedup_cluster_sizes_lsh, whose groups come from the banded
    // prefilter with no all-pairs stage): the curation histogram over
    // llm_dedup_groups' brute τ=0.35 groups (shared chain + shared
    // oracle CTEs — the two keys cannot drift): how much of the corpus
    // sits in duplicate clusters, and how big the clusters are. The
    // brute chain is the ground truth the LSH report is audited against
    // on corpora small enough to afford O(n²) — exactly the
    // llm_dedup_groups vs llm_dedup_groups_lsh division of labor.
    // Cost beyond the group chain: two bounded aggregates.
    Q("llm_dedup_cluster_sizes",
      s"""WITH RECURSIVE $dedupGroupsCtes, g AS (
         |  SELECT node AS vec_id, min(r) AS group_id FROM reach GROUP BY node
         |), cs AS (
         |  SELECT group_id, CAST(count(*) AS BIGINT) AS cluster_size
         |  FROM g GROUP BY group_id
         |)
         |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |       CAST(sum(cluster_size) AS BIGINT) AS n_vecs
         |FROM cs GROUP BY cluster_size ORDER BY cluster_size""".stripMargin) {
      (s, d) =>
      cosineDedupGroups(s, d)
        .groupBy("group_id").agg(count(lit(1)).as("cluster_size"))
        .groupBy("cluster_size")
        .agg(count(lit(1)).as("n_clusters"),
          sum(col("cluster_size")).cast("long").as("n_vecs"))
        .orderBy("cluster_size")
    },

    // PQ/ADC top-k, SERVED from the persisted index (round 10 — VERDICT
    // r9 #6, built straight onto the r9-#1 index precedent so per-query
    // PQ training never becomes next round's scale wart):
    // product-quantize the corpus (8 subspaces × 256 codes over 10⁻⁴
    // ticks, one hash-seeded Lloyd round — every arithmetic step exact
    // BIGINT, see pqTrainCtes) ONCE per corpus fingerprint into
    // config.PqIndex's lake state (codebook + packed codes); the
    // declared plan READS both, builds each query's 8×256 LUT of
    // subspace dot-products, ADC-scores EVERY stored code row (8
    // integer lookups + adds per candidate — the compressed linear
    // scan PQ exists for), cuts to the top-64 ADC candidates per
    // query, and exact-cosine re-ranks to the final top-5. The integer
    // discipline is what makes the candidate CUT itself deterministic
    // across engines — adc ties at the boundary break on n_id, never
    // on a float. At 100 TB the ADC scan rides the stored IVF cells
    // instead of the full corpus — that composition is declared as
    // llm_ivfpq_topk. Shuffles: one (q_id, n_id) ADC sum — LUT,
    // codebook, candidate and query sides all broadcast.
    Q("llm_pq_topk", pqTopkOracle) { (s, d) =>
      val dir = graft.config.PqIndex.ensure(s, d)
      val codes = graft.config.PqIndex.codes(s, dir)
        .select(col("vec_id").as("n_id"),
          posexplode(col("codes")).as(Seq("j", "code")))
      pqTopkFrom(codes, graft.config.PqIndex.codebook(s, dir),
        emb(s, d).select(col("vec_id"), col("embedding")))
    },

    // Rerank-budget TUNING CURVE (round 12 — the llm_ann_ivf_nprobe
    // doctrine applied to PQ's OTHER dial): mean recall@5 of the
    // stored-PQ ADC shortlist at rerank budgets L ∈ {8, 16, 64} — the
    // curve that prices the exact-rerank cost (every shortlist member
    // pays one full-precision cosine against the base table; 8× fewer
    // candidates is 8× less base-table I/O per query at 100 TB). A
    // true top-5 neighbor is recovered iff it survives the ADC cut —
    // exact re-rank can only reorder, never drop, a true member below
    // rank 5 — so ONE ADC rank pass serves all three budgets (broadcast
    // budget frame, no per-budget re-run, no re-rank replay anywhere).
    // ApproxSpec pins monotonicity + curve(64) == llm_pq_recall's mean.
    Q("llm_pq_rerank_curve", pqRerankCurveOracle) { (s, d) =>
      val dir = graft.config.PqIndex.ensure(s, d)
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val codes = graft.config.PqIndex.codes(s, dir)
        .select(col("vec_id").as("n_id"),
          posexplode(col("codes")).as(Seq("j", "code")))
      val adc = pqAdc(codes, graft.config.PqIndex.codebook(s, dir), e)
      val wc = Window.partitionBy("q_id").orderBy(col("adc").desc, col("n_id"))
      val ranked = adc.withColumn("crn", row_number().over(wc))
        .select(col("q_id").as("t_qid"), col("n_id").as("t_nid"), col("crn"))
      val bud = s.range(1)
        .select(explode(array(lit(8L), lit(16L), lit(64L)))
          .as("rerank_budget"))
      val queries = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        .repartition(probeFanout(s))
      val we = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val exact = c.join(broadcast(queries), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(we))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"))
      exact.crossJoin(broadcast(bud))
        .join(ranked,
          col("t_qid") === col("q_id") && col("t_nid") === col("n_id") &&
            col("crn") <= col("rerank_budget"), "left")
        .groupBy("rerank_budget", "q_id")
        .agg(count(col("t_nid")).as("h"))
        .groupBy("rerank_budget")
        .agg(count(lit(1)).as("n_queries"),
          round(avg(col("h").cast("double")) / 5, 6).as("mean_recall"))
        .orderBy("rerank_budget")
    },

    // The RECOMPUTE twin of llm_pq_topk (the llm_ann_ivf_train /
    // near-dup-registry precedent): identical semantics, identical
    // oracle, training kept INSIDE the declared plan — stored codebook
    // + codes and the live recipe can never drift unnoticed, because
    // both keys must hash-match the same replayed CTE chain.
    Q("llm_pq_topk_train", pqTopkOracle) { (s, d) =>
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      // the subspace tick-frame feeds seeding + two assignment passes +
      // the query LUT — one materialization instead of four scans
      val sv = pqSubFrame(e).persist()
      // trained codebook: ≤2048 rows; localCheckpoint cuts the training
      // lineage so encode/LUT don't each replan seeding + Lloyd
      val cb = pqRecenter(pqAssign(sv, pqSeeds(sv))).localCheckpoint()
      val codes = pqAssign(sv, cb)
        .select(col("vec_id").as("n_id"), col("j"), col("code"))
      pqTopkFrom(codes, cb, e)
    },

    // INGEST-INCREMENTAL PQ serving (round 11 — the llm_ann_ivf_ingest
    // posture applied to the code table): codebook STATIC-TRAINED on
    // the vec_id < 400 base (once per fingerprint, PqIndex.ensureBase),
    // new vectors only ENCODED against the stored codebook — the plan
    // reads the stored base codes, encodes the batch in-plan (∝ batch),
    // unions, and serves the standard ADC top-5. Because encoding is
    // per-vector independent, base-encode ∪ batch-encode ≡
    // encode-everything — the oracle replays base-only training then
    // encodes the whole corpus, so drifted stored codes hash-mismatch.
    // The mutating append is PqIndex.ingest (spec + ScaleSmoke: 0.9 s
    // for a 10k batch vs 14 s for the 1M rebuild).
    Q("llm_pq_topk_ingest", pqTopkIngestOracle) { (s, d) =>
      val dir = graft.config.PqIndex.ensureBase(s, d, 400L)
      val cb = graft.config.PqIndex.codebook(s, dir)
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val batchCodes = pqCodesPacked(pqAssign(
        pqSubFrame(e.where(col("vec_id") >= 400)), cb))
      val codes = graft.config.PqIndex.codes(s, dir)
        .unionByName(batchCodes)
        .select(col("vec_id").as("n_id"),
          posexplode(col("codes")).as(Seq("j", "code")))
      pqTopkFrom(codes, cb, e)
    },

    // PQ retrieval eval (round 10): recall@5 of the stored-index PQ/ADC
    // chain against brute-force exact cosine, per query — the
    // llm_ann_recall readout applied to the new index family, so "are
    // 8 one-byte codes enough at my k?" is an oracle-verified number on
    // the dashboard, not a spec-only claim. Exact side = the
    // llm_knn_per_query plan; PQ side = the llm_pq_topk serving chain.
    Q("llm_pq_recall",
      s"""WITH $pqTopkCtes, ex AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
         |           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
         |                                        CAST(c.embedding AS DOUBLE[])), 6)
         |             DESC, c.vec_id) AS rn
         |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
         |  WHERE q.vec_id < 20
         |), exact AS (
         |  SELECT q_id, n_id FROM ex WHERE rn <= 5
         |)
         |SELECT e.q_id, CAST(count(p.n_id) AS BIGINT) AS n_hit,
         |       round(CAST(count(p.n_id) AS DOUBLE) / 5, 6) AS recall
         |FROM exact e LEFT JOIN pq5 p
         |  ON p.q_id = e.q_id AND p.n_id = e.n_id
         |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin) { (s, d) =>
      val dir = graft.config.PqIndex.ensure(s, d)
      val codes = graft.config.PqIndex.codes(s, dir)
        .select(col("vec_id").as("n_id"),
          posexplode(col("codes")).as(Seq("j", "code")))
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val pq5 = pqTopkFrom(codes, graft.config.PqIndex.codebook(s, dir), e)
        .select(col("q_id"), col("n_id"))
      val q = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val c = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
        .repartition(probeFanout(s))
      val w = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      val exact = c.join(broadcast(q), col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"))
      exact.join(pq5.withColumnRenamed("n_id", "p_nid")
          .withColumnRenamed("q_id", "p_qid"),
          col("p_qid") === col("q_id") && col("p_nid") === col("n_id"),
          "left")
        .groupBy("q_id")
        .agg(count(col("p_nid")).as("n_hit"),
          round(count(col("p_nid")).cast("double") / 5, 6).as("recall"))
        .orderBy("q_id")
    },

    // IVFADC (round 10; Jégou et al. 2011 §IV — the composition the
    // 100 TB ANN recipe actually runs): the stored IVF coarse quantizer
    // routes each query to its 2 nearest cells, the stored PQ codes
    // ADC-score ONLY those cells' members (8 integer lookups per
    // candidate over the 32×-compressed code table), the top-16 ADC
    // candidates re-rank by exact cosine against the inverted file's
    // embedded vectors — the base embeddings table is read only for the
    // 20 bounded query rows. Per-query cost = probe + ∝ probed-cell
    // population; neither index trains in this plan (both ride their
    // fingerprinted lake state; the recompute twins pin the recipes).
    // Both CTE chains replay in the oracle, so a drift in EITHER stored
    // index hash-mismatches this key too.
    Q("llm_ivfpq_topk", ivfpqTopkOracle) { (s, d) =>
      val ivfDir = graft.config.IvfIndex.ensure(s, d)
      val pqDir = graft.config.PqIndex.ensure(s, d)
      val cents = graft.config.IvfIndex.centroids(s, ivfDir)
      val inv = graft.config.IvfIndex.assignments(s, ivfDir)
      val e = emb(s, d).select(col("vec_id"), col("embedding"))
      val queries = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val wq = Window.partitionBy("q_id").orderBy(col("sim").desc, col("cell"))
      val probes = queries.join(broadcast(cents), lit(true))
        .select(col("q_id"), col("cell"),
          round(cosineSim(col("q_emb"), col("cent")), 6).as("sim"))
        .withColumn("rn", row_number().over(wq))
        .where(col("rn") <= 2)
        .select(col("q_id"), col("cell"))
      // inverted-file members of the probed cells: the broadcast probe
      // frame's cell keys dynamic-partition-prune the cell-partitioned
      // scan to the probed cells' files
      val cm = inv.select(col("cell"), col("vec_id").as("n_id"))
        .join(broadcast(probes), Seq("cell"))
        .where(col("n_id") =!= col("q_id"))
        .select(col("q_id"), col("n_id"))
      val codes = graft.config.PqIndex.codes(s, pqDir)
        .select(col("vec_id").as("n_id"),
          posexplode(col("codes")).as(Seq("j", "code")))
      val lut = pqLut(graft.config.PqIndex.codebook(s, pqDir), e)
        .withColumnRenamed("c", "code")
      // candidate list broadcasts INTO the corpus-sized code table —
      // the codes side must never be the built/shuffled side at scale
      val adc = codes.join(broadcast(cm), Seq("n_id"))
        .join(broadcast(lut), Seq("q_id", "j", "code"))
        .groupBy("q_id", "n_id").agg(sum(col("v")).as("adc"))
      val wc = Window.partitionBy("q_id").orderBy(col("adc").desc, col("n_id"))
      val cand = adc.withColumn("crn", row_number().over(wc))
        .where(col("crn") <= 16).select(col("q_id"), col("n_id"), col("adc"))
      val ne = inv.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
      val wr = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
      ne.join(broadcast(cand), Seq("n_id"))
        .join(broadcast(queries), Seq("q_id"))
        .select(col("q_id"), col("n_id"), col("adc"),
          round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
        .withColumn("rn", row_number().over(wr))
        .where(col("rn") <= 5)
        .select(col("q_id"), col("n_id"), col("adc"), col("sim"),
          col("rn").cast("long").as("rn"))
        .orderBy("q_id", "rn")
    }
  )

  /** The ONE PQ top-k oracle text, shared verbatim by the stored-index
    * key (llm_pq_topk) and its recompute twin (llm_pq_topk_train) —
    * the driver hash-comparing both against the same replayed training
    * chain is what pins stored state to the live recipe. */
  private def pqTopkCtesFrom(trainChain: String): String =
    s"""$trainChain, ${pqAssignCte("cb", "penc")}, lut AS (
       |  SELECT sv.vec_id AS q_id, sv.j, cb.c,
       |         CAST(list_sum(list_transform(range(1, ${PqD + 1}),
       |           i -> list_extract(sv.sub, i) * list_extract(cb.cent, i)))
       |           AS BIGINT) AS v
       |  FROM sv JOIN cb ON sv.j = cb.j
       |  WHERE sv.vec_id < 20
       |), adc AS (
       |  SELECT q_id, penc.vec_id AS n_id, CAST(sum(v) AS BIGINT) AS adc
       |  FROM penc JOIN lut ON penc.j = lut.j AND penc.code = lut.c
       |  WHERE penc.vec_id <> lut.q_id
       |  GROUP BY 1, 2
       |), cand AS (
       |  SELECT q_id, n_id, adc FROM (
       |    SELECT q_id, n_id, adc, row_number() OVER (
       |      PARTITION BY q_id ORDER BY adc DESC, n_id) AS crn
       |    FROM adc) WHERE crn <= 64
       |), rr AS (
       |  SELECT c.q_id, c.n_id, c.adc,
       |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                      CAST(n.embedding AS DOUBLE[])), 6)
       |           AS sim
       |  FROM cand c JOIN embeddings q ON q.vec_id = c.q_id
       |              JOIN embeddings n ON n.vec_id = c.n_id
       |), pq5 AS (
       |  SELECT q_id, n_id, adc, sim, CAST(rn AS BIGINT) AS rn FROM (
       |    SELECT q_id, n_id, adc, sim, row_number() OVER (
       |      PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
       |    FROM rr) WHERE rn <= 5
       |)""".stripMargin

  private lazy val pqTopkCtes: String = pqTopkCtesFrom(pqTrainCtes)

  private lazy val pqTopkOracle: String =
    s"""WITH $pqTopkCtes
       |SELECT q_id, n_id, adc, sim, rn FROM pq5
       |ORDER BY q_id, rn""".stripMargin

  /** Rerank-budget curve oracle (round 12): ADC ranks from the replayed
    * PQ chain, brute exact top-5, hit counts per (budget, query) — a
    * true top-5 neighbor is recovered iff it survives the ADC cut
    * (exact re-rank of the shortlist can only reorder, never drop, a
    * true top-5 member below rank 5), so recall@L needs no re-rank
    * replay. */
  private lazy val pqRerankCurveOracle: String =
    s"""WITH $pqTopkCtes, ranked AS (
       |  SELECT q_id, n_id, row_number() OVER (
       |    PARTITION BY q_id ORDER BY adc DESC, n_id) AS crn
       |  FROM adc
       |), bud AS (
       |  SELECT CAST(unnest([8, 16, 64]) AS BIGINT) AS rerank_budget
       |), ex AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
       |           round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                        CAST(c.embedding AS DOUBLE[])), 6)
       |             DESC, c.vec_id) AS rn
       |  FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
       |  WHERE q.vec_id < 20
       |), exact AS (
       |  SELECT q_id, n_id FROM ex WHERE rn <= 5
       |), hits AS (
       |  SELECT b.rerank_budget, e.q_id, CAST(count(t.n_id) AS BIGINT) AS h
       |  FROM bud b CROSS JOIN exact e
       |  LEFT JOIN ranked t ON t.q_id = e.q_id AND t.n_id = e.n_id
       |                    AND t.crn <= b.rerank_budget
       |  GROUP BY 1, 2
       |)
       |SELECT rerank_budget, CAST(count(*) AS BIGINT) AS n_queries,
       |       round(avg(CAST(h AS DOUBLE)) / 5, 6) AS mean_recall
       |FROM hits GROUP BY rerank_budget ORDER BY rerank_budget""".stripMargin

  /** The ingest twin's oracle: base-trained codebook, whole-corpus
    * encode — what stored-base-codes ∪ encode-the-batch must equal. */
  private lazy val pqTopkIngestOracle: String =
    s"""WITH ${pqTopkCtesFrom(pqBaseTrainCtes(400L))}
       |SELECT q_id, n_id, adc, sim, rn FROM pq5
       |ORDER BY q_id, rn""".stripMargin

  /** The IVFADC oracle: BOTH stored-index training chains replayed
    * (coarse quantizer + PQ codebook), then probe → cell-restricted ADC
    * → exact re-rank from the inverted file. */
  private lazy val ivfpqTopkOracle: String =
    s"""WITH $ivfTrainedAssignCtes, $pqTrainCtes,
       |${pqAssignCte("cb", "penc")}, lut AS (
       |  SELECT sv.vec_id AS q_id, sv.j, cb.c,
       |         CAST(list_sum(list_transform(range(1, ${PqD + 1}),
       |           i -> list_extract(sv.sub, i) * list_extract(cb.cent, i)))
       |           AS BIGINT) AS v
       |  FROM sv JOIN cb ON sv.j = cb.j
       |  WHERE sv.vec_id < 20
       |), probes AS (
       |  SELECT q_id, cell FROM (
       |    SELECT e.vec_id AS q_id, c.cell,
       |           row_number() OVER (PARTITION BY e.vec_id ORDER BY
       |             round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
       |                                          CAST(c.cent AS DOUBLE[])), 6)
       |             DESC, c.cell) AS rn
       |    FROM embeddings e CROSS JOIN c2 c
       |    WHERE e.vec_id < 20)
       |  WHERE rn <= 2
       |), cm AS (
       |  SELECT p.q_id, a3.vec_id AS n_id
       |  FROM probes p JOIN a3 ON a3.cell = p.cell
       |  WHERE a3.vec_id <> p.q_id
       |), adcq AS (
       |  SELECT cm.q_id, cm.n_id, CAST(sum(lut.v) AS BIGINT) AS adc
       |  FROM cm JOIN penc ON penc.vec_id = cm.n_id
       |          JOIN lut ON lut.q_id = cm.q_id AND lut.j = penc.j
       |                  AND lut.c = penc.code
       |  GROUP BY 1, 2
       |), cand AS (
       |  SELECT q_id, n_id, adc FROM (
       |    SELECT q_id, n_id, adc, row_number() OVER (
       |      PARTITION BY q_id ORDER BY adc DESC, n_id) AS crn
       |    FROM adcq) WHERE crn <= 16
       |), rr AS (
       |  SELECT c.q_id, c.n_id, c.adc,
       |         round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
       |                                      CAST(n.embedding AS DOUBLE[])), 6)
       |           AS sim
       |  FROM cand c JOIN embeddings q ON q.vec_id = c.q_id
       |              JOIN a3 n ON n.vec_id = c.n_id
       |)
       |SELECT q_id, n_id, adc, sim, CAST(rn AS BIGINT) AS rn FROM (
       |  SELECT q_id, n_id, adc, sim, row_number() OVER (
       |    PARTITION BY q_id ORDER BY sim DESC, n_id) AS rn
       |  FROM rr) WHERE rn <= 5
       |ORDER BY q_id, rn""".stripMargin

  /** LUT build + ADC scan + top-64 cut + exact re-rank — the PQ serving
    * chain shared by the stored-index key and its recompute twin.
    * `codes`: (n_id, j, code); `cb`: codebook rows (j, c, cent);
    * `e`: (vec_id, embedding). Queries are ticked in-plan (20 rows). */
  /** Per-query ADC lookup table: (q_id, j, c, v = qsub·cent in exact
    * tick² BIGINTs) — one row per (query, subspace, code), broadcast-
    * sized (queries are a bounded anchor set). */
  private def pqLut(cb: DataFrame, e: DataFrame): DataFrame =
    pqSubFrame(e.where(col("vec_id") < 20))
      .select(col("vec_id").as("q_id"), col("j"), col("sub").as("qsub"))
      .join(broadcast(cb), Seq("j"))
      .select(col("q_id"), col("j"), col("c"),
        aggregate(zip_with(col("qsub"), col("cent"), (x, y) => x * y),
          lit(0L), (acc, v) => acc + v).as("v"))

  /** The ADC score frame (q_id, n_id, adc) over a code table — factored
    * round 12 so the serving chain and the rerank-budget curve read ONE
    * scan definition. */
  private def pqAdc(
      codes: DataFrame, cb: DataFrame, e: DataFrame): DataFrame = {
    val lut = pqLut(cb, e)
    codes
      .join(broadcast(lut),
        codes("j") === lut("j") && codes("code") === lut("c"))
      .where(col("n_id") =!= col("q_id"))
      .groupBy("q_id", "n_id").agg(sum(col("v")).as("adc"))
  }

  private[graft] def pqTopkFrom(
      codes: DataFrame, cb: DataFrame, e: DataFrame): DataFrame = {
    val adc = pqAdc(codes, cb, e)
    val wc = Window.partitionBy("q_id").orderBy(col("adc").desc, col("n_id"))
    val cand = adc.withColumn("crn", row_number().over(wc))
      .where(col("crn") <= 64).select(col("q_id"), col("n_id"), col("adc"))
    val qe = e.where(col("vec_id") < 20)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val ne = e.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val wr = Window.partitionBy("q_id").orderBy(col("sim").desc, col("n_id"))
    ne.join(broadcast(cand), Seq("n_id"))
      .join(broadcast(qe), Seq("q_id"))
      .select(col("q_id"), col("n_id"), col("adc"),
        round(cosineSim(col("q_emb"), col("n_emb")), 6).as("sim"))
      .withColumn("rn", row_number().over(wr))
      .where(col("rn") <= 5)
      .select(col("q_id"), col("n_id"), col("adc"), col("sim"),
        col("rn").cast("long").as("rn"))
      .orderBy("q_id", "rn")
  }
}
