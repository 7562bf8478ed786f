package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable token accounting for the token-denominated §2.K operators
  * (llm_pack_sequences / llm_corpus_build packing budgets). A training-data
  * pipeline packs sequences by TOKENIZER tokens (BPE/WordPiece subwords),
  * not whitespace words — whitespace undercounts by the subword fan-out
  * (~1.3–1.7× for English, far worse for unsegmented CJK), so a 2048-token
  * pack budgeted in whitespace words overflows the model context at train
  * time. Strategy objects keep the Spark column expression and the DuckDB
  * oracle SQL for the SAME tokenization in one place (TokenizerSpec pins
  * Spark == reference greedy implementation; the driver pins Spark ==
  * DuckDB at sf0.01 via llm_pack_sequences_bpe).
  *
  * Scale posture: both tokenizers are pure codegen'd expression chains over
  * the scan — no UDF, no shuffle, no driver involvement. The subword vocab
  * here is a literal compiled into the expression (equivalently: a
  * broadcast); a production 50k-piece BPE vocab would move to a custom
  * Expression holding the piece trie in a broadcast variable — same plan
  * shape, same per-row cost model (greedy longest-match is O(chars) with
  * trie lookup, O(chars × |vocab|) with this literal chain).
  */
sealed trait Tokenizer {

  /** BIGINT token count of one text value (space-separated words). */
  def countCol(text: Column): Column
}

/** The round-1..3 default: tokens = space-separated words. Kept as the
  * default everywhere an existing oracle depends on it.
  */
object WhitespaceTokenizer extends Tokenizer {
  override def countCol(text: Column): Column =
    size(split(text, " ")).cast("long")

  /** DuckDB twin (scalar, for inlining). */
  def countSql(text: String): String =
    s"CAST(len(string_split($text, ' ')) AS BIGINT)"
}

/** Greedy longest-prefix-match subword tokenizer (WordPiece-style
  * inference) over a fixed inlined vocab. Per word, repeatedly strip the
  * longest vocab piece that prefixes the remainder (single character as
  * fallback — every char is implicitly in-vocab, so tokenization never
  * fails); token count = number of strips. Unsegmented scripts (CJK — no
  * spaces) therefore cost ~1 token per character unless pieces match,
  * which is exactly the real-tokenizer behavior whitespace counting
  * misses.
  *
  * Determinism contract: match priority is length-desc then lexicographic,
  * generated from ONE Scala list into both the Spark when-chain and the
  * DuckDB CASE chain, so the two engines cannot disagree on which piece
  * wins.
  */
object SubwordTokenizer extends Tokenizer {

  /** Multi-char merge pieces, BPE-flavored for the harness corpus domain:
    * common English suffixes/digraphs + frequent corpus stems. Single
    * chars are the implicit fallback and never need listing.
    */
  val vocab: Seq[String] = Seq(
    "tion", "ment", "ing", "er", "ed", "es", "ly", "re", "un",
    "st", "sc", "ch", "sh", "th", "qu", "ow", "or", "ar", "an", "in",
    "le", "al", "ue", "ba", "ta", "val", "win", "join", "sort", "the")

  /** Priority order: longest first, ties lexicographic. */
  private val byPriority: Seq[String] = vocab.sortBy(p => (-p.length, p))

  /** Length of the winning piece at the head of `rem` (1 = char fallback). */
  private def matchLen(rem: Column): Column =
    byPriority.foldRight(lit(1): Column)((p, fallback) =>
      when(rem.startsWith(p), lit(p.length)).otherwise(fallback))

  /** Greedy token count of ONE word: fold over at most length(w) strip
    * steps (each step consumes ≥1 char, so length(w) steps always reach
    * the empty remainder; exhausted-early steps pass the state through).
    */
  private def wordTokens(w: Column): Column = {
    val folded = aggregate(
      sequence(lit(1), greatest(length(w), lit(1))),
      struct(w.as("rem"), lit(0L).as("cnt")),
      (acc, _) => {
        val rem = acc.getField("rem")
        val ml = matchLen(rem)
        when(length(rem) === 0, acc).otherwise(struct(
          rem.substr(ml + lit(1), length(rem)).as("rem"),
          (acc.getField("cnt") + lit(1L)).as("cnt")))
      },
      acc => acc.getField("cnt"))
    when(length(w) === 0, lit(0L)).otherwise(folded)
  }

  /** Per-document subword token count: sum of per-word greedy counts. */
  override def countCol(text: Column): Column =
    aggregate(transform(split(text, " "), wordTokens(_)), lit(0L), _ + _)

  private def mlSql: String =
    byPriority.map(p => s"WHEN starts_with(rem, '$p') THEN ${p.length}")
      .mkString("CASE ", " ", " ELSE 1 END")

  /** DuckDB twin as a CTE chain ending in `sw_ntok(doc_id, n_tok)` over
    * the `documents` table. The greedy strip loop is a recursive CTE (one
    * row per in-flight word remainder; every chain terminates at the empty
    * remainder, where the word's final count is harvested). The enclosing
    * WITH must be declared RECURSIVE.
    */
  def ntokCtes: String =
    s"""sw_words AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
       |), sw_step(doc_id, rem, cnt) AS (
       |  SELECT doc_id, w, 0 FROM sw_words
       |  UNION ALL
       |  SELECT doc_id, substr(rem, ml + 1), cnt + 1
       |  FROM (SELECT doc_id, rem, cnt, $mlSql AS ml
       |        FROM sw_step WHERE len(rem) > 0)
       |), sw_ntok AS (
       |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok
       |  FROM sw_step WHERE len(rem) = 0 GROUP BY doc_id
       |)""".stripMargin

  /** Reference greedy tokenization of one word (driver-side Scala, for
    * specs): the definitional semantics both engine twins must reproduce.
    */
  def referenceWordTokens(w: String): Long = {
    var rem = w
    var cnt = 0L
    while (rem.nonEmpty) {
      val piece = byPriority.find(rem.startsWith).map(_.length).getOrElse(1)
      rem = rem.substring(piece)
      cnt += 1
    }
    cnt
  }

  /** Reference per-document count (space-split, like the engines). */
  def referenceCount(text: String): Long =
    text.split(" ", -1).map(referenceWordTokens).sum
}
