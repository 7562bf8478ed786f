package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE content-normalization chain for dedup keys — lowercase → strip
  * non-alnum → collapse space runs → trim — defined once so batch dedup
  * (llm_exact_dedup), streaming ingest dedup
  * (Streaming.contentDedupWithinWatermark) and the DuckDB oracle can never
  * silently diverge.
  */
object TextNorm {

  def normText(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))

  /** DuckDB oracle twin of [[normText]] over column `text`. */
  val normSql: String =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"

  // ------------------------------------------------------------------
  // PII scrubbing (round 4): the redaction pass a training corpus runs
  // before packing — emails, SSN-shaped ids, IPv4s, then phone-shaped
  // digit runs (ORDER MATTERS: the generic phone pattern would otherwise
  // eat SSN/IP substrings), each replaced by a stable tag so downstream
  // token counts stay deterministic. A pure codegen'd regexp_replace
  // chain over the scan — per-row cost is the regex scan, no UDF, no
  // shuffle; at 100 TB this rides the same single corpus pass as
  // normalization. Spec-only (the harness corpus contains no PII to
  // redact — TextPiiSpec plants some); patterns are Java-regex, kept
  // RE2-compatible (no backrefs/lookarounds) for engine portability.
  // ------------------------------------------------------------------

  /** (pattern, replacement tag), applied in order. */
  val piiPatterns: Seq[(String, String)] = Seq(
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    ("\\b[0-9]{1,3}(\\.[0-9]{1,3}){3}\\b", "<IP>"),
    ("(\\+[0-9]{1,3}[-. ]*)?(\\([0-9]{3}\\)|[0-9]{3})[-. ]*[0-9]{3}[-. ]*[0-9]{4}\\b",
      "<PHONE>"))

  /** Redact PII spans in `c`, in pattern order. */
  def scrubPii(c: Column): Column =
    piiPatterns.foldLeft(c) { case (col, (pat, tag)) =>
      regexp_replace(col, pat, tag)
    }

  /** Count of redactions per pattern tag — the audit surface a corpus
    * build logs per shard (`map(tag -> n)` via one pass per pattern).
    */
  def piiCounts(c: Column): Column =
    map(piiPatterns.flatMap { case (pat, tag) =>
      Seq(lit(tag),
        (size(split(c, pat, -1)) - 1).cast("long"))
    }: _*)
}
