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
}
