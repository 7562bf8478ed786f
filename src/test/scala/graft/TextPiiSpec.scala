package graft

import graft.functions.TextNorm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII scrubbing on planted text (the harness corpus itself is clean, so
  * redaction behavior needs plants): every pattern family redacts, clean
  * text is untouched, the pass is idempotent, and the audit counts agree
  * with the redactions.
  */
class TextPiiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def scrub(s: String): String =
    Seq(s).toDF("t").select(TextNorm.scrubPii($"t")).as[String].head()

  test("each PII family redacts to its tag") {
    assert(scrub("contact john.doe+spam@example-mail.co.uk today") ==
      "contact <EMAIL> today")
    assert(scrub("ssn 123-45-6789 on file") == "ssn <SSN> on file")
    assert(scrub("from 192.168.001.1 port 80") == "from <IP> port 80")
    assert(scrub("call +1 (415) 555-0123 now") == "call <PHONE> now")
    assert(scrub("call 415-555-0123 now") == "call <PHONE> now")
  }

  test("clean text is untouched; ordering protects SSN/IP from the phone pattern") {
    val clean = "the fast scan window merge batch 42 items"
    assert(scrub(clean) == clean)
    // an SSN is phone-shaped (3-2-4 digits) — it must become <SSN>, not <PHONE>
    assert(scrub("id 123-45-6789").contains("<SSN>"))
    assert(!scrub("id 123-45-6789").contains("<PHONE>"))
    assert(scrub("host 10.0.0.1").contains("<IP>"))
  }

  test("scrubbing is idempotent") {
    val planted = "a@b.io or 415-555-0123 or 10.0.0.1 or 123-45-6789 end"
    val once = scrub(planted)
    assert(scrub(once) == once)
  }

  test("corpusBuild scrubPii stage: pack budget counts redacted text") {
    // each doc carries a long email whose local-part would tokenize into
    // many subwords; scrubbed it is ONE <EMAIL> whitespace token. Dedup
    // still runs on raw text (distinct unique words per doc → no dedup).
    val docs = (0L until 6L).map { i =>
      (i, s"u${i}a report from alpha.beta.gamma.delta.u$i@example-corp.com sent", "src0")
    }.toDF("doc_id", "text", "source")
    def totTok(scrub: Boolean): Long = {
      val t = graft.operators.Llm
        .corpusBuild(docs, qualityMin = 0.0, scrubPii = scrub)
        .agg(sum("n_tok")).as[Long].head()
      spark.catalog.clearCache()
      t
    }
    val (raw, scrubbed) = (totTok(false), totTok(true))
    assert(raw == scrubbed,
      "whitespace token count is insensitive here — email is one word either way")
    // with the SUBWORD tokenizer the divergence is visible: the raw email
    // fans out into many pieces, the <EMAIL> tag does not
    def totSub(scrub: Boolean): Long = {
      val t = graft.operators.Llm
        .corpusBuild(docs, qualityMin = 0.0,
          tokenizer = graft.functions.SubwordTokenizer, scrubPii = scrub)
        .agg(sum("n_tok")).as[Long].head()
      spark.catalog.clearCache()
      t
    }
    assert(totSub(false) > totSub(true) + 6 * 10,
      s"scrubbed email must cost far fewer subword tokens: raw=${totSub(false)} scrubbed=${totSub(true)}")
  }

  test("piiCounts audit matches the redactions") {
    val row = Seq("a@b.io c@d.org 10.0.0.1 call 415-555-0123")
      .toDF("t").select(TextNorm.piiCounts($"t")).as[Map[String, Long]].head()
    assert(row("<EMAIL>") == 2L)
    assert(row("<IP>") == 1L)
    assert(row("<PHONE>") == 1L)
    assert(row("<SSN>") == 0L)
  }

  test("phone pattern is start-anchored: no partial redaction inside longer digit runs") {
    // round-5 advice fix: with only a trailing \b, a 13-digit account id
    // had its 10-digit SUFFIX redacted, leaving '991<PHONE>'.
    val acct = "account 9914155550123 on file"
    assert(scrub(acct) == acct, s"13-digit id must be untouched: ${scrub(acct)}")
    // a real phone right after a non-digit boundary still redacts, and the
    // boundary character survives the rewrite
    assert(scrub("x:4155550123.") == "x:<PHONE>.")
    assert(scrub("4155550123 leads the line") == "<PHONE> leads the line")
  }

  test("piiCounts does not double-count overlapping families") {
    // the email's local part is phone-shaped (10 digits) and its domain is
    // IP-shaped; counting each pattern on the already-scrubbed text means
    // it is ONE <EMAIL>, zero <PHONE>/<IP> — exactly what scrubPii does.
    val row = Seq("mail 4155550123@10.0.0.1.example.com sent")
      .toDF("t").select(TextNorm.piiCounts($"t")).as[Map[String, Long]].head()
    assert(row("<EMAIL>") == 1L)
    assert(row("<PHONE>") == 0L)
    assert(row("<IP>") == 0L)
    val scrubbed = scrub("mail 4155550123@10.0.0.1.example.com sent")
    assert(scrubbed == "mail <EMAIL> sent", scrubbed)
  }
}
