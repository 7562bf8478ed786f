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

  test("piiCounts audit matches the redactions") {
    val row = Seq("a@b.io c@d.org 10.0.0.1 call 415-555-0123")
      .toDF("t").select(TextNorm.piiCounts($"t")).as[Map[String, Long]].head()
    assert(row("<EMAIL>") == 2L)
    assert(row("<IP>") == 1L)
    assert(row("<PHONE>") == 1L)
    assert(row("<SSN>") == 0L)
  }
}
