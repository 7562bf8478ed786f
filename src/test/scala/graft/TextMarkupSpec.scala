package graft

import graft.functions.TextNorm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Markup → text extraction on planted HTML (round 11 — the TextPiiSpec
  * planted-fixture pattern): container blocks drop before tag-strip,
  * entities decode after, whitespace collapses, and the chain is
  * idempotent exactly on markup-free text (the declared key's output
  * over the harness corpus).
  */
class TextMarkupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ex(s: String): String =
    Seq(s).toDF("t").select(TextNorm.stripMarkup($"t")).as[String].head()

  test("real-page shape: blocks, tags, comments, entities, whitespace") {
    val html =
      """<html><head><title>t</title>
        |<style type="text/css">body { color: red; }
        |p > a { x: 1; }</style>
        |<script>if (a < b && b > c) { emit("&amp;"); }
        |// multi-line
        |</script></head>
        |<body><!-- nav
        |boilerplate --><h1>Title</h1>
        |<p class="x">hello   world</p><br/>&amp; &lt;tag&gt;&nbsp;&#39;q&#39;</body></html>""".stripMargin
    assert(ex(html) == "t Title hello world & <tag> 'q'")
  }

  test("container drop precedes tag-strip: a '<' inside script cannot " +
    "open a phantom tag that eats following text") {
    // if tags stripped first, "<b && c > visible" would vanish
    assert(ex("<script>1 < 2</script>visible <b>text</b>") ==
      "visible text")
    assert(ex("<style>a < b {}</style>kept") == "kept")
  }

  test("entities decode AFTER tag-strip: literal markup in prose " +
    "becomes visible text, never re-parsed; single-pass decode") {
    assert(ex("say &lt;script&gt;x&lt;/script&gt; aloud") ==
      "say <script>x</script> aloud")
    // &amp;lt; is the ESCAPED text "&lt;" — one decode pass, not two
    assert(ex("a &amp;lt; b") == "a &lt; b")
  }

  test("fuzz: random nestings of blocks/tags/comments around known " +
    "visible words always recover exactly those words in order") {
    // a deterministic structural fuzz (seeded) — every generated page
    // interleaves visible words with markup noise; extraction must
    // return the visible words, whole and in order, for every shape
    val rnd = new scala.util.Random(20260816L)
    val noise = Seq(
      () => s"<div class='x${rnd.nextInt(9)}'>",
      () => "</div>",
      () => s"<script>var a = ${rnd.nextInt(9)} < ${rnd.nextInt(9)};</script>",
      () => s"<style>.c${rnd.nextInt(9)} { k: v; }</style>",
      () => s"<!-- n${rnd.nextInt(9)} -->",
      () => "<br/>",
      () => "\n", () => "  ")
    (1 to 50).foreach { _ =>
      val words = (1 to 1 + rnd.nextInt(6)).map(i => s"w${rnd.nextInt(100)}i$i")
      val page = words.map { w =>
        val pre = (0 until rnd.nextInt(3)).map(_ =>
          noise(rnd.nextInt(noise.length))()).mkString
        val post = (0 until rnd.nextInt(3)).map(_ =>
          noise(rnd.nextInt(noise.length))()).mkString
        s"$pre $w $post"
      }.mkString(" ")
      assert(ex(page) == words.mkString(" "),
        s"extraction diverged for page:\n$page")
    }
  }

  test("idempotent on markup-free text; declared key output is exact " +
    "over a planted doc") {
    val clean = "plain words stay exactly as they are"
    assert(ex(clean) == clean)
    // the declared key's construction on one synthetic doc
    val row = Seq((7L, "alpha beta")).toDF("doc_id", "text")
      .select(TextNorm.stripMarkup(concat(
        lit("<html><body><h1>Doc "), col("doc_id").cast("string"),
        lit("</h1><p>"), col("text"),
        lit("</p>&amp; &lt;tail&gt;</body></html>"))).as("clean"))
      .as[String].head()
    assert(row == "Doc 7 alpha beta & <tail>")
    // extraction output of markup-free input is a fixpoint
    assert(ex("Doc 7 alpha beta") == "Doc 7 alpha beta")
  }
}
