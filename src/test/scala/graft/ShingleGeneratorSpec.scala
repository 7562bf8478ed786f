package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ShingleGenerator.shingles
import org.scalatest.funsuite.AnyFunSuite

class ShingleGeneratorSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("emits n-token shingles in order") {
    val out = Seq("a b c d").toDF("text")
      .select(shingles(split($"text", " "), 3).as("s"))
      .as[String].collect().toSeq
    assert(out == Seq("a b c", "b c d"))
  }

  test("fewer tokens than n yields no rows; null yields no rows") {
    val df = Seq(Some("a b"), None).toDF("text")
    assert(df.select(shingles(split($"text", " "), 3)).count() == 0)
  }

  test("matches the transform+explode formulation on real documents") {
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val toks = split(col("text"), " ")
    val viaTransform = docs.select(
      col("doc_id"),
      explode(
        when(size(toks) >= 3,
          transform(sequence(lit(0), size(toks) - 3),
            i => concat_ws(" ", slice(toks, i + 1, lit(3)))))
          .otherwise(array())).as("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), countDistinct("s").as("d"))
    val viaGenerator = docs.select(
      col("doc_id"), shingles(split(col("text"), " "), 3).as("s"))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), countDistinct("s").as("d"))
    assert(viaGenerator.exceptAll(viaTransform).count() == 0)
    assert(viaTransform.exceptAll(viaGenerator).count() == 0)
  }

  test("width 1 degenerates to explode of the tokens") {
    val out = Seq("x y z").toDF("text")
      .select(shingles(split($"text", " "), 1).as("s"))
      .as[String].collect().toSeq
    assert(out == Seq("x", "y", "z"))
  }
}
