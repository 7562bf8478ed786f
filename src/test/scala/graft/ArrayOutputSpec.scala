package graft

import graft.functions.Aggregators
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 7 driver-declared queries that USED to emit ARRAY/MAP columns now
  * emit comma-joined strings (the driver's comparator cannot hash array
  * cells). This spec keeps the underlying ARRAY-form semantics tested —
  * each array expression is checked against a driver-side recomputation
  * from the raw data — so the string projection can never silently paper
  * over a regression in the array logic itself.
  */
class ArrayOutputSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("fn_string words: split array equals driver-side split") {
    val rows = Tables(spark, sf, "part")
      .select(col("p_partkey"), col("p_type"), split(col("p_type"), " ").as("words"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](2) == r.getString(1).split(" ", -1).toSeq)
    }
  }

  test("fn_array first4/sorted4: slice and sort_array semantics") {
    val rows = Tables(spark, sf, "embeddings")
      .select(col("embedding"),
        slice(col("embedding"), 1, 4).as("first4"),
        sort_array(slice(col("embedding"), 1, 4)).as("sorted4"))
      .collect()
    rows.foreach { r =>
      val emb = r.getSeq[Float](0)
      assert(r.getSeq[Float](1) == emb.take(4))
      assert(r.getSeq[Float](2) == emb.take(4).sorted)
    }
  }

  test("agg_collect_sorted event_ids: per-user ids ordered by (ts, event_id)") {
    val ev = Tables(spark, sf, "events")
    val got = ev.groupBy("user_id")
      .agg(transform(
        sort_array(collect_list(struct(col("ts"), col("event_id")))),
        x => x.getField("event_id")).as("event_ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = ev.select("user_id", "ts", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (u, rows) =>
        // full micro/nano precision: getTime is ms-truncated, so ordering
        // by it alone could disagree with Spark's full-timestamp sort for
        // same-millisecond events
        u -> rows.sortBy(r => (r._2.getTime, r._2.getNanos, r._3)).map(_._3).toSeq
      }
    assert(got == want)
  }

  test("fn_map ks: sorted map keys") {
    val row = Tables(spark, sf, "events")
      .select(sort_array(map_keys(
        map(lit("k"), lit("1"), lit("type"), lit("x")))).as("ks"))
      .head()
    assert(row.getSeq[String](0) == Seq("k", "type"))
  }

  test("centroid UDAF array equals driver-side elementwise mean") {
    val got = Tables(spark, sf, "embeddings")
      .groupBy("label")
      .agg(Aggregators.centroid(col("embedding")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val want = Tables(spark, sf, "embeddings")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
      .groupBy(_._1)
      .map { case (l, vs) =>
        val n = vs.length
        l -> (0 until 64).map(i => vs.map(_._2(i).toDouble).sum / n)
      }
    got.foreach { case (l, c) =>
      c.zip(want(l)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-9) }
    }
  }

  test("fingerprint array: winnowing window-min properties hold") {
    // reconstruct the pre-stringify array form WITH the production guards
    // (length(text)>=8, size(h)>=4 — short docs fall back to the distinct
    // gram set) and check winnowing laws: every fingerprint value is the
    // min of SOME 4-window of gram hashes, sorted distinct, and every
    // 4-window's min IS in the fingerprint
    val grams = when(length(col("text")) >= 8,
      transform(
        sequence(lit(1), length(col("text")) - 7),
        i => graft.functions.PortableHash.pHash(col("text").substr(i, lit(8)))))
      .otherwise(array())
    val rows = Tables(spark, sf, "documents").limit(50)
      .select(col("doc_id"), grams.as("h"),
        when(size(grams) >= 4,
          array_sort(array_distinct(transform(
            sequence(lit(0), size(grams) - 4),
            j => array_min(slice(grams, j + 1, lit(4)))))))
          .otherwise(array_sort(array_distinct(grams))).as("fp"))
      .collect()
    rows.foreach { r =>
      val h = r.getSeq[Long](1)
      val fp = r.getSeq[Long](2)
      val windowMins =
        if (h.length >= 4) h.sliding(4).map(_.min).toSet else h.toSet
      assert(fp.toSet == windowMins, s"doc ${r.getLong(0)}")
      assert(fp == fp.distinct.sorted)
    }
  }

  test("int8 quantization: values in [-127,127], per-element error ≤ scale/2") {
    val q = SparkEntry.queries("llm_embedding_quantize")(spark, "/root/testdata/sf0.001")
      .collect()
    val embs = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(q.length == embs.size)
    q.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val codes = r.getAs[String]("q8").split(",").map(_.toLong)
      assert(codes.forall(c => c >= -127L && c <= 127L),
        s"vec ${r.getLong(0)}: code outside int8 range")
      // round-to-nearest on the 6dp-rounded grid: each element lands
      // within half a step of its original value
      val xs = embs(r.getLong(0))
      codes.zip(xs).foreach { case (c, x) =>
        assert(math.abs(c * scale - x) <= scale / 2 + 1e-9)
      }
      assert(r.getAs[Double]("mse") <= scale * scale / 4 + 1e-9)
    }
  }

  test("int8-quantized cosine preserves top-k search (recall@10 ≥ 0.9)") {
    // the property that makes llm_embedding_quantize the serving path:
    // ranking by cosine over DEQUANTIZED int8 vectors reproduces the
    // exact float top-k almost verbatim (64-dim, |q·scale − x| ≤ scale/2
    // per element ⇒ relative cosine perturbation ≪ neighbor gaps)
    val exactVecs = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    // dequantize from the DECLARED query's own output (q8 codes + scale),
    // so a change to the production quantizer is what this test exercises
    val deq = SparkEntry.queries("llm_embedding_quantize")(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        val scale = r.getAs[Double]("scale")
        r.getAs[Long]("vec_id") ->
          r.getAs[String]("q8").split(",").map(_.toDouble * scale)
      }.toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / math.sqrt(na * nb)
    }
    def top10(space: Map[Long, Array[Double]], qid: Long) =
      space.iterator.filter(_._1 != qid)
        .map { case (id, v) => id -> cos(v, space(qid)) }
        .toSeq.sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSet
    val qids = exactVecs.keys.toSeq.sorted.take(20)
    val recalls = qids.map { qid =>
      top10(exactVecs, qid).intersect(top10(deq, qid)).size / 10.0
    }
    val meanRecall = recalls.sum / recalls.length
    assert(meanRecall >= 0.9, s"recall@10 over int8 = $meanRecall")
  }

  test("multimodal media struct carries payload/mime/meta through ops") {
    val row = operators.Multimodal.attachMedia(Tables(spark, sf, "documents"))
      .filter(_.doc_id == 0L).head()
    assert(row.media.mime == "image/png") // doc 0: doc_id % 3 == 0
    assert(row.media.meta("n_bytes").toLong == row.media.payload.length.toLong)
    assert(row.media.meta.contains("source"))
  }

  test("sliding chunks: coverage, stride, overlap, and tail laws") {
    // declared llm_chunk_sliding (W=64, S=48) vs a driver-side re-chunk:
    // chunk text/token counts match exactly, consecutive chunks overlap
    // by W-S tokens, every token lands in some chunk, and only the tail
    // may run short.
    val chunks = SparkEntry.queries("llm_chunk_sliding")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .groupBy(_._1)
    val docsById = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == docsById.keySet, "every doc must be chunked")
    docsById.foreach { case (id, text) =>
      val toks = text.split(" ", -1).toSeq
      val starts = 0 until toks.length by 48
      val got = chunks(id).sortBy(_._2)
      assert(got.map(_._2).toSeq == starts.indices.map(_.toLong).toSeq,
        s"doc $id chunk_ids must be dense from 0")
      got.zip(starts).foreach { case ((_, _, chunk, nTok), st) =>
        val want = toks.slice(st, st + 64)
        assert(chunk == want.mkString(" "), s"doc $id start $st text")
        assert(nTok == want.length.toLong, s"doc $id start $st count")
      }
      // coverage law: the last chunk ends exactly at the last token, so
      // with stride < window every token is inside some chunk
      assert(starts.last + got.last._4 == toks.length.toLong,
        s"doc $id tail must end exactly at the last token")
    }
  }
}
