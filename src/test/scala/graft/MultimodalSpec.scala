package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaCodec, MediaRow, StubCodec}
import org.scalatest.funsuite.AnyFunSuite

/** Pins the REAL properties of the multimodal plumbing — schema, batch
  * shape, partition preservation, determinism — around the honestly-stubbed
  * codec (no image/audio libs in this container).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def media = Multimodal.attachMedia(Tables(spark, sf, "documents"))

  test("decodeFeatures: schema and deterministic per-row values") {
    val out = Multimodal.decodeFeatures(media).collect()
    assert(out.length == media.count())
    assert(out.forall(_.features.length == 8))
    // deterministic: same input → bitwise-same features
    val again = Multimodal.decodeFeatures(media).collect()
    assert(out.sortBy(_.doc_id).zip(again.sortBy(_.doc_id))
      .forall { case (a, b) => a.features.sameElements(b.features) })
    // stub features match a direct driver-side call per row
    val byId = out.map(f => f.doc_id -> f).toMap
    media.collect().foreach { r =>
      val expect = StubCodec.decodeBatch(Seq(r.media.payload), r.media.mime).head
      assert(byId(r.doc_id).features.sameElements(expect))
      assert(byId(r.doc_id).n_bytes == r.media.payload.length.toLong)
    }
  }

  test("decodeFeatures: codec is invoked batch-at-a-time within the cap") {
    // task closures are serialized even in local mode, so batch sizes are
    // reported through an accumulator, not a captured collection
    val seen = spark.sparkContext.collectionAccumulator[Int]("batchSizes")
    val countingCodec = new MediaCodec {
      override def decodeBatch(
          payloads: Seq[Array[Byte]], mime: String): Seq[Array[Float]] = {
        seen.add(payloads.size)
        StubCodec.decodeBatch(payloads, mime)
      }
    }
    val n = Multimodal.decodeFeatures(media.repartition(2), countingCodec,
      batchSize = 16).count()
    val sizes = {
      import scala.jdk.CollectionConverters._
      seen.value.asScala.map(_.toInt).toSeq
    }
    assert(n == media.count())
    assert(sizes.nonEmpty && sizes.forall(_ <= 16),
      s"codec must never see more than batchSize rows: $sizes")
    assert(sizes.sum == n, "every row decoded exactly once")
    // full batches split ~evenly across the 3 mimes before the codec call,
    // so a healthy batch is around batchSize/3 — not degenerate singletons
    assert(sizes.max >= 5, s"batches degenerated: $sizes")
  }

  test("decodeFeatures and sampleFrames are narrow: no shuffle in the plan") {
    for (plan <- Seq(
      Multimodal.decodeFeatures(media).queryExecution.executedPlan.toString,
      Multimodal.sampleFrames(media, 2).queryExecution.executedPlan.toString)) {
      assert(!plan.contains("Exchange"),
        s"multimodal ops must preserve partitioning:\n$plan")
    }
  }

  test("MediaHeaderCodec decodes REAL planted PNG and JPEG bytes through the batch path") {
    import graft.operators.Multimodal.{Media, MediaHeaderCodec}
    import spark.implicits._
    // real encoders from the JDK produce the planted bytes; the codec
    // must recover the true dimensions by parsing the actual containers
    def encodeImg(w: Int, h: Int, fmt: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) img.setRGB(x, y, (x * 31 + y) << 8)
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, Media(encodeImg(7, 5, "png"), "image/png", Map())),
      MediaRow(2L, Media(encodeImg(33, 17, "png"), "image/png", Map())),
      MediaRow(3L, Media(encodeImg(12, 9, "jpg"), "image/jpeg", Map())),
      MediaRow(4L, Media("not an image".getBytes, "image/png", Map())),
      MediaRow(5L, Media(encodeImg(4, 4, "png"), "audio/wav", Map())))
    val got = Multimodal
      .decodeFeatures(spark.createDataset(rows), MediaHeaderCodec)
      .collect().map(f => f.doc_id -> f.features).toMap
    // [w, h, depth, channels, aspect, log2 bytes, parsed, 0]
    assert(got(1L).take(4).sameElements(Array(7f, 5f, 8f, 3f)) && got(1L)(6) == 1f)
    assert(got(2L).take(4).sameElements(Array(33f, 17f, 8f, 3f)))
    assert(got(2L)(4) == 33f / 17f)
    assert(got(3L).take(4).sameElements(Array(12f, 9f, 8f, 3f)) && got(3L)(6) == 1f)
    // malformed payload and non-image mime: stub fallback, parsed-flag 0
    assert(got(4L)(6) == 0f && got(5L)(6) == 0f)
    assert(got.values.forall(_.length == 8), "batch contract: fixed arity")
  }

  test("MediaHeaderCodec decodes REAL planted WAV bytes: rate/channels/bits/duration") {
    // round-5: the declared multimodal fixture emits audio/wav mimes that
    // the round-4 codec could not touch. The planted bytes come from the
    // JDK's own WAV writer (javax.sound.sampled), so the codec is parsing
    // a genuine RIFF container, not a hand-rolled approximation.
    import graft.operators.Multimodal.{Media, MediaHeaderCodec}
    def encodeWav(sampleRate: Float, channels: Int, bits: Int,
        nFrames: Int): Array[Byte] = {
      val fmt = new javax.sound.sampled.AudioFormat(
        sampleRate, bits, channels, true, false)
      val frameBytes = channels * bits / 8
      val pcm = Array.tabulate(nFrames * frameBytes)(i => (i * 37 % 251).toByte)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val rows = Seq(
      MediaRow(1L, Media(encodeWav(16000f, 1, 16, 16000), "audio/wav", Map())),
      MediaRow(2L, Media(encodeWav(44100f, 2, 16, 4410), "audio/wav", Map())),
      MediaRow(3L, Media(encodeWav(8000f, 1, 8, 800), "audio/x-wav", Map())),
      MediaRow(4L, Media("not audio at all".getBytes, "audio/wav", Map())))
    val got = Multimodal
      .decodeFeatures(spark.createDataset(rows)(
        org.apache.spark.sql.Encoders.product[MediaRow]), MediaHeaderCodec)
      .collect().map(f => f.doc_id -> f.features).toMap
    // [sample_rate, channels, bits, duration_sec, byte_rate, log2, parsed, 1]
    assert(got(1L).take(3).sameElements(Array(16000f, 1f, 16f)))
    assert(math.abs(got(1L)(3) - 1.0f) < 1e-3, s"1s clip: ${got(1L)(3)}")
    assert(got(1L)(4) == 32000f && got(1L)(6) == 1f && got(1L)(7) == 1f)
    assert(got(2L).take(3).sameElements(Array(44100f, 2f, 16f)))
    assert(math.abs(got(2L)(3) - 0.1f) < 1e-3, s"0.1s clip: ${got(2L)(3)}")
    assert(got(3L).take(3).sameElements(Array(8000f, 1f, 8f)))
    // malformed payload: stub fallback, parsed-flag 0
    assert(got(4L)(6) == 0f)
    assert(got.values.forall(_.length == 8), "batch contract: fixed arity")
  }

  test("MediaHeaderCodec decodes MP4/ISO-BMFF headers: timescale/duration/tracks") {
    // no MP4 writer ships with the JDK, so the fixture is assembled
    // box-by-box to the ISO-BMFF spec (the same bytes ffmpeg would lead
    // with): ftyp, then moov containing a v0 or v1 mvhd and trak children
    import graft.operators.Multimodal.{Media, MediaHeaderCodec}
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(payload.length + 8)
      bb.putInt(payload.length + 8).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    def mvhdV0(timescale: Int, duration: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(100) // spec size of mvhd v0 payload
      bb.putInt(0) // version 0 + flags
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(timescale).putInt(duration)
      box("mvhd", bb.array())
    }
    def mvhdV1(timescale: Int, duration: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(112)
      bb.put(1.toByte).put(new Array[Byte](3)) // version 1 + flags
        .putLong(0L).putLong(0L) // ctime, mtime (64-bit in v1)
        .putInt(timescale).putLong(duration)
      box("mvhd", bb.array())
    }
    val ftyp = box("ftyp",
      "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 1) ++
        "isomavc1".getBytes("US-ASCII"))
    val trak = box("trak", box("tkhd", new Array[Byte](84)))
    def mp4(mvhd: Array[Byte], nTrak: Int): Array[Byte] =
      ftyp ++ box("moov", mvhd ++ Array.fill(nTrak)(trak).flatten) ++
        box("mdat", Array.fill(64)(7.toByte))
    val rows = Seq(
      MediaRow(1L, Media(mp4(mvhdV0(600, 3000), 2), "video/mp4", Map())),
      MediaRow(2L, Media(mp4(mvhdV1(90000, 2700000L), 1), "video/mp4", Map())),
      MediaRow(3L, Media("definitely not an mp4".getBytes, "video/mp4", Map())))
    val got = Multimodal
      .decodeFeatures(spark.createDataset(rows)(
        org.apache.spark.sql.Encoders.product[MediaRow]), MediaHeaderCodec)
      .collect().map(f => f.doc_id -> f.features).toMap
    // [timescale, duration_sec, n_tracks, 0, 0, log2, parsed, 2]
    assert(got(1L).take(3).sameElements(Array(600f, 5f, 2f)), got(1L).mkString(","))
    assert(got(1L)(6) == 1f && got(1L)(7) == 2f)
    assert(got(2L).take(3).sameElements(Array(90000f, 30f, 1f)), got(2L).mkString(","))
    assert(got(3L)(6) == 0f, "malformed payload must fall back to stub")
  }

  test("sampleFrames emits every k-th 32-byte frame") {
    val r: MediaRow = media.filter(_.doc_id == 0L).head()
    val expectFrames = r.media.payload.grouped(32).zipWithIndex
      .collect { case (b, i) if i % 2 == 0 => i }.toSeq
    val got = Multimodal.sampleFrames(media, 2).filter(_.doc_id == 0L)
      .collect().map(_.frame_no).toSeq.sorted
    assert(got == expectFrames)
    assert(got.length >= 1)
  }
}
