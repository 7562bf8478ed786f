package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2.K `llm_multimodal_col`'s
  * typed, batch-processing backbone): image/audio/video payloads ride as
  * opaque `binary` columns with typed metadata, and the decode /
  * feature-extract / frame-sample steps run batch-at-a-time inside
  * `mapPartitions` — the Scala analog of the mapInPandas/mapInArrow batch
  * shape: a real codec amortizes per-BATCH init (model load, decoder
  * context) instead of paying it per row, and the operation is narrow
  * (partitioning preserved, no shuffle), so at 100 TB it scales as one
  * pass over the payload partitions with no data movement.
  *
  * The codec itself is a clearly-marked deterministic STUB ([[StubCodec]])
  * — this container ships no image/audio libraries — but everything the
  * cluster cares about (schema, batch shape, partition-preservation,
  * serialization) is real and pinned by MultimodalSpec.
  */
object Multimodal {

  /** Typed media value: payload bytes + mime + string metadata. */
  final case class Media(payload: Array[Byte], mime: String, meta: Map[String, String])
  final case class MediaRow(doc_id: Long, media: Media)
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Long, features: Array[Float])
  final case class Frame(doc_id: Long, frame_no: Int, frame: Array[Byte])

  /** Batch decode interface — one call per ≤`batchSize` rows of one
    * partition, mirroring the Arrow-batch UDF contract. Implementations
    * must be deterministic per (payload, mime).
    */
  trait MediaCodec extends Serializable {
    def decodeBatch(payloads: Seq[Array[Byte]], mime: String): Seq[Array[Float]]
  }

  /** STUB codec: derives 8 deterministic pseudo-features from payload
    * bytes (sum/len/first/last byte mixes). A real deployment swaps this
    * for an image/audio model behind the same batch interface.
    */
  object StubCodec extends MediaCodec {
    override def decodeBatch(
        payloads: Seq[Array[Byte]], mime: String): Seq[Array[Float]] =
      payloads.map { b =>
        val sum = b.foldLeft(0L)((a, x) => a + (x & 0xff))
        Array.tabulate(8)(i =>
          (((sum + i * 31) % 256).toFloat +
            (if (b.isEmpty) 0f else (b(i % b.length) & 0xff).toFloat)) / 256f)
      }
  }

  /** REAL byte decoder (round 4 images, round 5 audio + video):
    * container-format header parsing for PNG, JPEG, WAV/RIFF, and
    * MP4/ISO-BMFF — actual decoding of actual media bytes, no libraries
    * needed (all four are public specs: PNG IHDR is the first chunk
    * after the 8-byte signature; JPEG dimensions live in the SOF0/1/2
    * segment; WAV format metadata lives in the RIFF `fmt ` chunk; MP4
    * timing lives in `moov`→`mvhd`). Deliberately header-only: a 100 TB
    * media crawl needs (width, height, depth, channels) / (sample rate,
    * channels, bits, duration) / (timescale, duration, tracks) for
    * filtering/bucketing WITHOUT paying a full pixel/sample decode per
    * object — header parsing touches <1 KB per payload regardless of
    * media size. Unknown mimes and malformed payloads fall back to
    * [[StubCodec]] features with the parsed-flag feature slot at 0, so
    * the batch contract (one feature row per input, fixed arity) holds
    * for mixed corpora.
    *
    * Feature layout (arity 8, same as StubCodec; slot 7 = modality,
    * 0 = image / 1 = audio / 2 = video):
    *  - image: [width, height, bit-depth/precision, channels, aspect
    *    (w/h), log2(n_bytes+1), parsed-flag = 1, 0]
    *  - audio: [sample_rate, channels, bits_per_sample, duration_sec,
    *    byte_rate, log2(n_bytes+1), parsed-flag = 1, 1]
    *  - video: [timescale, duration_sec, n_tracks, 0, 0,
    *    log2(n_bytes+1), parsed-flag = 1, 2]
    */
  object MediaHeaderCodec extends MediaCodec {
    private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
    private def u16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
    private def u32(b: Array[Byte], i: Int): Long =
      (u16(b, i).toLong << 16) | u16(b, i + 2)

    private val pngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** PNG: signature, then IHDR is REQUIRED first chunk — width/height
      * at fixed offsets 16/20 (big-endian), bit depth 24, color type 25.
      */
    private def png(b: Array[Byte]): Option[(Long, Long, Int, Int)] =
      if (b.length >= 26 && b.take(8).sameElements(pngSig) &&
        new String(b.slice(12, 16), "US-ASCII") == "IHDR") {
        val channels = u8(b, 25) match {
          case 0 => 1 case 2 => 3 case 3 => 1 case 4 => 2 case 6 => 4
          case _ => 0
        }
        Some((u32(b, 16), u32(b, 20), u8(b, 24), channels))
      } else None

    /** JPEG: FF D8, then marker segments (FF xx, 2-byte big-endian length
      * including itself); dimensions are in the first SOF segment
      * (C0-CF minus C4/C8/CC): precision(1) height(2) width(2) ncomp(1).
      */
    private def jpeg(b: Array[Byte]): Option[(Long, Long, Int, Int)] = {
      if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
      var i = 2
      while (i + 3 < b.length && u8(b, i) == 0xff) {
        val marker = u8(b, i + 1)
        if (marker == 0xff) { i += 1 } // fill byte
        else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) i += 2
        else if (marker == 0xd9 || marker == 0xda) return None // EOI/SOS: no SOF seen
        else {
          val len = u16(b, i + 2)
          if (len < 2 || i + 2 + len > b.length) return None
          if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (len < 8) return None
            return Some((u16(b, i + 7).toLong, u16(b, i + 5).toLong,
              u8(b, i + 4), u8(b, i + 9)))
          }
          i += 2 + len
        }
      }
      None
    }

    private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
    private def le32(b: Array[Byte], i: Int): Long =
      le16(b, i).toLong | (le16(b, i + 2).toLong << 16)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b.slice(i, i + 4), "US-ASCII")

    /** WAV/RIFF (round 5): "RIFF"<size>"WAVE", then word-aligned chunks
      * of (id:4)(size:4 LE). The `fmt ` chunk carries audio_format(2)
      * channels(2) sample_rate(4) byte_rate(4) block_align(2)
      * bits_per_sample(2), all little-endian; the `data` chunk size over
      * byte_rate gives the duration. Returns (sample_rate, channels,
      * bits, byte_rate, data_bytes).
      */
    private def wav(b: Array[Byte]): Option[(Long, Int, Int, Long, Long)] = {
      if (b.length < 36 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12
      var fmt: Option[(Long, Int, Int, Long)] = None
      var dataBytes = -1L
      while (i + 8 <= b.length) {
        val id = tag(b, i)
        val size = le32(b, i + 4)
        if (id == "fmt " && size >= 16 && i + 24 <= b.length)
          fmt = Some((le32(b, i + 12), le16(b, i + 10), le16(b, i + 22),
            le32(b, i + 16)))
        if (id == "data") dataBytes = size
        i += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
        if (size < 0 || size > Int.MaxValue - 16) return fmt.map {
          case (sr, ch, bits, br) => (sr, ch, bits, br, dataBytes)
        }
      }
      fmt.map { case (sr, ch, bits, br) => (sr, ch, bits, br, dataBytes) }
    }

    /** MP4 / ISO-BMFF (round 5): a box tree of [size:4 BE][type:4]
      * (size 1 → 64-bit largesize follows; size 0 → to EOF). The movie
      * header `moov`→`mvhd` carries timescale + duration (v0: u32 at
      * +12/+16 after the version byte block; v1: u64 duration), and the
      * number of `trak` children is the track count. Header-only like
      * the image/audio paths — no sample decode. Returns
      * (timescale, duration_ticks, n_tracks).
      */
    private def mp4(b: Array[Byte]): Option[(Long, Long, Int)] = {
      def boxes(lo: Int, hi: Int): Iterator[(String, Int, Int)] =
        new Iterator[(String, Int, Int)] {
          private var i = lo
          def hasNext: Boolean = i + 8 <= hi
          def next(): (String, Int, Int) = {
            val size0 = u32(b, i)
            val t = tag(b, i + 4)
            val (hdr, size) =
              if (size0 == 1L && i + 16 <= hi) {
                val large = (u32(b, i + 8) << 32) | u32(b, i + 12)
                (16, large)
              } else if (size0 == 0L) (8, (hi - i).toLong)
              else (8, size0)
            val payloadStart = i + hdr
            val end = math.min(hi.toLong, i + math.max(size, hdr.toLong)).toInt
            i = end
            (t, payloadStart, end)
          }
        }
      if (b.length < 16) return None
      // a conformant file leads with ftyp (or styp for segments)
      val top = boxes(0, b.length).toSeq
      if (!top.headOption.exists(t => t._1 == "ftyp" || t._1 == "styp")) return None
      top.find(_._1 == "moov").flatMap { case (_, ms, me) =>
        val inner = boxes(ms, me).toSeq
        val nTracks = inner.count(_._1 == "trak")
        inner.find(_._1 == "mvhd").flatMap { case (_, hs, he) =>
          if (hs + 4 > he) None
          else u8(b, hs) match { // mvhd version
            case 0 if hs + 20 <= he =>
              Some((u32(b, hs + 12), u32(b, hs + 16), nTracks))
            case 1 if hs + 32 <= he =>
              Some((u32(b, hs + 20),
                (u32(b, hs + 24) << 32) | u32(b, hs + 28), nTracks))
            case _ => None
          }
        }
      }
    }

    override def decodeBatch(
        payloads: Seq[Array[Byte]], mime: String): Seq[Array[Float]] =
      payloads.map { b =>
        val image = mime match {
          case "image/png" => png(b)
          case "image/jpeg" | "image/jpg" => jpeg(b)
          case _ => None
        }
        val audio = mime match {
          case "audio/wav" | "audio/x-wav" | "audio/wave" => wav(b)
          case _ => None
        }
        val video = mime match {
          case "video/mp4" | "video/quicktime" => mp4(b)
          case _ => None
        }
        (image, audio, video) match {
          case (Some((w, h, depth, channels)), _, _) => Array(
            w.toFloat, h.toFloat, depth.toFloat, channels.toFloat,
            if (h == 0) 0f else w.toFloat / h.toFloat,
            (math.log(b.length + 1.0) / math.log(2.0)).toFloat, 1f, 0f)
          case (_, Some((sr, ch, bits, byteRate, dataBytes)), _) => Array(
            sr.toFloat, ch.toFloat, bits.toFloat,
            if (byteRate > 0 && dataBytes >= 0) (dataBytes.toDouble / byteRate).toFloat
            else 0f,
            byteRate.toFloat,
            (math.log(b.length + 1.0) / math.log(2.0)).toFloat, 1f, 1f)
          case (_, _, Some((timescale, durTicks, nTracks))) => Array(
            timescale.toFloat,
            if (timescale > 0) (durTicks.toDouble / timescale).toFloat else 0f,
            nTracks.toFloat, 0f, 0f,
            (math.log(b.length + 1.0) / math.log(2.0)).toFloat, 1f, 2f)
          case _ =>
            val f = StubCodec.decodeBatch(Seq(b), mime).head
            f(6) = 0f // parsed-flag slot: fell back to stub features
            f
        }
      }
  }


  /** THE media-struct construction — payload bytes, mime by doc_id mod 3,
    * (n_bytes, source) metadata — shared by [[attachMedia]] and the
    * declared `llm_multimodal_col` query so the spec-pinned plumbing and
    * the declared query can never carry diverging shapes.
    */
  def mediaStruct(docId: org.apache.spark.sql.Column,
      text: org.apache.spark.sql.Column,
      source: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val payload = encode(text, "utf-8")
    struct(
      payload.as("payload"),
      // all three modalities ride the fixture (round 5 adds video)
      when(docId % 3 === 0, "image/png")
        .when(docId % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      map(
        lit("n_bytes"), octet_length(payload).cast("string"),
        lit("source"), source).as("meta"))
  }

  /** Wrap the documents table's text as utf-8 payloads with mime + meta —
    * the ingestion shape a binary-bearing parquet table would give.
    */
  def attachMedia(docs: DataFrame): Dataset[MediaRow] =
    docs.select(
      col("doc_id"),
      mediaStruct(col("doc_id"), col("text"), col("source")).as("media"))
      .as[MediaRow](Encoders.product[MediaRow])

  /** Feature extraction: batch-at-a-time over each partition. Narrow — no
    * shuffle; output partitioning == input partitioning.
    */
  def decodeFeatures(
      ds: Dataset[MediaRow],
      codec: MediaCodec = StubCodec,
      batchSize: Int = 64): Dataset[MediaFeatures] =
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // group by mime within the batch so a codec sees homogeneous input
        batch.groupBy(_.media.mime).iterator.flatMap { case (mime, rows) =>
          val feats = codec.decodeBatch(rows.map(_.media.payload), mime)
          rows.lazyZip(feats).map { (r, f) =>
            MediaFeatures(r.doc_id, mime, r.media.payload.length.toLong, f)
          }
        }
      }
    }(Encoders.product[MediaFeatures])

  /** Frame sampling (video-style): the stub treats each 32-byte payload
    * slice as a "frame" and emits every `everyK`-th — the flatMap shape a
    * real frame sampler (one row in, n frames out) needs, again narrow.
    */
  def sampleFrames(ds: Dataset[MediaRow], everyK: Int): Dataset[Frame] =
    ds.flatMap { r =>
      r.media.payload.grouped(32).zipWithIndex.collect {
        case (bytes, i) if i % everyK == 0 => Frame(r.doc_id, i, bytes)
      }
    }(Encoders.product[Frame])
}
