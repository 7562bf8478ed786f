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

  /** THE media-struct construction — payload bytes, mime by doc parity,
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
      when(docId % 2 === 0, "image/png").otherwise("audio/wav").as("mime"),
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
