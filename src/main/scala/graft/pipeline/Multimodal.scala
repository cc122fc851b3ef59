package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride through
  * the pipeline as opaque `binary` columns with typed metadata, and
  * decode / feature-extraction runs batch-at-a-time inside
  * `mapPartitions` so a real decoder would amortize model/codec
  * initialization per partition (the Scala analogue of `mapInPandas`
  * batches).
  *
  * The decode step itself is STUBBED — this container has no
  * image/audio codecs — with a deterministic fake that reads real
  * bytes and emits a fixed-shape feature vector. The Spark-side
  * plumbing (schema, partitioning, batch shape, typed Datasets) is
  * real and tested; swap `decodeBatch` for a JNI/FFI codec in
  * production.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long,
      kind: String, // "image" | "audio" | "video" | "text"
      payload: Array[Byte],
      source: String)

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      byte_len: Long,
      checksum: Long,
      feature: Array[Float])

  val featureDims = 8

  /** STUB decoder: a real implementation would decode the payload
    * (image decode / audio resample / video frame-sample) here, once
    * per batch. The fake derives a deterministic feature vector from
    * payload bytes so tests can assert end-to-end dataflow — and both
    * outputs are plain sums (position-weighted checksum, per-lane byte
    * totals scaled once at the end), so the correctness oracle can
    * recompute them exactly in SQL without overflow or float-fold
    * order concerns.
    */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[MediaFeatures] = {
    // per-partition init would happen here (codec handles, model load)
    rows.map { r =>
      val bytes = r.payload
      var checksum = 0L
      val acc = new Array[Long](featureDims)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        checksum += b.toLong * (i + 1)
        acc(i % featureDims) += b
        i += 1
      }
      val feat = new Array[Float](featureDims)
      var d = 0
      while (d < featureDims) {
        feat(d) = (acc(d) / 255.0).toFloat
        d += 1
      }
      MediaFeatures(r.media_id, r.kind, bytes.length.toLong, checksum, feat)
    }
  }

  /** Batch feature extraction over a media Dataset. Repartitions by a
    * size-aware key first so one partition never holds a skewed run of
    * large payloads (large-blob skew is the real-world failure mode).
    */
  def extractFeatures(media: Dataset[MediaRow],
      partitions: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .repartition(partitions, col("media_id"))
      .mapPartitions(decodeBatch _)
  }

  /** Stubbed resize: a real implementation decodes, scales to
    * (width × height) and re-encodes per batch; the fake
    * deterministically downsamples the byte stream so output size
    * really depends on the requested dims and tests can assert the
    * batch contract.
    */
  def resizeBatch(width: Int, height: Int)(
      rows: Iterator[MediaRow]): Iterator[MediaRow] = {
    val target = math.max(1, width * height / 64)
    rows.map { r =>
      val in = r.payload
      val out = new Array[Byte](math.min(target, in.length))
      val step = math.max(1, in.length / math.max(1, out.length))
      var i = 0
      while (i < out.length) { out(i) = in(i * step); i += 1 }
      r.copy(payload = out)
    }
  }

  /** Stubbed video frame-sampling: emits one MediaRow per sampled
    * "frame" (every `everyNth` chunk of `frameBytes` bytes) — the
    * 1→N generator shape a real frame sampler has.
    */
  def frameSampleBatch(frameBytes: Int, everyNth: Int)(
      rows: Iterator[MediaRow]): Iterator[MediaRow] =
    rows.flatMap { r =>
      val nFrames = math.max(1, r.payload.length / frameBytes)
      (0 until nFrames by everyNth).map { f =>
        val from = f * frameBytes
        val until = math.min(from + frameBytes, r.payload.length)
        MediaRow(r.media_id * 1000 + f, "frame",
          java.util.Arrays.copyOfRange(r.payload, from, until), r.source)
      }
    }

  /** resize → decode pipeline over a media Dataset (both stages
    * batch-at-a-time inside one mapPartitions pass).
    */
  def resizeAndExtract(media: Dataset[MediaRow], width: Int, height: Int,
      partitions: Int): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.repartition(partitions, col("media_id"))
      .mapPartitions(rows => decodeBatch(resizeBatch(width, height)(rows)))
  }

  /** Build a media Dataset from the documents table, treating the
    * UTF-8 text payload as the opaque binary (stands in for image
    * bytes; the plumbing is identical).
    */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), lit("text").as("kind"),
      col("text").cast("binary").as("payload"), col("source"))
      .as[MediaRow]
  }

  /** End-to-end: documents → media rows → batch decode → per-source
    * feature aggregate (the shape a training-data curation job needs:
    * group statistics over extracted features).
    */
  def mediaFeatureStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val media = mediaFromDocuments(spark, docs)
    val feats = extractFeatures(media, partitions = 32)
    feats.toDF()
      .select(col("media_id"), col("byte_len"), col("checksum"),
        element_at(col("feature"), 1).cast("double").as("f0"))
  }
}
