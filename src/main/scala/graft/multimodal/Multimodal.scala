package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata travelling alongside. The
  * Spark-side mechanics — schema, batched per-partition processing,
  * deterministic partitioning of large blobs — are real; the actual
  * media decode is STUBBED (this environment ships no image/audio
  * codecs) behind `FakeCodec`, a deterministic byte-level stand-in with
  * the same signature a real decoder would have.
  *
  * Scale notes: blobs never pass through a shuffle wider than needed —
  * metadata extraction is a narrow map; `withMediaMeta` batches rows
  * per partition (the `mapPartitions` shape a vectorized decoder
  * needs: amortize codec init across a partition, process in order,
  * emit one row per input).
  */
object Multimodal {

  /** Decoded-media metadata a real codec would produce. */
  case class MediaMeta(
      kind: String, // "image" | "audio" | "video"
      nBytes: Long,
      width: Int, // fake: derived from leading bytes
      height: Int,
      nFrames: Int, // fake: nBytes / 1024 + 1
      sha: String)

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)

  /** STUB decoder: deterministic metadata from raw bytes. A production
    * build replaces exactly this object with codec-backed decode; all
    * the Spark plumbing around it stays untouched.
    */
  object FakeCodec {
    def decode(kind: String, payload: Array[Byte]): MediaMeta = {
      def b(i: Int): Int = if (payload.length > i) payload(i) & 0xff else 0
      MediaMeta(
        kind = kind,
        nBytes = payload.length.toLong,
        width = 16 + (b(0) << 4) + b(1),
        height = 16 + (b(2) << 4) + b(3),
        nFrames = payload.length / 1024 + 1,
        sha = java.security.MessageDigest.getInstance("MD5")
          .digest(payload).map("%02x".format(_)).mkString)
    }

    /** STUB resize: a real impl re-encodes; the fake truncates/pads the
      * payload to a deterministic size proportional to the target box.
      */
    def resize(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val target = math.max(1, (w * h) / 64)
      java.util.Arrays.copyOf(payload, target)
    }

    /** STUB frame sampling: every `stride`-th `frameBytes` slice. */
    def sampleFrames(payload: Array[Byte], stride: Int,
        frameBytes: Int = 1024): Seq[Array[Byte]] =
      payload.grouped(frameBytes).zipWithIndex.collect {
        case (frame, i) if i % stride == 0 => frame
      }.toSeq

    /** STUB perceptual hash (the pHash slot: real impl = downscale →
      * DCT → sign-vs-median bits): bit i of the fingerprint is set iff
      * decoded-byte histogram bucket i sits at or above the bucket
      * mean (`hist(i)·bits >= total`, exact integer compare). Small
      * perturbations move one bucket by one count and almost never
      * cross the mean, so near-identical payloads collide — the
      * property perceptual dedup needs — while the fingerprint stays a
      * pure function of the payload.
      */
    def perceptualHash(payload: Array[Byte], bits: Int = 16): Long = {
      val hist = new Array[Long](bits)
      var i = 0
      while (i < payload.length) {
        hist((payload(i) & 0xff) % bits) += 1L
        i += 1
      }
      val total = payload.length.toLong
      var fp = 0L
      var b = 0
      while (b < bits) {
        if (hist(b) * bits >= total) fp |= (1L << b)
        b += 1
      }
      fp
    }
  }

  case class TransformedRow(
      media_id: Long, resized_bytes: Int, resized_md5: String,
      n_frames_sampled: Int)

  /** Batched per-partition decode: the canonical shape for vectorized
    * media processing (codec initialized once per partition, rows
    * processed in partition order, one output row per input row).
    */
  def withMediaMeta(ds: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      // per-partition init point (real codec handle would live here)
      val codec = FakeCodec
      rows.map(r => DecodedRow(r.media_id, r.kind, r.payload, codec.decode(r.kind, r.payload)))
    }
  }

  /** Synthesize a media table from any (id, text) corpus — payload =
    * UTF-8 bytes. Lets the plumbing be exercised (and oracle-checked on
    * byte lengths / hashes) without real media files.
    */
  def synthesizeFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col(idCol) % 3 + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Resize + frame-sample in one batched per-partition pass — the
    * transform (not just inspect) side of the media pipeline. Same
    * contract as [[withMediaMeta]]: codec init once per partition,
    * narrow map, one output row per input row.
    */
  def mediaTransformTable(spark: SparkSession, media: DataFrame,
      width: Int, height: Int, stride: Int, frameBytes: Int = 64): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val codec = FakeCodec
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val resized = codec.resize(r.payload, width, height)
        md.reset()
        TransformedRow(
          r.media_id, resized.length,
          md.digest(resized).map("%02x".format(_)).mkString,
          codec.sampleFrames(r.payload, stride, frameBytes).length)
      }
    }.toDF()
  }

  case class EmbeddedRow(media_id: Long, kind: String, embedding: Seq[Double])

  /** STUB feature extraction: media payload → unit-norm embedding.
    * The fake derives a `dim`-bucket byte histogram (deterministic, a
    * pure function of the payload) where a production build calls a
    * vision/audio encoder; everything around it — batched
    * per-partition model init, narrow map, `array<double>` output
    * column — is the real plumbing, and the output column feeds the
    * similarity plane unchanged ([[graft.similarity.Similarity]]
    * brute/LSH/IVF top-k and semDedup all run on it).
    */
  def mediaEmbeddings(spark: SparkSession, media: DataFrame,
      dim: Int = 64): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition init point (a real encoder session would load here)
      rows.map { r =>
        val hist = new Array[Double](dim)
        var i = 0
        while (i < r.payload.length) {
          hist((r.payload(i) & 0xff) % dim) += 1.0
          i += 1
        }
        // empty payload: deterministic basis vector, NOT all-zeros — a
        // zero norm would turn every downstream cosine into NaN, and
        // NaN sorts ABOVE all doubles in Spark's desc top-k windows
        if (r.payload.isEmpty) hist(0) = 1.0
        val nrm = math.sqrt(hist.map(v => v * v).sum)
        EmbeddedRow(r.media_id, r.kind, hist.map(_ / nrm).toSeq)
      }
    }.toDF()
  }

  /** Perceptual fingerprint per media row (the image-dedup companion
    * to [[mediaEmbeddings]]: exact-fingerprint collapse is the cheap
    * first pass, the embedding path catches what it misses). Same
    * batched per-partition plumbing as the other codec calls.
    */
  def mediaFingerprints(spark: SparkSession, media: DataFrame,
      bits: Int = 16): DataFrame = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      val codec = FakeCodec
      rows.map(r => (r.media_id, codec.perceptualHash(r.payload, bits)))
    }.toDF("media_id", "fp")
  }

  /** Collapse [[mediaFingerprints]] output: one survivor (min id) per
    * fingerprint — byte-identical AND perceptually-near-identical
    * payloads share a fingerprint, so both collapse in one
    * fingerprint-keyed aggregate (no pair join at all; the standard
    * pHash-bucket image dedup). Output: (fp, survivor_id, n_copies).
    */
  def collapseByFingerprint(fps: DataFrame): DataFrame =
    fps.groupBy(col("fp"))
      .agg(min(col("media_id")).as("survivor_id"),
        count(lit(1)).as("n_copies"))

  /** DataFrame-level metadata projection of the decoded dataset. */
  def mediaMetaTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    val ds = media.as[MediaRow]
    withMediaMeta(ds).toDF().select(
      col("media_id"), col("kind"),
      col("meta.nBytes").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      col("meta.nFrames").as("n_frames"),
      col("meta.sha").as("sha"))
  }
}
