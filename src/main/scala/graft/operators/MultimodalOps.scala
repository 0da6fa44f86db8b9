package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed metadata extracted from an opaque media payload. */
final case class MediaMeta(
    docId: Long, mediaType: String, byteLen: Long,
    width: Int, height: Int, durationMs: Long, contentHash: String)

/** One fixed-size feature vector per decoded frame/sample. */
final case class MediaFeature(docId: Long, frameIdx: Int, feature: Array[Float])

/** Decode metadata plus the resize pass's output geometry. */
final case class ResizedMeta(docId: Long, mediaType: String,
    width: Int, height: Int, newWidth: Int, newHeight: Int, outBytes: Long)

/**
 * Multimodal column plumbing: image/audio/video as opaque BINARY columns
 * with typed metadata, decode / feature-extract / frame-sample as
 * partition-parallel transforms over `Dataset[(Long, Array[Byte])]`.
 *
 * Decoding goes through the [[MultimodalOps.MediaCodec]] seam with TWO
 * implementations: the DETERMINISTIC STUB ([[MultimodalOps.StubCodec]] —
 * what the driver queries run, because the DuckDB oracle re-derives its
 * sha256 arithmetic in SQL), and a REAL image decoder
 * ([[MultimodalOps.ImageIoCodec]], `javax.imageio` PNG/BMP/GIF — the JDK's
 * own codecs, spec-proven on synthetic images with known pixels). External
 * codecs (JPEG turbo paths, ffmpeg) are not in this container; everything
 * around the seam — binary schema, mapPartitions batching (one decoder
 * init per partition, the same shape a Pandas-UDF/mapInPandas batch has),
 * fixed-width feature schema, partition sizing — is identical for both,
 * so a production codec is one more MediaCodec instance.
 */
object MultimodalOps {

  /** STUB: stands in for a real image/audio decoder. Deterministic in the
    * payload bytes; replace the body with a codec call in production. */
  def stubDecode(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    def u8(i: Int): Int = h(i) & 0xff
    val mediaType = Seq("image", "audio", "video")(u8(0) % 3)
    MediaMeta(docId, mediaType, bytes.length.toLong,
      width = 64 + 8 * (u8(1) % 32), height = 64 + 8 * (u8(2) % 32),
      durationMs = if (mediaType == "image") 0L else 1000L + 100L * u8(3),
      contentHash = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(h))
  }

  /** STUB: stands in for a per-frame feature extractor (e.g. a CNN
    * embedding); emits `frames` deterministic 8-dim vectors per payload. */
  def stubFeatures(docId: Long, bytes: Array[Byte], frames: Int): Seq[MediaFeature] = {
    val h = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    (0 until frames).map { f =>
      MediaFeature(docId, f,
        Array.tabulate(8)(i => ((h((f * 8 + i) % 32) & 0xff) / 255.0f) * 2f - 1f))
    }
  }

  /** The codec seam: the m-family's decode / feature-extract passes are
    * written against this interface, so the SAME partition-parallel
    * plumbing (binary schema, mapPartitions batching, fixed-width feature
    * schema) runs either codec. Serializable because instances ship in
    * task closures. */
  trait MediaCodec extends Serializable {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta
    def features(docId: Long, bytes: Array[Byte], frames: Int): Seq[MediaFeature]
    /** Fused decode→resize (the mm3 shape): aspect-preserving integer
      * downscale to `maxDim`, reporting the output geometry and byte
      * volume. Codecs that re-encode report REAL output bytes. */
    def resize(docId: Long, bytes: Array[Byte], maxDim: Int): ResizedMeta
  }

  /** The deterministic stand-in codec — what the driver queries run on
    * (oracle stability: DuckDB re-derives sha256 arithmetic, not pixels). */
  object StubCodec extends MediaCodec {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta =
      stubDecode(docId, bytes)
    def features(docId: Long, bytes: Array[Byte], frames: Int): Seq[MediaFeature] =
      stubFeatures(docId, bytes, frames)
    def resize(docId: Long, bytes: Array[Byte], maxDim: Int): ResizedMeta =
      stubResize(stubDecode(docId, bytes), maxDim)
  }

  /** REAL image decode via `javax.imageio` (PNG/BMP/GIF — the decoders
    * the JDK ships, no external libs): metadata comes from the decoded
    * raster's true geometry, and features from actual pixels — frame f of
    * n is the f-th horizontal band, its 8-dim feature the per-strip mean
    * integer luma ((299R+587G+114B)/1000, floor mean) of 8 vertical
    * strips, scaled to [-1, 1] like the stub's byte features. The scaling
    * keeps [[mm2FrameStats]]' byte-recovery contract: rint((x+1)/2·255)
    * recovers the integer luma mean exactly, so the same rollup is exact
    * over real pixels (MultimodalOpsSpec proves it against independently
    * computed pixel truth). Decoder state is per-call (ImageIO readers
    * are not thread-safe to share); the mapPartitions batching still
    * amortizes classloading/SPI lookup per partition. */
  object ImageIoCodec extends MediaCodec {
    private[graft] def read(docId: Long, bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"payload of doc $docId is not a decodable image")
      img
    }
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
      val img = read(docId, bytes)
      val h = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
      MediaMeta(docId, "image", bytes.length.toLong,
        img.getWidth, img.getHeight, durationMs = 0L,
        contentHash = java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(h))
    }
    /** Integer mean luma of the pixel box [x0,x1)×[y0,y1); 0 for an
      * empty box (degenerate band on a tiny image). */
    private[operators] def meanLuma(img: java.awt.image.BufferedImage,
        x0: Int, x1: Int, y0: Int, y1: Int): Int = {
      var sum = 0L; var n = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) {
          val rgb = img.getRGB(x, y)
          sum += (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
            114 * (rgb & 0xff)) / 1000
          n += 1; x += 1
        }
        y += 1
      }
      if (n == 0) 0 else (sum / n).toInt
    }
    def features(docId: Long, bytes: Array[Byte], frames: Int): Seq[MediaFeature] = {
      val img = read(docId, bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      (0 until frames).map { f =>
        val y0 = (h.toLong * f / frames).toInt
        val y1 = (h.toLong * (f + 1) / frames).toInt
        MediaFeature(docId, f, Array.tabulate(8) { i =>
          val x0 = (w.toLong * i / 8).toInt
          val x1 = (w.toLong * (i + 1) / 8).toInt
          (meanLuma(img, x0, x1, y0, y1) / 255.0f) * 2f - 1f
        })
      }
    }
    /** REAL fused decode→resize→re-encode: same integer geometry formula
      * as the stub (floor((dim·maxDim)/max)), a Graphics2D bilinear
      * scale onto the exact (nw, nh) raster, PNG re-encode; outBytes is
      * the TRUE encoded size (vs the stub's raw nw·nh·3 model). The
      * encoded payload is returned too, so a write-side pipeline can
      * land it — the production "decode feeds the scaler inside the
      * same batch" shape mm3's scaladoc describes. */
    def resizeEncode(docId: Long, bytes: Array[Byte],
        maxDim: Int): (ResizedMeta, Array[Byte]) = {
      val img = read(docId, bytes)
      val (w, h) = (img.getWidth, img.getHeight)
      val mx = math.max(w, h)
      val (nw, nh) =
        if (mx <= maxDim) (w, h)
        else (math.max(1, (w * maxDim) / mx), math.max(1, (h * maxDim) / mx))
      val out = new java.awt.image.BufferedImage(
        nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(
          java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, nw, nh, null)
      } finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      val enc = bos.toByteArray
      (ResizedMeta(docId, "image", w, h, nw, nh, enc.length.toLong), enc)
    }
    def resize(docId: Long, bytes: Array[Byte], maxDim: Int): ResizedMeta =
      resizeEncode(docId, bytes, maxDim)._1
  }

  /** The documents table as an opaque binary media column — the corpus'
    * stand-in payload source (UTF-8 bytes of the text). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    // fan out before the decode passes every consumer runs — the corpus
    // scan is ONE partition at bench SFs (r17, Tables.fanOutSmallScan)
    Tables.fanOutSmallScan(
        Tables.t(spark, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload")),
        "doc_id")
      .as[(Long, Array[Byte])]
  }

  /** Decode pass over any binary media source: one decoder per partition
    * (mapPartitions — the JVM equivalent of a mapInPandas batch: amortized
    * init, streaming batches, no per-row setup), yielding the typed
    * metadata table under the given codec. */
  def decodeMetaOf(media: Dataset[(Long, Array[Byte])],
      codec: MediaCodec): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec init amortizes here, once per partition
      it.map { case (id, bytes) => codec.decode(id, bytes) }
    }
  }

  /** The corpus decode pass on the stand-in codec (driver-query surface). */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] =
    decodeMetaOf(mediaTable(spark, dir), StubCodec)

  /** Frame-sample + feature-extract pass: flatMap partitions into the
    * long-form (docId, frameIdx, feature[8]) table — the shape an
    * embedding-index build consumes — under the given codec. */
  def extractFeaturesOf(media: Dataset[(Long, Array[Byte])], frames: Int,
      codec: MediaCodec): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { case (id, bytes) => codec.features(id, bytes, frames) }
    }
  }

  def extractFeatures(spark: SparkSession, dir: String, frames: Int = 3): Dataset[MediaFeature] =
    extractFeaturesOf(mediaTable(spark, dir), frames, StubCodec)

  /** Per-frame feature digest over the long-form feature table: positive-
    * component count and recovered byte mass per (doc, frame). Both measures
    * are INTEGER-exact through the float features (x > 0 ⇔ source byte ≥
    * 128; rint((x+1)/2·255) recovers the byte exactly), so the DuckDB
    * oracle re-derives them from sha256 bytes with no float-rounding
    * hazard — the hash-match proves the whole decode→frame-sample→feature
    * plumbing end to end, not just row counts. */
  def mm2FrameStats(spark: SparkSession, dir: String): DataFrame =
    frameStatsOf(mediaTable(spark, dir), 3, StubCodec)

  /** The m2 rollup over any media source/codec — the byte-recovery
    * arithmetic holds for BOTH codecs (stub: source bytes; imageio:
    * integer luma means), so the same query shape audits real decodes
    * (MultimodalOpsSpec runs it on ImageIoCodec over synthetic PNGs). */
  def frameStatsOf(media: Dataset[(Long, Array[Byte])], frames: Int,
      codec: MediaCodec): DataFrame =
    frameRollup(
      extractFeaturesOf(media, frames, codec).toDF()
        .select(col("docId").as("doc_id"), col("frameIdx").as("frame_idx"),
          col("feature")),
      "doc_id", "frame_idx")

  /** The ONE copy of the byte-recovery rollup (n_pos: x > 0 ⇔ source
    * byte ≥ 128; byte_sum: rint((x+1)/2·255) recovers it exactly) —
    * load-bearing for BOTH the m2 (stub) and m7 (real-codec) oracles, so
    * it must not exist twice: a rounding-mode drift in one copy would
    * silently break the other's hash. Input: long-form rows with a
    * `feature` float-array column plus the grouping keys. */
  private def frameRollup(longForm: DataFrame, keys: String*): DataFrame =
    longForm
      .select(keys.map(col) :+ explode(col("feature")).as("x"): _*)
      .groupBy(keys.map(col): _*)
      .agg(sum(when(col("x") > 0f, 1L).otherwise(0L)).as("n_pos"),
        sum(round((col("x") + lit(1.0d)) / 2.0d * 255.0d).cast("long")).as("byte_sum"))
      .orderBy("doc_id", "frame_idx")

  /** STUB: stands in for the resize/transcode step — aspect-preserving
    * downscale to a 128px max dimension in pure INTEGER arithmetic
    * (floor((dim * 128) / maxDim)), so the DuckDB oracle re-derives the
    * output geometry exactly from the sha256 bytes. In production the body
    * re-encodes the payload; the integer geometry contract is unchanged. */
  def stubResize(m: MediaMeta, maxDim: Int = 128): ResizedMeta = {
    val mx = math.max(m.width, m.height)
    val (nw, nh) =
      if (mx <= maxDim) (m.width, m.height)
      else ((m.width * maxDim) / mx, (m.height * maxDim) / mx)
    ResizedMeta(m.docId, m.mediaType, m.width, m.height, nw, nh, nw.toLong * nh * 3)
  }

  /** Resize pass: decode + resize fused in ONE partition-parallel transform
    * (a real pipeline never materializes decoded frames between the two —
    * decode feeds the scaler inside the same batch), then the per-type
    * rollup a storage-budget planner consumes: how many payloads shrink,
    * the output byte volume, and what the downscale saves. All quantities
    * are integer-exact through the stub, so the oracle hash-match proves
    * the fused decode→resize plumbing, not just row counts. */
  def mm3ResizeSummary(spark: SparkSession, dir: String): DataFrame =
    resizeSummaryOf(mediaTable(spark, dir), 128, StubCodec)

  /** The mm3 rollup over any media source/codec — with [[ImageIoCodec]]
    * the fused decode→resize→re-encode runs on real rasters and
    * `out_bytes` is true encoded volume (MultimodalOpsSpec proves the
    * distributed rollup equals a client-side recompute over the same
    * codec on synthetic PNGs). */
  def resizeSummaryOf(media: Dataset[(Long, Array[Byte])], maxDim: Int,
      codec: MediaCodec): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // codec + scaler init amortizes here, once per partition
      it.map { case (id, bytes) => codec.resize(id, bytes, maxDim) }
    }.toDF()
      .groupBy(col("mediaType").as("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("newWidth") < col("width") || col("newHeight") < col("height"), 1L)
          .otherwise(0L)).as("n_downscaled"),
        sum("outBytes").as("out_bytes"),
        sum(col("width").cast("long") * col("height") * 3L - col("outBytes"))
          .as("saved_bytes"))
      .orderBy("media_type")
  }

  /** m4: TIME-based frame sampling — the rate-driven sampling verb next
    * to m2's fixed-count frames: every timed payload (audio/video) yields
    * one sample per 500 ms of its duration (`sequence` explode — the
    * sampling schedule is plan arithmetic, not decoder work), each sample
    * lands in its 1-second chunk, and the per-type rollup reports media /
    * samples / distinct chunks — the planning table a frame-extraction
    * job sizes its output storage with. Integer-exact end to end, so the
    * oracle re-derives the whole schedule from the stub's sha256
    * durations. At scale the explode fans each payload to duration/rate
    * rows of 3 small columns — bounded by clip length, never corpus size. */
  def mm4FrameSample(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir).toDF()
      .filter(col("durationMs") > 0)
      .select(col("docId"), col("mediaType").as("media_type"),
        explode(sequence(lit(0L), col("durationMs") - 1, lit(500L))).as("t_ms"))
      .withColumn("chunk", expr("t_ms div 1000"))
      .groupBy("media_type")
      .agg(countDistinct(col("docId")).as("n_media"),
        count(lit(1)).as("total_samples"),
        countDistinct(struct(col("docId"), col("chunk"))).as("total_chunks"))
      .orderBy("media_type")

  /** m5: MULTIMODAL sequence packing — the interleaved text+media variant
    * of z3's concat-and-chop: each document contributes its TEXT tokens
    * (whitespace count, the y-family bridge) followed by its MEDIA tokens
    * (vision-transformer patches `ceil(w/16)*ceil(h/16)` for images, one
    * token per 500 ms sample for timed media — m4's schedule), and the
    * combined token stream is chopped into 4096-token training sequences
    * in doc_id order. Emits the packing manifest per sequence with the
    * PER-MODALITY fill split (a doc straddling a boundary splits exactly:
    * its text tokens occupy [strt, strt+text), media [strt+text, fin)) —
    * the table a multimodal trainer sizes its patch-embedding batch from.
    *
    * Scale: token counts are one decode pass (mapPartitions, amortized
    * init); the global offsets come from [[ExactOffsets]]'s range-partition
    * + broadcast prefix scaffold (no unpartitioned window, O(nParts)
    * driver memory); the explode fans each doc to the 1 + toks/cap
    * sequences it touches — bounded expansion, and only (id, 3 longs)
    * rows ever shuffle, never text or payload bytes. Integer-exact end to
    * end, so the DuckDB oracle re-derives the whole schedule from sha256
    * geometry + a window cumsum. */
  def mm5MultimodalPack(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cap = 4096L
    val toks = Tables.fanOutSmallScan(
        Tables.t(spark, dir, "documents").select(col("doc_id"), col("text")),
        "doc_id")
      .as[(Long, String)]
      .mapPartitions { it =>
        // real codec init would go here, once per partition
        it.map { case (id, text) =>
          val m = stubDecode(id, text.getBytes("UTF-8"))
          var textToks = 1L
          var i = 0
          while (i < text.length) { if (text.charAt(i) == ' ') textToks += 1; i += 1 }
          val mediaToks =
            if (m.durationMs > 0) (m.durationMs - 1) / 500 + 1
            else ((m.width + 15L) / 16) * ((m.height + 15L) / 16)
          (id, textToks, mediaToks)
        }
      }.toDF("doc_id", "text_toks", "media_toks")
      .withColumn("toks", col("text_toks") + col("media_toks"))
    val (withOffsets, _) = ExactOffsets.withPartitionOffsets(
      spark, toks, Seq(col("doc_id")), col("toks"), "tok_offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("pid").orderBy("doc_id")
    val seqLo = col("seq_id") * cap
    val seqHi = (col("seq_id") + 1) * cap
    withOffsets
      .withColumn("fin", sum(col("toks")).over(w) + col("tok_offset"))
      .withColumn("strt", col("fin") - col("toks"))
      .withColumn("tmid", col("strt") + col("text_toks"))
      .withColumn("seq_id",
        explode(sequence(expr(s"strt DIV $cap"), expr(s"(fin - 1) DIV $cap"))))
      .groupBy("seq_id")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("strt") < seqLo, 1L).otherwise(0L)).as("n_carried"),
        sum(greatest(least(col("tmid"), seqHi) - greatest(col("strt"), seqLo), lit(0L)))
          .as("text_fill"),
        sum(greatest(least(col("fin"), seqHi) - greatest(col("tmid"), seqLo), lit(0L)))
          .as("media_fill"))
      .withColumn("fill_tokens", col("text_fill") + col("media_fill"))
      .orderBy("seq_id")
  }

  /** m6: media payload dedupe — the x1 exact-dup verb on the BINARY side
    * of the corpus: payloads group by the decoder's content hash (the
    * sha256 the stub already computes — production gets it free from the
    * same decode pass), and the per-type rollup reports dup groups,
    * redundant copies, and the bytes a content-addressed media store
    * reclaims — the planning table a multimodal ingest sizes its CAS
    * against. Scale: the groupBy shuffles one (hash, type, length) row
    * per payload — 32-byte digests, never media bytes (x1's discipline);
    * the per-type rollup is |types| rows. Oracle re-derives the stub's
    * sha256 grouping in SQL, so the hash-match proves the decode→hash→
    * dedupe plumbing, not just counts. */
  def mm6MediaDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // The synthetic corpus has no byte-identical payloads at the small
    // gate SFs, so (y12/y16's injection pattern) every 11th doc's payload
    // is one of 3 canonical blobs on BOTH engines — the dedupe path is
    // exercised on real collisions at every scale.
    val media = Tables.fanOutSmallScan(
        Tables.t(spark, dir, "documents")
          .select(col("doc_id"),
            when(col("doc_id") % 11 === 0,
              concat(lit("dup payload "), col("doc_id") % 3))
              .otherwise(col("text")).cast("binary").as("payload")),
        "doc_id")
      .as[(Long, Array[Byte])]
    media.mapPartitions { it =>
      // real codec init would go here, once per partition
      it.map { case (id, bytes) => stubDecode(id, bytes) }
    }.toDF()
      .groupBy("contentHash")
      .agg(max(col("mediaType")).as("media_type"),
        count(lit(1)).as("n"),
        max(col("byteLen")).as("blen"))
      .groupBy("media_type")
      .agg(count(lit(1)).as("uniq_payloads"),
        sum(col("n")).as("n_payloads"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_groups"),
        sum(col("n") - 1).as("dup_copies"),
        sum((col("n") - 1) * col("blen")).as("reclaimable_bytes"))
      .orderBy("media_type")
  }

  /** Metadata rollup per media type — the query a curation pipeline runs
    * over the decoded corpus. Snake-case output columns so the DuckDB
    * oracle (which re-derives the stub's sha256 arithmetic in SQL) aligns
    * under the driver's name-sorted column compare. */
  def mm1MediaSummary(spark: SparkSession, dir: String): DataFrame =
    decodeMeta(spark, dir).toDF()
      .groupBy(col("mediaType").as("media_type"))
      .agg(count(lit(1)).as("n"),
        sum("byteLen").as("total_bytes"),
        round(avg(col("width") * col("height")), 2).as("avg_pixels"),
        sum(when(col("durationMs") > 0, 1).otherwise(0)).as("timed_media"))
      .orderBy("media_type")

  /** m7's synthetic payload: a real PNG whose pixels are a pure integer
    * function of `docId` — a 3-band × 8-strip grid of solid colors
    * (`r,g,b = (7·id+31·band+13·strip, 11·id+37·band+17·strip,
    * 13·id+41·band+19·strip) mod 256`) on a raster whose width is a
    * multiple of 8 and height a multiple of 3, so [[ImageIoCodec]]'s
    * feature strips/bands land EXACTLY on the color blocks. PNG is
    * lossless over TYPE_INT_RGB, so the decoded per-block integer mean
    * luma equals the generator's `(299r+587g+114b) div 1000` — the whole
    * real decode→frame-sample→feature path becomes SQL-rederivable from
    * doc_id alone. */
  private[operators] def syntheticPng(docId: Long): Array[Byte] = {
    val w = 8 * (2 + (docId % 13)).toInt   // 16..112, always /8
    val h = 3 * (2 + (docId % 7)).toInt    // 6..24,   always /3
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var band = 0
    while (band < 3) {
      var strip = 0
      while (strip < 8) {
        val r = ((7 * docId + 31 * band + 13 * strip) % 256).toInt
        val g = ((11 * docId + 37 * band + 17 * strip) % 256).toInt
        val b = ((13 * docId + 41 * band + 19 * strip) % 256).toInt
        val rgb = (r << 16) | (g << 8) | b
        val (x0, x1) = (w * strip / 8, w * (strip + 1) / 8)
        val (y0, y1) = (h * band / 3, h * (band + 1) / 3)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        strip += 1
      }
      band += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** m7: the REAL codec driven end-to-end as a driver query — closes the
    * "ImageIoCodec is spec-proven but has no CORRECTNESS row" gap: every
    * third document becomes a [[syntheticPng]] payload (generated ON THE
    * EXECUTORS inside the same mapPartitions batch a production decode
    * runs in), [[decodeMetaOf]] reads the true raster geometry and
    * [[frameStatsOf]] the true pixel features through `javax.imageio` —
    * no stub anywhere on the path — and because the pixels are an integer
    * function of doc_id, the DuckDB oracle re-derives `n_pos`/`byte_sum`
    * (per-band positive-strip count and recovered luma mass) and the
    * decoded geometry exactly. A hash-match here certifies REAL
    * decode→feature plumbing, not sha256 arithmetic. Scale: payloads are
    * generated and decoded in-partition and never shuffle — only the
    * (doc_id, 5 longs) feature rollup moves, the m-family discipline. */
  def m7RealDecode(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // ONE source pass: each payload is generated once and its metadata +
    // frame features extracted in the same task from the same bytes (a
    // first cut ran separate meta and feature lanes over two generations
    // of the corpus plus a join — at decode-bound scale that doubles the
    // dominant cost for zero benefit). Emits the long-form rows the m2
    // rollup shape consumes, geometry carried alongside.
    Tables.fanOutSmallScan(
        Tables.t(spark, dir, "documents")
          .filter(col("doc_id") % 3 === 0).select("doc_id"), "doc_id")
      .as[Long]
      .mapPartitions { it =>
        // encoder init (ImageIO SPI lookup) amortizes here, per partition
        it.flatMap { id =>
          val png = syntheticPng(id)
          val m = ImageIoCodec.decode(id, png)
          ImageIoCodec.features(id, png, 3).map(f =>
            (id, m.width, m.height, f.frameIdx, f.feature))
        }
      }.toDF("doc_id", "width", "height", "frame_idx", "feature")
      .transform(frameRollup(_, "doc_id", "width", "height", "frame_idx"))
  }

  // ------------------------------------------------------- m8: image pHash

  /** m8's perturbation sites: the two grid blocks the odd twin recolors.
    * Chosen inside grid rows 0–1, whose dHash comparison bits all have
    * index < 14 — i.e. inside BAND 0 of the 4×14-bit banding — so a
    * designed near-dup pair is byte-identical on bands 1–3 and its
    * candidate recall is GUARANTEED by construction, not probabilistic. */
  private val M8Perturbed = Seq((2, 0), (5, 1))

  /** m8's block color: the first three bytes of `md5("b:c:r")` — PROPER
    * hash mixing, not an affine formula. An affine color ramp was tried
    * first and measured broken two ways: gradients between adjacent
    * columns were base-independent (every doc shared much of its dHash
    * comparison pattern), and every base coefficient times 256 vanishes
    * mod 256, so docs 256 apart rendered byte-identical images — a
    * near-pair set growing QUADRATICALLY with the corpus. md5 mixing
    * makes distinct bases independent 56-bit hashes (cross-pair
    * P[hamming ≤ 6] ≈ 5·10⁻¹⁰), and DuckDB re-derives it verbatim
    * (`('0x' || substr(md5(…), k, 2))::INT` — the x6/v2 oracle idiom). */
  private[operators] def m8BlockColor(b: Long, c: Int, r: Int): (Int, Int, Int) =
    m8BlockColor(java.security.MessageDigest.getInstance("MD5"), b, c, r)

  /** Digest-reusing form: one MessageDigest serves all 63 blocks of an
    * image (the 5-arg getInstance-per-block form measured as avoidable
    * allocation churn in the 10k-images-per-partition bench shape). */
  private def m8BlockColor(md: java.security.MessageDigest,
      b: Long, c: Int, r: Int): (Int, Int, Int) = {
    md.reset()
    val h = md.digest(s"$b:$c:$r".getBytes("UTF-8"))
    (h(0) & 0xff, h(1) & 0xff, h(2) & 0xff)
  }

  /** m8's synthetic payload: a real PNG of 9×7 solid-color blocks whose
    * colors are [[m8BlockColor]] of the doc's PAIR BASE `b = docId −
    * (docId % 2)` — consecutive (even, odd) docs render the same image
    * except that the odd twin shifts the red channel of the two
    * [[M8Perturbed]] blocks by +128: a visually-near duplicate with a
    * pixel-level delta, the shape a perceptual dedupe exists to catch.
    * Width is a multiple of 9 and height of 7, so [[dHash56]]'s grid
    * cells land exactly on the solid blocks and the decoded cell lumas
    * are SQL-rederivable from doc_id alone (PNG is lossless over
    * TYPE_INT_RGB). */
  private[graft] def m8SyntheticPng(docId: Long): Array[Byte] = {
    val b = docId - (docId % 2)
    val odd = docId % 2 == 1
    val w = 9 * (2 + (b % 5)).toInt // 18..54, always /9
    val h = 7 * (2 + (b % 3)).toInt // 14..28, always /7
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val md = java.security.MessageDigest.getInstance("MD5")
    var c = 0
    while (c < 9) {
      var r = 0
      while (r < 7) {
        val bump = if (odd && M8Perturbed.contains((c, r))) 128 else 0
        val (r0, gCh, bCh) = m8BlockColor(md, b, c, r)
        val rCh = (r0 + bump) % 256
        val rgb = (rCh << 16) | (gCh << 8) | bCh
        val (x0, x1) = (w * c / 9, w * (c + 1) / 9)
        val (y0, y1) = (h * r / 7, h * (r + 1) / 7)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        r += 1
      }
      c += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** 56-bit difference hash over a decoded raster: integer mean luma of a
    * 9-wide × 7-tall cell grid (floor boundaries — exact on block-aligned
    * images), bit y·8+x set iff cell (x+1, y) is strictly brighter than
    * cell (x, y). 56 bits (not the classical 64) keeps the top byte clear
    * so the hash lives in non-negative BIGINT range on both engines — no
    * two's-complement edge in the oracle's sum-of-shifted-bits rebuild. */
  private[graft] def dHash56(img: java.awt.image.BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val lum = Array.ofDim[Int](9, 7)
    var c = 0
    while (c < 9) {
      var r = 0
      while (r < 7) {
        lum(c)(r) = ImageIoCodec.meanLuma(img,
          w * c / 9, w * (c + 1) / 9, h * r / 7, h * (r + 1) / 7)
        r += 1
      }
      c += 1
    }
    var hash = 0L
    var y = 0
    while (y < 7) {
      var x = 0
      while (x < 8) {
        if (lum(x + 1)(y) > lum(x)(y)) hash |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    hash
  }

  /** m8: perceptual near-duplicate images over REAL decoded pixels — the
    * x4 (MinHash-LSH) verb on the VISION side: every doc renders its
    * [[m8SyntheticPng]] payload executor-side, `javax.imageio` decodes it
    * back, [[dHash56]] fingerprints the raster, and near-dups surface via
    * 4×14-bit band buckets + exact Hamming verification (≤ 6 bits) on the
    * candidates — never an all-pairs compare. The emitted pair set is
    * hash-complete for the designed twins (perturbed bits confined to
    * band 0, see [[M8Perturbed]]); the DuckDB oracle re-derives the cell
    * lumas, the dHash, the banding, and the verify from doc_id
    * arithmetic, so a hash-match certifies the real decode→fingerprint→
    * band→verify pipeline end to end. Scale: payloads are generated,
    * decoded, and hashed in-partition and never move — the shuffle
    * carries (doc_id, 8-byte hash) rows; band buckets bound the join the
    * way x4's bands do; the verify is one codegen'd bit_count(xor). */
  def m8PhashNearDup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // localCheckpoint: the band self-join references this frame on BOTH
    // sides, and without the cut each side re-runs the whole
    // generate→encode→decode→hash pass (measured: the decode dominates
    // m8's bench time 2x). The checkpointed frame is (doc_id, 8-byte
    // hash) — KBs per thousand docs; at 100 TB this is the persisted
    // fingerprint table a production run lands anyway.
    val hashes = Tables.fanOutSmallScan(
        Tables.t(spark, dir, "documents").select("doc_id"), "doc_id")
      .as[Long]
      .mapPartitions { it =>
        // ImageIO SPI lookup amortizes here, once per partition
        it.map { id =>
          (id, dHash56(ImageIoCodec.read(id, m8SyntheticPng(id))))
        }
      }.toDF("doc_id", "hash").localCheckpoint()
    val bands = hashes.select(col("doc_id"), col("hash"),
        explode(array((0 until 4).map(b => lit(b)): _*)).as("band"))
      .withColumn("bkey", expr("shiftright(hash, 14 * band) & 16383"))
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.hash").bitwiseXOR(col("b.hash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= 6)
      .orderBy("doc_a", "doc_b")
  }

  /** The m8 oracle: cell lumas from the generator arithmetic (lossless
    * PNG + block-aligned grid make decode exact), the same 56-bit hash as
    * a sum of shifted comparison bits, the same 4×14 banding, the same
    * Hamming verify. */
  def m8OracleSql: String = {
    val perturb = M8Perturbed.map { case (c, r) => s"(c = $c AND r = $r)" }
      .mkString(" OR ")
    s"""WITH d AS (SELECT doc_id, doc_id - (doc_id % 2) AS b, doc_id % 2 AS odd
       |  FROM documents),
       |g AS (SELECT doc_id, b, odd, cc.c, rr.r
       |  FROM d CROSS JOIN (SELECT unnest(generate_series(0, 8)) AS c) cc
       |  CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS r) rr),
       |lum AS (SELECT doc_id, c, r,
       |    (299 * (((('0x' || substr(md5(b || ':' || c || ':' || r), 1, 2))::INT)
       |        + CASE WHEN odd = 1 AND ($perturb) THEN 128 ELSE 0 END) % 256)
       |     + 587 * (('0x' || substr(md5(b || ':' || c || ':' || r), 3, 2))::INT)
       |     + 114 * (('0x' || substr(md5(b || ':' || c || ':' || r), 5, 2))::INT)) // 1000 AS luma
       |  FROM g),
       |h AS (SELECT a.doc_id,
       |    CAST(sum(CASE WHEN n.luma > a.luma
       |      THEN (1::BIGINT << (a.r * 8 + a.c)) ELSE 0 END) AS BIGINT) AS hash
       |  FROM lum a JOIN lum n ON n.doc_id = a.doc_id AND n.r = a.r AND n.c = a.c + 1
       |  WHERE a.c < 8 GROUP BY 1),
       |bands AS (SELECT doc_id, hash, p.band, (hash >> (14 * p.band)) & 16383 AS bkey
       |  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) p),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, bb.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.hash, bb.hash)) AS BIGINT) AS hamming
       |  FROM bands a JOIN bands bb
       |    ON a.band = bb.band AND a.bkey = bb.bkey AND a.doc_id < bb.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs
       |WHERE hamming <= 6 ORDER BY doc_a, doc_b""".stripMargin
  }

  // ------------------------------------------------------- m9: audio PCM

  /** m9's per-window sample budget. */
  private[operators] val M9Window = 256

  /** m9's synthetic payload: a COMPLETE WAV (RIFF) file — 12-byte RIFF
    * header, `fmt ` chunk (PCM, mono, 16-bit, 16 kHz), a deliberately
    * ODD-sized `note` chunk (exercising RIFF's word-alignment padding
    * rule on the parser), then the `data` chunk: signed-16-bit
    * little-endian samples of a square wave whose parameters are integer
    * functions of doc_id — length 1024+256·(id%5) samples, half-period
    * 32+8·(id%4), per-half-period amplitude 500+31·(id%7)+113·(k%5) with
    * alternating sign. Every windowed statistic of the DECODED samples is
    * exact integer arithmetic on doc_id — the m7/m8 oracle move, audio
    * edition, with a real container around it. */
  private[graft] def m9SyntheticWav(docId: Long): Array[Byte] = {
    val n = (1024 + 256 * (docId % 5)).toInt
    val half = (32 + 8 * (docId % 4)).toInt
    val note = s"doc $docId".getBytes("US-ASCII") // odd/even length varies
    val notePad = note.length % 2 // RIFF chunks are word-aligned
    val dataBytes = n * 2
    val riffLen = 4 + (8 + 16) + (8 + note.length + notePad) + (8 + dataBytes)
    val buf = java.nio.ByteBuffer.allocate(8 + riffLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(riffLen)
      .put("WAVE".getBytes("US-ASCII"))
    // fmt : PCM(1), mono, 16 kHz, 16-bit
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(16000).putInt(16000 * 2)
      .putShort(2).putShort(16)
    // a non-audio chunk a correct parser must SKIP (with padding)
    buf.put("note".getBytes("US-ASCII")).putInt(note.length).put(note)
    if (notePad == 1) buf.put(0.toByte)
    buf.put("data".getBytes("US-ASCII")).putInt(dataBytes)
    var t = 0
    while (t < n) {
      val k = t / half
      val amp = (500 + 31 * (docId % 7) + 113 * (k % 5)).toInt
      buf.putShort((if (k % 2 == 0) amp else -amp).toShort)
      t += 1
    }
    buf.array()
  }

  /** Decoded WAV: the format fields a pipeline routes on + the samples. */
  private[graft] final case class WavAudio(
      channels: Int, sampleRate: Int, bitsPerSample: Int, samples: Array[Short])

  /** REAL WAV decode: walk the RIFF chunk list (honoring the word-
    * alignment padding rule), read the `fmt ` fields, and decode the
    * `data` chunk's s16le payload — the genuine parser for the container,
    * not a fixed-44-byte-offset shortcut (the synthetic payloads carry an
    * extra odd-sized chunk precisely so a shortcut would break loudly).
    * Endianness, sign handling, and chunk walking here are exactly what
    * the m9 oracle's hash-match certifies. */
  private[graft] def decodeWav(bytes: Array[Byte]): WavAudio = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(tag() == "RIFF", "not a RIFF file")
    buf.getInt // riff length
    require(tag() == "WAVE", "not a WAVE form")
    var channels = 0; var sampleRate = 0; var bits = 0
    var samples: Array[Short] = null
    while (buf.remaining() >= 8 && samples == null) {
      val id = tag()
      val len = buf.getInt
      id match {
        case "fmt " =>
          val fmtEnd = buf.position() + len
          val codec = buf.getShort
          require(codec == 1, s"not PCM (fmt $codec)")
          channels = buf.getShort.toInt
          sampleRate = buf.getInt
          buf.getInt // byte rate
          buf.getShort // block align
          bits = buf.getShort.toInt
          require(bits == 16, s"not 16-bit ($bits)")
          buf.position(fmtEnd + (len % 2))
        case "data" =>
          val out = new Array[Short](len / 2)
          buf.asShortBuffer().get(out)
          samples = out
        case _ => // skip unknown chunks, padded to word boundary
          buf.position(buf.position() + len + (len % 2))
      }
    }
    require(samples != null, "no data chunk")
    WavAudio(channels, sampleRate, bits, samples)
  }

  /** m9: the AUDIO lane of the multimodal family — real container +
    * byte-level decode, no stub anywhere: each doc's [[m9SyntheticWav]]
    * payload (a complete RIFF/WAV file with an extra chunk a correct
    * parser must skip) is generated executor-side, decoded back through
    * the real chunk-walking parser ([[decodeWav]]), and reduced to the
    * per-window loudness/peak/crossing table a speech-curation pipeline
    * gates on (window = [[M9Window]] samples): sum of |sample|, peak
    * |sample|, and sign-change count (zero crossings, window-interior
    * only). The DuckDB oracle re-derives all three from doc_id
    * arithmetic, so a hash-match proves the decode (a byte-order, sign,
    * or chunk-offset slip shifts every sum). Scale: payloads are
    * generated, decoded, and reduced in-partition — only (doc_id, window,
    * 3 longs) rows ever move, never audio bytes; decoder init amortizes
    * per partition like every m-family pass. */
  def m9AudioPcmFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.fanOutSmallScan(
        Tables.t(spark, dir, "documents").select("doc_id"), "doc_id")
      .as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          val samples = decodeWav(m9SyntheticWav(id)).samples
          samples.indices.grouped(M9Window).zipWithIndex.map { case (win, w) =>
            var sumAbs = 0L; var peak = 0L; var crossings = 0L
            win.foreach { t =>
              val v = math.abs(samples(t).toLong)
              sumAbs += v
              if (v > peak) peak = v
              if (t % M9Window != 0 &&
                  math.signum(samples(t).toInt) != math.signum(samples(t - 1).toInt))
                crossings += 1
            }
            (id, w.toLong, sumAbs, peak, crossings)
          }
        }
      }.toDF("doc_id", "win", "sum_abs", "peak", "crossings")
      .orderBy("doc_id", "win")
  }

  // ------------------------------------------------------ m10: video lane

  /** m10's per-frame payload: an 8-strip × 3-band solid-block PNG (m7's
    * block-aligned geometry, so decoded block means are exact), colors =
    * the first three bytes of md5("v:doc:frame:band:strip") — frame index
    * mixed into the hash, so frames differ. */
  private def m10FramePng(docId: Long, f: Int): Array[Byte] = {
    val w = 8 * (2 + (docId % 5)).toInt // 16..48, /8
    val h = 3 * (2 + (docId % 4)).toInt // 6..15,  /3
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val md = java.security.MessageDigest.getInstance("MD5")
    var b = 0
    while (b < 3) {
      var s = 0
      while (s < 8) {
        md.reset()
        val hx = md.digest(s"v:$docId:$f:$b:$s".getBytes("UTF-8"))
        val rgb = ((hx(0) & 0xff) << 16) | ((hx(1) & 0xff) << 8) | (hx(2) & 0xff)
        val (x0, x1) = (w * s / 8, w * (s + 1) / 8)
        val (y0, y1) = (h * b / 3, h * (b + 1) / 3)
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        s += 1
      }
      b += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** m10's synthetic payload: a VIDEO-shaped container — 4-byte magic
    * `GVID`, int32-LE frame count, then each frame as int32-LE length +
    * PNG bytes (the MJPEG idiom: a real container walk over real encoded
    * frames; the JDK ships no mp4/h264 demuxer, so the container is ours
    * while the per-frame codec is the real `javax.imageio` path). Frame
    * count 2+id%3. */
  private[graft] def m10SyntheticVideo(docId: Long): Array[Byte] = {
    val frames = (2 + docId % 3).toInt
    val pngs = (0 until frames).map(f => m10FramePng(docId, f))
    val buf = java.nio.ByteBuffer.allocate(8 + pngs.map(_.length + 4).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("GVID".getBytes("US-ASCII")).putInt(frames)
    pngs.foreach { p => buf.putInt(p.length); buf.put(p) }
    buf.array()
  }

  /** REAL video-container decode: verify the magic, walk the
    * length-prefixed frame records, decode each through `javax.imageio`.
    * A length-arithmetic slip reads a frame boundary wrong and the PNG
    * decode fails loudly — the container walk is what m10's hash-match
    * certifies on top of the per-frame decode. */
  private[graft] def decodeVideo(docId: Long,
      bytes: Array[Byte]): Seq[java.awt.image.BufferedImage] = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = new Array[Byte](4); buf.get(magic)
    require(new String(magic, "US-ASCII") == "GVID", "not a GVID container")
    val frames = buf.getInt
    require(frames >= 0, s"negative frame count $frames")
    (0 until frames).map { f =>
      require(buf.remaining() >= 4, s"truncated container at frame $f")
      val len = buf.getInt
      require(len >= 0 && len <= buf.remaining(),
        s"frame $f length $len exceeds remaining ${buf.remaining()} bytes")
      val png = new Array[Byte](len)
      buf.get(png)
      ImageIoCodec.read(docId, png)
    }
  }

  /** m10: the VIDEO lane — the container walk + per-frame real decode
    * that completes the image (m7/m8) / audio (m9) / video trio: each
    * doc's [[m10SyntheticVideo]] payload is generated executor-side,
    * demuxed frame by frame, each frame ImageIO-decoded, and reduced to
    * the per-(doc, frame) brightness table (bright-block count and total
    * block luma over the 3×8 grid) a sampling/quality pass gates on. The
    * block grid is solid-color-aligned, so the DuckDB oracle re-derives
    * every block luma from md5 arithmetic — a hash-match certifies the
    * container walk AND the per-frame decode. Scale: generate + demux +
    * decode + fold all in-partition; only (doc_id, frame, 2 longs) rows
    * move, never frames. */
  def m10VideoFrames(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.fanOutSmallScan(
        Tables.t(spark, dir, "documents").select("doc_id"), "doc_id")
      .as[Long]
      .mapPartitions { it =>
        it.flatMap { id =>
          decodeVideo(id, m10SyntheticVideo(id)).zipWithIndex.map { case (img, f) =>
            val (w, h) = (img.getWidth, img.getHeight)
            var bright = 0L; var lumaSum = 0L
            var b = 0
            while (b < 3) {
              var s = 0
              while (s < 8) {
                val l = ImageIoCodec.meanLuma(img,
                  w * s / 8, w * (s + 1) / 8, h * b / 3, h * (b + 1) / 3)
                if (l >= 128) bright += 1
                lumaSum += l
                s += 1
              }
              b += 1
            }
            (id, f.toLong, bright, lumaSum)
          }
        }
      }.toDF("doc_id", "frame_idx", "n_bright", "luma_sum")
      .orderBy("doc_id", "frame_idx")
  }

  /** The m10 oracle: unnest (frame, band, strip) per doc and fold the
    * same block-luma statistics from the md5 arithmetic. */
  def m10OracleSql: String =
    s"""WITH d AS (SELECT doc_id, 2 + doc_id % 3 AS frames FROM documents),
       |fr AS (SELECT doc_id, unnest(generate_series(0, frames - 1)) AS f FROM d),
       |g AS (SELECT doc_id, f, bb.b, ss.s
       |  FROM fr CROSS JOIN (SELECT unnest(generate_series(0, 2)) AS b) bb
       |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS s) ss),
       |lum AS (SELECT doc_id, f,
       |    (299 * (('0x' || substr(md5('v:' || doc_id || ':' || f || ':' || b || ':' || s), 1, 2))::INT)
       |     + 587 * (('0x' || substr(md5('v:' || doc_id || ':' || f || ':' || b || ':' || s), 3, 2))::INT)
       |     + 114 * (('0x' || substr(md5('v:' || doc_id || ':' || f || ':' || b || ':' || s), 5, 2))::INT)) // 1000 AS luma
       |  FROM g)
       |SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
       |  CAST(sum(CASE WHEN luma >= 128 THEN 1 ELSE 0 END) AS BIGINT) AS n_bright,
       |  CAST(sum(luma) AS BIGINT) AS luma_sum
       |FROM lum GROUP BY 1, 2 ORDER BY doc_id, frame_idx""".stripMargin

  /** The m9 oracle: unnest the sample clock per doc and fold the same
    * three window statistics from the generator arithmetic (|sample| =
    * the half-period amplitude; a sign change happens exactly at interior
    * half-period boundaries). */
  def m9OracleSql: String =
    s"""WITH d AS (SELECT doc_id, 1024 + 256 * (doc_id % 5) AS n,
       |    32 + 8 * (doc_id % 4) AS half
       |  FROM documents),
       |s AS (SELECT doc_id, half, unnest(generate_series(0, n - 1)) AS t FROM d),
       |v AS (SELECT doc_id, t // $M9Window AS w,
       |    500 + 31 * (doc_id % 7) + 113 * ((t // half) % 5) AS amp,
       |    CASE WHEN t % $M9Window <> 0 AND t % half = 0 THEN 1 ELSE 0 END AS crossing
       |  FROM s)
       |SELECT doc_id, CAST(w AS BIGINT) AS win,
       |  CAST(sum(amp) AS BIGINT) AS sum_abs,
       |  CAST(max(amp) AS BIGINT) AS peak,
       |  CAST(sum(crossing) AS BIGINT) AS crossings
       |FROM v GROUP BY 1, 2 ORDER BY doc_id, win""".stripMargin
}
