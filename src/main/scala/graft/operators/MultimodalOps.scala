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
 * The decode step is a DETERMINISTIC STUB (`stubDecode`): real codecs
 * (JPEG/PNG/ffmpeg) are not in this container, so it derives plausible
 * metadata and features from the bytes alone. Everything around it —
 * binary schema, mapPartitions batching (one decoder init per partition,
 * the same shape a Pandas-UDF/mapInPandas batch has), fixed-width feature
 * schema, partition sizing — is real and tested, so swapping in a real
 * codec is a one-function change.
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

  /** The documents table as an opaque binary media column — the corpus'
    * stand-in payload source (UTF-8 bytes of the text). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[(Long, Array[Byte])] = {
    import spark.implicits._
    Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
      .as[(Long, Array[Byte])]
  }

  /** Decode pass: one decoder per partition (mapPartitions — the JVM
    * equivalent of a mapInPandas batch: amortized init, streaming batches,
    * no per-row setup), yielding the typed metadata table. */
  def decodeMeta(spark: SparkSession, dir: String): Dataset[MediaMeta] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      // real codec init would go here, once per partition
      it.map { case (id, bytes) => stubDecode(id, bytes) }
    }
  }

  /** Frame-sample + feature-extract pass: flatMap partitions into the
    * long-form (docId, frameIdx, feature[8]) table — the shape an
    * embedding-index build consumes. */
  def extractFeatures(spark: SparkSession, dir: String, frames: Int = 3): Dataset[MediaFeature] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      it.flatMap { case (id, bytes) => stubFeatures(id, bytes, frames) }
    }
  }

  /** Per-frame feature digest over the long-form feature table: positive-
    * component count and recovered byte mass per (doc, frame). Both measures
    * are INTEGER-exact through the float features (x > 0 ⇔ source byte ≥
    * 128; rint((x+1)/2·255) recovers the byte exactly), so the DuckDB
    * oracle re-derives them from sha256 bytes with no float-rounding
    * hazard — the hash-match proves the whole decode→frame-sample→feature
    * plumbing end to end, not just row counts. */
  def mm2FrameStats(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).toDF()
      .select(col("docId").as("doc_id"), col("frameIdx").as("frame_idx"),
        explode(col("feature")).as("x"))
      .groupBy("doc_id", "frame_idx")
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
  def mm3ResizeSummary(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { it =>
      // codec + scaler init would go here, once per partition
      it.map { case (id, bytes) => stubResize(stubDecode(id, bytes)) }
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
    val toks = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("text")).as[(Long, String)]
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
    val media = Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0,
          concat(lit("dup payload "), col("doc_id") % 3))
          .otherwise(col("text")).cast("binary").as("payload"))
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
}
