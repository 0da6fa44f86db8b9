package graft.operators

import graft.SparkSpec

class MultimodalOpsSpec extends SparkSpec {

  test("decodeMeta yields one typed row per payload, deterministic") {
    val meta = MultimodalOps.decodeMeta(spark, sfDir).collect()
    assert(meta.length == 500)
    assert(meta.forall(m => m.byteLen > 0 && m.width >= 64 && m.height >= 64))
    assert(meta.forall(m => Set("image", "audio", "video")(m.mediaType)))
    // deterministic: same payload -> same hash
    val again = MultimodalOps.decodeMeta(spark, sfDir).collect()
    assert(meta.map(_.contentHash).sorted.sameElements(again.map(_.contentHash).sorted))
    // image rows have no duration; timed media do
    assert(meta.filter(_.mediaType == "image").forall(_.durationMs == 0))
    assert(meta.filter(_.mediaType != "image").forall(_.durationMs > 0))
  }

  test("extractFeatures yields fixed-width frame vectors") {
    val feats = MultimodalOps.extractFeatures(spark, sfDir, frames = 3).collect()
    assert(feats.length == 1500)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(_.feature.forall(v => v >= -1f && v <= 1f)))
    assert(feats.map(f => (f.docId, f.frameIdx)).distinct.length == 1500)
  }

  /** Deterministic synthetic raster: pixel (x,y) of image `id` is the
    * RGB ((x*7 + y*13 + id*31) % 256, (x*3 + y*5) % 256, (x + y*11) % 256)
    * — full dynamic range, different per image, trivially recomputable. */
  private def syntheticImage(id: Int, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        (((x * 7 + y * 13 + id * 31) % 256) << 16) |
        (((x * 3 + y * 5) % 256) << 8) | ((x + y * 11) % 256))
    img
  }

  private def encode(img: java.awt.image.BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  test("ImageIoCodec decodes real PNG/BMP pixels: true geometry + exact m2 stats") {
    import spark.implicits._
    // sizes deliberately NOT multiples of 8/3 so strip/band boundaries
    // exercise the integer split; one BMP to prove the seam is per-format
    val specs = Seq((1L, 37, 23, "png"), (2L, 64, 41, "png"),
      (3L, 129, 50, "png"), (4L, 40, 27, "bmp"))
    val images = specs.map { case (id, w, h, fmt) =>
      (id, w, h, encode(syntheticImage(id.toInt, w, h), fmt))
    }
    val media = images.map { case (id, _, _, b) => (id, b) }
      .toDF("docId", "payload").as[(Long, Array[Byte])]
    // metadata comes from the DECODED raster, not the container bytes
    val meta = MultimodalOps.decodeMetaOf(media, MultimodalOps.ImageIoCodec)
      .collect().map(m => m.docId -> m).toMap
    specs.foreach { case (id, w, h, _) =>
      assert(meta(id).width == w && meta(id).height == h,
        s"doc $id decoded geometry ${meta(id).width}x${meta(id).height} != ${w}x$h")
      assert(meta(id).mediaType == "image" && meta(id).durationMs == 0L)
    }
    // m2 frame stats over REAL pixels must equal pixel-truth recomputed
    // independently here: per frame band (3 bands) and strip (8 strips),
    // the floor-mean integer luma; n_pos counts means >= 128, byte_sum
    // recovers the mean sum exactly through the float feature scaling
    val got = MultimodalOps.frameStatsOf(media, 3, MultimodalOps.ImageIoCodec)
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong) -> (r.getLong(2), r.getLong(3))).toMap
    val expected = images.flatMap { case (id, w, h, _) =>
      val img = syntheticImage(id.toInt, w, h)
      (0 until 3).map { f =>
        val (y0, y1) = ((h.toLong * f / 3).toInt, (h.toLong * (f + 1) / 3).toInt)
        val means = (0 until 8).map { i =>
          val (x0, x1) = ((w.toLong * i / 8).toInt, (w.toLong * (i + 1) / 8).toInt)
          val px = for (y <- y0 until y1; x <- x0 until x1) yield {
            val rgb = img.getRGB(x, y)
            (299 * ((rgb >> 16) & 0xff) + 587 * ((rgb >> 8) & 0xff) +
              114 * (rgb & 0xff)) / 1000
          }
          if (px.isEmpty) 0L else px.map(_.toLong).sum / px.size
        }
        (id, f.toLong) -> ((means.count(_ >= 128).toLong, means.sum))
      }
    }.toMap
    assert(got == expected,
      s"real-pixel m2 stats diverge from pixel truth: got $got expected $expected")
  }

  test("ImageIoCodec fused resize: true geometry, real re-encoded bytes, mm3 rollup") {
    import spark.implicits._
    val specs = Seq((1L, 300, 180), (2L, 128, 96), (3L, 260, 400), (4L, 64, 64))
    val images = specs.map { case (id, w, h) =>
      (id, w, h, encode(syntheticImage(id.toInt, w, h), "png"))
    }
    // client-side truth: run the SAME codec per image and re-derive the
    // rollup; the distributed operator must agree exactly
    val metas = images.map { case (id, _, _, b) =>
      MultimodalOps.ImageIoCodec.resizeEncode(id, b, 128)
    }
    specs.zip(metas).foreach { case ((id, w, h), (m, enc)) =>
      val mx = math.max(w, h)
      val (ew, eh) = if (mx <= 128) (w, h)
        else (math.max(1, w * 128 / mx), math.max(1, h * 128 / mx))
      assert((m.newWidth, m.newHeight) == ((ew, eh)), s"doc $id geometry")
      // the re-encoded payload is a REAL image of exactly that geometry
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(enc))
      assert(back.getWidth == ew && back.getHeight == eh)
      assert(m.outBytes == enc.length && m.outBytes > 0, "true encoded size")
    }
    val media = images.map { case (id, _, _, b) => (id, b) }
      .toDF("docId", "payload").as[(Long, Array[Byte])]
    val got = MultimodalOps.resizeSummaryOf(media, 128, MultimodalOps.ImageIoCodec)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ms = metas.map(_._1)
    val expected = Array(("image", ms.size.toLong,
      ms.count(m => m.newWidth < m.width || m.newHeight < m.height).toLong,
      ms.map(_.outBytes).sum))
    assert(got.toSeq == expected.toSeq,
      s"distributed rollup ${got.toSeq} != client-side truth ${expected.toSeq}")
  }

  test("mm1MediaSummary aggregates by media type") {
    val s = MultimodalOps.mm1MediaSummary(spark, sfDir).collect()
    assert(s.map(_.getLong(1)).sum == 500)
  }

  test("m7: real imageio decode of synthetic PNGs matches closed-form pixel truth") {
    // independent truth: the generator formula evaluated directly (no
    // codec, no Spark) — per (doc, band): luma of each of 8 strips
    def luma(id: Long, band: Int, strip: Int): Long =
      (299 * ((7 * id + 31 * band + 13 * strip) % 256)
        + 587 * ((11 * id + 37 * band + 17 * strip) % 256)
        + 114 * ((13 * id + 41 * band + 19 * strip) % 256)) / 1000
    val got = MultimodalOps.m7RealDecode(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getInt(3)),
        (r.getInt(1), r.getInt(2), r.getLong(4), r.getLong(5)))).toMap
    assert(got.nonEmpty && got.size % 3 == 0)
    got.foreach { case ((id, band), (w, h, nPos, byteSum)) =>
      assert(w == 8 * (2 + (id % 13)).toInt && h == 3 * (2 + (id % 7)).toInt,
        s"decoded geometry of doc $id")
      val lumas = (0 until 8).map(s => luma(id, band, s))
      assert(nPos == lumas.count(_ >= 128), s"n_pos of ($id, $band)")
      assert(byteSum == lumas.sum, s"byte_sum of ($id, $band)")
    }
    // and the payload really is a decodable PNG whose pixels carry the
    // formula — checked through plain ImageIO, no graft code in the loop
    val png = MultimodalOps.syntheticPng(6L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 8 * (2 + 6 % 13) && img.getHeight == 3 * (2 + 6 % 7))
    val rgb = img.getRGB(0, 0) // band 0, strip 0 of doc 6
    assert(((rgb >> 16) & 0xff) == (7 * 6) % 256 &&
      ((rgb >> 8) & 0xff) == (11 * 6) % 256 && (rgb & 0xff) == (13 * 6) % 256)
  }
}
