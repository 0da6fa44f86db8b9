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

  test("mm1MediaSummary aggregates by media type") {
    val s = MultimodalOps.mm1MediaSummary(spark, sfDir).collect()
    assert(s.map(_.getLong(1)).sum == 500)
  }
}
