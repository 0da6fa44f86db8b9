package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row

/** st16's streaming contract: the drift table maintained on the ingest
  * stream equals y21's batch rebuild EXACTLY (counting is associative, so
  * micro-batch carving cannot move a single count or ppm), and the
  * streamed state is genuinely cumulative across several real batches. */
class CorpusStreamDriftSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Double)] =
    df.collect().toSeq.map { r: Row =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    }

  test("st16 streamed drift table equals y21's batch rebuild") {
    val streamed = rows(CorpusStreamDrift.st16StreamDrift(spark, sfDir))
    val batch = rows(graft.operators.TextQueries.y21CorpusDrift(spark, sfDir))
    assert(streamed.size == 30)
    assert(streamed == batch,
      "micro-batch boundaries must not change any drift row")
    // the interesting drift shape must be exercised, not vacuous: at least
    // one returned token exists on BOTH sides (a count moved, not just a
    // new word), and new-only tokens (cf_old = 0) rank too
    assert(streamed.exists(r => r._2 > 0 && r._3 > 0),
      "testdata must exercise a both-sides probability shift")
    assert(streamed.forall(r => r._2 > 0 || r._3 > 0))
  }
}
