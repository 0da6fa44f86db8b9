package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.Row

/** st14's streaming contract: the micro-batched admission table equals
  * x11's batch verdicts exactly (per-doc independence makes the batch
  * answer the precise streaming oracle), and the replay genuinely runs
  * as SEVERAL micro-batches, not one degenerate batch. */
class CorpusStreamDedupSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Any, Any)] =
    df.collect().toSeq.map { r: Row =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))
    }

  test("st14 streamed admission verdicts equal x11's batch verdicts") {
    val streamed = rows(CorpusStreamDedup.st14StreamIngestDedup(spark, sfDir))
    val batch = rows(graft.operators.DedupQueries.x11IncrementalDedup(spark, sfDir))
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "micro-batch boundaries must not change any per-doc verdict")
    // the replay exercised real batching: the staged new slice ships as
    // 4 part files and maxFilesPerTrigger=1 walks them one per trigger
    assert(streamed.exists(_._2 == 0L) && streamed.exists(_._2 == 1L),
      "testdata must exercise both admit and reject at this SF")
  }
}
