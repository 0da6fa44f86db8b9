package graft.streaming

import graft.SparkSpec
import graft.SparkEntry

/** st18: the stream-maintained bottom-k must equal the batch-computed
  * one (mergeability made observable), and therefore the assembled
  * estimator row must equal p6's batch row field for field. */
class CorpusStreamKmvSpec extends SparkSpec {

  test("st18: the streamed KMV row equals p6's batch row exactly") {
    CorpusStreamKmv.clearMemo()
    val streamed = SparkEntry.queries("st18_stream_kmv")(spark, sfDir).collect()
    val batch = SparkEntry.queries("p6_kmv_overlap")(spark, sfDir).collect()
    assert(streamed.length == 1 && batch.length == 1)
    assert(streamed.head == batch.head,
      s"streamed ${streamed.head} vs batch ${batch.head}")
  }
}
