package graft.operators

import graft.SparkSpec

/** v20's contract: the join-dataflow ADC serve is bitwise the inline
  * (driver-expression) serve — candidate stream and final ranking. */
class AdcJoinSpec extends SparkSpec {

  test("joined candidate stream equals the inline stream bitwise") {
    def stream(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val inline = stream(SimilarityQueries.ivfAdcScored(spark, sfDir))
    val joined = stream(SimilarityQueries.ivfAdcScoredJoined(spark, sfDir))
    assert(joined.nonEmpty && joined == inline,
      "same candidates, same raw double scores — no rounding slack")
    // and at nprobe=4 (the multiprobe regime) too
    val inline4 = stream(SimilarityQueries.ivfAdcScored(spark, sfDir, nprobe = 4))
    val joined4 = stream(SimilarityQueries.ivfAdcScoredJoined(spark, sfDir, nprobe = 4))
    assert(joined4 == inline4 && joined4.size > joined.size)
  }

  test("v20 rows equal v12 rows") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSeq
    assert(rows(SimilarityQueries.v20AdcJoinServe(spark, sfDir))
      == rows(SimilarityQueries.v12IvfAdc(spark, sfDir)))
  }

  test("the size dispatcher switches plans at InlineQueryLimit, outputs identical") {
    import org.apache.spark.sql.functions.col
    def stream(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the inline form's signature: per-query CASE-literal distance tables
    def isInlinePlan(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("CASE WHEN (code_0")
    // below the threshold: the dispatcher IS the historical inline plan
    val small = SimilarityQueries.ivfAdcScoredAuto(spark, sfDir)
    assert(isInlinePlan(small), "10 queries must take the inline path")
    assert(stream(small) == stream(SimilarityQueries.ivfAdcScored(spark, sfDir)))
    // above it: a 100-query probe set flips to the join dataflow, and the
    // two implementations still agree bitwise at that size
    val pred = col("vec_id") < 100
    val auto = SimilarityQueries.ivfAdcScoredAuto(spark, sfDir, queriesPred = pred)
    assert(!isInlinePlan(auto), "100 queries must take the join dataflow")
    val inline100 = stream(
      SimilarityQueries.ivfAdcScored(spark, sfDir, queriesPred = pred))
    assert(stream(auto) == inline100 && inline100.nonEmpty,
      "both paths bitwise-identical on the wide probe set too")
  }
}
