package graft.functions

import graft.SparkSpec
import graft.operators.AnalyticsQueries

class TopKAggSpec extends SparkSpec {

  test("TopKAgg query output equals the window-function formulation") {
    val viaWindow = AnalyticsQueries.w1TopPerBrand(spark, sfDir).collect()
    val viaAgg = AnalyticsQueries.w3TopKAgg(spark, sfDir).collect()
    assert(viaAgg.length == viaWindow.length)
    viaWindow.zip(viaAgg).foreach { case (w, a) =>
      assert(w.getString(0) == a.getString(0), "brand")
      assert(w.getLong(1) == a.getLong(1), s"partkey for brand ${w.getString(0)}")
      assert(w.getDouble(2) == a.getDouble(2), "revenue must be bitwise equal")
      assert(w.getInt(3) == a.getInt(3), "rank")
    }
  }

  test("merge keeps the global top-k across partial buffers") {
    val agg = new TopKAgg(3)
    val left = Seq((9.0, 1L), (5.0, 2L), (1.0, 3L))
      .foldLeft(agg.zero)(agg.reduce)
    val right = Seq((8.0, 4L), (7.0, 5L), (6.0, 6L))
      .foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(left, right)) ==
      Seq((9.0, 1L), (8.0, 4L), (7.0, 5L)))
  }

  test("ties rank by tag ascending") {
    val agg = new TopKAgg(2)
    val buf = Seq((5.0, 9L), (5.0, 2L), (5.0, 7L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf) == Seq((5.0, 2L), (5.0, 7L)))
  }
}
