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

  test("NaN scores order deterministically regardless of arrival or merge order") {
    // Double.compare gives NaN a total-order slot (above +Inf), so the same
    // multiset of entries must produce the same buffer however it was
    // reduced or merged — raw >/== comparators would both return false for
    // NaN and make the outcome arrival-order-dependent
    val agg = new TopKAgg(3)
    val entries = Seq((Double.NaN, 5L), (9.0, 1L), (8.0, 2L), (7.0, 3L))
    val direct = agg.finish(entries.foldLeft(agg.zero)(agg.reduce))
    val reversed = agg.finish(entries.reverse.foldLeft(agg.zero)(agg.reduce))
    val merged = agg.finish(agg.merge(
      entries.take(2).foldLeft(agg.zero)(agg.reduce),
      entries.drop(2).foldLeft(agg.zero)(agg.reduce)))
    def key(s: Seq[(Double, Long)]) = s.map { case (d, t) =>
      (java.lang.Double.doubleToLongBits(d), t) }
    assert(key(direct) == key(reversed), "arrival order must not matter")
    assert(key(direct) == key(merged), "merge partitioning must not matter")
    assert(direct.count(_._1.isNaN) == 1 && direct.map(_._2).contains(1L),
      "real results keep their slots alongside the single NaN")
  }
}
