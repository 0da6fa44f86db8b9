package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-8 operator contracts not covered by GraphScaleSpec. */
class Round8OpsSpec extends SparkSpec {

  test("p5 sketch prefilter changes the plan, never the answer — and prunes") {
    val exact = Tables.t(spark, sfDir, "lineitem")
      .groupBy(col("l_partkey").as("part_key"))
      .agg(count(lit(1)).as("n_rows"))
      .filter(col("n_rows") >= 40)
      .orderBy(col("n_rows").desc, col("part_key"))
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val got = AnalyticsQueries.p5HeavyHitters(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(got == exact, "CMS never undercounts => zero false negatives; " +
      "the HAVING removes false positives — output must be the plain query's")
    assert(got.nonEmpty, "threshold must bite at the gate SF")
    // the prefilter's reason to exist: the exact agg sees strictly fewer
    // keys than the corpus holds (collisions may admit some light keys,
    // but at 4x16384 most of the key space must be pruned map-side)
    val keys = Tables.t(spark, sfDir, "lineitem").select(col("l_partkey"))
    val total = keys.distinct().count()
    val survivors = keys
      .filter(AnalyticsQueries.p5Prefilter(spark, sfDir, col("l_partkey")))
      .distinct().count()
    assert(survivors < total / 2,
      s"prefilter admitted $survivors of $total keys — not pruning")
  }

  test("z7 zone audit: scanned zones always cover every matching row") {
    // rows_scanned >= rows_matched for every layout (min/max pruning is
    // conservative), and the matched floor is layout-independent
    val rows = LayoutOps.z7ZoneSkip(spark, sfDir).collect()
    assert(rows.length == 3)
    val matched = rows.map(_.getLong(4)).distinct
    assert(matched.length == 1, "true match count cannot depend on layout")
    rows.foreach { r =>
      assert(r.getLong(3) >= r.getLong(4),
        s"${r.getString(0)}: scanned rows below the match floor")
      assert(r.getLong(1) >= r.getLong(2), "scanned zones <= total zones")
    }
  }
}
