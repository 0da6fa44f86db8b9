package graft

import org.apache.spark.sql.catalyst.plans.logical.{Join, Window}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}

/**
 * Structural plan lint over the ENTIRE batch query surface: the scale
 * disciplines the round-6 verdict audited by hand (no single-task global
 * sorts, no accidental nested-loop joins) enforced as a test, so a future
 * query can't quietly regress them. Streaming queries are excluded — their
 * returned frame is a memory-sink scan; their plans are audited by the
 * streaming specs.
 *
 * Whitelists are exact (asserted equal to the observed set, both ways):
 * an entry that stops being exercised fails the lint too, so the list
 * can't rot into an escape hatch. Every entry names its bounded side.
 */
class PlanLintSpec extends SparkSpec {

  /** queries whose optimized plan may contain an unpartitioned Window.
    * EMPTY — every global rank/cumsum in the surface goes through the
    * ExactOffsets range-partition scaffold (y9/z3/m5/z6) or partitions by
    * a real key; keep it that way. */
  private val unpartitionedWindowOk: Map[String, String] = Map.empty

  /** queries whose optimized plan may contain a condition-free (cross)
    * join, because one side is O(1) rows by construction. */
  private val crossJoinOk: Map[String, String] = Map(
    "e1_index_stats" -> "two 1-row aggregate legs (object totals x chunk totals) zipped",
    "y10_mixture_resample" -> "1-row smallest-class target joined onto the per-lang rate table",
    "y14_unigram_typicality" -> "1-row corpus-mean scalar broadcast onto per-doc scores",
    "y19_bigram_typicality" -> "1-row corpus-mean scalar broadcast onto per-doc bigram scores",
    "y15_tfidf_terms" -> "1-row corpus doc-count broadcast into every idf term",
    "y21_corpus_drift" -> "1-row per-side token totals broadcast onto the vocabulary table",
    "y18_bm25" -> "1-row corpus stats (N, Σdl, 3 dfs) broadcast onto per-doc scores",
    "w10_assoc_rules" -> "1-row basket total joined onto the 20-row rule list",
    // n2_hits left the list in r17: the L1 mass cross-join still exists but
    // now runs inside each half-step's localCheckpoint (the x7 plan-
    // duplication fix), so the returned plan reads checkpointed RDDs and
    // shows no condition-free join to whitelist.
    "v20_adc_join_serve" ->
      "quantizer tables (k=10-row coarse, k'=4-row codebooks) cross the query set — O(k) sides by construction, the ADC distance-table build",
    "p6_kmv_overlap" ->
      "four 1-row aggregate legs (kth, matches, exact union, exact inter) zipped into the single output row"
  )

  // one analysis pass per query: optimizedPlan only (no execution)
  private lazy val flagged: Map[String, (Boolean, Boolean)] =
    SparkEntry.queries.toSeq
      .filterNot(_._1.startsWith("st"))
      .map { case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.optimizedPlan
        val unpartWindow = plan.collectFirst {
          case w: Window if w.partitionSpec.isEmpty => w
        }.isDefined
        val condFreeJoin = plan.collectFirst {
          case j: Join if j.condition.isEmpty &&
            (j.joinType == Cross || j.joinType == Inner) => j
        }.isDefined
        name -> (unpartWindow, condFreeJoin)
      }.toMap

  test("no unpartitioned Window anywhere in the batch surface") {
    val observed = flagged.filter(_._2._1).keySet
    assert(observed == unpartitionedWindowOk.keySet,
      s"unpartitioned (single-task) windows: observed $observed, " +
        s"whitelisted ${unpartitionedWindowOk.keySet} — fix the plan " +
        "(ExactOffsets scaffold) or justify a new entry")
  }

  test("condition-free joins exactly match the O(1)-side whitelist") {
    val observed = flagged.filter(_._2._2).keySet
    assert(observed == crossJoinOk.keySet,
      s"condition-free joins: observed $observed, " +
        s"whitelisted ${crossJoinOk.keySet}")
  }
}
