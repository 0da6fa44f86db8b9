package graft.operators

import graft.SparkSpec
import java.nio.file.Files

/** Dedupe-sweep semantics the DuckDB gate can't reach alone: x7's
  * propagation depth on a long chain, x4's verified-pair equality with the
  * exact x3 set (the basis of its oracle bridge), and the shared candidate
  * stage memo. */
class DedupSweepSpec extends SparkSpec {

  /** A 51-doc CHAIN corpus: doc i = 16 globally-unique tokens starting at
    * 4i, so consecutive docs share 12 tokens → 10 of 18 distinct shingles
    * (J = 0.556 ≥ 0.5) while docs two apart share only 6 of 22 (J = 0.27):
    * the pair graph is exactly the path 0-1-…-50, diameter 50. */
  private lazy val chainDir: String = {
    val dir = Files.createTempDirectory("graft-chain").toString
    val words = (0 until 4 * 50 + 16).map(i => s"tok$i")
    val docs = (0 to 50).map { i =>
      (100L + i, words.slice(4 * i, 4 * i + 16).mkString(" "))
    }
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("x3 on the chain corpus finds exactly the 50 consecutive pairs") {
    val pairs = DedupQueries.x3NgramJaccardPairs(spark, chainDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === (0 until 50).map(i => (100L + i, 101L + i)).toSet,
      "corpus must induce a pure path graph or the diameter claim is void")
  }

  test("x7 collapses a diameter-50 chain into one cluster without tripping the guard") {
    // pointer halving doubles propagation reach per pass: a 50-hop chain
    // converges in ~log2(50)+2 iterations, far under the 64 cap — the
    // convergence guard throwing here would fail the test by itself
    val rows = DedupQueries.x7DupClusters(spark, chainDir).collect()
    assert(rows.length === 51)
    assert(rows.forall(_.getLong(1) == 100L),
      "every doc in the chain must converge to the smallest reachable doc_id")
  }

  test("x4's verified pair set equals x3's exact pair set (the oracle bridge)") {
    // MinHash banding only GENERATES candidates; emitted pairs are
    // exact-Jaccard verified, so on dup clusters (near-identical docs,
    // J >= 0.5 with 4x4 banding) the output must equal the exact set —
    // which is why x4's oracleSql can be x3's hash-free SQL
    val x3 = DedupQueries.x3NgramJaccardPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val x4 = DedupQueries.x4MinhashLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(x3.nonEmpty, "sf0.001 must contain near-dup pairs for this test to bite")
    assert(x4 === x3)
  }

  test("x8 on the chain corpus reports exactly the near-neighbor contamination") {
    // eval slice = doc_id % 50 == 0 → docs 100 and 150 (the chain's ends).
    // Consecutive docs share 10 distinct shingles, two-apart share 6,
    // three-apart only 2 (< 3 threshold) — so contamination is exactly the
    // two nearest chain neighbors of each eval doc, with known counts.
    val got = DedupQueries.x8Contamination(spark, chainDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((101L, 100L, 10L), (102L, 100L, 6L),
      (148L, 150L, 6L), (149L, 150L, 10L)))
  }

  /** Known-answer corpus for x11: ids 200-229, new slice = %7==0
    * (203/210/217/224). 203 copies 201, 210 copies 202, 224 copies BOTH
    * 211 and 212 (identical old twins — the tie case), 217 is unique.
    * Exact copies (J = 1.0) because banding recall is only guaranteed for
    * identical signatures — the corpus-contract x4's oracle relies on. */
  private lazy val incrDir: String = {
    val dir = Files.createTempDirectory("graft-incr").toString
    val base = (0 until 30).map(i =>
      (200L + i, (0 until 16).map(k => s"w${i}_$k").mkString(" "))).toMap
    val docs = (0 until 30).map { i =>
      val id = 200L + i
      val text = id match {
        case 203L => base(201L)
        case 210L => base(202L)
        case 224L => base(211L)
        case 212L => base(211L) // old twin of 211 — tie for 224
        case _ => base(id)
      }
      (id, text)
    }
    import spark.implicits._
    docs.toDF("doc_id", "text").coalesce(1)
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("x11 known-answer: copies dropped against their source, unique new doc kept, tie to min id") {
    val rows = DedupQueries.x11IncrementalDedup(spark, incrDir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSeq
    assert(rows === Seq(
      (203L, 0L, 201L, 1.0),
      (210L, 0L, 202L, 1.0),
      (217L, 1L, -1L, -1.0),  // unique: kept, NULL evidence
      (224L, 0L, 211L, 1.0))) // identical twins 211/212: tie -> min doc_id
  }

  test("x11 keep/drop equals the exact pair graph restricted to new x old") {
    // brute force from x3's exact verified pairs (both orientations),
    // keeping only new-vs-old edges; best = (jaccard DESC, old id ASC)
    val pairs = DedupQueries.x3NgramJaccardPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val newDocs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id").collect().map(_.getLong(0)).filter(_ % 7 == 0).sorted
    val matches = newDocs.map { d =>
      val ms = pairs.collect {
        case (a, b, j) if a == d && b % 7 != 0 => (b, j)
        case (a, b, j) if b == d && a % 7 != 0 => (a, j)
      }
      d -> (if (ms.isEmpty) None else Some(ms.minBy { case (id, j) => (-j, id) }))
    }.toMap
    val got = DedupQueries.x11IncrementalDedup(spark, sfDir).collect()
    assert(got.length === newDocs.length)
    assert(got.exists(_.getLong(1) == 0L), "sf corpus must produce at least one drop")
    got.foreach { r =>
      val d = r.getLong(0)
      matches(d) match {
        case None =>
          assert(r.getLong(1) == 1L && r.isNullAt(2) && r.isNullAt(3),
            s"doc $d has no old near-dup and must be kept with NULL evidence")
        case Some((dupOf, j)) =>
          assert(r.getLong(1) == 0L && r.getLong(2) == dupOf && r.getDouble(3) == j,
            s"doc $d must be dropped against $dupOf at jaccard $j")
      }
    }
  }

  test("the candidate stage is computed once per (session, corpus)") {
    // the memo returns the same materialized frame, so a sweep running
    // pairs then clusters pays ONE candidate build (the r4 perf-weak item)
    val a = DedupQueries.x3NgramJaccardPairs(spark, sfDir)
    val b = DedupQueries.x3NgramJaccardPairs(spark, sfDir)
    assert(a eq b, "repeated x3 calls must hit the session memo")
  }
}
