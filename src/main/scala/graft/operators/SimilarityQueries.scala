package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (Array[Float] vectors,
 * unit-normalized): brute-force cosine top-k as the exact baseline, and
 * a random-hyperplane LSH bucketed variant as the sub-quadratic scale path.
 * Dot products are expression-only (`zip_with` + `aggregate` sequential
 * double fold — bitwise-matching DuckDB's DOUBLE[] list_dot_product).
 */
object SimilarityQueries {
  import Tables._

  /** Brute-force cosine top-k: for each query vector (vec_id < 10), the 5
    * nearest other vectors. Query side is broadcast — the scan of the corpus
    * is the only distributed pass, which is the right 100 TB shape when the
    * query set is small. */
  def v1CosineTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val joined = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("embedding"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** Deterministic hyperplane weight for plane `p`, component `i`:
    * centered 60-bit md5 scaled to (-1, 1) — exactly SQL's
    * `(('0x' || substr(md5(p || ':' || i), 1, 15))::BIGINT - 2^59) / 2^59.0`.
    * md5 (not xxhash64) so the DuckDB oracle rebuilds the SAME planes;
    * the matrix is built once per partition (2048 hashes), so hash cost
    * is irrelevant here, unlike the per-shingle paths. */
  private[operators] def planeWeight(p: Int, i: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(s"$p:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = java.nio.ByteBuffer.wrap(d).getLong >>> 4
    (h - 576460752303423488L).toDouble / 576460752303423488.0
  }

  /** Random-hyperplane LSH ANN: 16 signed projections onto deterministic
    * pseudo-random hyperplanes give a 16-bit bucket; candidates share a
    * bucket in any of 2 overlapping 8-bit bands; exact cosine reranks.
    * No all-pairs stage — the scale path. The projection runs per-row in a
    * JIT'd mapPartitions (plane matrix derived once per partition, so the
    * op stays deterministic and shuffle-free until the band join), not as
    * nested column HOFs (interpreted, ~100x slower). Round-7 oracle
    * upgrade: planes derive from md5 ([[planeWeight]]), and the
    * projection is the ascending-index double fold both engines share
    * (JVM loop == DuckDB list_dot_product), so every sign bit, band key,
    * candidate pair and rerank similarity is re-derived in SQL. */
  def v2AnnLsh(spark: SparkSession, dir: String): DataFrame =
    annCandidatePairs(spark, t(spark, dir, "embeddings"))
      .orderBy(col("sim").desc, col("vec_a"), col("vec_b"))
      .limit(50)

  /** The banded candidate stage of [[v2AnnLsh]] with exact rerank sims,
    * pre-top-k — exposed over an arbitrary (vec_id, embedding) frame so
    * specs can assert LSH recall against v1's exact top-k on a corpus
    * where neighbors actually exist (KmeansIvfSpec's clustered one). */
  def annCandidatePairs(spark: SparkSession, e: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import spark.implicits._
    // 4 bands x 16 planes: 65,536 buckets per band. The pre-round-7 shape
    // (2 bands x 8 bits = 256 fixed buckets) was the x6 quadratic trap —
    // band-join work grows with corpus²/buckets, measured 8.8 s at sf1.
    // Wider bands cut per-pair collision probability, so the band COUNT
    // doubles to compensate: recall is pinned by the executable contract
    // (KmeansIvfSpec recall@5 >= 0.85 on clustered data), and the band
    // join now shuffles 4 rows/vector into near-empty buckets.
    val numBands = 4
    val bitsPerBand = 16
    val numPlanes = numBands * bitsPerBand
    val banded = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        // plane matrices keyed by dimension: deterministic per (p, i), so
        // a mixed-dim table still projects every row against a full matrix
        val byDim = scala.collection.mutable.Map.empty[Int, Array[Array[Double]]]
        it.flatMap { case (id, emb) =>
          val planes = byDim.getOrElseUpdate(emb.length,
            Array.tabulate(numPlanes, emb.length)((p, i) => planeWeight(p, i)))
          val keys = new Array[Int](numBands)
          var p = 0
          while (p < numPlanes) {
            val pl = planes(p)
            var s = 0.0
            var i = 0
            while (i < emb.length) { s += emb(i) * pl(i); i += 1 }
            if (s > 0) keys(p / bitsPerBand) |= (1 << (p % bitsPerBand))
            p += 1
          }
          Iterator.tabulate(numBands)(b => (id, emb, b, keys(b)))
        }
      }.toDF("vec_id", "embedding", "band", "band_key")
      .localCheckpoint() // hyperplane projections run once, not per join side
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"))
      .dropDuplicates("vec_a", "vec_b")
    pairs.withColumn("sim", round(dot(col("ea"), col("eb")), 6))
      .select("vec_a", "vec_b", "sim")
  }

  /** IVF probe search: the two-stage ANN an inverted-file index runs.
    * Stage 1 (coarse quantizer): every vector is assigned to its nearest
    * label centroid (the IVF cell); stage 2: each query vector probes ONLY
    * its own cell and exact-reranks the cell's members — at 100 TB the
    * scan is one narrow pass and the probe join touches 1/nlist of the
    * corpus per query instead of all of it (vs v1's brute force; LSH v2 is
    * the hash-bucket alternative). Centroids are broadcast — the coarse
    * quantizer is small by construction. */
  /** Every vector's RANKED cosine distances to the normalized label
    * centroids — v4's coarse quantizer up to (but not including) the
    * rk=1 cut, so rk 1 is the home-cell assignment (v4) and rk ≤ nprobe
    * is a query's probe list (v22's filtered search widens probes to
    * recover recall lost to the metadata filter). Decimal sum → double →
    * one IEEE divide: portable across engines. */
  private def labelCellsRanked(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    // coarse quantizer: per-label exact-decimal centroids (same math as v3).
    // Decimal sum (exact, order-independent) -> double -> one IEEE divide:
    // portable across engines, unlike decimal division whose result scale
    // is engine-specific.
    val centroids = e.select(col("label"), posexplode(col("embedding")))
      .groupBy("label", "pos")
      .agg((sum(col("col").cast("decimal(28,10)")).cast("double") / count(lit(1)))
        .as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))
    // cell assignment: nearest centroid by COSINE — centroids must be
    // L2-normalized before the dot product, else argmax-dot herds vectors
    // toward large-norm centroids regardless of angle (embeddings are
    // unit-norm, centroids are plain means with differing norms)
    val normed = centroids
      .withColumn("cn", sqrt(aggregate(
        transform(col("centroid"), x => x * x), lit(0.0), (a, x) => a + x)))
      .withColumn("centroid",
        transform(col("centroid"), x => (x / col("cn")).cast("float")))
      .drop("cn")
    e.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(normed.withColumnRenamed("label", "cl")))
      .withColumn("d", dot(col("embedding"), col("centroid")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("d").desc, col("cl"))))
  }

  def v4IvfSearch(spark: SparkSession, dir: String): DataFrame = {
    val assigned = labelCellsRanked(spark, dir)
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cl").as("cell"))
      .localCheckpoint() // assignment feeds both probe sides
    // probe: each query searches only its own cell, exact rerank, top-3
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))
    val cand = assigned.join(broadcast(q),
        Seq("cell")).filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("embedding"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cell"),
        round(col("sim"), 6).as("sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** v22: FILTERED vector search — the metadata-constrained top-k every
    * production ANN serves ("nearest neighbors WHERE tier = X"): v4's
    * coarse quantizer, but each query probes its TOP-4 cells (filtered
    * search widens probes because the predicate thins each cell's
    * candidates — the recall-recovery move; measured filtered recall@3
    * vs the exact filtered brute force climbs 0.17→0.40→0.43→0.50 at
    * sf0.001 and 0.30→0.47→0.50→0.67 at sf0.01 as nprobe goes 1→4 —
    * tools/V22Probe, retired to git history), candidates must match the query's metadata tier
    * (derived `vec_id % 3` — the corpus ships no second attribute; the
    * derivation is identical on both engines, and the interesting part
    * is the probe+filter+rerank PLAN, not the attribute's provenance),
    * and the survivors exact-rerank to top-3. The oracle replicates
    * quantizer, probe list, filter, and rerank, so the hash-match pins
    * the full filtered-search semantics. Scale: the filter rides INSIDE
    * the cell-bounded candidate join (never a post-materialization
    * pass), stage-2 touch is ≤ nprobe cells per query with the tier
    * predicate pushed into the join, and only (ids, sim) rows shuffle. */
  def v22FilteredAnn(spark: SparkSession, dir: String): DataFrame =
    v22FilteredAnn(spark, dir, nprobe = 4)

  /** nprobe-parameterized form: the spec measures the widening dividend
    * (filtered recall at the shipped nprobe strictly above 1-probe). */
  private[graft] def v22FilteredAnn(spark: SparkSession, dir: String,
      nprobe: Int): DataFrame = {
    val ranked = labelCellsRanked(spark, dir)
      .localCheckpoint() // quantizer runs once; home cells + probe lists
    val assigned = ranked.filter(col("rk") === 1)
      .select(col("vec_id"), col("embedding"), col("cl").as("cell"),
        (col("vec_id") % 3).as("tier"))
    val q = ranked.filter(col("vec_id") < 10 && col("rk") <= nprobe)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("cl").as("cell"), (col("vec_id") % 3).as("qtier"))
    // a candidate's home cell is unique, so each (query, candidate) pair
    // appears at most once across the nprobe probe cells — no dedupe
    // needed at any probe width
    val cand = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id") && col("tier") === col("qtier"))
      .withColumn("sim", dot(col("embedding"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("tier"),
        round(col("sim"), 6).as("sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** The v22 oracle: v4's quantizer CTEs, the rank kept (probe list =
    * rk ≤ 4, the shipped nprobe), the tier filter inside the candidate
    * join, same rerank. */
  def v22OracleSql: String =
    """WITH u AS (
      |  SELECT label, unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos
      |  FROM embeddings),
      |cm AS (SELECT label, pos, CAST(sum(CAST(v AS DECIMAL(28,10))) AS DOUBLE) / count(*) AS c
      |  FROM u GROUP BY 1, 2),
      |cent AS (SELECT label, list(c ORDER BY pos) AS centroid FROM cm GROUP BY 1),
      |norm AS (SELECT label AS cl,
      |  list_transform(centroid, x -> CAST(CAST(x / sqrt(list_dot_product(centroid, centroid)) AS FLOAT) AS DOUBLE)) AS nc
      |  FROM cent),
      |a AS (SELECT e.vec_id, e.embedding, norm.cl,
      |        list_dot_product(e.embedding::DOUBLE[], norm.nc) AS d
      |      FROM embeddings e CROSS JOIN norm),
      |rkd AS (SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cl) AS rk FROM a),
      |asg AS (SELECT vec_id, embedding, cl AS cell, vec_id % 3 AS tier FROM rkd WHERE rk = 1),
      |q AS (SELECT vec_id AS query_id, embedding AS qv, cl AS cell, vec_id % 3 AS qtier
      |  FROM rkd WHERE vec_id < 10 AND rk <= 4),
      |cand AS (SELECT q.query_id, asg.vec_id AS neighbor_id, asg.tier,
      |    list_dot_product(asg.embedding::DOUBLE[], q.qv::DOUBLE[]) AS s
      |  FROM asg JOIN q ON asg.cell = q.cell AND asg.vec_id <> q.query_id
      |    AND asg.tier = q.qtier),
      |r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rank FROM cand)
      |SELECT query_id, neighbor_id, tier, round(s, 6) AS sim, rank FROM r WHERE rank <= 3
      |ORDER BY query_id, rank""".stripMargin

  /** Lloyd's k-means as a broadcast-loop of DataFrame passes — the real
    * (unsupervised) IVF coarse quantizer, vs v4's label-centroid stand-in.
    * Each iteration: tiny centroid table broadcast to a single corpus scan
    * (assignment = argmin Euclidean distance, computed as
    * argmax dot(e,c) - ||c||²/2 since ||e|| is constant per row), then an
    * exact-decimal per-cell mean. Centroids are collected per iteration
    * (k x dim doubles — trivially driver-sized), which truncates lineage:
    * iteration N is ONE compact job over the corpus, not a replay of
    * iterations 1..N-1. Deterministic: init = the k lowest vec_ids,
    * decimal sums are order-independent, ties break by cell id. Cells that
    * lose all members drop out (k shrinks monotonically, also determinist).
    */
  /** Nearest-cell assignment as a PURE PROJECTION against driver-side
    * centroids: per-cell scores `dot(v, c) - |c|²/2` as literal-array
    * expressions, argmax via `array_position(scores, array_max(scores))`
    * whose first-match rule IS the (score DESC, cell ASC) tie rule — the
    * centroid list arrives cell-sorted. Replaces the former
    * crossJoin(broadcast) + per-vector row_number window: same values
    * bitwise (same DotProductF folds, cn2 still an expression over the
    * literal so the arithmetic path is unchanged), but ZERO exchange and
    * no |corpus|×k intermediate — the quantizer family's hot loop is now
    * one codegen'd map over the scan. Returns (cell code, raw dot to the
    * winning centroid, winning score). */
  private def assignExprs(emb: Column, cents: Seq[(Int, Seq[Double])])
      : (Column, Column, Column) = {
    // cell labels need not be contiguous (a sliced-corpus quantizer labels
    // cells by its init vec_ids) — only SORTED, so that array_position's
    // first-match rule lands on the lowest label among score ties
    require(cents.map(_._1) == cents.map(_._1).sorted, "centroids must be cell-sorted")
    val dots = cents.map { case (_, c) => dot(emb, typedLit(c)) }
    val scores = cents.map { case (_, c) =>
      dot(emb, typedLit(c)) - lit(0.5) * dot(typedLit(c), typedLit(c)) }
    val scoreArr = array(scores: _*)
    val pos = array_position(scoreArr, array_max(scoreArr)).cast("int")
    (element_at(typedLit(cents.map(_._1)), pos).as("cell"),
      element_at(array(dots: _*), pos), element_at(scoreArr, pos))
  }

  /** Past this many centroids the expression-chain assignment
    * ([[assignExprs]]: k inlined literal dots) generates O(k·dim) code,
    * falls out of whole-stage codegen and goes interpreted — v15's √N
    * quantizer (k=141 at sf0.1) measured 40.9 s in-suite on that path.
    * Above the gate, [[assignCells]] switches to a JIT'd mapPartitions
    * argmax over a broadcast centroid matrix (v2's LSH-projection
    * precedent): the SAME left-to-right double fold as [[DotProductF]]
    * and the same (score desc, cell asc) tie order — first strict
    * improvement wins over cell-sorted centroids — so cells are
    * bit-identical across paths (the sf0.1 oracle run proves it at
    * k=141) and the cost is one tight k·dim loop per row at ANY k. */
  private val AssignExprMaxK = 32

  /** Rank-1 cell assignment `(vec_id, embedding, cell)` — expression
    * path for small k (inside codegen, zero extra operators), JVM-loop
    * path past [[AssignExprMaxK]]. */
  private def assignCells(e: DataFrame,
      cents: Seq[(Int, Seq[Double])]): DataFrame = {
    import e.sparkSession.implicits._
    if (cents.size <= AssignExprMaxK) {
      val (cell, _, _) = assignExprs(col("embedding"), cents)
      e.select(col("vec_id"), col("embedding"), cell.as("cell"))
    } else {
      require(cents.map(_._1) == cents.map(_._1).sorted,
        "centroids must be cell-sorted")
      val cellIds = cents.map(_._1).toArray
      val cmat = cents.map(_._2.toArray).toArray
      // 0.5·‖c‖² per cell, the same ascending fold the expression path's
      // dot(c, c) literal runs — one double per cell, precomputed once
      val bias = cmat.map { c =>
        var a = 0.0; var i = 0
        while (i < c.length) { a += c(i) * c(i); i += 1 }
        0.5 * a
      }
      e.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
        .mapPartitions { it =>
          it.map { case (id, emb) =>
            var best = 0
            var bestScore = Double.NegativeInfinity
            var ci = 0
            while (ci < cmat.length) {
              val c = cmat(ci)
              var a = 0.0; var i = 0
              while (i < c.length) { a += emb(i).toDouble * c(i); i += 1 }
              val s = a - bias(ci)
              if (s > bestScore) { bestScore = s; best = ci }
              ci += 1
            }
            (id, emb, cellIds(best))
          }
        }.toDF("vec_id", "embedding", "cell")
    }
  }

  /** The Lloyd loop, driver-side centroids in and out: init = the k lowest
    * vec_ids, each iteration one assignment pass (see [[assignCells]])
    * + the decimal-exact per-cell mean. */
  private def lloydCentroids(spark: SparkSession, e: DataFrame, k: Int,
      iters: Int): Seq[(Int, Seq[Double])] = {
    import spark.implicits._
    var cents: Seq[(Int, Seq[Double])] = e.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int"), col("embedding"))
      .as[(Int, Array[Float])].collect().toSeq.sortBy(_._1)
      .map { case (id, emb) => (id, emb.map(_.toDouble).toSeq) }
    for (_ <- 1 to iters) {
      cents = assignCells(e, cents).select(col("cell"), posexplode(col("embedding")))
        .groupBy("cell", "pos")
        .agg((sum(col("col").cast("decimal(28,10)")).cast("double") / count(lit(1))).as("c"))
        .groupBy("cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("centroid"))
        .as[(Int, Seq[Double])].collect().toSeq.sortBy(_._1)
    }
    cents
  }

  def kmeansCentroids(spark: SparkSession, e: DataFrame, k: Int, iters: Int): DataFrame = {
    import spark.implicits._
    lloydCentroids(spark, e, k, iters).toDF("cell", "centroid")
  }

  /** Session memo for the k-means cell assignment (same pattern and
    * rationale as DedupQueries' memo): v5's probe and v7's kNN join consume
    * the SAME quantizer, and the Lloyd loop is `iters + 1` corpus scans
    * plus per-iteration driver collects — a sweep must pay it once. The
    * memoized frame is localCheckpointed (materialized, lineage-free);
    * corpus dirs are immutable within a session (the testdata contract). */
  private val assignMemo = new graft.BenchMemos.CountedMemo[String, DataFrame]("SimilarityQueries")

  /** Session memo for the trained CENTROIDS themselves (k×dim driver-side
    * Seqs): the Lloyd loop is the expensive part, and FOUR consumer
    * families want the same quantizer in different shapes — the full-corpus
    * one (kmeansAssigned/v14's fresh side) and the old-slice one (v8's
    * incremental assignment, st9's streamed assignment, v14's stale side).
    * Keyed by an explicit slice tag because the training frame's identity
    * can't key a map. */
  private val centroidMemo =
    new graft.BenchMemos.CountedMemo[String, Seq[(Int, Seq[Double])]]("SimilarityQueries")

  private[graft] def clearMemo(): Unit =
    { assignMemo.clear(); pqMemo.clear(); centroidMemo.clear() }


  /** Memoized Lloyd training over a named slice of the embeddings table. */
  private[operators] def trainedCentroids(spark: SparkSession, dir: String,
      slice: String, k: Int, iters: Int): Seq[(Int, Seq[Double])] =
    centroidMemo.computeIfAbsent(
      s"${spark.sparkContext.applicationId}|$dir|$slice|$k|$iters", _ => {
        val e = t(spark, dir, "embeddings")
        val src = slice match {
          case "full" => e
          case "old"  => e.filter(col("vec_id") % 7 =!= 0)
        }
        lloydCentroids(spark, src, k, iters)
      })

  /** `(vec_id, embedding, cell)` under the k-means coarse quantizer —
    * the IVF index body. One broadcast assignment pass over the corpus
    * after the Lloyd loop. */
  private[operators] def kmeansAssigned(spark: SparkSession, dir: String,
      k: Int, iters: Int): DataFrame = assignMemo.computeIfAbsent(
    s"${spark.sparkContext.applicationId}|$dir|$k|$iters", _ => {
      val e = t(spark, dir, "embeddings")
      assignCells(e, trainedCentroids(spark, dir, "full", k, iters))
        .localCheckpoint() // assignment feeds every consumer materialized
    })

  /** IVF probe search over the k-means quantizer (the production IVF shape;
    * v4 is the supervised-label variant). Assignment + probe are the same
    * broadcast passes as v4: at 100 TB the index build is `iters + 1`
    * corpus scans and each query touches 1/k of the corpus. */
  def v5IvfKmeans(spark: SparkSession, dir: String): DataFrame = {
    val assigned = kmeansAssigned(spark, dir, 10, 3)
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"), col("cell"))
    val cand = assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("embedding"), col("qv")))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("vec_id").as("neighbor_id"), col("cell"),
        round(col("sim"), 6).as("sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** kNN self-join within IVF cells: every vector's single nearest
    * neighbor among vectors sharing its cell (here the label — the same
    * cell structure v3/v4 quantize into). This is the embedding-dedupe /
    * "link every item to its closest sibling" shape, and the reason
    * cell-bounded joins exist: the all-pairs blowup is |cell|² instead of
    * |corpus|², so nlist cells cut the work by nlist×. One shuffle on the
    * cell key; the rank-1 filter plans with `WindowGroupLimit` pushdown,
    * so each partition forwards one candidate row per vec_id before the
    * final window. Ranking uses the RAW dot (bitwise identical in both
    * engines) with neighbor-id tiebreak; only the output rounds. */
  def v6KnnJoin(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val nbrs = e.select(col("label"), col("vec_id").as("neighbor_id"),
      col("embedding").as("nv"))
    val w = Window.partitionBy("vec_id").orderBy(col("s").desc, col("neighbor_id"))
    e.join(nbrs, Seq("label"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("s", dot(col("embedding"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id"), round(col("s"), 6).as("sim"))
      .orderBy("vec_id")
  }

  /** [[v6KnnJoin]] over the UNSUPERVISED quantizer: every vector's nearest
    * neighbor among the vectors sharing its K-MEANS cell — v6 cell-bounds
    * by the supervised `label` (fixed 10 cells), which is a stand-in; real
    * corpora have no labels, so the cell structure must come from the
    * quantizer itself. `k` is PARAMETERIZED because the cell-bounded-join
    * contract is nlist-scales-with-corpus: the join does sum(|cell|²) work,
    * and |cell| ≈ N/k, so k must grow with N (the usual nlist ≈ √N keeps
    * per-cell work flat) — a fixed k quietly degrades toward the |corpus|²
    * blowup as the corpus grows. Assignment comes from the session memo
    * (shared with v5: one Lloyd loop per sweep); ranking uses the RAW dot
    * with neighbor-id tiebreak, rounding only the output (v6's oracle
    * contract). */
  def v7KnnKmeans(spark: SparkSession, dir: String,
      k: Int = 10, iters: Int = 3): DataFrame = {
    val assigned = kmeansAssigned(spark, dir, k, iters)
    val nbrs = assigned.select(col("cell"), col("vec_id").as("neighbor_id"),
      col("embedding").as("nv"))
    val w = Window.partitionBy("vec_id").orderBy(col("s").desc, col("neighbor_id"))
    assigned.join(nbrs, Seq("cell"))
      .filter(col("vec_id") =!= col("neighbor_id"))
      .withColumn("s", dot(col("embedding"), col("nv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") === 1)
      .select(col("vec_id"), col("cell"), col("neighbor_id"),
        round(col("s"), 6).as("sim"))
      .orderBy("vec_id")
  }

  /** v15: the nlist ≈ √N contract EXECUTED — v7 parameterizes k and the
    * family's docs state the cell-bounded-join work sum(|cell|²) stays
    * flat only when nlist grows with the corpus; this query derives
    * k = max(10, ⌊√N⌋) from ONE counted scalar and builds/assigns the
    * quantizer at that k, emitting the cell-occupancy table (cell,
    * n_vecs, nlist). The row count itself is the evidence: ≈ √N cells,
    * each ≈ √N vectors — the shape that keeps v6/v7-style within-cell
    * joins linear in N. ⌊√N⌋ agrees across engines because IEEE sqrt is
    * correctly rounded (exact on perfect squares), and the occupancy
    * rollup is exact counting. Scale: the count is one scan; training is
    * the shared memoized Lloyd loop (k×dim driver state — at 100 TB,
    * k ≈ 10^6 centroids × dim doubles still fits the driver, and past
    * THAT the quantizer itself shards hierarchically, which is IVF-HNSW
    * territory, not this operator's); assignment is the usual broadcast
    * projection; the rollup shuffles k-bounded (cell, count) partials. */
  def v15AutoNlist(spark: SparkSession, dir: String): DataFrame = {
    val n = t(spark, dir, "embeddings").count() // bounded scalar
    val k = math.max(10L, math.floor(math.sqrt(n.toDouble)).toLong).toInt
    kmeansAssigned(spark, dir, k, 3)
      .groupBy("cell").agg(count(lit(1)).as("n_vecs"))
      .withColumn("nlist", lit(k.toLong))
      .orderBy("cell")
  }

  /** Incremental IVF index maintenance — the similarity-side face of x11's
    * cross-run theme: a NEW batch of vectors (the vec_id % 7 slice) is
    * assigned to the k-means quantizer trained on the EXISTING remainder
    * only, WITHOUT retraining — exactly what a production vector index does
    * between periodic quantizer rebuilds. Emits one row per new vector:
    * its cell and its quantizer score (the cell-ranking objective
    * dot(v, c) - |c|²/2), the index-update table a nightly embedding run
    * appends. At scale the Lloyd loop costs `iters + 1` passes over the
    * OLD corpus once per rebuild cycle (amortized across increments), and
    * the increment itself is one broadcast-quantizer pass over the new
    * batch — no shuffle of either corpus. Oracle: the shared unrolled
    * k-means CTE restricted to the old slice, then the same rank-1
    * assignment of the new slice. */
  def v8IncrementalIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val fresh = e.filter(col("vec_id") % 7 === 0)
    val (cell, _, score) = assignExprs(col("embedding"),
      trainedCentroids(spark, dir, "old", 10, 3))
    fresh.select(col("vec_id"), cell.as("cell"), round(score, 6).as("score"))
      .orderBy("vec_id")
  }

  /** Semantic deduplication (the SemDeDup shape: cluster embeddings with
    * the coarse quantizer, then drop within-cell near-duplicates): one row
    * per vector with a keep/drop verdict — drop iff some LOWER-id vector
    * in the same k-means cell has cosine above the dedupe threshold, with
    * the best such match (highest cosine, ties to the lowest id) as
    * evidence. Keep-first ordering makes the verdict deterministic and
    * single-pass (no greedy chain: a vector dropped for closeness to an
    * already-dropped one still drops — standard dedupe-against-earlier
    * semantics, like x2's keep_doc_id). τ = 0.35 is corpus-calibrated
    * (this synthetic corpus' clusters are well-separated; real SemDeDup
    * sweeps τ per corpus).
    *
    * Scale design: the pair join is cell-bounded (|cell|², never
    * |corpus|²) over the session-memoized assignment — one Lloyd loop per
    * sweep shared with v5/v7 — and the per-vector argmax plans with the
    * WindowGroupLimit pushdown, so each partition forwards one candidate
    * per vec_id. Embeddings never leave the cell shuffle; verdicts are
    * 3 scalars per vector. Ranking and the threshold compare use the RAW
    * dot (bitwise identical in both engines); only the output rounds. */
  def x13SemanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val tau = 0.35
    val assigned = kmeansAssigned(spark, dir, 10, 3)
    val prior = assigned.select(col("cell"), col("vec_id").as("prior_id"),
      col("embedding").as("pv"))
    val w = Window.partitionBy("vec_id").orderBy(col("s").desc, col("prior_id"))
    val best = assigned.join(prior, Seq("cell"))
      .filter(col("prior_id") < col("vec_id"))
      .withColumn("s", dot(col("embedding"), col("pv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("prior_id"), col("s"))
    assigned.select(col("vec_id"), col("cell"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        (col("s").isNull || col("s") <= tau).cast("long").as("keep"),
        when(col("s") > tau, col("prior_id")).as("dup_of"),
        when(col("s") > tau, round(col("s"), 6)).as("sim"))
      .orderBy("vec_id")
  }

  /** Product quantization (the compression layer past IVF: split the
    * vector into M subspaces, k-means each independently, store M small
    * codes per vector instead of the vector): each vector's 4×16-dim
    * subspace codes plus its reconstruction similarity — the
    * subspace-additive dot(v, reconstruction) = Σ_m dot(v_m, centroid_m),
    * the quantity a PQ index's asymmetric-distance lookup tables serve at
    * query time. 64 floats compress to 4 byte-sized codes (16× here;
    * production uses M=8..64 over larger dims for 32-256×).
    *
    * Determinism: each subspace runs the SAME deterministic Lloyd loop as
    * v5 (init = the k lowest vec_ids' slices, decimal-exact means, ties to
    * the lower cell), and the additive score sums the per-subspace RAW
    * dots in subspace order — every term bitwise-reproducible, so the
    * total is too. recon_sim < 1 measures quantization loss per vector
    * (vectors are unit-norm).
    *
    * Scale design: the M Lloyd loops each scan only their 1/M-width slice
    * (same total bytes as one full pass per iteration), all M assignment
    * passes are broadcast-side (k×subDim doubles each), and the M code
    * columns join on vec_id — co-partitioned after each subspace's window,
    * with AQE free to planning-time-merge the tiny sides. Codes are what
    * ships to the serving tier: 4 ints per vector, not 64 floats. */
  /** PQ geometry shared by v9 (encode) and v10 (ADC search): 4 subspaces
    * of 16 dims, 4 centroids each, 3 fused Lloyd iterations. */
  private val PqM = 4; private val PqSubDim = 16
  private val PqK = 4; private val PqIters = 3

  /** Per-corpus PQ codebook memo (same contract as [[assignMemo]]):
    * training is `iters` corpus scans plus per-iteration driver collects
    * of k×dim doubles; a sweep that encodes (v9) AND searches (v10) the
    * same corpus must pay it once. */
  private val pqMemo =
    new graft.BenchMemos.CountedMemo[String, IndexedSeq[Seq[(Int, Seq[Double])]]]("SimilarityQueries")

  private[operators] def pqCodebooks(spark: SparkSession, dir: String,
      sliceTag: String = "full"): IndexedSeq[Seq[(Int, Seq[Double])]] = pqMemo.computeIfAbsent(
    s"${spark.sparkContext.applicationId}|$dir|$sliceTag", _ => {
    import spark.implicits._
    val (m, subDim, k, iters) = (PqM, PqSubDim, PqK, PqIters)
    // slice tags mirror trainedCentroids: "old" trains the codebooks on
    // the standing corpus only (the index-maintenance regime — v21
    // encodes the increment with these, never retraining)
    val e = sliceTag match {
      case "full" => t(spark, dir, "embeddings")
      case "old"  => t(spark, dir, "embeddings").filter(col("vec_id") % 7 =!= 0)
    }
    // The M Lloyd loops run FUSED: one pass per iteration computes every
    // subspace's assignment and per-(subspace, cell, pos) decimal mean
    // (rows are disjoint by subspace, so the groups — and the math — are
    // exactly the per-subspace jobs'), cutting m×iters tiny jobs to iters.
    var cents: IndexedSeq[Seq[(Int, Seq[Double])]] = {
      val init = e.filter(col("vec_id") < k)
        .select(col("vec_id").cast("int"), col("embedding"))
        .as[(Int, Array[Float])].collect().toSeq.sortBy(_._1)
      (0 until m).map(s => init.map { case (id, emb) =>
        (id, emb.slice(s * subDim, (s + 1) * subDim).map(_.toDouble).toSeq) })
    }
    for (_ <- 1 to iters) {
      val subCols = (0 until m).map { s =>
        val sub = slice(col("embedding"), s * subDim + 1, subDim)
        val (cell, _, _) = assignExprs(sub, cents(s))
        struct(lit(s).as("s"), cell.as("cell"), sub.as("semb"))
      }
      val agg = e.select(explode(array(subCols: _*)).as("u"))
        .select(col("u.s").as("s"), col("u.cell").as("cell"), posexplode(col("u.semb")))
        .groupBy("s", "cell", "pos")
        .agg((sum(col("col").cast("decimal(28,10)")).cast("double") / count(lit(1))).as("c"))
        .groupBy("s", "cell")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
          x => x.getField("c")).as("centroid"))
        .as[(Int, Int, Seq[Double])].collect()
      cents = (0 until m).map(s =>
        agg.filter(_._1 == s).map(r => (r._2, r._3)).toSeq.sortBy(_._1))
    }
    cents
  })

  def v9ProductQuantization(spark: SparkSession, dir: String): DataFrame = {
    val (m, subDim) = (PqM, PqSubDim)
    val cents = pqCodebooks(spark, dir)
    val e = t(spark, dir, "embeddings")
    // ALL M code+sim pairs emit in ONE codegen'd projection over the
    // scan — the former per-subspace crossJoin + window + M-way vec_id
    // join is gone entirely (it was the whole pipeline's slowest query).
    val perSub = (0 until m).map { s =>
      val (code, simRaw, _) = assignExprs(
        slice(col("embedding"), s * subDim + 1, subDim), cents(s))
      (code.as(s"code_$s"), simRaw.as(s"sim_$s"))
    }
    e.select(col("vec_id") +: perSub.flatMap { case (c, d) => Seq(c, d) }: _*)
      // subspace order, left-associated: Σ_m dot(v_m, c_m) exactly as the oracle
      .withColumn("recon_sim",
        round(col("sim_0") + col("sim_1") + col("sim_2") + col("sim_3"), 6))
      .select(col("vec_id"), col("code_0"), col("code_1"), col("code_2"),
        col("code_3"), col("recon_sim"))
      .orderBy("vec_id")
  }

  /** v10: ADC (asymmetric distance computation) top-k search — the QUERY
    * path of a PQ index, over the same codebooks v9 trains. Each query's
    * per-subspace distance table (k doubles per subspace) is computed on
    * the driver against the shared codebooks and inlined as literals, so
    * the corpus pass is ONE narrow codegen'd projection: encode (argmax
    * per subspace) + table lookup + (m-1) adds per query — no join and no
    * per-candidate float[64] math, which is the whole point of ADC at
    * scale (the classical IVFADC read path). Table lookups use a when()
    * chain on the cell label rather than array indexing: cell labels are
    * init vec_ids and survive empty-cell collapse, so positional indexing
    * would silently misattribute distances if a cell ever vanished.
    * Driver-side state is m×k×|Q| doubles — bounded. The per-query score
    * folds subspace tables in subspace order (left-associated adds), the
    * same arithmetic as the oracle's q0.d + q1.d + q2.d + q3.d, so scores
    * are bitwise-reproducible and rank tiebreaks agree across engines —
    * including the EXACT ties PQ creates between same-code candidates. */
  def v10PqAdcSearch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (m, subDim) = (PqM, PqSubDim)
    val cents = pqCodebooks(spark, dir)
    val e = t(spark, dir, "embeddings")
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    // sequential left-fold dot — the same evaluation order as the in-plan
    // `dot` fold and DuckDB's list_dot_product, so literals match bitwise
    def jdot(q: Array[Float], c: Seq[Double], off: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += q(off + i).toDouble * c(i); i += 1 }
      acc
    }
    val codeCols = (0 until m).map { s =>
      val (cell, _, _) = assignExprs(
        slice(col("embedding"), s * subDim + 1, subDim), cents(s))
      cell.as(s"code_$s")
    }
    val coded = e.select(col("vec_id").as("neighbor_id") +: codeCols: _*)
    val perQuery = queries.map { case (qid, qv) =>
      val score = (0 until m).map { s =>
        val lookups = cents(s).map { case (cellId, c) =>
          (cellId, jdot(qv, c, s * subDim)) }
        lookups.tail.foldLeft(
          when(col(s"code_$s") === lookups.head._1, lit(lookups.head._2))) {
          case (acc, (cellId, d)) => acc.when(col(s"code_$s") === cellId, lit(d))
        }
      }.reduce(_ + _)
      struct(lit(qid).as("query_id"), score.as("s"))
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("s").desc, col("neighbor_id"))
    coded.select(col("neighbor_id"), explode(array(perQuery.toIndexedSeq: _*)).as("u"))
      .select(col("u.query_id").as("query_id"), col("neighbor_id"), col("u.s").as("s"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("s"), 6).as("adc_sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** v11: SQ8 scalar-quantized search — the third quantization flavor next
    * to PQ (v9/v10) and LSH (v2/x6), and the one FAISS calls SQ8: each
    * dimension scales independently to a signed-byte code
    * (floor(x·127/max_abs_d), clamped), and search ranks by the INTEGER
    * dot of code vectors. Integer scoring makes this the one ANN path
    * with zero float-ordering risk — scores are exact longs, so ranking
    * (and the oracle hash) is trivially deterministic, and at scale the
    * scan reads 64 bytes/vector instead of 256 and multiplies ints.
    * The 64 per-dimension scales collect once (bounded driver state);
    * queries quantize driver-side with the same IEEE sequence and inline
    * as literal code arrays, so the corpus pass is scan → quantize →
    * 10 integer folds — no join (v10's shape with integer math). */
  def v11Sq8Search(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = t(spark, dir, "embeddings")
    val scales = e.select(posexplode(col("embedding")))
      .groupBy("pos").agg(max(abs(col("col"))).cast("double").as("m"))
      .as[(Int, Double)].collect().sortBy(_._1).map(_._2)
    require(scales.forall(_ > 0), "SQ8 needs a nonzero max-abs per dimension")
    val scaleLit = typedLit(scales.toSeq)
    def quantize(x: Column, i: Column): Column =
      least(lit(127L), greatest(lit(-127L),
        floor(x.cast("double") * 127 / element_at(scaleLit, i + 1))))
    val coded = e.select(col("vec_id").as("neighbor_id"),
      transform(col("embedding"), (x, i) => quantize(x, i)).as("codes"))
    val queries = e.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .map { case (qid, qv) =>
        (qid, qv.toSeq.zipWithIndex.map { case (x, d) =>
          // the same IEEE sequence as the in-plan quantize()
          math.min(127L, math.max(-127L,
            math.floor(x.toDouble * 127 / scales(d)).toLong))
        })
      }
    val perQuery = queries.map { case (qid, qcodes) =>
      val score = aggregate(
        zip_with(col("codes"), typedLit(qcodes), (a, b) => a * b),
        lit(0L), (acc, x) => acc + x)
      struct(lit(qid).as("query_id"), score.as("qdot"))
    }
    val w = Window.partitionBy("query_id")
      .orderBy(col("qdot").desc, col("neighbor_id"))
    coded.select(col("neighbor_id"), explode(array(perQuery.toIndexedSeq: _*)).as("u"))
      .select(col("u.query_id").as("query_id"), col("neighbor_id"), col("u.qdot").as("qdot"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("qdot"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** v12: IVFADC — the classical composed vector index, assembled from
    * the two pieces this suite already proves independently: the k-means
    * coarse quantizer (v5/v7's session-memoized assignment) restricts
    * each query to ITS OWN cell (probe = 1/nlist of the corpus), and
    * within the cell candidates rank by v10's ADC lookup — inlined
    * per-query distance tables over the shared PQ codebooks, no joins,
    * no raw-vector math at query time. This is the exact read path a
    * FAISS-style IVFADC index executes, end to end, and the oracle
    * composes the same two SQL templates (the Lloyd CTE + the subspace
    * CTEs), so the whole composition hash-matches. At 100 TB: the scan
    * emits (cell, 4 codes) per vector; the only exchange is the rank
    * shuffle of k·|queries| rows after the WindowGroupLimit pushdown. */
  def v12IvfAdc(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("s").desc, col("neighbor_id"))
    // through the size dispatcher: the 10-query driver sample sits below
    // InlineQueryLimit, so this IS the historical inline plan — but a
    // caller with a production probe set gets the join dataflow without
    // touching the API (the two are bitwise-identical, AdcJoinSpec)
    ivfAdcScoredAuto(spark, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("s"), 6).as("adc_sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** The IVFADC candidate stream `(query_id, neighbor_id, s)` — each
    * query's probed-cell candidates under the ADC score — shared by v12
    * (rank directly on the quantized score), v16 (shortlist, then exact
    * re-rank) and v18 (the same two stages at nprobe=4). One derivation,
    * three consumers, mirroring how the SQL oracles share the `scored`
    * CTE verbatim.
    *
    * `nprobe` is THE IVF recall/cost dial (v17's audit measures what it
    * buys): each query's candidates come from its `nprobe` nearest coarse
    * cells by the quantizer objective dot(q,c) − |c|²/2 — ranked
    * driver-side over the k×dim centroid table with the SAME
    * ascending-index fold as [[graft.functions.DotProductF]] /
    * list_dot_product and the (score desc, cell asc) tie order, so the
    * probe set is bitwise the window the SQL oracle ranks (and rank 1 is
    * exactly the assignment cell, making nprobe=1 the classic own-cell
    * probe). Scale: the probe set multiplies only the CANDIDATE stream
    * (nprobe/nlist of the corpus per query, still never a corpus scan);
    * the codes scan and the window's group-limit pushdown are
    * unchanged. */
  /** The IVF-PQ index BODY `(neighbor_id, cell, code_0..code_{M-1})` —
    * what a persisted index stores per vector (4 ints + the coarse cell,
    * never the raw floats): one codegen'd assignment scan over the
    * session-memoized coarse assignment. Shared by the in-session read
    * path ([[ivfAdcScored]]) and the persist path
    * ([[AnnIndexStore.persist]]), so the persisted codes are bitwise the
    * session's. */
  private[operators] def codedVectors(spark: SparkSession, dir: String): DataFrame = {
    val (m, subDim) = (PqM, PqSubDim)
    val cents = pqCodebooks(spark, dir)
    val assigned = kmeansAssigned(spark, dir, 10, 3)
    val codeCols = (0 until m).map { s =>
      assignExprs(slice(col("embedding"), s * subDim + 1, subDim), cents(s))
        ._1.as(s"code_$s")
    }
    assigned.select(
      col("vec_id").as("neighbor_id") +: col("cell") +: codeCols: _*)
  }

  /** Encode arbitrary `(vec_id, embedding)` rows against an EXPLICIT
    * quantizer — the write-side twin of [[ivfAdcServe]]: same
    * [[assignExprs]] arithmetic as the memoized paths, but the quantizer
    * arrives as data (e.g. reopened from [[AnnIndexStore]] storage), so
    * an index increment encodes with the PERSISTED codebooks and never
    * touches training state. */
  private[operators] def encodeWith(e: DataFrame,
      coarse: Seq[(Int, Seq[Double])],
      cents: IndexedSeq[Seq[(Int, Seq[Double])]]): DataFrame = {
    val (m, subDim) = (PqM, PqSubDim)
    val (cell, _, _) = assignExprs(col("embedding"), coarse)
    val codeCols = (0 until m).map { s =>
      assignExprs(slice(col("embedding"), s * subDim + 1, subDim), cents(s))
        ._1.as(s"code_$s")
    }
    e.select(col("vec_id").as("neighbor_id") +: cell.as("cell") +: codeCols: _*)
  }

  private[operators] def ivfAdcScored(spark: SparkSession, dir: String,
      nprobe: Int = 1,
      queriesPred: Column = col("vec_id") < 10): DataFrame = {
    import spark.implicits._
    val cents = pqCodebooks(spark, dir)
    val coarse = trainedCentroids(spark, dir, "full", 10, 3)
    val assigned = kmeansAssigned(spark, dir, 10, 3)
    val coded = codedVectors(spark, dir)
    val queries = assigned.filter(queriesPred)
      .select(col("vec_id"), col("cell"), col("embedding"))
      .as[(Long, Int, Array[Float])].collect().sortBy(_._1).toSeq
    ivfAdcServe(coarse, cents, coded, queries, nprobe)
  }

  /** The inline CASE-literal ADC form is the right plan only while the
    * probe set is SMALL: its expression tree grows O(|Q|·M·k') and the
    * whole probe set rides the driver's plan. At M=4 subspaces and
    * k'=4 codes, 64 queries is ~1k CASE branches — comfortably inside
    * whole-stage codegen's 64KB method budget with an order of magnitude
    * of headroom, and plan-build time still milliseconds. Past it, the
    * join-dataflow form's O(1) expression size wins (its |Q|-scaled
    * tables live in the data plane, AQE-gated). */
  private[operators] val InlineQueryLimit = 64L

  /** The serving entry point: dispatch between the two bitwise-identical
    * ADC implementations on probe-set size (the r9 review's scale note —
    * closed). The count is one row-group-pruned scan of the predicate;
    * at or below [[InlineQueryLimit]] the inline path runs (v12's
    * historical plan, oracle-stable), above it the join dataflow.
    * AdcJoinSpec proves the outputs identical on both sides of the
    * threshold AND that the switch really changes the plan. */
  private[operators] def ivfAdcScoredAuto(spark: SparkSession, dir: String,
      nprobe: Int = 1,
      queriesPred: Column = col("vec_id") < 10,
      inlineQueryLimit: Long = InlineQueryLimit): DataFrame = {
    val nQ = t(spark, dir, "embeddings").filter(queriesPred).count()
    if (nQ <= inlineQueryLimit) ivfAdcScored(spark, dir, nprobe, queriesPred)
    else ivfAdcScoredJoined(spark, dir, nprobe, queriesPred)
  }

  /** The IVFADC scoring core over EXPLICIT index parts — the serve-time
    * read path detached from training: callers hand it the coarse
    * centroids, the PQ codebooks, the coded-vector table and the
    * (query_id, own cell, raw vector) probe set, and it runs the exact
    * arithmetic [[ivfAdcScored]] always ran (ascending-index folds,
    * (score desc, cell asc) ties, inlined per-query distance tables).
    * The in-session path and [[AnnIndexStore]]'s persisted-index path
    * both delegate here, which is what makes "reopened index ≡ session
    * memo" a structural fact rather than a hope. */
  private[operators] def ivfAdcServe(
      coarse: Seq[(Int, Seq[Double])],
      cents: IndexedSeq[Seq[(Int, Seq[Double])]],
      coded: DataFrame,
      queries: Seq[(Long, Int, Array[Float])],
      nprobe: Int): DataFrame = {
    val m = PqM; val subDim = PqSubDim
    def jdot(q: Array[Float], c: Seq[Double], off: Int): Double = {
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += q(off + i).toDouble * c(i); i += 1 }
      acc
    }
    // ascending-index fold == list_dot_product's accumulation order, the
    // same arithmetic assignExprs runs — driver ranking of k cells per
    // query is exact, so rank 1 always equals the assignment cell
    def cellObjective(q: Array[Float], c: Seq[Double]): Double = {
      var cn = 0.0; var i = 0
      while (i < c.length) { cn += c(i) * c(i); i += 1 }
      jdot(q, c, 0) - 0.5 * cn
    }
    val perQuery = queries.map { case (qid, qcell, qv) =>
      val probes: Seq[Int] =
        if (nprobe <= 1) Seq(qcell)
        else coarse.map { case (id, c) => (id, cellObjective(qv, c)) }
          .sortBy { case (id, s) => (-s, id) }.take(nprobe).map(_._1)
      val score = (0 until m).map { s =>
        val lookups = cents(s).map { case (cellId, c) =>
          (cellId, jdot(qv, c, s * subDim)) }
        lookups.tail.foldLeft(
          when(col(s"code_$s") === lookups.head._1, lit(lookups.head._2))) {
          case (acc, (cellId, d)) => acc.when(col(s"code_$s") === cellId, lit(d))
        }
      }.reduce(_ + _)
      struct(lit(qid).as("query_id"),
        typedLit(probes).as("qcells"), score.as("s"))
    }
    coded.select(col("neighbor_id"), col("cell"),
        explode(array(perQuery.toIndexedSeq: _*)).as("u"))
      .filter(array_contains(col("u.qcells"), col("cell")) &&
        col("neighbor_id") =!= col("u.query_id"))
      .select(col("u.query_id").as("query_id"), col("neighbor_id"), col("u.s").as("s"))
  }

  /** v16: two-stage ANN serving — the production read path every vector
    * store runs: the quantized index proposes, the raw vectors decide.
    * Stage 1 is v12's IVFADC candidate stream widened to a top-20
    * SHORTLIST per query (ADC scores over 4 codes/vector — cheap, reads
    * no raw embeddings); stage 2 joins ONLY the ≤20 survivors per query
    * back to their raw embeddings and re-ranks by the exact double dot
    * ([[Tables.dot]], the ascending-index fold `list_dot_product` also
    * runs), emitting the top 5 with exact similarities. Determinism:
    * both stages' orderings are total ((score desc, neighbor_id)), the
    * shortlist boundary sits on v12's already-hash-proven ADC scores,
    * and the exact rerank is the same bitwise fold v1 proves. At 100 TB:
    * stage 1 scans codes (16 B/vector, no shuffle before the window's
    * group-limit pushdown); stage 2 touches raw vectors for
    * 20·|queries| rows — a point-lookup-sized semi-join, NOT a corpus
    * scan, which is exactly why serving systems shortlist before they
    * re-rank. Queries broadcast (10 rows); the neighbor-side join keys
    * on vec_id against the shortlist, so AQE sizes it (shortlist ≪
    * corpus → broadcast the shortlist, never the embeddings). */
  def v16Rerank(spark: SparkSession, dir: String): DataFrame =
    rerankOver(spark, dir, ivfAdcScored(spark, dir))

  /** v18: [[v16Rerank]] with the nprobe dial TURNED — the same two-stage
    * serving read path over the nprobe=4 candidate stream (each query's 4
    * nearest coarse cells instead of 1), with the shortlist budget scaled
    * to match (20·nprobe). The scaling is NOT optional garnish — the first
    * cut kept the fixed top-20 shortlist and v17's audit measured recall
    * FALLING at nprobe=4 (26 → 14 hits of 50 at sf0.001): this PQ's
    * 4^4-combination code space floods the boundary with quantized-score
    * ties, so 4× candidates under a fixed budget evict true neighbors
    * from the shortlist — exactly the deployment pitfall the audit exists
    * to catch (every production IVF-PQ exposes the refine budget as a
    * dial next to nprobe for this reason). Cost: still a cell-bounded
    * candidate stream, never a corpus scan; the stage-2 raw-vector touch
    * grows to ≤20·nprobe·|queries| rows — point-lookup-sized at any
    * corpus scale. */
  def v18Multiprobe(spark: SparkSession, dir: String): DataFrame =
    rerankOver(spark, dir, ivfAdcScored(spark, dir, nprobe = 4), shortlistK = 80)

  /** The IVFADC candidate stream as a pure JOIN dataflow — the
    * PRODUCTION-QUERY-VOLUME form of [[ivfAdcScored]]. The inline path
    * builds per-query distance tables as driver-side CASE literal chains:
    * exact and fast at the 10-query driver sample, but the expression
    * tree grows O(|Q|·M·k') and the whole probe set rides the driver's
    * plan — at real serving volumes (thousands of concurrent queries)
    * that is a driver bottleneck, not a data-plane one. This form keeps
    * EVERYTHING in the data plane, expression size O(1):
    *   1. probe cells  = queries ⋈ broadcast(k×dim coarse table), window
    *      top-nprobe per query by the quantizer objective;
    *   2. M distance tables = queries ⋈ broadcast(k'-row codebook_s):
    *      (query_id, code_s, d_s = dot(q_s, centroid)) — |Q|·k' rows;
    *   3. candidates   = codes scan ⋈ probe cells on cell (the only
    *      corpus-side join — cell-equi, AQE size-gates the build side);
    *   4. score        = M successive (query_id, code_s) hash-join
    *      lookups, s = d_0 + … + d_(M−1) in subspace order.
    * Only the k×dim / k'-row quantizer tables carry broadcast HINTS; the
    * |Q|-scaled probe/distance tables are unhinted — AQE broadcasts them
    * while |Q| is small and degrades to shuffled hash joins when |Q|
    * outgrows broadcast range, which is exactly the wanted behavior.
    * Arithmetic is BITWISE the inline path's: [[graft.functions.DotProductF]]
    * is the same ascending fold as the driver-side jdot, the probe rank
    * order the same (objective desc, cell asc), the subspace sum the same
    * left-assoc order — AdcJoinSpec asserts stream equality and the v20
    * driver row shares v12's oracle verbatim. */
  private[operators] def ivfAdcScoredJoined(spark: SparkSession, dir: String,
      nprobe: Int = 1,
      queriesPred: Column = col("vec_id") < 10): DataFrame = {
    import spark.implicits._
    val (m, subDim) = (PqM, PqSubDim)
    val coarseDf = trainedCentroids(spark, dir, "full", 10, 3)
      .toDF("cell", "centroid")
    val books = pqCodebooks(spark, dir)
    val coded = codedVectors(spark, dir)
    val q = t(spark, dir, "embeddings").filter(queriesPred)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val wq = Window.partitionBy("query_id").orderBy(col("obj").desc, col("cell"))
    val probes = q.join(broadcast(coarseDf))
      .withColumn("obj", dot(col("qv"), col("centroid")) -
        lit(0.5) * dot(col("centroid"), col("centroid")))
      .withColumn("rk", row_number().over(wq)).filter(col("rk") <= nprobe)
      .select("query_id", "cell")
    val dtabs = (0 until m).map { s =>
      q.join(broadcast(books(s).toDF(s"code_$s", "centroid")))
        .select(col("query_id"), col(s"code_$s"),
          dot(slice(col("qv"), s * subDim + 1, subDim), col("centroid")).as(s"d_$s"))
    }
    val cands = coded.join(probes, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
    (0 until m).foldLeft(cands) { (df, s) =>
        df.join(dtabs(s), Seq("query_id", s"code_$s"))
      }
      .select(col("query_id"), col("neighbor_id"),
        (0 until m).map(s => col(s"d_$s")).reduce(_ + _).as("s"))
  }

  /** v20: v12's top-5 ADC ranking over the JOIN-dataflow candidate
    * stream — the scale form executed and hash-proven against the same
    * oracle as the inline form (any arithmetic or tie-order divergence
    * between the two serving implementations breaks the driver hash). */
  def v20AdcJoinServe(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("s").desc, col("neighbor_id"))
    ivfAdcScoredJoined(spark, dir)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("s"), 6).as("adc_sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** The shared stage-2 exact re-rank: top-`shortlistK` ADC shortlist
    * from the given candidate stream, raw-vector exact top-5 out (v16's
    * scaladoc carries the full design rationale; v18 reuses it at
    * nprobe=4 with the scaled budget). */
  private[operators] def rerankOver(spark: SparkSession, dir: String,
      scored: DataFrame, shortlistK: Int = 20): DataFrame = {
    val wShort = Window.partitionBy("query_id")
      .orderBy(col("s").desc, col("neighbor_id"))
    val shortlist = scored
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= shortlistK)
      .select(col("query_id"), col("neighbor_id"))
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = shortlist
      .join(e.select(col("vec_id").as("neighbor_id"), col("embedding").as("nv")),
        Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("sim", dot(col("nv"), col("qv")))
    val wFinal = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    exact.withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"),
        round(col("sim"), 6).as("sim"), col("rank"))
      .orderBy("query_id", "rank")
  }

  /** v17: ANN recall audit — the table every vector-index deployment
    * reads before trusting its index: per query, how many of the TRUE
    * top-5 (v1's exact scan) the two-stage index (v16) actually
    * returned. The number quantifies the IVF cell restriction — recall
    * lost to probing 1/nlist of the corpus — which no amount of
    * re-ranking can recover; a deployment tunes nprobe/nlist until this
    * table clears its floor. Deterministic end to end (both inputs are
    * hash-proven), and the oracle composes the two proven templates.
    * At 100 TB the practice this encodes: ground truth is the exact
    * scan over a bounded QUERY SAMPLE (here the 10 probe queries), never
    * all-pairs — the audit costs one corpus pass per refresh. On THIS
    * corpus the embeddings are random vectors with no cluster structure
    * (x6's scaladoc records the same property), so 1-probe recall is
    * intrinsically low (~0.44 mean at sf0.1) — which is the point: the
    * audit MEASURES it instead of letting the index ship on faith.
    *
    * r9: the table is now recall-vs-NPROBE — one block per setting of the
    * dial the audit exists to tune (nprobe=1, v16's own-cell serve;
    * nprobe=4, v18's multi-probe), so the deployment reads what turning
    * the knob actually buys on this corpus instead of prose promising it
    * rises. Candidate sets are nested by construction (rank ≤ 1 cells ⊂
    * rank ≤ 4 cells), but the SHORTLIST boundary is not monotone in
    * theory (a flood of better-ADC candidates could push a true neighbor
    * off the top-20) — measuring instead of assuming is the audit's whole
    * job, and KmeansIvfSpec asserts what IS structural (probe-set
    * nesting) separately. */
  def v17RecallAudit(spark: SparkSession, dir: String): DataFrame = {
    val exact = v1CosineTopK(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    def audit(np: Int, approx: DataFrame): DataFrame =
      exact.join(
          approx.select(col("query_id"), col("neighbor_id"), lit(1L).as("hit")),
          Seq("query_id", "neighbor_id"), "left")
        .groupBy("query_id")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
        .select(lit(np.toLong).as("nprobe"), col("query_id"), col("hits"),
          round(col("hits") / lit(5.0), 4).as("recall_at_5"))
    audit(1, v16Rerank(spark, dir))
      .union(audit(4, v18Multiprobe(spark, dir)))
      .orderBy("nprobe", "query_id")
  }

  /** IVF-flavored per-label centroids + assignment check: exact-decimal
    * element-wise centroid per label, then each vector's cosine to its own
    * label centroid — the coarse-quantizer building block of an IVF index. */
  def v3LabelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val unpacked = e.select(col("label"), posexplode(col("embedding")))
    // exact order-independent mean: decimal sum -> double -> one IEEE divide
    val centroids = unpacked.groupBy("label", "pos")
      .agg((sum(col("col").cast("decimal(28,10)")).cast("double") / count(lit(1)))
        .as("c"))
      .groupBy("label")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
        x => x.getField("c")).as("centroid"))
    e.join(broadcast(centroids), "label")
      .withColumn("sim_to_centroid", round(
        aggregate(zip_with(col("embedding"), col("centroid"),
          (x, y) => x.cast("double") * y), lit(0.0), (acc, x) => acc + x), 6))
      .groupBy("label")
      // rounded sims are exact DECIMAL(18,6) values: summing them in decimal
      // keeps the average independent of partition order (double avg is not)
      .agg(count(lit(1)).as("n_vectors"),
        round(sum(col("sim_to_centroid").cast("decimal(18,6)")).cast("double")
          / count(lit(1)), 6).as("avg_sim_to_centroid"))
      .orderBy("label")
  }

  /** v13's similarity floor: same-cell neighbors with dot ≥ 0.15 (the
    * corpus' same-label dots top out around 0.36, so this keeps the result
    * selective but non-empty at every SF — probed before settling). */
  private val RangeSearchTau = 0.15

  /** v13: RANGE (radius/threshold) search — the variable-cardinality verb
    * next to v1/v4's top-k: every neighbor of the 10 query vectors with
    * similarity ≥ τ, not a fixed k of them. This is the shape semantic
    * dedupe thresholds use (x13 keeps a pair iff sim ≥ τ — there the τ
    * decides DROPS, here it returns the matches). Candidates are
    * cell-bounded exactly like v6 (label cells here; v7 documents the
    * kmeans-cell variant of the same contract), the threshold compares the
    * RAW double dot — bit-identical across engines per the dot_f contract,
    * so the τ boundary cannot flip — and only the emitted sim is rounded.
    * Scale: queries broadcast; per-query work is |cell|, never corpus;
    * result size is data-dependent, which is exactly what the verb means. */
  def v13RangeSearch(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 10)
      .select(col("label"), col("vec_id").as("query_id"), col("embedding").as("qv"))
    e.join(broadcast(q), Seq("label"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("s", dot(col("embedding"), col("qv")))
      .filter(col("s") >= RangeSearchTau)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(col("s"), 6).as("sim"))
      .orderBy("query_id", "neighbor_id")
  }

  /** v14: quantizer drift audit — the WHEN-TO-RETRAIN signal that closes
    * the index-maintenance loop v8 opened: v8 assigns new batches to the
    * stale quantizer (trained on the old slice); this query measures what
    * that staleness costs. Per cell shared by the OLD-trained (v8's) and
    * FULL-corpus (v5's) quantizers: the raw-dot similarity between the
    * two centroids, plus how many corpus vectors sit in the cell under
    * the old quantizer and how many of them would land in a DIFFERENT
    * cell under the fresh one (the membership churn a rebuild would
    * cause). When churn or centroid divergence crosses a budget, the
    * nightly job schedules the retrain. Scale: two Lloyd loops (each
    * `iters + 1` corpus passes — the audit is an offline maintenance
    * query), both SESSION-MEMOIZED via [[trainedCentroids]] so a sweep
    * pays the full-corpus loop once with v5/v7 and the old-slice loop
    * once with v8; the comparison pass is ONE corpus projection under two
    * broadcast argmax expressions into a ≤k-group map-side count — the
    * corpus never shuffles; the k×k centroid-similarity table is driver
    * arithmetic in the SAME ascending-index fold as `dot_f`/DuckDB's
    * list_dot_product, so it is bitwise-reproducible. */
  def v14QuantizerDrift(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val e = t(spark, dir, "embeddings")
    val centsOld = trainedCentroids(spark, dir, "old", 10, 3)
    val centsNew = trainedCentroids(spark, dir, "full", 10, 3)
    val (cellOld, _, _) = assignExprs(col("embedding"), centsOld)
    val (cellNew, _, _) = assignExprs(col("embedding"), centsNew)
    val churn = e.select(cellOld.as("cell"), cellNew.as("new_cell"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n_vectors"),
        sum(when(col("new_cell") =!= col("cell"), 1L).otherwise(0L)).as("n_moved"))
    val sims = centsOld.flatMap { case (id, co) =>
      centsNew.find(_._1 == id).map { case (_, cn) =>
        // ascending-index fold == list_dot_product's accumulation order
        (id, co.iterator.zip(cn.iterator).foldLeft(0.0) { case (a, (x, y)) => a + x * y })
      }
    }.toDF("cell", "centroid_sim")
    churn.join(broadcast(sims), Seq("cell"))
      .select(col("cell"), col("n_vectors"), col("n_moved"),
        round(col("centroid_sim"), 6).as("centroid_sim"))
      .orderBy("cell")
  }
}
