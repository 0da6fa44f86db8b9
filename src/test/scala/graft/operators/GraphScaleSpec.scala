package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/**
 * The size-gated iterative-graph join contract (GraphOps.broadcastNodeLimit):
 * below the gate n1/n2 broadcast the node-sized rank/score side; above it
 * the checkpointed edge set is co-partitioned by its join key ONCE and
 * every iteration ships only node-sized rows. These specs force the
 * co-partitioned regime (gate = 0, auto-broadcast off so AQE can't convert
 * the demonstration join back to broadcast) and assert BOTH halves of the
 * "done" contract: identical output to the broadcast regime (the oracle
 * hash is regime-independent because per-edge terms quantize to decimal
 * before summing), and ZERO shuffles of edge-shaped rows anywhere in the
 * executed plan — the one edge exchange happens inside the eager
 * localCheckpoint build, so the iteration plans only ever exchange rank /
 * score / partial-agg rows.
 */
class GraphScaleSpec extends SparkSpec {

  /** Output column-name sets of every shuffle exchange in the final
    * (post-AQE) executed plan — the fingerprint that separates edge-row
    * shuffles from node-row shuffles. */
  private def shuffleOutputs(plan: SparkPlan): Seq[Set[String]] = {
    val buf = scala.collection.mutable.Buffer.empty[Set[String]]
    def go(p: SparkPlan): Unit = p match {
      case a: AdaptiveSparkPlanExec => go(a.executedPlan)
      case s: ShuffleExchangeExec =>
        buf += s.output.map(_.name).toSet; s.children.foreach(go)
      case q: QueryStageExec => go(q.plan)
      case other => other.children.foreach(go)
    }
    go(plan)
    buf.toSeq
  }

  private def inCoPartitionedRegime[A](body: => A): A = {
    val conf = spark.conf
    val prevThresh = conf.get("spark.sql.autoBroadcastJoinThreshold")
    conf.set("graft.graph.broadcastNodeLimit", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body
    finally {
      conf.unset("graft.graph.broadcastNodeLimit")
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
    }
  }

  private def rows(df: DataFrame): Seq[(Long, Double)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getDouble(1)))

  test("n1 co-partitioned regime: same ranks, edges never re-shuffle") {
    val viaBroadcast = rows(GraphOps.n1Pagerank(spark, sfDir))
    val (viaCoPart, shuffles) = inCoPartitionedRegime {
      val df = GraphOps.n1Pagerank(spark, sfDir)
      val got = rows(df) // materialize so the adaptive plan is final
      (got, shuffleOutputs(df.queryExecution.executedPlan))
    }
    assert(viaCoPart == viaBroadcast,
      "the regime is a physical-plan choice; ranks must be bit-identical")
    // Edge rows carry (src, dst, p); rank-side and partial-agg shuffles
    // never hold src and dst together. One edge exchange exists — inside
    // the checkpoint build — so the iteration plan must show none.
    val edgeShuffles = shuffles.filter(o => o.contains("src") && o.contains("dst"))
    assert(edgeShuffles.isEmpty,
      s"edge set re-shuffled in the iteration plan: $edgeShuffles")
    assert(shuffles.nonEmpty,
      "sanity: the co-partitioned plan still shuffles node-sized rows")
  }

  test("edge memo materializes through the cache layer (measured stats)") {
    // r17 regression guard: a localCheckpointed memo carries the BUILD
    // plan's size ESTIMATE — the basket-agg build estimated ~2 MB where
    // the edge set is really edge-scale, so downstream unhinted joins
    // auto-broadcast the corpus-scale edge table (and at 100 TB, OOM the
    // driver). The cache layer reports MEASURED block sizes; this pins
    // the mechanism and that the reported stats are real bytes, not an
    // estimate left at the conf default.
    val e = GraphOps.coPurchaseEdges(spark, sfDir)
    val mem = e.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation => r
    }
    assert(mem.nonEmpty, "edge memo must be an InMemoryRelation (cache layer)")
    val bytes = e.queryExecution.optimizedPlan.stats.sizeInBytes
    val defaultSize = BigInt(spark.sessionState.conf.defaultSizeInBytes)
    assert(bytes > 0 && bytes < defaultSize,
      s"edge memo stats should be measured bytes, got $bytes")
  }

  test("n2 co-partitioned regime: same authorities, edges never re-shuffle") {
    val viaBroadcast = rows(GraphOps.n2Hits(spark, sfDir))
    val (viaCoPart, shuffles) = inCoPartitionedRegime {
      val df = GraphOps.n2Hits(spark, sfDir)
      val got = rows(df)
      (got, shuffleOutputs(df.queryExecution.executedPlan))
    }
    assert(viaCoPart == viaBroadcast,
      "the regime is a physical-plan choice; scores must be bit-identical")
    // Edge rows carry (cust, part); score tables and partials hold only
    // one of the two ids. Both co-partitions materialize inside their
    // eager checkpoints, so the half-step plans must never shuffle them.
    val edgeShuffles = shuffles.filter(o => o.contains("cust") && o.contains("part"))
    assert(edgeShuffles.isEmpty,
      s"edge set re-shuffled in the half-step plan: $edgeShuffles")
  }

  test("n4 delta-relaxation equals classical full Bellman-Ford") {
    import org.apache.spark.sql.functions._
    // classical form: every settled node re-relaxes each round (the shape
    // the DuckDB oracle unrolls); the shipped delta form must agree exactly
    val e = GraphOps.coPurchaseEdges(spark, sfDir)
      .select(col("src"), col("dst"), expr("1000000 div w").as("cost"))
    val seed = e.agg(min(col("src"))).head().getLong(0)
    import spark.implicits._
    var dist = Seq((seed, 0L)).toDF("part", "dist")
    for (_ <- 1 to 3) {
      dist = dist
        .union(e.join(dist.select(col("part").as("src"), col("dist").as("d0")),
            Seq("src"))
          .select(col("dst").as("part"), (col("d0") + col("cost")).as("dist")))
        .groupBy("part").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    val classical = dist.orderBy(col("dist"), col("part")).limit(20)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val shipped = GraphOps.n4Sssp(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(shipped == classical)
    assert(shipped.head == ((seed, 0L)), "seed is its own nearest node at 0")
    assert(shipped.map(_._2) == shipped.map(_._2).sorted, "dist-ascending")
  }

  test("n6 co-partitioned regime: same communities, edges never re-shuffle") {
    val viaBroadcast = rows2(GraphOps.n6LabelProp(spark, sfDir))
    val (viaCoPart, shuffles) = inCoPartitionedRegime {
      val df = GraphOps.n6LabelProp(spark, sfDir)
      val got = rows2(df)
      (got, shuffleOutputs(df.queryExecution.executedPlan))
    }
    assert(viaCoPart == viaBroadcast,
      "the regime is a physical-plan choice; communities must be identical")
    val edgeShuffles = shuffles.filter(o => o.contains("src") && o.contains("dst"))
    assert(edgeShuffles.isEmpty,
      s"edge set re-shuffled in the round plan: $edgeShuffles")
  }

  private def rows2(df: DataFrame): Seq[(Long, Long)] =
    df.collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))

  test("n5 degree-oriented count equals naive id-ordered enumeration") {
    import org.apache.spark.sql.functions._
    // naive canonical form: enumerate each triangle once as u<v<w by PLAIN
    // id over the symmetric edge set — no degree orientation involved, so
    // agreement proves the orientation neither drops nor double-counts
    val e = GraphOps.coPurchaseEdges(spark, sfDir).select("src", "dst")
    val tri = e.select(col("src").as("u"), col("dst").as("v"))
      .filter(col("u") < col("v"))
      .join(e.select(col("src").as("v"), col("dst").as("w"))
        .filter(col("v") < col("w")), Seq("v"))
      .join(e.select(col("src").as("u"), col("dst").as("w")), Seq("u", "w"))
    val naive = tri
      .select(explode(array(col("u"), col("v"), col("w"))).as("part"))
      .groupBy("part").agg(count(lit(1)).as("triangles"))
      .orderBy(col("triangles").desc, col("part")).limit(20)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val shipped = GraphOps.n5Triangles(spark, sfDir)
      .collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(shipped == naive)
    assert(shipped.nonEmpty, "co-purchase graph has triangles at every SF")
  }

  test("v16 re-ranks only the ADC shortlist, with exact sims") {
    import org.apache.spark.sql.functions._
    val shortlist = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("s").desc, col("neighbor_id"))
      SimilarityQueries.ivfAdcScored(spark, sfDir)
        .withColumn("r", row_number().over(w)).filter(col("r") <= 20)
        .select("query_id", "neighbor_id")
        .collect().toSet.map((r: org.apache.spark.sql.Row) =>
          (r.getLong(0), r.getLong(1)))
    }
    val out = graft.SparkEntry.queries("v16_rerank")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.sorted.reverse.toSeq == sims.toSeq, "rank follows exact sim desc")
    }
    assert(out.forall(r => shortlist.contains((r.getLong(0), r.getLong(1)))),
      "every re-ranked neighbor came through the quantized shortlist")
  }

  test("concurrent gated builds leave session AQE conf on throughout") {
    // r8's coPartitionedCheckpoint toggled spark.sql.adaptive.enabled
    // session-globally around the checkpoint build — a concurrently
    // planning query would silently lose AQE (VERDICT r8, What's wrong
    // #3). The r9 build goes through the cache layer and never touches
    // conf: two gated builds run concurrently here while a poller
    // watches the parent session's AQE flag, which must stay on for the
    // whole window.
    inCoPartitionedRegime {
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
      @volatile var sawOff = false
      @volatile var done = false
      val poller = new Thread(() => {
        while (!done) {
          if (spark.conf.get("spark.sql.adaptive.enabled") != "true") sawOff = true
          Thread.sleep(1)
        }
      })
      poller.start()
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val workers = Seq(
        () => rows(GraphOps.n1Pagerank(spark, sfDir)),
        () => rows2(GraphOps.n6LabelProp(spark, sfDir))
      ).map { body =>
        val th = new Thread(() =>
          try body() catch { case t: Throwable => errs.add(t) })
        th.start(); th
      }
      workers.foreach(_.join())
      done = true
      poller.join()
      assert(errs.isEmpty, s"concurrent gated build failed: ${errs.peek()}")
      assert(!sawOff, "session AQE conf was mutated during a gated build")
      assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    }
  }

  test("n4 empty edge set returns the empty distance table") {
    import spark.implicits._
    val empty = java.nio.file.Files.createTempDirectory("n4empty").toString
    Seq.empty[(Long, Long)].toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$empty/lineitem.parquet")
    val out = GraphOps.n4Sssp(spark, empty)
    assert(out.columns.toSeq == Seq("part", "dist") && out.count() == 0)
  }
}
