package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-12 additions: the sketch audit twins (p2b/q6b — the error
  * contracts that lived only in the local gate, now emitted as data) and
  * the Hilbert sharded writer (z10 — z9's measured winner shipped as a
  * real partitioned parquet export).
  */
class Round12OpsSpec extends SparkSpec {

  test("q6b: verdicts hold, and the exact lanes equal a direct countDistinct") {
    val out = AnalyticsQueries.q6bDistinctAudit(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("parts_within_bound") === 1L,
        s"HLL parts estimate out of its 3*rsd bound for ${r.get(0)}")
      assert(r.getAs[Long]("orders_within_bound") === 1L)
    }
    val truth = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"),
        countDistinct(col("l_orderkey")).as("o"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    out.foreach { r =>
      val (p, o) = truth(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("exact_parts") === p)
      assert(r.getAs[Long]("exact_orders") === o)
    }
  }

  test("p2b: rank envelope holds and exact lanes match p1's definitions") {
    val out = AnalyticsQueries.p2bPercentileAudit(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("within_envelope") === 1L,
      s"approx_percentile outside its rank envelope for ${r.get(0)}"))
    // the exact quantile lanes re-derive p1's oracle-matched definitions
    val p1 = AnalyticsQueries.p1Percentiles(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    out.foreach { r =>
      val (q25, q50, q75) = p1(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Double]("exact_q25") === q25)
      assert(r.getAs[Double]("exact_q50") === q50)
      assert(r.getAs[Double]("exact_q75") === q75)
    }
  }

  test("p2b: the envelope verdict FLIPS when the bound is made impossible") {
    // guard against a vacuously-true verdict: the same rank-interval
    // arithmetic applied to a deliberately wrong "sketch value" (the
    // group's maximum posing as the q25 quantile) must fail the envelope
    import spark.implicits._
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(max("l_quantity").cast("double").as("fake_q25"), count(lit(1)).as("n"),
        sum(when(col("l_quantity") < col("l_quantity"), 1L)).as("dummy"))
    val probe = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(broadcast(li), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(first("n").as("n"),
        count(when(col("l_quantity").cast("double") < col("fake_q25"), 1)).as("lo"))
      .select(col("l_returnflag"),
        (col("lo").cast("double") <= lit(0.25) * col("n") + lit(0.001) * col("n") + 1.0)
          .as("ok"))
      .as[(String, Boolean)].collect()
    assert(probe.forall(!_._2), "max-as-q25 should violate the rank envelope")
  }

  test("z10: a manifest-driven pruned read touches fewer files, same answer") {
    // the execution-side proof that z10's audit numbers are not
    // hypothetical: build the per-shard min/max manifest from the landed
    // tree (what a production writer persists alongside the files),
    // whitelist the shards intersecting the mid_square rectangle, and
    // read back with an hshard filter — Spark prunes the partition
    // directories at file listing, and the matched rows are unchanged
    val root = LayoutOps.hilbertExportRoot(spark, sfDir)
    val all = spark.read.parquet(root)
    val manifest = all.groupBy(col("hshard").cast("long").as("shard"))
      .agg(min("qx").as("qlo"), max("qx").as("qhi"),
        min("qy").as("dlo"), max("qy").as("dhi"))
      .collect()
    val r = LayoutOps.Z9Rects.find(_.name == "mid_square").get
    val want = manifest.filter(m =>
      m.getLong(2) >= r.qlo && m.getLong(1) <= r.qhi &&
        m.getLong(4) >= r.dlo && m.getLong(3) <= r.dhi)
      .map(_.getLong(0))
    assert(want.nonEmpty && want.length < manifest.length,
      "the rectangle must qualify a strict subset of shards")
    val pred = col("qx").between(r.qlo, r.qhi) && col("qy").between(r.dlo, r.dhi)
    val pruned = all.filter(col("hshard").cast("long").isin(want: _*))
    def filesRead(df: org.apache.spark.sql.DataFrame): Long = {
      val qe = df.queryExecution
      qe.toRdd.count() // drive THIS execution so its scan metrics populate
      qe.executedPlan.collectLeaves().collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.metrics("numFiles").value
      }.getOrElse(sys.error("no file scan in plan"))
    }
    val prunedFiles = filesRead(pruned)
    val allFiles = filesRead(all)
    assert(prunedFiles < allFiles,
      s"pruning read $prunedFiles of $allFiles files — no pruning happened")
    // same matches as the unpruned scan: the manifest whitelist loses nothing
    assert(pruned.filter(pred).count() === all.filter(pred).count())
    // and the pruned I/O equals the audit's claim for this rectangle
    val audited = LayoutOps.z10HilbertExport(spark, sfDir)
      .filter(col("rect") === "mid_square").collect()(0)
    assert(pruned.count() === audited.getAs[Long]("rows_scanned"))
    assert(want.length.toLong === audited.getAs[Long]("files_scanned"))
  }

  test("st20: the streamed lake is row-identical to the batch writer's cut") {
    val streamedRoot = graft.streaming.LakeStreamWriter.streamedLakeRoot(spark, sfDir)
    val batchRoot = LayoutOps.hilbertExportRoot(spark, sfDir)
    def tree(root: String) = spark.read.parquet(root)
      .select(col("hshard").cast("long"), col("l_orderkey"), col("qx"),
        col("qy"), col("hd"))
      .collect().map(_.toSeq)
    val s = tree(streamedRoot); val b = tree(batchRoot)
    assert(s.length === b.length && s.toSet === b.toSet,
      "micro-batch carving must not change a single landed row or shard")
    // the streamed tree is genuinely fragmented (several appends per
    // shard), yet the audit over it still hash-matches z10's oracle —
    // read correctness never depends on compaction
    val audit = graft.streaming.LakeStreamWriter
      .st20StreamHilbertSink(spark, sfDir).collect()
    val batchAudit = LayoutOps.z10HilbertExport(spark, sfDir).collect()
    assert(audit.map(_.toSeq).toSeq === batchAudit.map(_.toSeq).toSeq)
    // crashed-compaction debris heals at the next READ, not only the
    // next compaction (r15): park a shard at its reader-invisible
    // retired name — the memoized accessor's read-touch repair restores
    // it before the tree is handed to anyone
    val rootP = java.nio.file.Paths.get(streamedRoot)
    val victim = {
      val ls = java.nio.file.Files.list(rootP)
      try {
        val it = ls.iterator()
        var v: String = null
        while (it.hasNext && v == null) {
          val n = it.next().getFileName.toString
          if (n.startsWith("hshard=")) v = n
        }
        v
      } finally ls.close()
    }
    java.nio.file.Files.move(rootP.resolve(victim), rootP.resolve(s".retired-$victim"))
    val healed = graft.streaming.LakeStreamWriter.streamedLakeRoot(spark, sfDir)
    assert(healed === streamedRoot)
    assert(java.nio.file.Files.isDirectory(rootP.resolve(victim)),
      "read-touch repair must restore the shard the crash parked")
    assert(tree(healed).toSet === b.toSet)
  }

  test("st21: streamed tombstone commits serve identically to the batch delete") {
    val root = graft.streaming.IndexStreamMaintenance.maintainedRoot(spark, sfDir)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val streamed = rows(graft.streaming.IndexStreamMaintenance
      .st21StreamIndexDelete(spark, sfDir))
    // identical to the batch-delete lifecycle (v23): same index training,
    // same final tombstone set, same serve arithmetic
    assert(streamed.nonEmpty &&
      streamed === rows(AnnIndexStore.v23IndexDelete(spark, sfDir)))
    // the streamed set landed as several durable per-batch commits, and
    // the accumulated tombstones equal the delete slice exactly
    val tombs = AnnIndexStore.openTombstones(spark, root)
    val expected = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(expr(AnnIndexStore.V23DeleteSql))
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(tombs.collect().map(_.getLong(0)).toSet === expected)
    // compaction still closes the loop after streamed appends
    AnnIndexStore.compactDeletes(spark, root)
    assert(AnnIndexStore.openTombstones(spark, root).count() === 0L)
    assert(rows(AnnIndexStore.serveTopK(spark, sfDir, root)) === streamed)
  }

  test("x16: retraction rescues or re-matches exactly the affected verdicts") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3)))
    val before = rows(DedupQueries.x11IncrementalDedup(spark, sfDir))
    val after = rows(DedupQueries.x16IndexRetract(spark, sfDir)).map(r => r._1 -> r).toMap
    val retracted = (id: Long) => id % 5 == 2
    assert(before.size === after.size, "every new doc still gets a verdict row")
    var changed = 0
    before.foreach { case b @ (id, keep, dupOf, _) =>
      val a = after(id)
      // no retracted id ever surfaces as evidence post-retraction
      assert(a._3 == -1L || !retracted(a._3), s"doc $id evidences retracted ${a._3}")
      if (keep == 1L || (dupOf != -1L && !retracted(dupOf))) {
        // unaffected verdicts are bitwise identical to x11's
        assert(a === b, s"doc $id changed without cause: $b -> $a")
      } else {
        // best match was retracted: the doc is rescued (keep) or
        // re-matched to live second-best evidence — either way it changed
        assert(a !== b); changed += 1
      }
    }
    assert(changed > 0, "the retraction slice must actually affect a verdict")
  }

  test("n7: sampled local counts equal a brute-force over the undirected graph") {
    val out = GraphOps.n7LocalTriangles(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.nonEmpty && out.values.sum > 0L, "sample found no triangles at all")
    // independent truth: collect the undirected co-purchase edge set and
    // count, per sampled vertex, the neighbor pairs that are edges
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").distinct()
    val pairs = li.as("a").join(li.as("b"), "l_orderkey")
      .filter(col("a.l_partkey") =!= col("b.l_partkey"))
      .select(col("a.l_partkey").as("s"), col("b.l_partkey").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val und = pairs.map { case (s, d) => if (s < d) (s, d) else (d, s) }.toSet
    val nbrs = pairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { case (p, t) =>
      val n = nbrs.getOrElse(p, Set.empty).toSeq
      val truth = (for {
        i <- n.indices.iterator; j <- (i + 1 until n.size).iterator
        if und(if (n(i) < n(j)) (n(i), n(j)) else (n(j), n(i)))
      } yield 1).size.toLong
      assert(t === truth, s"vertex $p: n7 says $t, brute force says $truth")
    }
  }

  test("st19: streamed audio admission equals the one-batch run, all verdicts bite") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4),
        if (r.isNullAt(5)) -1L else r.getLong(5)))
    val streamed = rows(graft.streaming.CorpusStreamAudio
      .st19StreamAudioAdmit(spark, sfDir))
    val batch = rows(graft.streaming.CorpusStreamAudio
      .batchAudioAdmit(spark, sfDir))
    assert(streamed.nonEmpty && streamed === batch,
      "admission is stateless per batch — carving must not change a verdict")
    // every verdict class actually fires on the gate corpus
    val byVerdict = streamed.groupBy(_._5).view.mapValues(_.size).toMap
    Seq("clipped", "quiet", "dup", "keep").foreach(v =>
      assert(byVerdict.getOrElse(v, 0) > 0, s"verdict '$v' never fired"))
    // dup evidence is real: the standing twin's decoded samples are
    // byte-identical to the dropped clip's
    streamed.filter(_._5 == "dup").take(5).foreach { case (id, _, _, _, _, twin) =>
      val a = MultimodalOps.decodeWav(MultimodalOps.m9SyntheticWav(id)).samples
      val b = MultimodalOps.decodeWav(MultimodalOps.m9SyntheticWav(twin)).samples
      assert(a.toSeq == b.toSeq, s"dup $id vs twin $twin: samples differ")
    }
    // non-dup verdicts never carry evidence
    assert(streamed.filter(r => r._5 != "dup").forall(_._6 == -1L))
  }

  test("z10: the landed shard tree IS the Hilbert cut — z9's hilbert audit, from disk") {
    val root = LayoutOps.hilbertExportRoot(spark, sfDir)
    val landed = spark.read.parquet(root)
    // nothing lost in the write: row identity count matches the source
    val n = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(landed.count() === n)
    // the directory key equals the curve cut recomputed from the landed hd
    assert(landed.filter(
      col("hshard").cast("long") =!= expr(s"hd div ${LayoutOps.Z9ZoneCells}")
    ).count() === 0L)
    // the from-disk audit equals z9's in-memory hilbert half, column names aside
    val fromDisk = LayoutOps.z10HilbertExport(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val inMem = LayoutOps.z9HilbertLayout(spark, sfDir)
      .filter(col("layout") === "hilbert")
      .select("rect", "zones_total", "zones_scanned", "rows_scanned", "rows_matched")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(fromDisk.sortBy(_._1).toSeq === inMem.sortBy(_._1).toSeq)
  }
}
