package graft.tools

import graft.operators.AnnIndexStore
import graft.sources.CasStats
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}

/** CAS liveness probe (r15): the 3-thread race drill in AnnIndexStoreSpec
  * proves the multi-writer protocol SAFE (no lost tombstone, legal views);
  * this prices its GOODPUT — how much work the optimistic CAS wastes as N
  * genuinely concurrent writers mix appendIncrement / deleteIds /
  * compactDeletes through the retry loops on one persisted index root.
  *
  * Per N (default 1,2,4,8): persist a fresh index (untimed), then N
  * writer threads each run the same fixed op sequence; every call
  * returning = one committed operation (the retry loops never surface
  * conflicts). Reported per N from the [[CasStats]] counter deltas:
  *   - goodput      committed ops / wall second;
  *   - claim_lost   commits that fully wrote a segment, then lost the
  *                  manifest hard-link race (the unit of wasted work);
  *   - read_conflict read+checkpoint attempts a racing writer's segment
  *                  retirement invalidated;
  *   - wasted_mb    bytes fully written that no manifest ever references.
  *
  * Usage: runMain graft.tools.CasLiveness [sfDir] [Ns] [opsPerWriter]
  * The numbers land in BASELINE.md's r15 section — run in a quiet window
  * (tools/steal_probe.py first) or the wall clock prices the host, not
  * the CAS. */
object CasLiveness {

  /** The batching A/B the r15 BASELINE conclusion asserted but never
    * measured ("the fix is batching or per-shard tables"): N writers
    * append THE SAME total row set to a fresh index twice — once as
    * K tiny increments per writer (N*K contended commits), once as one
    * K-slice batched increment per writer (N commits) — and the deltas
    * price what batching buys: claim_lost and wasted bytes PER LANDED
    * ROW should drop roughly with the commit count while goodput-rows/s
    * rises, since every loss discards one increment's segment and
    * batching makes that segment carry K× the rows for the same loss
    * rate envelope. Usage: runMain graft.tools.CasLiveness ab [sfDir] [N] [K] */
  private def batchAb(spark: SparkSession, sfDir: String, n: Int, k: Int): Unit = {
    import graft.sources.CasStats
    val slots = n * k
    Seq(
      ("tiny", (w: Int) => (0 until k).map(i =>
        col("vec_id") % slots === lit(w * k + i))),
      ("batched", (w: Int) => Seq(
        col("vec_id") % slots >= lit(w * k) &&
          col("vec_id") % slots < lit((w + 1) * k)))
    ).foreach { case (label, preds) =>
      val root = java.nio.file.Files.createTempDirectory(s"cas-ab-$label").toString
      graft.core.FsUtil.deleteOnExitRecursively(java.nio.file.Paths.get(root))
      // quantizer-only base: the coded table starts EMPTY so every landed
      // row is a genuine increment, not a duplicate of a standing index
      // (r16 advisor finding on the full-persist base)
      AnnIndexStore.persistQuantizer(spark, sfDir, root) // untimed base state
      val baseRows = AnnIndexStore.openCoded(spark, root).count()
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val committed = new java.util.concurrent.atomic.AtomicLong()
      val s0 = CasStats.snapshot()
      val t0 = System.nanoTime()
      val threads = (0 until n).map { w =>
        new Thread(() => try {
          preds(w).foreach { p =>
            AnnIndexStore.appendIncrement(spark, sfDir, root, p)
            committed.incrementAndGet()
          }
        } catch { case e: Throwable => failures.add(e) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val s1 = CasStats.snapshot()
      if (!failures.isEmpty) {
        println(s"[cas-ab] $label FAILED: ${failures.peek()}")
        failures.peek().printStackTrace(); sys.exit(1)
      }
      val landedRows = AnnIndexStore.openCoded(spark, root).count() - baseRows
      val lost = s1("claim_lost") - s0("claim_lost")
      val rconf = s1("read_conflict") - s0("read_conflict")
      val wasted = s1("wasted_bytes") - s0("wasted_bytes")
      // guard the per-row division: an arm that lands zero rows (all ids
      // outside the predicate range) must not print NaN (r16 advisor)
      val perRow = if (landedRows > 0) f"${wasted.toDouble / landedRows}%.1f" else "n/a"
      println(f"[cas-ab] $label%-8s N=$n%d commits=${committed.get()}%d " +
        f"rows=$landedRows%d wall=$wall%.1fs rows/s=${landedRows / wall}%.0f " +
        f"claim_lost=$lost%d read_conflict=$rconf%d " +
        f"wasted_mb=${wasted / 1e6}%.2f wasted_b_per_row=$perRow")
    }
  }

  /** The read_conflict exciter (r16 verdict #5): long-pinned SERVES racing
    * frequent compactions. A compaction-only mix cannot move the read-side
    * counter — its pinned reads and its version flips are both corpus-sized
    * jobs, so no reader lags the TWO versions retirement needs (the first
    * rc run measured exactly that: N=8, claim_lost 411, read_conflict 0).
    * A serve is different: [[AnnIndexStore.serveTopKPinned]]'s plan holds
    * coded-segment paths for the whole multi-second ADC scoring job while
    * N compaction writers flip the coded version underneath; two flips
    * inside one serve retire the pinned files, the materialization dies
    * missing-file, asConflict folds it to read_conflict++ and the retry
    * re-resolves. Prices the read-side cost of compaction-vs-serve
    * contention: read_conflict count and serves/s vs the same serve loop
    * with zero writers (the N=0 row). Every reader must RETURN — an
    * escaped FileNotFoundException fails the probe.
    * Usage: runMain graft.tools.CasLiveness rc [sfDir] [Ns] [rounds] */
  private def readConflictMix(spark: SparkSession, sfDir: String,
      ns: Seq[Int], rounds: Int): Unit = {
    ns.foreach { n =>
      val root = java.nio.file.Files.createTempDirectory(s"cas-rc-$n").toString
      graft.core.FsUtil.deleteOnExitRecursively(java.nio.file.Paths.get(root))
      AnnIndexStore.persist(spark, sfDir, root) // untimed base state
      val commits = new java.util.concurrent.atomic.AtomicLong()
      val serves = new java.util.concurrent.atomic.AtomicLong()
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val writersDone = new java.util.concurrent.atomic.AtomicBoolean(n == 0)
      val s0 = CasStats.snapshot()
      val t0 = System.nanoTime()
      val writers = (0 until n).map { w =>
        new Thread(() => try {
          import spark.implicits._
          (0 until rounds).foreach { i =>
            // a tiny disjoint tombstone per round keeps every compaction
            // writeback non-trivial (rows actually leave the coded body)
            // ids DISJOINT from the corpus (and so from the probe set
            // vec_id < 10): each delete is a no-op on answers but still
            // costs a full tombstone flip + coded rewrite — maximum
            // version churn with the serve result invariant. (The first
            // rc draft deleted real ids 0..N·rounds·5, tombstoning every
            // probe by round 2 — which found the empty-probe-set crash
            // now guarded in servedStream, but left nothing to serve.)
            val ids = (0 until 5)
              .map(j => (900000L + (w * rounds + i) * 5 + j)).toDF("neighbor_id")
            AnnIndexStore.deleteIds(spark, root, ids)
            commits.incrementAndGet()
            AnnIndexStore.compactDeletes(spark, root)
            commits.incrementAndGet()
          }
        } catch { case e: Throwable => failures.add(e) })
      }
      // two pinned-serve readers loop until the writers drain (≥1 serve
      // each so the N=0 baseline row still prices an uncontended serve)
      val readers = (0 until 2).map { _ =>
        new Thread(() => try {
          do {
            val rows = AnnIndexStore.serveTopKPinned(spark, sfDir, root)
            require(rows.nonEmpty, "a raced serve must still answer")
            serves.incrementAndGet()
          } while (!writersDone.get())
        } catch { case e: Throwable => failures.add(e) })
      }
      (writers ++ readers).foreach(_.start())
      writers.foreach(_.join()); writersDone.set(true); readers.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val s1 = CasStats.snapshot()
      if (!failures.isEmpty) {
        println(s"[cas-rc] N=$n FAILED: ${failures.peek()}")
        failures.peek().printStackTrace(); sys.exit(1)
      }
      println(f"[cas-rc] N=$n%d commits=${commits.get()}%d serves=${serves.get()}%d " +
        f"wall=$wall%.1fs serves/s=${serves.get() / wall}%.2f " +
        f"claim_lost=${s1("claim_lost") - s0("claim_lost")}%d " +
        f"read_conflict=${s1("read_conflict") - s0("read_conflict")}%d " +
        f"wasted_mb=${(s1("wasted_bytes") - s0("wasted_bytes")) / 1e6}%.1f")
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("rc")) {
      val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      readConflictMix(spark, sfDir,
        args.lift(2).getOrElse("0,1,4,8").split(',').toSeq.map(_.trim.toInt),
        args.lift(3).map(_.toInt).getOrElse(6))
      spark.stop()
      return
    }
    if (args.headOption.contains("ab")) {
      val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
      val spark = SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false").getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      batchAb(spark, sfDir,
        args.lift(2).map(_.toInt).getOrElse(8),
        args.lift(3).map(_.toInt).getOrElse(8))
      spark.stop()
      return
    }
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val ns = args.lift(1).getOrElse("1,2,4,8").split(',').toSeq.map(_.trim.toInt)
    val ops = args.lift(2).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    ns.foreach { n =>
      val root = java.nio.file.Files.createTempDirectory(s"cas-live-$n").toString
      graft.core.FsUtil.deleteOnExitRecursively(java.nio.file.Paths.get(root))
      AnnIndexStore.persist(spark, sfDir, root) // untimed base state
      val committed = new java.util.concurrent.atomic.AtomicLong()
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val s0 = CasStats.snapshot()
      val t0 = System.nanoTime()
      val threads = (0 until n).map { w =>
        new Thread(() => try {
          // the writer mix the verdict asked priced: per op slot, cycle
          // delete -> append -> delete -> compact -> ... with disjoint id
          // slices per (writer, slot) so every commit changes real rows
          (0 until ops).foreach { i =>
            val slice = (w * ops + i) % 13
            (i % 4) match {
              case 0 | 2 =>
                import spark.implicits._
                val ids = (0 until 20)
                  .map(j => (slice * 1000 + j).toLong).toDF("neighbor_id")
                AnnIndexStore.deleteIds(spark, root, ids)
              case 1 =>
                AnnIndexStore.appendIncrement(spark, sfDir, root,
                  col("vec_id") % 13 === lit(slice))
              case 3 =>
                AnnIndexStore.compactDeletes(spark, root)
            }
            committed.incrementAndGet()
          }
        } catch { case e: Throwable => failures.add(e) })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val wall = (System.nanoTime() - t0) / 1e9
      val s1 = CasStats.snapshot()
      if (!failures.isEmpty) {
        println(s"[cas-liveness] N=$n FAILED: ${failures.peek()}")
        failures.peek().printStackTrace()
        sys.exit(1)
      }
      val lost = s1("claim_lost") - s0("claim_lost")
      val rconf = s1("read_conflict") - s0("read_conflict")
      val wasted = (s1("wasted_bytes") - s0("wasted_bytes")) / 1e6
      println(f"[cas-liveness] N=$n%d ops=${committed.get()}%d wall=$wall%.1fs " +
        f"goodput=${committed.get() / wall}%.2f ops/s claim_lost=$lost%d " +
        f"read_conflict=$rconf%d wasted_mb=$wasted%.1f")
    }
    spark.stop()
  }
}
