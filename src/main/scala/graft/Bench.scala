package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-run benchmark: times every SparkEntry query on SPARK_GRAFT_SF_DIR
  * and prints one JSON line. An untimed warmup pass first exercises the
  * parquet reader, codegen, encoder and shuffle paths so the first timed
  * query measures steady-state execution, not one-time JVM/JIT startup
  * (which was adding 4-6 s to whichever query happened to run first).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Preflight window: the warmup + untimed pass below takes real time
    // anyway, so sample CPU around it and stamp the launch window's
    // steal/foreign rates into the run JSON — anchor attempts
    // self-document whether they launched into a quiet host instead of
    // relying on commit-message narrative ("attempt 5 finally landed").
    val preflight0 = cpuSample()
    val preflightT0 = System.nanoTime()
    // Armed guard (cap parsed up front so an unparseable value fails
    // before any work; both names read — ..._CONTENTION is the accurate
    // one since the cap compares steal PLUS busy_foreign, ..._STEAL kept
    // for recorded r15 invocations).
    val guardCap: Option[Long] =
      sys.env.get("SPARK_GRAFT_MAX_PREFLIGHT_CONTENTION")
        .orElse(sys.env.get("SPARK_GRAFT_MAX_PREFLIGHT_STEAL"))
        .map(raw => raw.toLongOption.getOrElse(sys.error(
          s"SPARK_GRAFT_MAX_PREFLIGHT_{CONTENTION,STEAL} is not a long: '$raw'")))
    // Incremental abort check (r16): at sf1 the untimed warmup pass runs
    // ~10 minutes, and the r15 end-of-warmup guard meant a storm-launched
    // attempt still paid ALL of it before aborting (campaign attempts
    // measured 10-12 min per abort, storm-inflated). Sampling /proc is
    // ~100 us, so the armed guard now re-checks the accumulated window
    // after every untimed query and aborts the moment the cap is crossed
    // — a storm attempt dies in the first minute or two instead. Unarmed
    // runs never sample here.
    def abortIfStormy(): Unit = guardCap.foreach { cap =>
      val pf = for (a <- preflight0; b <- cpuSample()) yield {
        val (st, fb) = cpuDelta(a, b)
        ((System.nanoTime() - preflightT0) / 1e9, st, fb)
      }
      guardAbortReason(cap, pf).foreach { reason =>
        try spark.stop() catch { case _: Throwable => () }
        val sec0 = pf.map(_._1)
          .getOrElse((System.nanoTime() - preflightT0) / 1e9)
        val s = String.format(java.util.Locale.ROOT, "%.1f", Double.box(sec0))
        println(s"""{"metric":"aborted","reason":"$reason","preflight_sec":$s,"sf":"${sfDir.replace("\\", "\\\\").replace("\"", "\\\"")}"}""")
        sys.exit(2)
      }
    }
    warmup(spark, sfDir)
    abortIfStormy()
    // NATURAL sort (x3 before x10), not lexicographic: run order decides
    // which query pays a session-memoized build, and "x10" < "x3"
    // lexicographically made the keep-table query absorb the whole dedupe
    // sweep's candidate-build cost in the report (round-6 attribution nit)
    val sorted = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
      ("""\d+""".r.findFirstIn(name) match {
        case Some(n) => name.take(name.indexOf(n)) + f"${n.toInt}%04d" + name.drop(name.indexOf(n) + n.length)
        case None => name
      })
    }
    // Untimed first executions compile every plan (Janino codegen, ~1-3 s
    // per unique plan shape — a fixed cost that amortizes to zero over a
    // real corpus); the timed pass then measures steady-state engine
    // throughput, re-running each full pipeline from the parquet scan.
    sorted.foreach { case (_, fn) =>
      try { fn(spark, sfDir).count() } catch { case _: Throwable => () }
      abortIfStormy()
    }
    // Clear EVERY session memo (the single registry both Bench and QTime
    // share — see BenchMemos for the r13 uniform-rule rationale): the
    // timed pass pays each family's build exactly once, at the first
    // query that touches it, and the per-query memo_built markers below
    // stamp which query that was. A pre-warmed memo would report a cache
    // lookup as a query's cost (the r12 st21 finding: 0.85 s reported
    // where the honest persist+delete+serve costs 1.8 s).
    BenchMemos.clearAll()
    // Drain warmup-pass debris NOW: dropping the memo released two
    // localCheckpointed RDDs, and the untimed pass left shuffle/broadcast
    // refs that ContextCleaner reclaims on GC. Forcing the GC here runs
    // that (blocking-by-default) cleanup between the passes instead of at
    // a random point inside a timed query.
    System.gc()
    Thread.sleep(1000)
    val memoBuilt = scala.collection.mutable.Map[String, Seq[String]]()
    val stealJ = scala.collection.mutable.Map[String, Long]()
    val foreignJ = scala.collection.mutable.Map[String, Long]()
    // Preflight stamp closes here: the warmup window's steal + foreign
    // rates, measured while our own load ran (foreign subtracts it).
    val run0 = cpuSample()
    val preflight = for (a <- preflight0; b <- run0) yield {
      val (st, fb) = cpuDelta(a, b)
      ((System.nanoTime() - preflightT0) / 1e9, st, fb)
    }
    // Opt-in launch guard for anchor attempts (r15): when
    // SPARK_GRAFT_MAX_PREFLIGHT_STEAL is set and the preflight window
    // absorbed more CONTENTION jiffies (steal + busy_foreign — either
    // channel alone inflates wall time) than it, abort BEFORE the timed
    // pass — a suite launched into a storm spends ~10 min producing a
    // flagged snapshot (sf1 attempts 1-4 and both r15 attempts did
    // exactly that; run B's preflight already carried 52,607 jiffies).
    // Final guard check against the CLOSED preflight window (the
    // incremental checks above covered the warmup as it ran). Unset =
    // never abort, so driver-invoked runs are unaffected; armed-but-
    // unmeasurable (preflight None: off-Linux or a /proc read failure)
    // aborts instead of silently proceeding unguarded (r15 advisor
    // finding — the operator armed it on purpose, same fail-fast rule
    // as an unparseable cap). The abort prints a parseable line
    // (Locale.ROOT decimals) and exits 2 without touching
    // BENCH_FULL.json or the history.
    guardCap.foreach { cap =>
      guardAbortReason(cap, preflight).foreach { reason =>
        try spark.stop() catch { case _: Throwable => () }
        val sec0 = preflight.map(_._1)
          .getOrElse((System.nanoTime() - preflightT0) / 1e9)
        val s = String.format(java.util.Locale.ROOT, "%.1f", Double.box(sec0))
        println(s"""{"metric":"aborted","reason":"$reason","preflight_sec":$s,"sf":"${sfDir.replace("\\", "\\\\").replace("\"", "\\\"")}"}""")
        sys.exit(2)
      }
    }
    val results = sorted.map { case (name, fn) =>
      // A query that throws is reported as an err entry — NEVER as a fast
      // timing (a broken query must not read as a perf win).
      val before = BenchMemos.buildSnapshot()
      val c0 = cpuSample()
      val t0 = System.nanoTime()
      val outcome: Either[String, Long] =
        try Right(fn(spark, sfDir).count())
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      // Provenance stamp: which memo families THIS query's execution
      // built (it paid their one-per-session cost for the whole sweep) —
      // so an anomalous row self-adjudicates as rebuild vs host steal.
      val built = BenchMemos.builtSince(before)
      if (built.nonEmpty) memoBuilt(name) = built
      // Contention stamps (r14 steal, r15 foreign — the r14 driver run
      // proved steal alone mis-convicts: v19 ran 39x with 474 stolen
      // jiffies because same-guest co-tenants never show as steal).
      // Per-row maps stay sparse (>0 only — a dense map of zeros would
      // triple BENCH_FULL's size for no signal); the run-level
      // steal_run/foreign_run pair below is the AFFIRMATIVE measurement
      // that distinguishes measured-zero from unmeasured.
      for (s0 <- c0; s1 <- cpuSample()) {
        val (st, fb) = cpuDelta(s0, s1)
        if (st > 0) stealJ(name) = st
        if (fb > 0) foreignJ(name) = fb
      }
      (name, (System.nanoTime() - t0) / 1e9, outcome)
    }
    // Whole-pass /proc delta: emitted whenever sampling worked (zero is
    // an affirmative quiet reading, unlike the sparse per-row maps), and
    // it covers steal/foreign accrued BETWEEN rows (GC pauses, the
    // inter-query gaps) that the summed row stamps undercount.
    val runCpu = for (a <- run0; b <- cpuSample()) yield cpuDelta(a, b)
    // Contention stamp: before appending this run to the history, compare
    // the scan-bound sentinels against their history medians. A contended
    // snapshot must never read as a regression (r11's committed
    // BENCH_FULL.json held a 326.7 s contended run vs the 185.9 s quiet
    // truth) — the flag rides in both the compact line and the full JSON,
    // and the close ritual refuses to leave a flagged BENCH_FULL.json.
    val priorRuns = readHistoryRuns(
      java.nio.file.Paths.get("BENCH_HISTORY.jsonl"), sfDir)
      .map { case (_, qs, built, steal) => (qs, built, steal) }
    val curQ = results.collect { case (k, v, Right(_)) => k -> v }.toMap
    // Two independent contention detectors (r12's judge finding: the
    // sentinel majority catches UNIFORM steal but not bursts that land
    // between the sentinels in run order — the 18:01Z run was 3-4x
    // inflated on n5/p3/t3/t4 yet all three sentinels sat quiet):
    //   1. sentinel rule — 2 of 3 scan-bound sentinels above 1.5x median;
    //   2. burst rule — >= BurstMinQueries queries above 2x their own
    //      same-sf LIKE-WITH-LIKE history medians (each needing >=
    //      BurstMinSamples; see burstOutliers for the memo_built match).
    val outliers = burstOutliers(curQ, priorRuns, memoBuilt.keySet.toSet)
    // Stamp (and say out loud) when the steal veto is what pushed a
    // query's usable history below BurstMinSamples — a veto-disabled
    // audit must be distinguishable from genuinely thin history.
    val thinned = vetoThinned(curQ, priorRuns, memoBuilt.keySet.toSet)
    if (thinned.nonEmpty)
      Console.err.println(s"[bench] steal veto thinned ${thinned.length} " +
        s"queries below BurstMinSamples=$BurstMinSamples (audit disabled " +
        s"for them this run): ${thinned.mkString(", ")}")
    val contended = contendedFlag(curQ, priorRuns.map(_._1))
      .map(_ || outliers.lengthCompare(BurstMinQueries) >= 0)
    val (line, full) = renderJson(results, sfDir, contended, outliers,
      memoBuilt.toMap, stealJ.toMap, foreignJ.toMap, runCpu, preflight,
      thinned)
    // The driver captures only the last ~2000 chars of output and parses
    // the JSON line out of that tail. The complete per-query report (all
    // timings at full precision + row counts) goes to a file instead; the
    // printed line is size-capped so it survives the tail intact.
    try {
      val p = java.nio.file.Paths.get("BENCH_FULL.json")
      java.nio.file.Files.write(p, full.getBytes("UTF-8"))
      // BENCH_FULL.json is overwritten every run, which made rounds 2-6
      // unparseable for per-query regression checks (the driver's stdout
      // tail dropped the totals). Append each run's complete report —
      // timestamped — to a history log that nothing overwrites, so any
      // two rounds diff machine-checkably without prose anchors.
      val ts = java.time.Instant.now().toString
      val hist = java.nio.file.Paths.get("BENCH_HISTORY.jsonl")
      java.nio.file.Files.write(hist,
        (full.replaceFirst("\\{", s"""{"ts":"$ts",""") + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case _: Throwable => () }
    // stop() BEFORE println: any shutdown warnings it logs must land above
    // the JSON line, not between it and the end of the captured tail
    try spark.stop() catch { case _: Throwable => () }
    println(line)
    if (results.exists(_._3.isLeft)) sys.exit(1)
  }

  /** Printed line must fit the driver's 2000-char output-tail capture with
    * margin for sbt's trailing "[success]" line (rounds 1-6 printed one
    * ~4 KB line and every BENCH_r{N}.json came back `parsed: null`). */
  private[graft] val MaxLineChars = 1600

  /** Scan-bound sentinel queries for the contention stamp: cheap plans
    * whose cost is parquet scan + one shuffle, so same-code inflation on
    * them is host noise, never an engine change. q1 (decimal agg) rides
    * along as the CPU-bound control — in the observed contended runs it
    * inflates least, which is why the rule is a 2-of-3 majority, not
    * all-3 (the 326.7 s contended run had q1 at 0.97x its median). */
  private[graft] val Sentinels =
    Seq("q1_pricing_summary", "b2_point_lookup", "g2_ranged_read")

  /** Sentinel inflation threshold vs the history median (1.5x) and the
    * majority needed to flag (2 of 3). Simulated over all 28 historical
    * sf0.1 runs: flags exactly the two contended runs (252.7/326.7 s,
    * sentinels at 1.6-2.4x) and zero quiet ones (quiet max 1.27x). */
  private[graft] val SentinelInflation = 1.5
  private[graft] val SentinelMajority = 2
  private[graft] val MinHistoryRuns = 5

  /** Burst-audit knobs: a query is an OUTLIER when its timing exceeds
    * [[BurstInflation]] x its same-sf history median (needing >=
    * [[BurstMinSamples]] samples and a median >= [[BurstMedianFloor]] —
    * sub-50 ms rows are scheduler jitter, not signal); the run flags
    * contended when >= [[BurstMinQueries]] queries are outliers at once.
    * Calibrated by replaying all 46 historical runs: the 18:01Z burst
    * run (n5 4.4x, t3 4.2x, p3 3.2x) shows 6 outliers, the 17:30Z quiet
    * close shows 1, and every other quiet run shows 0-2 — while the
    * historically contended runs (12:20Z 252.7 s, 12:59Z 326.7 s, the
    * 207.7 s and 192.9 s afternoon runs) show 4-25. K=4 separates the
    * two populations with a full step of margin on each side. */
  private[graft] val BurstInflation = 2.0
  private[graft] val BurstMinQueries = 4
  private[graft] val BurstMinSamples = 5
  private[graft] val BurstMedianFloor = 0.05

  /** Timing-protocol version stamped into every run's JSON, for human
    * diffing of BENCH_HISTORY across protocol changes: 1 = the pre-r13
    * curated clear list (six streaming memo families exempt — their rows
    * timed cache lookups); 2 = the r13 uniform clear + memo_built
    * provenance markers + exact build counters. The MEDIANS need no
    * protocol filter: [[burstOutliers]] matches samples on each query's
    * memo_built status, which is what actually changes across protocols. */
  private[graft] val Protocol = 2

  /** Contention veto for history SAMPLES (r15, the judge's n5 finding):
    * a row whose own window absorbed at least one core-equivalent of
    * contention — steal PLUS busy_foreign, since either channel alone
    * inflates wall time (> [[StealVetoPerSec]] jiffies per wall second,
    * floored at [[StealVetoFloor]] so sub-second scheduler noise never
    * vetoes) — is NON-COMPARABLE: its timing is host-shaped, and
    * letting it into a median skews every future adjudication against
    * it (the landed sf1 anchor's n5 row: 108.9 s carrying 28,667
    * stolen jiffies vs a 16-59 s quiet range; a co-tenant-stormed row
    * would show the same inflation with the jiffies in busy_foreign
    * instead). Applies ONLY to history samples: a stormed CURRENT row
    * must still count toward flagging the run. */
  private[graft] val StealVetoPerSec = 100L // one core's jiffies/sec
  private[graft] val StealVetoFloor = 500L

  private[graft] def stealVetoed(t: Double, contentionJ: Option[Long]): Boolean =
    contentionJ.exists(j => j > math.max(StealVetoFloor, (StealVetoPerSec * t).toLong))

  /** The armed preflight guard's abort decision, pure for the spec:
    * Some(reason) aborts. An armed guard with NO measurement (preflight
    * None — off-Linux or a /proc read failure) aborts rather than
    * proceeding silently unguarded (r15 advisor finding: the operator
    * armed it on purpose, same fail-fast rule as an unparseable cap);
    * a measured window aborts when steal + foreign exceeds the cap. */
  private[graft] def guardAbortReason(cap: Long,
      preflight: Option[(Double, Long, Long)]): Option[String] =
    preflight match {
      case None =>
        Some(s"preflight guard armed (cap $cap) but /proc sampling unavailable - refusing to run unguarded")
      case Some((_, st, fb)) if st + fb > cap =>
        Some(s"preflight steal $st + foreign $fb > cap $cap jiffies")
      case _ => None
    }

  /** Per-query burst audit: every query running above [[BurstInflation]]
    * x its own same-sf history median, worst first, with its ratio.
    * Pure, so the spec replays the two adjudicating historical runs.
    *
    * Medians are LIKE-WITH-LIKE on memo provenance (the r13 advisor
    * finding): a query's first-touch timing — the run where it paid a
    * family's one-per-session build, stamped `memo_built` — and its
    * warm timings belong to different distributions, so a sample from a
    * prior run counts toward `name`'s median only when that run's
    * memo_built status for `name` matches the CURRENT run's. This also
    * retires the clear-protocol hazard: pre-r13 runs never stamped
    * memo_built, so a query that pays a build under the uniform-clear
    * protocol (st13/st14/st17/st19/st21) is never compared against its
    * old cache-lookup timings — it simply sits out the audit until
    * [[BurstMinSamples]] same-status runs accumulate, instead of
    * permanently false-flagging. (Sentinels never build memos, so
    * [[contendedFlag]] needs no matching.) Samples are additionally
    * steal-vetoed (see [[stealVetoed]]): a history row self-documented
    * as steal-stormed never shapes a median, even inside an otherwise
    * quiet run. */
  private[graft] def burstOutliers(current: Map[String, Double],
      priorRuns: Seq[(Map[String, Double], Set[String], Map[String, Long])],
      currentBuilt: Set[String] = Set.empty): Seq[(String, Double)] =
    current.toSeq.flatMap { case (name, t) =>
      val samples = priorRuns.collect {
        case (qs, built, steal) if qs.contains(name) &&
          built.contains(name) == currentBuilt.contains(name) &&
          !stealVetoed(qs(name), steal.get(name)) => qs(name)
      }.sorted
      if (samples.length < BurstMinSamples) None
      else {
        val med =
          if (samples.length % 2 == 1) samples(samples.length / 2)
          else (samples(samples.length / 2 - 1) + samples(samples.length / 2)) / 2.0
        if (med >= BurstMedianFloor && t > BurstInflation * med)
          Some(name -> t / med)
        else None
      }
    }.sortBy { case (n, r) => (-r, n) }

  /** Queries whose burst audit the steal veto DISABLED this run (r15
    * advisor finding): the query has >= [[BurstMinSamples]] same-status
    * history samples, but vetoing the stormed ones drops it below the
    * floor — silently indistinguishable from genuinely thin history
    * unless stamped. Rides in BENCH_FULL.json as `veto_thinned` so a
    * reader knows the audit sat out because of recorded storms, not
    * because the query is new. Pure, spec-replayed. */
  private[graft] def vetoThinned(current: Map[String, Double],
      priorRuns: Seq[(Map[String, Double], Set[String], Map[String, Long])],
      currentBuilt: Set[String] = Set.empty): Seq[String] =
    current.keys.toSeq.sorted.filter { name =>
      val matching = priorRuns.filter { case (qs, built, _) =>
        qs.contains(name) && built.contains(name) == currentBuilt.contains(name)
      }
      val kept = matching.count { case (qs, _, steal) =>
        !stealVetoed(qs(name), steal.get(name))
      }
      matching.length >= BurstMinSamples && kept < BurstMinSamples
    }

  /** None when fewer than [[MinHistoryRuns]] comparable history runs
    * exist (a new sf has no baseline to compare against); otherwise
    * Some(true) when >= [[SentinelMajority]] sentinels run above
    * [[SentinelInflation]] x their history median. Pure so the spec can
    * prove the flag fires on a synthetically inflated run. */
  private[graft] def contendedFlag(current: Map[String, Double],
      priorRuns: Seq[Map[String, Double]]): Option[Boolean] = {
    if (priorRuns.length < MinHistoryRuns) return None
    val inflated = Sentinels.count { s =>
      val prior = priorRuns.flatMap(_.get(s)).sorted
      val cur = current.get(s)
      if (prior.isEmpty || cur.isEmpty) false
      else {
        val med =
          if (prior.length % 2 == 1) prior(prior.length / 2)
          else (prior(prior.length / 2 - 1) + prior(prior.length / 2)) / 2.0
        cur.get > SentinelInflation * med
      }
    }
    Some(inflated >= SentinelMajority)
  }

  /** Parses BENCH_HISTORY.jsonl (the append-only per-run log) and returns
    * the FULL per-query timing map of every clean same-sf run — sentinel
    * and burst audits both draw from it. Runs stamped `contended: true`
    * are EXCLUDED (the r12 advisor fix: Bench appends every run to the
    * history, and accumulated contended runs would inflate the medians
    * and progressively desensitize both thresholds). Jackson is the JSON
    * reader Spark already bundles; a missing or malformed history yields
    * Nil (flag stays unknown). Path is a parameter so the spec replays
    * the committed history's adjudicating runs. */
  /** Each clean same-sf history run with its `ts` stamp, its
    * `memo_built` query set (empty for pre-r13 lines that predate the
    * markers) and its per-row CONTENTION map — `steal_jiffies` plus
    * `busy_foreign`, summed per query (empty pre-r14) — the spec
    * anchors the 17:30Z/18:01Z adjudication cases by timestamp, and
    * [[burstOutliers]] matches samples on the built set and vetoes
    * stormed rows. */
  private[graft] def readHistoryRuns(p: java.nio.file.Path, sfDir: String)
      : Seq[(String, Map[String, Double], Set[String], Map[String, Long])] = {
    if (!java.nio.file.Files.exists(p)) return Nil
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(p).asScala.toSeq.flatMap { ln =>
        try {
          val n = om.readTree(ln)
          val sameSf = Option(n.get("sf")).exists(_.asText() == sfDir)
          val clean = Option(n.get("errors")).forall(e => !e.fieldNames().hasNext)
          val quiet = !Option(n.get("contended")).exists(_.asBoolean(false))
          val qs = Option(n.get("queries"))
          if (sameSf && clean && quiet && qs.isDefined) {
            val ts = Option(n.get("ts")).map(_.asText()).getOrElse("")
            val built = Option(n.get("memo_built"))
              .map(_.properties().asScala.map(_.getKey).toSet)
              .getOrElse(Set.empty[String])
            def longMap(field: String): Map[String, Long] =
              Option(n.get(field))
                .map(_.properties().asScala
                  .filter(_.getValue.isNumber)
                  .map(e => e.getKey -> e.getValue.asLong()).toMap)
                .getOrElse(Map.empty[String, Long])
            // the veto reads COMBINED contention: steal and busy_foreign
            // inflate wall time the same way, just via different tenants
            val steal = longMap("steal_jiffies")
            val foreign = longMap("busy_foreign")
            val contention = (steal.keySet ++ foreign.keySet).map(k =>
              k -> (steal.getOrElse(k, 0L) + foreign.getOrElse(k, 0L))).toMap
            Some((ts, qs.get.properties().asScala
              .filter(_.getValue.isNumber)
              .map(e => e.getKey -> e.getValue.asDouble()).toMap, built, contention))
          } else None
        } catch { case _: Throwable => None }
      }
    } catch { case _: Throwable => Nil }
  }

  /** One /proc CPU sample for the per-row provenance stamps: host busy
    * jiffies, host steal jiffies, and this JVM's own utime+stime. The
    * r15 addition of `self` exists because steal alone has a contention
    * blind spot: same-guest co-tenant processes inflate wall time
    * without ever touching /proc/stat's steal field (the r14 driver run
    * had 39x/31x rows carrying ~0 steal). foreign = hostBusy - self is
    * the counter that sees them. */
  private[graft] final case class CpuSample(busy: Long, steal: Long, self: Long)

  /** Parses the aggregate "cpu " line of /proc/stat into
    * (busyJiffies, stealJiffies). The fields after "cpu" are user nice
    * system idle iowait irq softirq steal guest guest_nice; busy =
    * user+nice+system+irq+softirq — idle and iowait are excluded (the
    * host doing nothing is not contention), steal (field 8) is kept
    * separate (hypervisor-level, adjudicated on its own), and the guest
    * fields are excluded because the kernel already folds guest time
    * into user (summing both would double-count). Pure parser so the
    * spec replays the recorded r14 adjudication line verbatim. */
  private[graft] def parseCpuLine(statLine: String): Option[(Long, Long)] = {
    val a = statLine.trim.split("\\s+")
    if (a.length >= 9 && a(0) == "cpu")
      try {
        val v = a.slice(1, 9).map(_.toLong)
        Some((v(0) + v(1) + v(2) + v(5) + v(6), v(7)))
      } catch { case _: NumberFormatException => None }
    else None
  }

  /** Steal jiffies from the aggregate "cpu " line (time this guest's
    * vCPUs sat runnable while the hypervisor served other tenants). */
  private[graft] def parseSteal(statLine: String): Option[Long] =
    parseCpuLine(statLine).map(_._2)

  /** This process's own CPU jiffies (utime+stime, fields 14+15 of
    * /proc/self/stat). comm (field 2) may itself contain spaces or ')',
    * so fields are located from the LAST ')' — the kernel-documented
    * safe parse — rather than by naive whitespace split. */
  private[graft] def parseSelfStat(s: String): Option[Long] = {
    val i = s.lastIndexOf(')')
    if (i < 0) return None
    // after ')' the fields are: state(3) ppid pgrp session tty tpgid
    // flags minflt cminflt majflt cmajflt utime(14) stime(15) ...
    val rest = s.substring(i + 1).trim.split("\\s+")
    if (rest.length >= 13)
      try Some(rest(11).toLong + rest(12).toLong)
      catch { case _: NumberFormatException => None }
    else None
  }

  /** Current host+self CPU sample, None off-Linux or on any read
    * failure — absence of stamps, never a crash. Read around each timed
    * row (~100 us for both files): the stamps are provenance like
    * memo_built — no flag consumes them directly (protocol stays 2),
    * though [[stealVetoed]] uses a recorded row's steal stamp to mark
    * it non-comparable as a future median SAMPLE. tools/steal_probe.py is
    * the Spark-free form of the same measurement; BASELINE.md's r14
    * addendum records the adjudication that motivated it: 2-5x outlier
    * rows whose windows absorbed 600-7,400 stolen jiffies on constant
    * work. This is the ONE sampling helper — QTime calls it too (the
    * r14 advisor found the hand-copied steal-delta logic drifting). */
  private[graft] def cpuSample(): Option[CpuSample] =
    try {
      def firstLine(p: String): Option[String] = {
        val src = scala.io.Source.fromFile(p)
        try src.getLines().nextOption() finally src.close()
      }
      for {
        bs <- firstLine("/proc/stat").flatMap(parseCpuLine)
        self <- firstLine("/proc/self/stat").flatMap(parseSelfStat)
      } yield CpuSample(bs._1, bs._2, self)
    } catch { case _: Throwable => None }

  /** Delta between two samples as (stealJiffies, busyForeignJiffies).
    * foreign = host busy minus this JVM's own cputime over the window,
    * floored at 0 (the two /proc reads are not atomic, so own can lead
    * host-busy by a jiffy). Adjudication rule (README/BASELINE): a row
    * at 3x its median is code-suspect ONLY when steal ~ 0 AND foreign
    * ~ 0 — steal >> 0 is the hypervisor's neighbors, foreign >> 0 is
    * same-guest co-tenant processes, and either one inflates wall time
    * on innocent code. */
  private[graft] def cpuDelta(s0: CpuSample, s1: CpuSample): (Long, Long) =
    (s1.steal - s0.steal,
      math.max(0L, (s1.busy - s0.busy) - (s1.self - s0.self)))

  /** Kept for the spec's live-read contract check; stamping goes through
    * [[cpuSample]]/[[cpuDelta]]. */
  private[graft] def readSteal(): Option[Long] = cpuSample().map(_.steal)

  /** Renders (compactLine, fullJson). The compact line keeps the driver
    * contract — {"metric","value","unit","queries":{name:sec},"sf"} — but
    * includes per-query entries LARGEST-FIRST only while the line stays
    * under [[MaxLineChars]]; the rest are summarized as
    * "queries_omitted"/"omitted_sec" (their count and summed seconds), so
    * "value" is always the true total. Failed queries are EXCLUDED from
    * "queries" and reported under "errors" with the exception text — a
    * broken query must never read as a fast timing. The full JSON (every
    * query at full precision + row counts) is for the BENCH_FULL.json
    * evidence file, which also carries the burst-outlier list (every
    * query above 2x its history median, with its ratio) and the
    * memo-provenance markers (which queries paid which families'
    * one-per-session builds). */
  private[graft] def renderJson(
      results: Seq[(String, Double, Either[String, Long])], sfDir: String,
      contended: Option[Boolean] = None,
      burst: Seq[(String, Double)] = Nil,
      memoBuilt: Map[String, Seq[String]] = Map.empty,
      steal: Map[String, Long] = Map.empty,
      foreign: Map[String, Long] = Map.empty,
      runCpu: Option[(Long, Long)] = None,
      preflight: Option[(Double, Long, Long)] = None,
      vetoThinned: Seq[String] = Nil): (String, String) = {
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
      .replaceAll("\\p{Cntrl}", " ") + "\""
    def sec(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val ok = results.collect { case (k, v, Right(n)) => (k, v, n) }
    val errs = results.collect { case (k, _, Left(e)) => s"${jstr(k)}:${jstr(e.take(80))}" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    // "contended" is emitted only when known (>= MinHistoryRuns comparable
    // history runs): absent = no baseline, false = quiet, true = sentinel
    // majority inflated — a flagged snapshot must not close a round.
    val cf = contended.map(b => s""","contended":$b""").getOrElse("")
    // burst outliers ride in BOTH renderings (the full file for the
    // per-query ratios, the compact line as a count — so a driver-tail
    // reader sees WHY a run flagged without opening the file)
    val bfull = if (burst.isEmpty) "" else burst.map { case (k, r) =>
      s"${jstr(k)}:${String.format(java.util.Locale.ROOT, "%.2f", Double.box(r))}"
    }.mkString(""","burst_outliers":{""", ",", "}")
    val bline = if (burst.isEmpty) "" else s""","burst":${burst.length}"""
    // compact line carries the run-total stamps (the tail reader's
    // one-glance adjudicators next to "burst"); per-row maps are
    // file-only. steal_run/foreign_run are the affirmative pair (zero
    // means measured-quiet, and they cover the between-rows gaps the
    // summed row stamps miss); steal_total stays ALONGSIDE them when any
    // row stamped (r15 advisor: dropping it when runCpu measures would
    // silently starve a tail reader keyed on the r14-era field).
    val stealTotLine =
      if (steal.nonEmpty) s""","steal_total":${steal.values.sum}""" else ""
    val sline = runCpu match {
      case Some((st, fb)) => s""","steal_run":$st,"foreign_run":$fb""" + stealTotLine
      case None => stealTotLine
    }
    val mfull = if (memoBuilt.isEmpty) "" else memoBuilt.toSeq.sortBy(_._1)
      .map { case (q, fams) =>
        s"${jstr(q)}:${fams.map(jstr).mkString("[", ",", "]")}"
      }.mkString(""","memo_built":{""", ",", "}")
    // contention provenance: only rows whose window absorbed stolen /
    // foreign-busy jiffies appear (a dense map of zeros carries no
    // signal), plus the run totals — so a reader ranks a flagged run's
    // outliers against its stamps without rerunning anything. The
    // affirmative-zero reading lives in steal_run/foreign_run. Absent
    // entirely off-Linux.
    def sparse(m: Map[String, Long], key: String, tot: String) =
      if (m.isEmpty) "" else m.toSeq.sortBy(_._1)
        .map { case (q, j) => s"${jstr(q)}:$j" }
        .mkString(s""","$key":{""", ",", s"""},"$tot":${m.values.sum}""")
    val sfull = sparse(steal, "steal_jiffies", "steal_total") +
      sparse(foreign, "busy_foreign", "foreign_total") +
      runCpu.map { case (st, fb) => s""","steal_run":$st,"foreign_run":$fb""" }.getOrElse("") +
      preflight.map { case (s, st, fb) =>
        s""","preflight":{"sec":${sec(s)},"steal":$st,"busy_foreign":$fb}"""
      }.getOrElse("") +
      // queries whose burst audit the steal veto disabled this run —
      // thin-by-storm, not thin-by-newness (file-only; sorted, bounded
      // by the query count)
      (if (vetoThinned.isEmpty) ""
       else vetoThinned.map(jstr).mkString(""","veto_thinned":[""", ",", "]"))
    val full = {
      val qs = ok.map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
      val rows = ok.map { case (k, _, n) => s"${jstr(k)}:$n" }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec","protocol":$Protocol$cf$bfull$mfull$sfull,"queries":$qs,"rows":$rows,"errors":$errs,"sf":"$sfDir"}"""
    }
    // largest-first, name tie-break: the entries that matter vs BASELINE
    // always make the line; sub-millisecond noise is what gets summarized
    val desc = ok.sortBy { case (k, v, _) => (-v, k) }
    def line(kept: Seq[(String, Double, Long)]): String = {
      val qs = kept.map { case (k, v, _) => s"${jstr(k)}:${sec(v)}" }.mkString("{", ",", "}")
      val omitted = ok.length - kept.length
      val omittedSec = total - kept.map(_._2).sum
      val om = if (omitted == 0) ""
        else s""","queries_omitted":$omitted,"omitted_sec":${sec(omittedSec)},"full":"BENCH_FULL.json""""
      s"""{"metric":"total","value":${sec(total)},"unit":"sec"$cf$bline$sline,"queries":$qs$om,"errors":$errs,"sf":"$sfDir"}"""
    }
    var keep = desc.length
    while (keep > 0 && line(desc.take(keep)).length > MaxLineChars) keep -= 1
    (line(desc.take(keep)), full)
  }

  /** One cheap pass through each hot code path: parquet scan, hash agg,
    * shuffle join, window, and a typed flatMap (Dataset encoder + JIT). */
  private def warmup(spark: SparkSession, sfDir: String): Unit = {
    import spark.implicits._
    try {
      val n = spark.read.parquet(s"$sfDir/nation.parquet")
      val r = spark.read.parquet(s"$sfDir/region.parquet")
      n.join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1))).count()
      n.select("n_nationkey", "n_name").as[(Long, String)]
        .flatMap { case (k, s) => s.split(' ').map(t => (k, t)) }
        .toDF("k", "t").groupBy("t").agg(sum("k")).count()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .select(col("doc_id"), col("text")).as[(Long, String)]
        .map { case (id, t) => (id, graft.operators.DedupQueries.shingleHashes(t).length) }
        .toDF("id", "n").agg(sum("n")).count()
    } catch { case _: Throwable => () }
  }
}
