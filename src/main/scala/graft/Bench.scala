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
    warmup(spark, sfDir)
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
    }
    // The dedupe operators share one memoized candidate stage per session
    // (docSets / verified pairs). Clear it so the TIMED pass pays that
    // build exactly once, at the first query that needs it (x3), and later
    // queries (x4/x7) show their real incremental cost — the sweep shape a
    // real session runs. Without this, the warmup pass pre-fills the memo
    // and the timed x3 would report a cache lookup as the build cost.
    graft.operators.DedupQueries.clearMemo()
    // same fairness rule for the k-means assignment memo (v5/v7 share it):
    // the timed pass pays the Lloyd loop once, at the first consumer
    graft.operators.SimilarityQueries.clearMemo()
    // and for the co-purchase edge memo (n1/n3 share it)
    graft.operators.GraphOps.clearMemo()
    // and the persisted-ANN staging root (v19 re-persists in the timed
    // pass, so the row reports real persist+reopen+serve cost)
    graft.operators.AnnIndexStore.clearMemo()
    // and the z8 export root (the timed pass pays the real shard write)
    graft.operators.ExportOps.clearMemo()
    // and z10's hilbert-sharded export root (same rule)
    graft.operators.LayoutOps.clearMemo()
    // and st15's staged replay (the timed pass pays the staging write)
    graft.streaming.LateDataAudit.clearMemo()
    // and st20's streamed lake (the timed pass pays the real streamed
    // write, staging included — the st15 precedent)
    graft.streaming.LakeStreamWriter.clearMemo()
    // Drain warmup-pass debris NOW: dropping the memo released two
    // localCheckpointed RDDs, and the untimed pass left shuffle/broadcast
    // refs that ContextCleaner reclaims on GC. Forcing the GC here runs
    // that (blocking-by-default) cleanup between the passes instead of at
    // a random point inside a timed query.
    System.gc()
    Thread.sleep(1000)
    val results = sorted.map { case (name, fn) =>
      // A query that throws is reported as an err entry — NEVER as a fast
      // timing (a broken query must not read as a perf win).
      val t0 = System.nanoTime()
      val outcome: Either[String, Long] =
        try Right(fn(spark, sfDir).count())
        catch { case e: Throwable =>
          Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)}")
        }
      (name, (System.nanoTime() - t0) / 1e9, outcome)
    }
    // Contention stamp: before appending this run to the history, compare
    // the scan-bound sentinels against their history medians. A contended
    // snapshot must never read as a regression (r11's committed
    // BENCH_FULL.json held a 326.7 s contended run vs the 185.9 s quiet
    // truth) — the flag rides in both the compact line and the full JSON,
    // and the close ritual refuses to leave a flagged BENCH_FULL.json.
    val priorRuns = readHistorySentinels(sfDir)
    val curQ = results.collect { case (k, v, Right(_)) => k -> v }.toMap
    val contended = contendedFlag(curQ, priorRuns)
    val (line, full) = renderJson(results, sfDir, contended)
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
    * the sentinel timings of every clean same-sf run. Jackson is the JSON
    * reader Spark already bundles; a missing or malformed history yields
    * Nil (flag stays unknown). */
  private def readHistorySentinels(sfDir: String): Seq[Map[String, Double]] = {
    val p = java.nio.file.Paths.get("BENCH_HISTORY.jsonl")
    if (!java.nio.file.Files.exists(p)) return Nil
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    try {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(p).asScala.toSeq.flatMap { ln =>
        try {
          val n = om.readTree(ln)
          val sameSf = Option(n.get("sf")).exists(_.asText() == sfDir)
          val clean = Option(n.get("errors")).forall(e => !e.fieldNames().hasNext)
          val qs = Option(n.get("queries"))
          if (sameSf && clean && qs.isDefined)
            Some(Sentinels.flatMap(s => Option(qs.get.get(s))
              .filter(_.isNumber).map(v => s -> v.asDouble())).toMap)
          else None
        } catch { case _: Throwable => None }
      }
    } catch { case _: Throwable => Nil }
  }

  /** Renders (compactLine, fullJson). The compact line keeps the driver
    * contract — {"metric","value","unit","queries":{name:sec},"sf"} — but
    * includes per-query entries LARGEST-FIRST only while the line stays
    * under [[MaxLineChars]]; the rest are summarized as
    * "queries_omitted"/"omitted_sec" (their count and summed seconds), so
    * "value" is always the true total. Failed queries are EXCLUDED from
    * "queries" and reported under "errors" with the exception text — a
    * broken query must never read as a fast timing. The full JSON (every
    * query at full precision + row counts) is for the BENCH_FULL.json
    * evidence file. */
  private[graft] def renderJson(
      results: Seq[(String, Double, Either[String, Long])], sfDir: String,
      contended: Option[Boolean] = None): (String, String) = {
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
    val full = {
      val qs = ok.map { case (k, v, _) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
      val rows = ok.map { case (k, _, n) => s"${jstr(k)}:$n" }.mkString("{", ",", "}")
      s"""{"metric":"total","value":$total,"unit":"sec"$cf,"queries":$qs,"rows":$rows,"errors":$errs,"sf":"$sfDir"}"""
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
      s"""{"metric":"total","value":${sec(total)},"unit":"sec"$cf,"queries":$qs$om,"errors":$errs,"sf":"$sfDir"}"""
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
