package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: the stateful streaming replays (st2 native sessions, st8
  * custom state machine, st12 stream-SCD2) run under BOTH state-store
  * providers — the default HDFS-backed store and RocksDB — printing
  * wall time, output rows, an output checksum, and the final pre-flush
  * state-operator footprint (rows + bytes). The st-family's 100 TB
  * claims rest on bounded state; this measures the same replays on the
  * provider a production cluster would actually run at that scale
  * (RocksDB spills state off-heap/on-disk instead of holding every
  * version in executor memory). Results land in BASELINE.md.
  *
  * Usage: tools/jrun.sh graft.tools.RocksDbProbe <sfDir>
  */
object RocksDbProbe {
  private val Rocks =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Hdfs =
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ops = graft.streaming.EventStreamOps
    val runs: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "st2" -> (() => ops.runToMemoryAppend(spark, s"$sfDir/events.parquet",
        s"rp_st2_${System.nanoTime()}", ops.sessionizeByUser)),
      "st8" -> (() => ops.runToMemoryAppend(spark, s"$sfDir/events.parquet",
        s"rp_st8_${System.nanoTime()}", ops.customSessions)),
      "st12" -> (() => ops.runToMemoryAppend(spark, s"$sfDir/events.parquet",
        s"rp_st12_${System.nanoTime()}", ops.streamScd2)))
    for (provider <- Seq(Hdfs, Rocks)) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", provider)
      val label = provider.split('.').last
      runs.foreach { case (name, run) =>
        val t0 = System.nanoTime()
        val out = run()
        // checksum over all columns so the two providers are proven to
        // produce identical OUTPUT, not just identical row counts
        val chk = out.selectExpr(
          "bit_xor(xxhash64(struct(*))) AS c", "count(*) AS n").collect()(0)
        val secs = (System.nanoTime() - t0) / 1e9
        val st = ops.lastStateOperators.map { case (op, rows, bytes) =>
          s"$op rows=$rows bytes=$bytes"
        }.mkString("; ")
        println(f"[rocksdb-probe] $name%-5s $label%-30s ${secs}%7.2f s  " +
          f"rows=${chk.getLong(1)}  checksum=${chk.getLong(0)}  state: $st")
      }
    }
    spark.stop()
  }
}
