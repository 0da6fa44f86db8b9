package graft.apps

import graft.SparkSpec
import graft.core.DedupeSettings
import graft.engine.DedupeEngine
import java.nio.file.Files

/** CLI flag parity with the reference console
  * (reference: src/Cli/Program.cs:52-130 — --results/--idxstart paging,
  * md/stats --chunks detail). */
class DedupeCliSpec extends SparkSpec {

  private def captureOut(body: => Unit): Seq[String] = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos))(body)
    bos.toString("UTF-8").linesIterator.toSeq
  }

  private def newIndex(): String = {
    val dir = Files.createTempDirectory("graft-cli").toString
    val e = DedupeEngine.create(spark, dir, DedupeSettings(256, 2048, 8, 1))
    val r = new scala.util.Random(7)
    val data = new Array[Byte](3000)
    r.nextBytes(data)
    e.ingest((1 to 25).map(i => f"k$i%03d" -> data))
    dir
  }

  private def captureRaw(body: => Unit): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos))(body)
    bos.toByteArray
  }

  test("get '-' streams raw object bytes to stdout (reference stdout parity)") {
    val dir = Files.createTempDirectory("graft-cli-stdout").toString
    val e = DedupeEngine.create(spark, dir, DedupeSettings(256, 2048, 8, 1))
    val r = new scala.util.Random(11)
    val data = new Array[Byte](5000)
    r.nextBytes(data)
    e.write("raw", data)
    val out = captureRaw(DedupeCli.run(spark, dir, "get", Array("raw", "-")))
    assert(java.util.Arrays.equals(out, data),
      "stdout must carry exactly the object bytes, no report line")
  }

  test("parseArgs splits positionals from --flags") {
    val (pos, flags) = DedupeCli.parseArgs(
      Array("pref", "--results", "7", "--idxstart", "k005", "--chunks"))
    assert(pos == Seq("pref"))
    assert(flags == Map("results" -> "7", "idxstart" -> "k005", "chunks" -> "true"))
    assertThrows[IllegalArgumentException](DedupeCli.parseArgs(Array("--results")))
  }

  test("list --results/--idxstart paginates exactly like listObjects") {
    val dir = newIndex()
    val e = DedupeEngine.open(spark, dir)
    val envelope = e.listObjects(Some("k"), None, 10)
    val page1 = captureOut(DedupeCli.run(spark, dir, "list",
      Array("k", "--results", "10")))
    val keys1 = page1.filterNot(_.startsWith("--")).map(_.split("\\s+")(0))
    assert(keys1 == envelope.objects.map(_.objectKey))
    assert(page1.last == s"-- next: ${envelope.nextStartAfterKey.get}")
    // continuation equals the engine's keyset page 2
    val env2 = e.listObjects(Some("k"), envelope.nextStartAfterKey, 10)
    val page2 = captureOut(DedupeCli.run(spark, dir, "list",
      Array("k", "--idxstart", envelope.nextStartAfterKey.get, "--results", "10")))
    val keys2 = page2.filterNot(_.startsWith("--")).map(_.split("\\s+")(0))
    assert(keys2 == env2.objects.map(_.objectKey))
  }

  test("md prints summary only; --chunks adds map and refcount detail") {
    val dir = newIndex()
    val bare = captureOut(DedupeCli.run(spark, dir, "md", Array("k001")))
    assert(bare.size == 1 && bare.head.startsWith("key=k001"))
    val full = captureOut(DedupeCli.run(spark, dir, "md", Array("k001", "--chunks")))
    assert(full.size > 1)
    assert(full.exists(_.contains("addr=")), "map rows expected with --chunks")
    assert(full.exists(_.contains("refs=")), "chunk refcounts expected with --chunks")
  }

  test("stats --chunks dumps the chunk table") {
    val dir = newIndex()
    val bare = captureOut(DedupeCli.run(spark, dir, "stats", Array()))
    assert(bare.size == 1 && bare.head.contains("objects=25"))
    val full = captureOut(DedupeCli.run(spark, dir, "stats", Array("--chunks")))
    val chunkLines = full.count(_.contains("refs="))
    val e = DedupeEngine.open(spark, dir)
    assert(chunkLines.toLong == e.chunks.count())
  }
}
