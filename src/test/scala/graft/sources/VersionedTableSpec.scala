package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

class VersionedTableSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", StringType), StructField("n", LongType)))

  private def fresh() = {
    val dir = Files.createTempDirectory("vt_spec").toString
    (dir, new VersionedTable(spark, dir, schema))
  }

  private def df(rows: (String, Long)*) = {
    import spark.implicits._
    rows.toDF("k", "n")
  }

  private def segDirs(dir: String): Seq[String] =
    Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .map(_.getFileName.toString).filter(_.startsWith("seg-")).toSeq.sorted

  test("empty table reads as empty with schema") {
    val (_, t) = fresh()
    assert(t.read().schema === schema)
    assert(t.read().count() === 0)
  }

  test("append accumulates segments; read unions them") {
    val (dir, t) = fresh()
    t.append(df("a" -> 1L))
    t.append(df("b" -> 2L))
    t.append(df("c" -> 3L))
    assert(segDirs(dir).size === 3, "each append adds exactly one segment")
    val got = t.read().collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got === Seq(("a", 1L), ("b", 2L), ("c", 3L)))
  }

  test("publish replaces contents in a single-segment manifest") {
    val (dir, t) = fresh()
    t.append(df("a" -> 1L))
    t.append(df("b" -> 2L))
    t.publish(df("z" -> 9L))
    assert(t.segmentCount === 1, "publish manifest references one segment")
    val got = t.read().collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("z", 9L)))
    // one more commit retires the pre-publish segments (grace window is 1)
    t.append(df("w" -> 8L))
    assert(segDirs(dir).size === 2, "only the grace window survives GC")
  }

  test("compact preserves contents in a single-segment manifest") {
    val (_, t) = fresh()
    t.append(df("a" -> 1L))
    t.append(df("b" -> 2L))
    t.compact()
    assert(t.segmentCount === 1)
    val got = t.read().collect().map(r => (r.getString(0), r.getLong(1))).sorted
    assert(got === Seq(("a", 1L), ("b", 2L)))
  }

  test("append auto-compacts past the segment threshold") {
    val (_, t) = fresh()
    (1 to 5).foreach(i => t.append(df(s"k$i" -> i.toLong), compactThreshold = 4))
    assert(t.segmentCount === 1, "chain must have been folded")
    assert(t.read().count() === 5, "compaction preserves all rows")
  }

  test("a DataFrame resolved before a commit survives that commit (grace)") {
    val (_, t) = fresh()
    t.append(df("a" -> 1L, "b" -> 2L))
    val before = t.read()
    t.publish(df("z" -> 9L)) // rewrites; old segment must stay one version
    assert(before.count() === 2, "pre-commit plan still executes after GC")
  }

  test("publish of a derived-from-self DataFrame materializes before GC") {
    val (_, t) = fresh()
    t.append(df("a" -> 1L, "b" -> 2L))
    // delete-shaped rewrite: new snapshot computed FROM the current one
    t.publish(t.read().filter("k <> 'a'"))
    val got = t.read().collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("b", 2L)))
  }
}
