package graft.functions

import graft.SparkSpec
import graft.core.{Chunker, DedupeSettings}
import org.apache.spark.sql.functions._

class FunctionsSpec extends SparkSpec {

  test("dot_f equals the zip_with/aggregate double fold bitwise") {
    GraftExtensions.register(spark)
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val folded = e.limit(50).select(col("vec_id"),
      aggregate(zip_with(col("embedding"), col("embedding"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("a"),
      DotProductF.dotF(col("embedding"), col("embedding")).as("b"))
    assert(folded.filter(col("a") =!= col("b")).isEmpty)
    // and via SQL registration
    e.limit(5).createOrReplaceTempView("emb_t")
    val viaSql = spark.sql("SELECT dot_f(embedding, embedding) AS d FROM emb_t")
    assert(viaSql.collect().forall(r => math.abs(r.getDouble(0) - 1.0) < 1e-4))
  }

  test("sorted_intersect_size equals size(array_intersect) on sorted distinct arrays") {
    GraftExtensions.register(spark)
    import spark.implicits._
    // random sorted-distinct long sets with forced overlaps, plus edge cases
    val rnd = new scala.util.Random(23)
    val rows = (1 to 200).map { _ =>
      val common = Array.fill(rnd.nextInt(20))(rnd.nextLong())
      val a = (common ++ Array.fill(rnd.nextInt(30))(rnd.nextLong())).distinct.sorted
      val b = (common ++ Array.fill(rnd.nextInt(30))(rnd.nextLong())).distinct.sorted
      (a, b)
    } :+ ((Array.empty[Long], Array(1L, 2L))) :+ ((Array(5L), Array(5L)))
    val df = rows.toDF("a", "b")
    val checked = df.select(
      SortedIntersectSize.sortedIntersectSize(col("a"), col("b")).as("fast"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
    assert(checked.filter(col("fast") =!= col("ref")).isEmpty,
      "two-pointer merge must equal the built-in intersect size")
    // SQL registration + interpreted path (eval) via a literal-free filter
    df.createOrReplaceTempView("sis_t")
    val viaSql = spark.sql(
      "SELECT sorted_intersect_size(a, b) AS s, size(array_intersect(a, b)) AS r FROM sis_t")
    assert(viaSql.filter(col("s") =!= col("r")).isEmpty)
  }

  test("cdc_chunks generator matches the Chunker on the same payload") {
    GraftExtensions.register(spark)
    spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("doc_id", "cast(text as binary) AS payload")
      .createOrReplaceTempView("docs_t")
    val viaSql = spark.sql(
      """SELECT doc_id, c.chunk_key, c.length, c.position, c.address
        |FROM docs_t LATERAL VIEW cdc_chunks(payload, 256, 2048, 8, 1) c
        |""".stripMargin).collect()
    val s = DedupeSettings(256, 2048, 8, 1)
    val direct = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap(r => Chunker.chunk(r.getString(1).getBytes("UTF-8"), s)
        .map(c => (r.getLong(0), c.chunkKey, c.length, c.position, c.address)))
    val got = viaSql.map(r =>
      (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3), r.getLong(4)))
    assert(got.sorted.sameElements(direct.sorted))
    assert(got.nonEmpty)
  }

  test("binary_concat aggregator reconstructs objects distributively") {
    import spark.implicits._
    val r = new scala.util.Random(3)
    val objs = (1 to 5).map { i =>
      val data = new Array[Byte](5000 + i * 100); r.nextBytes(data); (s"o$i", data)
    }
    val s = DedupeSettings(256, 2048, 8, 1)
    val chunked = objs.flatMap { case (k, data) =>
      Chunker.chunkWithData(data, s).map(c => (k, c.ref.address, c.data))
    }
    val df = spark.createDataset(chunked).toDF("key", "address", "data")
      .repartition(7) // scatter chunks across partitions on purpose
      .as[(String, Long, Array[Byte])]
    val rebuilt = df.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(BinaryConcatAgg.toColumn.name("obj"))
      .collect().toMap
    objs.foreach { case (k, data) =>
      assert(java.util.Arrays.equals(rebuilt(k), data), s"object $k mismatch")
    }
  }
}
