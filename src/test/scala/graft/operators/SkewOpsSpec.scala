package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {

  import spark.implicits._

  // heavily skewed fact: 90% of rows share key 1
  private lazy val fact = spark.range(0, 20000)
    .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100).as("k"),
      (col("id") % 7).cast("double").as("v"))
  private lazy val dim = spark.range(0, 100)
    .select(col("id").as("k"), concat(lit("d"), col("id")).as("label"))

  test("saltedEquiJoin equals the plain inner join") {
    val plain = fact.join(dim, "k")
      .groupBy("k", "label").agg(count(lit(1)).as("n"), sum("v").as("s"))
    val salted = SkewOps.saltedEquiJoin(fact, dim, "k", 8)
      .groupBy("k", "label").agg(count(lit(1)).as("n"), sum("v").as("s"))
    assert(plain.count() == salted.count())
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("saltedCountSum equals the direct aggregation") {
    val direct = fact.groupBy("k")
      .agg(count(lit(1)).as("n"),
        sum(col("v").cast("decimal(28,6)")).cast("double").as("sum_value"))
    val salted = SkewOps.saltedCountSum(fact.toDF(), "k", "v", 8)
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("salted join spreads a hot key across salt partitions") {
    val salted = SkewOps.saltedEquiJoin(fact, dim, "k", 8)
    // the hot key's rows survive intact (8x dim replication, no loss/dup)
    assert(salted.filter(col("k") === 1).count() ==
      fact.filter(col("k") === 1).count())
  }

  test("k1 driver query equals the unsalted join+agg (output invariance)") {
    val ev = Tables.t(spark, sfDir, "events")
      .select(when(col("user_id") % 4 === 0, lit(1L)).otherwise(col("user_id")).as("c_custkey"),
        col("value"))
    val plain = ev.join(Tables.t(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")), "c_custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(28,6)")).cast("double").as("sum_value"))
    val k1 = SkewOps.k1SaltedJoin(spark, sfDir)
    assert(k1.count() > 0, "the synthesized hot key must hit customer rows")
    assert(plain.exceptAll(k1).isEmpty && k1.exceptAll(plain).isEmpty)
  }
}
