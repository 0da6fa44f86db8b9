package graft

/** Smoke: every declared query runs at sf0.001 and returns rows; every
  * oracleSql key has a matching query. (Value-level parity is checked by
  * the driver's DuckDB gate + tools/check_oracle.py.) */
class QueriesSmokeSpec extends SparkSpec {

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"query $name runs and returns rows") {
      val df = fn(spark, sfDir)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }
}
