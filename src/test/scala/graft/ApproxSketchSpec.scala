package graft

import org.apache.spark.sql.functions._

/** The approximate companions to the exact oracle-gated aggregates —
  * HyperLogLog++ distinct counts and quantile sketches. These are the
  * 100 TB substitutes (mergeable, bounded-memory); they can't sit behind
  * the DuckDB hash gate (sketch internals differ across engines), so they
  * are bounded against the exact answers instead. */
class ApproxSketchSpec extends SparkSpec {

  private lazy val li = sources.Tables.lineitem(spark, "/root/testdata/sf0.01")

  test("approx_count_distinct within its standard-error envelope") {
    val exact = li.select(countDistinct(col("l_partkey"))).collect().head.getLong(0)
    val approx = li.select(approx_count_distinct(col("l_partkey"), rsd = 0.02))
      .collect().head.getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.06, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("approx_percentile tracks the exact percentile") {
    val exact = li.select(expr("percentile(l_extendedprice, 0.5)"))
      .collect().head.getDouble(0)
    val approx = li.select(expr("approx_percentile(l_extendedprice, 0.5, 10000)"))
      .collect().head.getDouble(0)
    val relErr = math.abs(approx - exact) / exact
    assert(relErr < 0.01, s"exact=$exact approx=$approx relErr=$relErr")
  }

  test("sketches merge across partitionings (the property that makes them scale)") {
    val a = li.repartition(3).select(approx_count_distinct(col("l_partkey"))).collect().head.getLong(0)
    val b = li.repartition(17).select(approx_count_distinct(col("l_partkey"))).collect().head.getLong(0)
    assert(a === b, "HLL merge is associative — partitioning must not change the estimate")
  }
}
