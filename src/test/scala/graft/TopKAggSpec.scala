package graft

import graft.functions.TopKAgg.top_k
import graft.operators.StarSchema
import org.apache.spark.sql.functions._

/** The heap aggregate must reproduce the window formulation exactly —
  * including tiebreaks and partial-aggregation merges across partitions. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("top_k keeps the best k with (score desc, id asc) tiebreaks") {
    val df = Seq(
      ("g", 5.0, 1L), ("g", 9.0, 2L), ("g", 9.0, 3L), ("g", 1.0, 4L), ("g", 7.0, 5L)
    ).toDF("g", "score", "id")
    val out = df.groupBy("g").agg(top_k(struct(col("score"), col("id")), 3).as("top"))
      .select(explode(col("top")).as("e")).select("e.score", "e.id")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    assert(out.toSeq === Seq((9.0, 2L), (9.0, 3L), (7.0, 5L)))
  }

  test("heap agg matches window formulation on the fixture, across partitions") {
    val orders = sources.Tables.orders(spark, "/root/testdata/sf0.001").repartition(7)
    val viaWindow = StarSchema.customerTopOrders(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val viaAgg = StarSchema.customerTopOrdersAgg(orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(viaAgg === viaWindow)
  }

  test("nulls in the input struct are ignored") {
    val df = Seq[(String, Option[Double], Long)](
      ("g", Some(3.0), 1L), ("g", None, 2L), ("g", Some(8.0), 3L)
    ).toDF("g", "score", "id")
    val out = df.groupBy("g").agg(top_k(struct(col("score"), col("id")), 5).as("top"))
      .select(explode(col("top")).as("e")).select("e.id")
      .collect().map(_.getLong(0))
    assert(out.toSeq === Seq(3L, 1L))
  }
}
