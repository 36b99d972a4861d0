package graft

import graft.operators.RankUtils
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RankUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("distributed global rank equals the single-partition window rank") {
    val df = (1 to 5000).map(i => (i.toLong, (i * 2654435761L % 997).toDouble))
      .toDF("id", "score").repartition(13)
    val order = Seq(col("score").desc, col("id").asc)
    val viaWindow = df
      .withColumn("rank", row_number().over(Window.orderBy(order: _*)).cast("long"))
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaUtils = RankUtils.globalRowNumber(df, order, "rank", partitions = 7)
      .select("id", "rank").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUtils === viaWindow)
  }

  test("ranks are dense 1..n regardless of partition boundaries") {
    val df = (1 to 100).map(i => (i.toLong, 1.0)).toDF("id", "score") // all ties
    val ranks = RankUtils
      .globalRowNumber(df, Seq(col("score").desc, col("id").asc), "rank", partitions = 9)
      .select("rank").collect().map(_.getLong(0)).sorted
    assert(ranks.toSeq === (1L to 100L))
  }
}
