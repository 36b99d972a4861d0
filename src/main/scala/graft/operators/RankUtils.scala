package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking.
  *
  * `row_number().over(Window.orderBy(...))` moves the whole input to ONE
  * partition — fine behind a top-K limit, fatal on an unbounded row set at
  * cluster scale. This is the classic scalable alternative:
  *
  *   1. range-repartition on the (total) sort order,
  *   2. rank within each partition (distributed windows),
  *   3. add per-partition offsets (a tiny count aggregate, broadcast).
  *
  * The result is identical to the single-partition window for any total
  * order (ranks depend only on the global order, not on where Spark draws
  * the range boundaries), which the oracle gate and `RankUtilsSpec`
  * verify.
  */
object RankUtils {

  /** Append `rankCol` = 1-based global row number under `order` (must be a
    * TOTAL order — include a unique tiebreak key). */
  def globalRowNumber(df: DataFrame, order: Seq[Column], rankCol: String,
                      partitions: Int = 0): DataFrame = {
    val ranged =
      (if (partitions > 0) df.repartitionByRange(partitions, order: _*)
       else df.repartitionByRange(order: _*))
        .withColumn("__pid", spark_partition_id())
    val perPart = Window.partitionBy(col("__pid")).orderBy(order: _*)
    val offsets = ranged
      .groupBy("__pid").agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__pid", "__offset")
    ranged
      .withColumn("__rn", row_number().over(perPart).cast("long"))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol, col("__rn") + col("__offset"))
      .drop("__pid", "__rn", "__offset")
  }
}
