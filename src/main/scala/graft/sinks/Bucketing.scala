package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout for co-located fact⋈fact joins (the 100 TB
  * design brief's "bucketing for co-located joins").
  *
  * Writing both join sides bucketed (and sorted) by the join key lets
  * Spark plan the join with ZERO shuffle exchanges: each bucket pairs off
  * 1:1 and a sort-merge join runs directly on the bucket files. For a
  * repeatedly-joined pair like orders⋈lineitem at 100 TB this removes the
  * dominant cost of every downstream query. Verified by
  * `BucketedJoinSpec`, which asserts the physical plan is Exchange-free
  * and row-identical to the shuffled join.
  */
object Bucketing {

  /** Write `df` as a managed bucketed+sorted parquet table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket keys — plans shuffle-free
    * when both were written with the same bucket count. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable).join(
      spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
