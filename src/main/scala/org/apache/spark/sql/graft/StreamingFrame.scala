/*
 * The ONE private[sql] bridge in this codebase, isolated in an
 * `org.apache.spark.sql` subpackage exactly the way Delta Lake's
 * DeltaSource does it (delta-io/delta keeps its Spark-internal touches
 * behind the same package-visibility seam): Structured Streaming's
 * MicroBatchExecution asserts that a V1 `Source.getBatch` DataFrame has
 * `isStreaming = true`, and the only way to stamp an arbitrary batch
 * plan as streaming is the `LogicalRDD` constructor, which is
 * `private[sql]`. Everything else in the repo sticks to the public
 * DataFrame/Catalyst surface.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.StructType

object StreamingFrame {

  /** Re-base a fully planned BATCH frame as a STREAMING one: execute the
    * batch plan to its InternalRow RDD and wrap it in an
    * `isStreaming = true` [[LogicalRDD]] — the exact shape
    * `FileStreamSource`/`DeltaSource` return from `getBatch`. The RDD is
    * lazy; nothing runs until the micro-batch executes. */
  def asStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val qe = df.queryExecution
    Dataset.ofRows(spark,
      LogicalRDD(qe.analyzed.output, qe.toRdd, isStreaming = true)(spark))
  }

  /** The REVERSE rebase: a streaming-planned micro-batch frame as a
    * BATCH one. A V1 `Sink.addBatch` receives its frame planned
    * incrementally (`isStreaming = true`) — batch writers reject it.
    * `foreachBatch` performs this rebase inside the engine; a custom
    * Sink must do it itself, same `LogicalRDD` move in the other
    * direction. */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[SparkSession]
    val qe = df.queryExecution
    Dataset.ofRows(spark,
      LogicalRDD(qe.analyzed.output, qe.toRdd, isStreaming = false)(spark))
  }

  /** An EMPTY streaming frame of `schema` — what a CDC `getBatch`
    * returns for a version range that added no data dirs. */
  def emptyStreaming(spark: org.apache.spark.sql.SparkSession,
                     schema: StructType): DataFrame = {
    val s = spark.asInstanceOf[SparkSession]
    val attrs = LocalRelation(schema).output
    Dataset.ofRows(s,
      LogicalRDD(attrs, s.sparkContext.emptyRDD, isStreaming = true)(s))
  }
}
