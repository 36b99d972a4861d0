package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the conditional-clause MERGE
  * ([[graft.sinks.VersionedStore.mergeIntoClauses]]): captures every
  * SQL execution the command runs (QueryExecutionListener) and counts
  * join strategies. The 100 TB question: a bounded merge source must
  * BROADCAST to the touched-dir scans — a sort-merge join here would
  * shuffle table-side data per rewritten dir. Round-15 record: all 3
  * join-bearing executions (key probe, per-dir outer-join rewrite,
  * insert anti-join) are BroadcastHashJoin, 0 sort-merge. */
object MergePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .withExtensions(new GraftExtensions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.sinks.VersionedStore
    val root = java.nio.file.Files.createTempDirectory("gmp").toString
    VersionedStore.commitAppend(
      (1L to 50000L).map(i => (i, i * 2.0, s"g${i % 5}")).toDF("id", "value", "grp"),
      root, statsCols = Seq("id"))
    val tbl = "gmp_t"
    spark.sql(s"CREATE TABLE $tbl USING graftstore OPTIONS (path '$root')")
    (1L to 2000L).map(i => (i * 7, 1.0, "new")).toDF("id", "value", "grp")
      .createOrReplaceTempView("gmp_src")
    // capture the physical plans the rewrite runs by listening to the
    // SQL executions during the merge
    val plans = scala.collection.mutable.ArrayBuffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, d: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    spark.sql(
      s"""MERGE INTO $tbl t USING gmp_src s ON t.id = s.id
         |WHEN MATCHED AND s.value > 0 THEN UPDATE SET value = t.value + s.value
         |WHEN MATCHED THEN DELETE
         |WHEN NOT MATCHED THEN INSERT *
         |""".stripMargin).collect()
    Thread.sleep(3000)
    val joined = plans.filter(p => p.contains("Join"))
    println("JOIN-BEARING EXECUTIONS: " + joined.size)
    println("broadcast joins: " + joined.count(_.contains("BroadcastHashJoin")))
    println("sort-merge joins: " + joined.count(_.contains("SortMergeJoin")))
    joined.find(_.contains("SortMergeJoin")).foreach(p =>
      println("SMJ plan head:\n" + p.linesIterator.take(12).mkString("\n")))
    // Second statement: the BY SOURCE shape (round 16) — the rewrite's
    // left-outer join must STILL broadcast the bounded source to every
    // dir scan, and the conditional existence probe must stay join-free
    // (a pushed filter + limit per leg, no join at all).
    plans.synchronized { plans.clear() }
    (1L to 500L).map(i => (i * 11, 2.0, "bys")).toDF("id", "value", "grp")
      .createOrReplaceTempView("gmp_src2")
    spark.sql(
      s"""MERGE INTO $tbl t USING gmp_src2 s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET value = s.value
         |WHEN NOT MATCHED BY SOURCE AND t.grp = 'g3' AND t.id > 49000
         |  THEN UPDATE SET value = t.value - 1
         |""".stripMargin).collect()
    Thread.sleep(3000)
    val joined2 = plans.filter(p => p.contains("Join"))
    println("BY-SOURCE JOIN-BEARING EXECUTIONS: " + joined2.size)
    println("by-source broadcast joins: " +
      joined2.count(_.contains("BroadcastHashJoin")))
    println("by-source sort-merge joins: " +
      joined2.count(_.contains("SortMergeJoin")))
    joined2.find(_.contains("SortMergeJoin")).foreach(p =>
      println("SMJ plan head:\n" + p.linesIterator.take(12).mkString("\n")))
    spark.sql(s"DROP TABLE $tbl")
    spark.stop()
  }
}
