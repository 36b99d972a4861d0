package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Stage-by-stage cardinality + spill probe for the exact set-similarity
  * join — the diagnostic behind the decade-2 scale-leg analysis. Prints,
  * for one corpus, the row count of every intermediate of
  * [[graft.operators.SetJoin.similarPairs]] (shingle rows, vocabulary,
  * prefix rows, raw candidate-join output, distinct candidate pairs,
  * verified pairs) plus cluster-wide shuffle/spill totals from a stage
  * listener. Two invocations (sf1, sf10) answer the question a raw wall
  * time cannot: is a super-linear exponent ALGORITHMIC (candidates grow
  * faster than rows) or EXECUTIONAL (same per-row work, worse constants
  * from spill/GC at fixed resources)?
  *
  * Usage: SetJoinProbe <dir> [threshold] — same env knobs as
  * [[ScaleBench]] (SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE_PARTITIONS).
  * Mirrors the SHIPPED fingerprinted pipeline (xxhash64 longs in
  * sort/prefix/candidate stages — what the operator executes since the
  * round-9 fix); SPARK_GRAFT_PROBE_LEGACY=1 swaps in the pre-fingerprint
  * string pipeline (the baseline the decade-2 spill diagnosis ran
  * against), so both the current operator and the historical comparison
  * stay reproducible.
  */
object SetJoinProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val parts = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufW = new AtomicLong; val shufR = new AtomicLong
    val memSpill = new AtomicLong; val diskSpill = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val m = s.stageInfo.taskMetrics
        shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        memSpill.addAndGet(m.memoryBytesSpilled)
        diskSpill.addAndGet(m.diskBytesSpilled)
      }
    })

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[probe] $name%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    val legacy = sys.env.get("SPARK_GRAFT_PROBE_LEGACY").contains("1")
    val docs = graft.sources.Tables.documents(spark, dir)
    // Mirror SetJoin.similarPairs stage by stage (same expressions) so the
    // counts describe the real operator's intermediates. Default = the
    // shipped fingerprinted pipeline (8-byte xxhash64 carried through
    // sort/prefix/verify); legacy = the string pipeline it replaced.
    val toks = graft.operators.CacheRegistry.persistBounded(
      graft.operators.Dedup.shingles(docs))
    val nSh = timed("shingle rows")(toks.count())
    val dfreq = toks.groupBy("sh").agg(count(lit(1)).as("df"))
    val nVocab = timed("vocabulary")(dfreq.count())
    val tok = if (legacy) col("sh") else xxhash64(col("sh"))
    val stamped = toks.join(dfreq, Seq("sh")).select(
      col("doc_id"), col("df"), tok.as("sh"))
    val sortedDocs = graft.operators.CacheRegistry.persistBounded(stamped
      .groupBy("doc_id")
      .agg(sort_array(collect_set(struct(col("df"), col("sh")))).as("sorted"))
      .select(col("doc_id"),
        array_distinct(expr("transform(sorted, x -> x.sh)")).as("shs"))
      .select(col("doc_id"), col("shs"), size(col("shs")).as("n")))
    val nDocs = timed("docs w/ shingles")(sortedDocs.count())
    val prefixes = sortedDocs
      .select(col("doc_id"), col("n"),
        posexplode(expr(s"slice(shs, 1, size(shs) - CAST(ceil($threshold * size(shs)) AS INT) + 2)")))
      .toDF("doc_id", "n", "pos", "sh")
    val nPre = timed("prefix rows")(prefixes.count())
    val reqFrac = threshold / (1.0 + threshold)
    val candRaw = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          col("a.n") * lit(threshold) <= col("b.n") + lit(1) &&
          col("b.n") * lit(threshold) <= col("a.n") + lit(1) &&
          least(col("a.n") - col("a.pos"), col("b.n") - col("b.pos")) >=
            ceil(lit(reqFrac) * (col("a.n") + col("b.n"))) - lit(1))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val nCandRaw = timed("cand join output")(candRaw.count())
    val cand = candRaw.distinct()
    val nCand = timed("distinct pairs")(cand.count())
    val nFinal = timed("verified pairs")(
      graft.operators.SetJoin.similarPairs(docs, threshold)
        .queryExecution.toRdd.count())
    println(s"""{"metric":"setjoin_probe","dir":"$dir","parts":$parts,""" +
      s""""mode":"${if (legacy) "legacy-string" else "fingerprint"}",""" +
      s""""shingle_rows":$nSh,"vocab":$nVocab,"docs":$nDocs,"prefix_rows":$nPre,""" +
      s""""cand_raw":$nCandRaw,"cand_distinct":$nCand,"pairs":$nFinal,""" +
      s""""shuffle_write_mb":${shufW.get / 1048576},"shuffle_read_mb":${shufR.get / 1048576},""" +
      s""""mem_spill_mb":${memSpill.get / 1048576},"disk_spill_mb":${diskSpill.get / 1048576}}""")
    spark.stop()
  }
}
