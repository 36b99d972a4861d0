package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The MAINTAINED LANGUAGE-MODEL artifact — [[TextAnalysis.lmPerplexity]]'s
  * model tables (bigram counts, head counts, vocabulary size) written once
  * per reference-corpus version and read by every scoring query, the same
  * once-per-ingest amortization as [[ShingleStore]] (shingles) and
  * [[Search]] (postings): training re-aggregates the whole reference
  * corpus, scoring only joins against the counts — at 100 TB the model is
  * gigabytes where the corpus is the 100 TB.
  *
  * Freshness (per-process, source-fingerprint keyed), build caching, and
  * crash-safe rename publish ride [[graft.sinks.ArtifactStore]], shared
  * with the other maintained artifacts. The count tables are exact (no
  * pruning), so stored-model scoring is bit-identical to the
  * self-contained path — both gate on the same oracle.
  */
object LmStore {

  /** Build the model tables at `path` from the reference corpus unless
    * this process already built them from the same source data. */
  def ensure(train: DataFrame, path: String): Unit =
    graft.sinks.ArtifactStore.ensure(train, path, builderId = "lm1")(writeTables)

  private def writeTables(train: DataFrame, tmpRoot: String): Unit = {
    val tb = CacheRegistry.persistBounded(TextAnalysis.lmBigrams(train))
    tb.groupBy("bg").agg(count(lit(1)).as("c12"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$tmpRoot/c12")
    tb.groupBy("w1").agg(count(lit(1)).as("c1"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$tmpRoot/c1")
    train.select(explode(TextAnalysis.wordsExpr).as("wd"))
      .agg(countDistinct(col("wd")).as("v"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(s"$tmpRoot/v")
  }

  /** Score `docs` against the stored model — the scoring tail is
    * [[TextAnalysis.lmScoreWithModel]], shared with the self-contained
    * path. */
  def score(spark: SparkSession, path: String, docs: DataFrame,
            k: Double = 0.5): DataFrame =
    TextAnalysis.lmScoreWithModel(
      spark.read.parquet(s"$path/c12"),
      spark.read.parquet(s"$path/c1"),
      spark.read.parquet(s"$path/v"),
      docs, k)
}
