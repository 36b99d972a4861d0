package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic hash-ordered sampling (training-data pipeline staple).
  *
  * `ORDER BY hash(seed, key) LIMIT k` is the scalable deterministic
  * sampler: reproducible across runs and engines (md5, not RNG state),
  * plans as TakeOrderedAndProject (per-partition top-K, no global sort),
  * and composes into stratified variants with a partitioned window. The
  * hash key makes the sample unbiased w.r.t. any natural ordering of the
  * data (ids, ingestion time).
  */
object Sampling {

  private def hashKey(seed: String) = md5(concat_ws(":", lit(seed), col("doc_id")))

  /** Uniform deterministic sample of `k` documents. */
  def deterministicSample(docs: DataFrame, k: Int = 100, seed: String = "s1"): DataFrame =
    docs
      .select(col("doc_id"), col("lang"), hashKey(seed).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(k)
      .orderBy("doc_id")

  /** Stratified: `perStratum` docs per language, hash-ordered within each
    * stratum — one shuffle on the stratum key. */
  def stratifiedSample(docs: DataFrame, perStratum: Int = 20, seed: String = "s1"): DataFrame = {
    val w = Window.partitionBy(col("lang")).orderBy(col("h").asc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col("lang"), hashKey(seed).as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= perStratum)
      .select("lang", "rn", "doc_id")
      .orderBy("lang", "rn")
  }
}
