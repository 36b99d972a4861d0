package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Hash60.md5_hash60
import graft.functions.MinKAgg.min_k_distinct

/** KMV / theta-style distinct-set sketches with multiset-operation
  * estimators (Beyer et al., SIGMOD 2007; the same k-minimum-hash idea
  * underlies the theta sketch family of Dasgupta et al., "Theta-Sketch
  * Framework", 2016).
  *
  * The sketch of a set is its k smallest distinct [[graft.functions
  * .Md5Hash60]] values — a pure function of the set, so sketches (and
  * every estimate below) are deterministic across runs, partitionings,
  * and engines, which is what lets the DuckDB oracle hash-match a
  * *probabilistic* estimator: the randomness is in the hash design, not
  * the execution.
  *
  * Estimators over 60-bit hashes (u = h / 2^60 uniform on [0,1)):
  *  - distinct:     |S| < k → exact |S|; else (k-1) · 2^60 / h_(k)
  *  - union:        k smallest of (A_k ∪ B_k) IS the KMV sketch of A ∪ B
  *                  (each side's sketch contains its side's smallest), so
  *                  the distinct estimator applies with θ = kth of union
  *  - intersection: hashes < θ form a uniform θ-probability sample of
  *                  A ∪ B, so |{h ∈ A_k ∩ B_k : h < θ}| · 2^60 / θ
  *  - Jaccard:      c / (k-1) — ratio of the two counts above
  *
  * Why this matters at 100 TB: the exact overlap of two corpus slices
  * needs a full distinct + shuffle-join of BOTH shingle sets; the sketch
  * needs one map-side-combining aggregate per slice and ships k longs per
  * group. Sketches are mergeable (union = merge-then-trim), so per-shard
  * sketches roll up without revisiting data — the same maintenance story
  * as the HLL register tables, but closed under intersection estimates,
  * which HLL is not.
  */
object Kmv {
  /** 2^60 — the hash range of [[md5_hash60]]; exactly representable as a
    * Double (mantissa 1), so `x * TwoPow60 / y` is IEEE-deterministic and
    * mirrored verbatim in the DuckDB oracle. */
  val TwoPow60: Double = 1152921504606846976.0

  /** Per-group KMV sketch: k smallest distinct hashes of `value`. */
  def sketch(df: DataFrame, groupCol: Column, value: Column, k: Int): DataFrame =
    df.groupBy(groupCol.as("grp"))
      .agg(min_k_distinct(md5_hash60(value), k).as("kmv"))

  /** Distinct-count estimate from a sketch array column. */
  def distinctEstimate(kmv: Column, k: Int): Column =
    when(size(kmv) < k, size(kmv).cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(TwoPow60) / element_at(kmv, k).cast("double"))

  /** Scalar twin of [[distinctEstimate]] for the streaming keyed state —
    * IDENTICAL IEEE operation order, so the stream's per-batch estimates
    * are bit-equal to the batch column's. */
  def estimateScalar(sketch: java.util.TreeSet[java.lang.Long], k: Int): Double =
    if (sketch.size < k) sketch.size.toDouble
    else (k - 1).toDouble * TwoPow60 / sketch.last.toDouble

  /** Corpus-slice overlap: KMV estimates of per-side distinct counts,
    * union, intersection, and Jaccard over `value` sets keyed by the
    * boolean `sideA`, with the exact answers (one distinct + one
    * presence-flag aggregate) riding along as the certificate — house
    * style of `kll_quantiles`: `within_bound` folds the estimator's
    * accuracy claim into the oracle hash.
    *
    * Accuracy claim certified: the KMV distinct/union estimator has
    * relative standard error ~ 1/sqrt(k-2) (Beyer et al. §4); the
    * intersection adds binomial sampling noise on c ~ Bin(·, j). The
    * gates use 4σ-with-slack deterministic bounds — estimates are pure
    * functions of the data, so this is a fixed theorem check, not a
    * flaky statistical test.
    */
  def overlap(df: DataFrame, sideA: Column, value: Column, k: Int): DataFrame = {
    // Both the sketch and the exact certificate consume the full (side,
    // value) projection — persist it once (bounded registry) so the
    // upstream tokenization isn't evaluated twice.
    val sides = CacheRegistry.persistBounded(df.select(sideA.as("is_a"), value.as("v")))

    val sk = sketch(sides, when(col("is_a"), "a").otherwise("b"), col("v"), k)
    val a = sk.filter(col("grp") === "a").select(col("kmv").as("akmv")) // 1 row
    val b = sk.filter(col("grp") === "b").select(col("kmv").as("bkmv")) // 1 row

    // Exact certificate: one hash-distinct then one presence-flag agg —
    // count per side, union, and intersection in a single pass.
    val exact = sides.distinct()
      .groupBy(col("v"))
      .agg(max(col("is_a")).as("in_a"), max(!col("is_a")).as("in_b"))
      .agg(
        count_if(col("in_a")).as("exact_a"),
        count_if(col("in_b")).as("exact_b"),
        count(lit(1)).as("exact_union"),
        count_if(col("in_a") && col("in_b")).as("exact_inter"))

    // 1-row × 1-row broadcasts — the allowlisted scalar-frame pattern.
    // The sketch frames are filter+agg subtrees with no usable size
    // stats, so an unhinted crossJoin degenerates to CartesianProduct;
    // the explicit hints pin the BroadcastNestedLoopJoin shape.
    val est = broadcast(a).crossJoin(broadcast(b)).crossJoin(broadcast(exact))
      .withColumn("unionk", slice(array_sort(array_union(col("akmv"), col("bkmv"))), 1, k))
      .withColumn("theta",
        when(size(col("unionk")) < k, lit(Long.MaxValue))
          .otherwise(element_at(col("unionk"), k)))
      .withColumn("c",
        size(filter(array_intersect(col("akmv"), col("bkmv")), h => h < col("theta"))))
      .withColumn("est_a", distinctEstimate(col("akmv"), k))
      .withColumn("est_b", distinctEstimate(col("bkmv"), k))
      .withColumn("est_union",
        when(size(col("unionk")) < k, size(col("unionk")).cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(TwoPow60) / col("theta").cast("double")))
      .withColumn("est_inter",
        when(size(col("unionk")) < k, col("c").cast("double"))
          .otherwise(col("c").cast("double") * lit(TwoPow60) / col("theta").cast("double")))
      // In the exact regime (union fits in k, θ = MaxValue) c IS the full
      // intersection of the merged sketch = the exact intersection, so the
      // Jaccard is c / |union|, not the estimator ratio c/(k-1) — two
      // identical small sets must report 1.0, not c/(k-1).
      .withColumn("est_jaccard",
        when(size(col("unionk")) < k,
          col("c").cast("double") / size(col("unionk")).cast("double"))
          .otherwise(col("c").cast("double") / lit((k - 1).toDouble)))

    // 4σ + slack deterministic accuracy gates (σ_rel ≈ 1/sqrt(k-2) for
    // distinct/union; intersection: 4·sqrt(j(1-j)/k) of the union, +2%
    // slack for the θ-scaling noise).
    val relBound = 4.0 / math.sqrt((k - 2).toDouble)
    est.select(
      col("est_a"), col("est_b"), col("est_union"), col("est_inter"), col("est_jaccard"),
      col("exact_a"), col("exact_b"), col("exact_union"), col("exact_inter"),
      (abs(col("est_a") - col("exact_a")) <= lit(relBound) * col("exact_a") &&
        abs(col("est_b") - col("exact_b")) <= lit(relBound) * col("exact_b") &&
        abs(col("est_union") - col("exact_union")) <= lit(relBound) * col("exact_union") &&
        abs(col("est_inter") - col("exact_inter")) <=
          (lit(4.0) * sqrt(col("est_jaccard") * (lit(1.0) - col("est_jaccard")) / lit(k.toDouble))
            + lit(0.02)) * col("exact_union"))
        .as("within_bound"))
  }
}
