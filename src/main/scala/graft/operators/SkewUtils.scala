package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB design stance.
  *
  * AQE's skew-join splitting (on by default in our sessions) handles most
  * cases at runtime; explicit salting remains the tool when one join key
  * dominates so heavily that even split shuffle blocks overwhelm a task —
  * the classic hot-key fact⋈fact join.
  */
object SkewUtils {

  /** Salted inner equi-join on `key`: the left (large, skewed) side gets a
    * random salt in [0, buckets); the right side is replicated `buckets`
    * times so every (key, salt) pair finds its match. Row-identical to
    * `left.join(right, key)` for unique-keyed right sides, but the shuffle
    * spreads each hot key over `buckets` reducers.
    *
    * The salt is `pmod(hash(monotonically_increasing_id()), buckets)` —
    * deterministic per task layout, uniform, and independent of the key. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, buckets: Int): DataFrame = {
    require(buckets > 0)
    val salted = left.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val replicated = right
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    salted
      .join(replicated, Seq(key, "__salt"))
      .drop("__salt")
  }
}
