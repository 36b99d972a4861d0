package graft

import graft.functions.Md5Hash60
import graft.functions.MinKAgg.min_k_distinct
import graft.operators.Kmv
import org.apache.spark.sql.functions._

/** KMV sketch invariants: the min-k-distinct aggregate is a pure function
  * of the input SET (dedup, order- and partitioning-independence), the
  * distinct estimator is exact below k and within its 4σ bound above it,
  * and sketch union composes (merge-then-trim = sketch of the union). */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("min_k_distinct keeps the k smallest DISTINCT values regardless of order, dups, partitioning") {
    val values = Seq(9L, 3L, 7L, 3L, 1L, 9L, 5L, 1L, 8L, 2L)
    val expected = Seq(1L, 2L, 3L, 5L) // 4 smallest distinct
    for (parts <- Seq(1, 3, 7)) {
      val got = values.toDF("v").repartition(parts)
        .agg(min_k_distinct(col("v"), 4).as("mk"))
        .collect()(0).getSeq[Long](0)
      assert(got === expected, s"parts=$parts")
    }
  }

  test("buffer holds fewer than k when the distinct domain is smaller") {
    val got = Seq(5L, 5L, 2L, 2L).toDF("v")
      .agg(min_k_distinct(col("v"), 10).as("mk"))
      .collect()(0).getSeq[Long](0)
    assert(got === Seq(2L, 5L))
  }

  test("distinct estimator: exact below k; within 4/sqrt(k-2) relative above k") {
    val k = 128
    // below k: estimate IS the count
    val small = (1 to 50).map(i => s"v$i").toDF("v")
    val sSmall = Kmv.sketch(small, lit("g"), col("v"), k)
      .select(Kmv.distinctEstimate(col("kmv"), k)).collect()(0).getDouble(0)
    assert(sSmall === 50.0)
    // above k: 20000 distinct strings, 4σ bound
    val big = (1 to 20000).map(i => s"item-$i").toDF("v")
    val est = Kmv.sketch(big, lit("g"), col("v"), k)
      .select(Kmv.distinctEstimate(col("kmv"), k)).collect()(0).getDouble(0)
    val rel = math.abs(est - 20000.0) / 20000.0
    assert(rel <= 4.0 / math.sqrt((k - 2).toDouble),
      s"est=$est rel=$rel exceeds the 4-sigma KMV bound")
  }

  test("sketch union composes: k-min of merged sketches = sketch of the union") {
    val k = 64
    val a = (1 to 5000).map(i => s"a-$i") ++ (1 to 2000).map(i => s"c-$i")
    val b = (1 to 5000).map(i => s"b-$i") ++ (1 to 2000).map(i => s"c-$i")
    def kmv(vs: Seq[String]): Seq[Long] =
      vs.toDF("v").agg(min_k_distinct(graft.functions.Md5Hash60.md5_hash60(col("v")), k))
        .collect()(0).getSeq[Long](0)
    val merged = (kmv(a) ++ kmv(b)).distinct.sorted.take(k)
    assert(merged === kmv(a ++ b), "merge-then-trim must equal the union's sketch")
  }

  test("overlap certificate: estimates within bound and exact values right on a planted overlap") {
    // A = x1..x6000 ∪ s1..s2000, B = y1..y6000 ∪ s1..s2000:
    // |A|=|B|=8000, |A∪B|=14000, |A∩B|=2000, j≈0.143
    val rows =
      (1 to 6000).map(i => (true, s"x-$i")) ++
      (1 to 2000).map(i => (true, s"s-$i")) ++
      (1 to 6000).map(i => (false, s"y-$i")) ++
      (1 to 2000).map(i => (false, s"s-$i"))
    val df = rows.toDF("a", "v")
    val r = Kmv.overlap(df, col("a"), col("v"), 256).collect()(0)
    assert(r.getAs[Long]("exact_a") === 8000L)
    assert(r.getAs[Long]("exact_b") === 8000L)
    assert(r.getAs[Long]("exact_union") === 14000L)
    assert(r.getAs[Long]("exact_inter") === 2000L)
    assert(r.getAs[Boolean]("within_bound"),
      s"certificate failed: est_union=${r.getAs[Double]("est_union")} " +
        s"est_inter=${r.getAs[Double]("est_inter")}")
  }

  test("exact regime: identical small sets report est_jaccard = 1.0, disjoint report 0.0") {
    // union < k → θ = MaxValue → c is the EXACT intersection, so the
    // Jaccard must be c/|union|, not the estimator ratio c/(k-1).
    val same = ((1 to 10).map(i => (true, s"e-$i")) ++ (1 to 10).map(i => (false, s"e-$i")))
      .toDF("a", "v")
    val rSame = Kmv.overlap(same, col("a"), col("v"), 256).collect()(0)
    assert(rSame.getAs[Double]("est_jaccard") === 1.0)
    assert(rSame.getAs[Boolean]("within_bound"))
    val disj = ((1 to 10).map(i => (true, s"p-$i")) ++ (1 to 10).map(i => (false, s"q-$i")))
      .toDF("a", "v")
    val rDisj = Kmv.overlap(disj, col("a"), col("v"), 256).collect()(0)
    assert(rDisj.getAs[Double]("est_jaccard") === 0.0)
  }

  test("md5_hash60 stays in [0, 2^60) — the estimator's uniformity domain") {
    val hs = (1 to 1000).map(i => s"probe-$i").toDF("v")
      .select(Md5Hash60.md5_hash60(col("v")).as("h"))
      .agg(min(col("h")), max(col("h"))).collect()(0)
    assert(hs.getLong(0) >= 0L)
    assert(hs.getLong(1) < Kmv.TwoPow60.toLong)
  }
}
