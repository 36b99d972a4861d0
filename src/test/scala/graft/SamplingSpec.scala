package graft

import graft.operators.Sampling

/** Mixture-construction semantics: exact per-stratum quotas, deterministic
  * epoch cycling for up-sampled strata, exclusion of unlisted strata, and
  * reproducibility across partitionings. */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  // 3 langs: "aa" has 4 docs, "bb" has 2, "cc" has 3 (no quota -> excluded)
  private lazy val docs = Seq(
    (1L, "aa"), (2L, "aa"), (3L, "aa"), (4L, "aa"),
    (5L, "bb"), (6L, "bb"),
    (7L, "cc"), (8L, "cc"), (9L, "cc")
  ).toDF("doc_id", "lang")

  private val quotas = Map("aa" -> 3L, "bb" -> 5L)

  test("exact quota per stratum; up-sampled stratum cycles with epochs") {
    val out = Sampling.mixtureSample(docs, quotas).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val byLang = out.groupBy(_._1)
    assert(byLang("aa").length === 3, "subsampled stratum hits its quota")
    assert(byLang("bb").length === 5, "up-sampled stratum hits its quota")
    assert(!byLang.contains("cc"), "stratum without a quota is excluded")
    // positions are exactly 1..quota per stratum
    assert(byLang("aa").map(_._2).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(byLang("bb").map(_._2).sorted.toSeq === (1L to 5L))
    // bb has 2 docs and quota 5: epochs 0,0,1,1,2 and position p carries
    // the doc of rank ((p-1) mod 2) + 1
    val bb = byLang("bb").sortBy(_._2)
    assert(bb.map(_._5).toSeq === Seq(0L, 0L, 1L, 1L, 2L))
    assert(bb.map(x => x._4).toSeq === Seq(1L, 2L, 1L, 2L, 1L))
    val rankToDoc = bb.filter(_._5 == 0L).map(x => x._4 -> x._3).toMap
    assert(bb.forall(x => rankToDoc(x._4) === x._3), "every epoch repeats the same doc per rank")
  }

  test("weighted sample favors heavy docs, is partition-invariant, never duplicates") {
    // 100 heavy docs (weight ~2001) vs 100 light ones (weight ~11): with
    // inclusion odds ∝ weight, a k=50 A-ES sample should be nearly all
    // heavy. Deterministic, so the exact composition is fixed — assert a
    // conservative floor and reproducibility across partitionings.
    val corpus = ((1L to 100L).map(i => (i, "x" * 2000)) ++
      (101L to 200L).map(i => (i, "y" * 10))).toDF("doc_id", "text")
    val sample = Sampling.weightedSample(corpus, k = 50).collect()
    val ids = sample.map(_.getLong(0))
    assert(ids.distinct.length === 50, "sampling is without replacement")
    val heavy = ids.count(_ <= 100L)
    assert(heavy >= 45, s"expected heavy docs to dominate, got $heavy/50")
    val repartitioned = Sampling.weightedSample(corpus.repartition(7), k = 50)
      .collect().map(_.getLong(0))
    assert(repartitioned.toSeq === ids.toSeq, "sample must not depend on partitioning")
  }

  test("mixture is invariant under input partitioning") {
    val a = Sampling.mixtureSample(docs.repartition(7), quotas).collect().toSeq
    val b = Sampling.mixtureSample(docs.coalesce(1), quotas).collect().toSeq
    assert(a === b)
  }

  test("stratified sample still yields hash-ordered per-lang prefixes after the grouped-rank rewrite") {
    val out = Sampling.stratifiedSample(docs, perStratum = 2).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.count(_._1 == "aa") === 2)
    assert(out.count(_._1 == "bb") === 2)
    assert(out.count(_._1 == "cc") === 2)
    assert(out.filter(_._1 == "aa").map(_._2).sorted.toSeq === Seq(1L, 2L))
  }
}
