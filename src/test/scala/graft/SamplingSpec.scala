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

  test("perplexity bins: per-lang terciles, per-bin shares, NULL-scored docs excluded") {
    import org.apache.spark.sql.functions.col
    // 30 scorable docs per lang with distinct synthetic scores, plus one
    // unscorable (NULL avg_nll) doc per lang.
    val scored = (for {
      (lang, off) <- Seq(("en", 0L), ("de", 100L))
      i <- 1 to 30
    } yield (off + i, lang, Some(i.toDouble / 10))) ++
      Seq((90L, "en", None), (190L, "de", None))
    val df = scored.toDF("doc_id", "lang", "avg_nll")
    val out = Sampling.perplexityBinnedSample(df).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // per (lang, bin) keep counts: head 10/10, middle ceil(10/2)=5, tail ceil(10/10)=1
    val counts = out.groupBy(t => (t._1, t._2)).view.mapValues(_.length).toMap
    for (lang <- Seq("en", "de")) {
      assert(counts((lang, 0L)) === 10, s"head of $lang is kept whole")
      assert(counts((lang, 1L)) === 5, s"middle of $lang keeps half")
      assert(counts((lang, 2L)) === 1, s"tail of $lang keeps a tenth")
    }
    // bin boundaries follow the score ranking: every head score < every
    // middle score < every tail score within a language
    for (lang <- Seq("en", "de")) {
      val byBin = out.filter(_._1 == lang).groupBy(_._2).view.mapValues(_.map(_._4)).toMap
      assert(byBin(0L).max < byBin(1L).min, "head scores below middle")
      assert(byBin(1L).max < byBin(2L).min, "middle scores below tail")
    }
    // unscorable docs never appear
    assert(!out.exists(t => t._3 == 90L || t._3 == 190L))
    // partition-invariance: the selection is a pure function of content
    assert(Sampling.perplexityBinnedSample(df.repartition(7)).collect().toSeq
      === Sampling.perplexityBinnedSample(df.repartition(1, col("lang"))).collect().toSeq)
  }

  test("temperature mixture: quotas sum exactly to total, flatten the head, partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 80/15/5 skew: α = 0.5 must pull the head's share down and the
    // tails' up relative to proportional allocation.
    val corpus = ((1 to 80).map(i => (i.toLong, "en")) ++
      (101 to 115).map(i => (i.toLong, "de")) ++
      (201 to 205).map(i => (i.toLong, "zh")))
      .toDF("doc_id", "lang").withColumn("text", col("lang"))
    val total = 50L
    val out = Sampling.temperatureMixture(corpus, total).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val quotas = out.map(t => t._1 -> t._4).distinct.toMap
    assert(quotas.values.sum === total, s"largest remainder must hit the total exactly: $quotas")
    // Expected: w = floor(sqrt(n)·2^20) → en:√80, de:√15, zh:√5.
    val w = Map("en" -> 80, "de" -> 15, "zh" -> 5).view
      .mapValues(n => math.floor(math.sqrt(n) * 1048576).toLong).toMap
    val z = w.values.sum
    val q0 = w.view.mapValues(v => total * v / z).toMap
    assert(quotas.forall { case (l, q) => q == q0(l) || q == q0(l) + 1 })
    assert(quotas("en").toDouble / total < 0.8, "head share must flatten below proportional")
    assert(quotas("zh").toDouble / total > 0.05, "tail share must rise above proportional")
    // Each lang's picks are the hash-order prefix, capped by its size.
    assert(out.count(_._1 == "zh") === math.min(quotas("zh"), 5L))
    val repart = Sampling.temperatureMixture(corpus.repartition(7), total).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(repart.toSeq === out.toSeq, "partition-invariant")
  }

  test("budget select: greedy by quality, inclusive cumulative cut, partition-invariant") {
    import org.apache.spark.sql.functions.col
    // Quality rises with stopword share; budget 25 tokens admits the best
    // docs until the INCLUSIVE running total would exceed it.
    val docs = Seq(
      (1L, "the of and to is the of and to is"),          // 10 tokens, top quality
      (2L, "the of and junk junk junk junk junk"),        // 8 tokens, mid
      (3L, "junk junk junk junk junk junk junk"),         // 7 tokens, low
      (4L, "the the the the the the the the the the")     // 10 tokens, top-ish
    ).toDF("doc_id", "text")
    val out = Sampling.budgetSelect(docs, tokenBudget = 25).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    // Order is (quality desc, doc_id): docs 1 and 4 are all-stopwords
    // (quality equal), then 2, then 3. Cumulative: 10, 20, 28 → doc 2
    // exceeds the budget at 28; docs 3 onward can never re-enter.
    assert(out.map(_._1).toSeq === Seq(1L, 4L), s"greedy cut: ${out.toSeq}")
    assert(out.map(_._3).toSeq === Seq(10L, 20L), "inclusive running totals")
    val repart = Sampling.budgetSelect(docs.toDF.repartition(7), tokenBudget = 25)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(repart.toSeq === out.toSeq, "partition-invariant")
  }

  test("DSIR: target-like pool docs out-rank off-domain ones; unscorable excluded; partition-invariant") {
    import org.apache.spark.sql.functions.col
    // Target domain speaks vocabulary A; the pool holds 3 docs written in
    // vocabulary A, 12 written in an unrelated vocabulary, and one
    // single-word doc (unscorable: no bigram under either model).
    val vocabA = "sun moon star sky cloud rain wind storm"
    def aText(i: Int) = (0 until 10).map(j => vocabA.split(" ")((i * 3 + j) % 8)).mkString(" ")
    def bText(i: Int) = (0 until 10).map(j => s"tok${(i * 5 + j * 7) % 40}").mkString(" ")
    val rows =
      (1 to 6).map(i => (i.toLong, aText(i), "tgt")) ++        // target
      (11 to 13).map(i => (i.toLong, aText(i), "raw")) ++      // target-like pool
      (21 to 32).map(i => (i.toLong, bText(i), "raw")) ++      // off-domain pool
      Seq((40L, "alone", "raw"))                               // unscorable
    val docs = rows.toDF("doc_id", "text", "source")
    val sel = Sampling.dsirSelect(docs, col("source") === "tgt", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(!sel.map(_._1).contains(40L), "unscorable doc must never compete")
    // λ ranks the target-like docs far above the off-domain ones; with
    // k = 3 and only 3 target-like pool docs, Gumbel noise (≤ ~3.7 spread
    // on ln(−ln u)) cannot overcome the λ gap on these fixtures.
    assert(sel.map(_._1).toSet === Set(11L, 12L, 13L),
      s"importance resampling must pull the target-like docs: ${sel.toSeq}")
    val all = Sampling.dsirSelect(docs, col("source") === "tgt", k = 100).collect()
    assert(all.length === 15, "every scorable pool doc competes, unscorable excluded")
    val repart = Sampling.dsirSelect(docs.repartition(7), col("source") === "tgt", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(repart.toSeq === sel.toSeq, "partition-invariant")
  }
}
