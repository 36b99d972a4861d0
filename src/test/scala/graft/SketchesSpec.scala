package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** HLL sketch properties: partition-independence (the determinism claim),
  * register-level mergeability (the incremental-maintenance claim), and
  * bounded error at a cardinality the fixture gate doesn't cover. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is identical under any partitioning") {
    val df = (1L to 5000L).map(i => (i % 7, i * 31 % 4001)).toDF("g", "v")
    val a = Sketches.hllDistinct(df.repartition(13), Seq("g"), "v")
      .orderBy("g").collect().toSeq
    val b = Sketches.hllDistinct(df.coalesce(1), Seq("g"), "v")
      .orderBy("g").collect().toSeq
    assert(a === b)
  }

  test("register tables merge by max: sketch(a ∪ b) == merge(sketch(a), sketch(b))") {
    val left = (1L to 3000L).map(i => ("all", i)).toDF("g", "v")
    val right = (2000L to 6000L).map(i => ("all", i)).toDF("g", "v")
    val mergedRegs = Sketches.hllRegisters(left, Seq("g"), "v")
      .unionByName(Sketches.hllRegisters(right, Seq("g"), "v"))
      .groupBy("g", "__idx").agg(max(col("__r")).as("__r"))
      .orderBy("g", "__idx").collect().toSeq
    val unionRegs = Sketches.hllRegisters(left.unionByName(right), Seq("g"), "v")
      .orderBy("g", "__idx").collect().toSeq
    assert(mergedRegs === unionRegs)
  }

  test("CMS never undercounts, and is exact for terms without cell collisions") {
    val words = (1L to 2000L).map(i => s"w${i % 97}").toDF("term")
    val counters = Sketches.cmsCounters(words, "term")
    val est = Sketches.cmsEstimate(counters, Seq("w0", "w1", "w96", "missing"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = words.groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (t <- Seq("w0", "w1", "w96"))
      assert(est(t) >= exact(t), s"$t undercounted: ${est(t)} < ${exact(t)}")
    assert(est("missing") >= 0L)
    // 97 distinct terms over 4×1024 cells: collisions are possible but the
    // min over 4 independent rows must stay tight — within 2× here.
    for (t <- Seq("w0", "w96")) assert(est(t) <= 2 * exact(t))
  }

  test("register-merge rollup equals a from-scratch sketch of every day prefix") {
    // The merge-by-max property, exercised end to end: day d's merged
    // register vector must be EXACTLY the vector a fresh sketch of all
    // rows with day <= d builds — so the rollup's estimate per day equals
    // the from-scratch estimate of the prefix, not merely approximates it.
    val rows = (1L to 4000L).map { i =>
      (f"day${i % 7}%s", s"user${(i * 2654435761L) % 900}")
    }
    val df = rows.toDF("day", "uid")
    val run = Sketches.hllRunningDistinct(df, "day", "uid")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val days = rows.map(_._1).distinct.sorted
    for (d <- days) {
      val prefix = df.filter(col("day") <= d)
      val scratch = Sketches.hllDistinct(prefix, Seq.empty, "uid")
        .collect().head.getLong(0)
      assert(run(d) === scratch, s"rollup at $d must equal from-scratch prefix sketch")
    }
  }

  test("CMS overcount stays within the advertised e·N/w bound on adversarial streams") {
    // The Cormode–Muthukrishnan guarantee: est(t) ≤ true(t) + ε·N with
    // ε = e/w, failing with probability ≤ e^(-d) per query. The hash gate
    // (cms_term_counts) proves DETERMINISM; this pins ACCURACY — the
    // guarantee a capacity planner sizes w against. Streams chosen to
    // stress the two classic adversaries: (a) a heavy hitter forcing every
    // one of its cells hot, probed via RARE terms that may collide with
    // it; (b) a wide uniform vocabulary (4× more terms than cells) where
    // every cell carries multiple terms. With md5-derived indices the
    // outcome is deterministic, so a pass is a pinned regression fact,
    // not a flaky sample.
    val bound = math.E * 1.0 / Sketches.CmsW // ε·N per unit N
    def checkStream(words: Seq[String], probes: Seq[String], label: String): Unit = {
      val df = words.toDF("term")
      val n = words.size.toDouble
      val counters = Sketches.cmsCounters(df, "term")
      val est = Sketches.cmsEstimate(counters, probes)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = df.groupBy("term").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
      for (t <- probes) {
        val over = est(t) - exact(t)
        assert(over >= 0, s"[$label] $t undercounted")
        assert(over <= bound * n,
          s"[$label] $t overcount $over exceeds e·N/w = ${bound * n}")
      }
    }
    // (a) heavy hitter: one term is 80% of a 50k stream; rare probes share
    // cells with it only if a hash collides — the bound must still hold.
    val heavy = Seq.fill(40000)("zipf_head") ++ (1 to 10000).map(i => s"tail${i % 500}")
    checkStream(heavy, (0 until 20).map(i => s"tail$i") :+ "zipf_head", "heavy-hitter")
    // (b) saturated vocabulary: 16384 distinct terms over 4096 cells —
    // every cell averages 4 terms; min-over-d must still keep ≤ e·N/w.
    val wide = (1 to 32768).map(i => s"v${i % 16384}")
    checkStream(wide, (0 until 30).map(i => s"v$i"), "wide-vocab")
  }

  test("HLL estimate stays within 3 standard errors across cardinality regimes") {
    // Flajolet's guarantee: σ ≈ 1.04/√m relative (m = 512 → ~4.6%). The
    // hash gates (hll_distinct_*) prove DETERMINISM — the same registers
    // everywhere; this pins ACCURACY, the number a capacity planner sizes
    // m against, across the estimator's regimes: linear counting (most
    // registers empty), the corrected crossover (~2.5·m), and raw HLL.
    // With md5-derived register indices the outcome is deterministic, so
    // a pass is a pinned regression fact, not a flaky sample.
    val se = 1.04 / math.sqrt(Sketches.HllM.toDouble)
    for (n <- Seq(100, 1300, 20000, 100000)) {
      val df = (1 to n).map(i => s"user_${i}_x").toDF("uid")
      val est = Sketches.hllDistinct(df, Seq.empty, "uid").collect().head.getLong(0)
      val rel = math.abs(est - n.toDouble) / n
      assert(rel <= 3 * se,
        f"n=$n est=$est rel=$rel%.4f exceeds 3σ = ${3 * se}%.4f (m=${Sketches.HllM})")
    }
  }

  test("CMS counter tables merge by cell-wise addition") {
    val a = (1L to 1000L).map(i => s"t${i % 31}").toDF("term")
    val b = (1L to 500L).map(i => s"t${i % 13}").toDF("term")
    val merged = Sketches.cmsCounters(a, "term")
      .unionByName(Sketches.cmsCounters(b, "term"))
      .groupBy("j", "idx").agg(sum(col("cnt")).as("cnt"))
      .orderBy("j", "idx").collect().toSeq
    val whole = Sketches.cmsCounters(a.unionByName(b), "term")
      .orderBy("j", "idx").collect().toSeq
    assert(merged === whole)
  }

  test("bloom filter: zero false negatives, low false-positive rate, real selectivity") {
    val keys = (1L to 500L).map(k => k * 13).toDF("k")
    val bloom = broadcast(Sketches.bloomBuild(keys, "k"))
    val probes = (1L to 40000L).toDF("k")
      .crossJoin(bloom)
      .withColumn("hit", Sketches.bloomMightContain("k"))
    val hits = probes.filter(col("hit")).select("k").collect().map(_.getLong(0)).toSet
    val truth = (1L to 500L).map(_ * 13).toSet
    assert(truth.subsetOf(hits), "a bloom filter may never miss a true member")
    val fp = (hits -- truth).size.toDouble / (40000 - truth.size)
    assert(fp < 0.02, s"false-positive rate $fp too high for 500 keys in 8192 bits")
  }

  test("bloom sizing guards: unaligned bits or zero hashes are rejected up front") {
    // bits not divisible by 64 would truncate the word array and turn the
    // overflow positions into NULL lookups — silent FALSE NEGATIVES. The
    // guard makes the misuse loud at build/probe construction time.
    val keys = Seq(1L, 2L).toDF("k")
    intercept[IllegalArgumentException](Sketches.bloomBuild(keys, "k", bits = 100))
    intercept[IllegalArgumentException](Sketches.bloomBuild(keys, "k", bits = 0))
    intercept[IllegalArgumentException](Sketches.bloomBuild(keys, "k", hashes = 0))
    intercept[IllegalArgumentException](Sketches.bloomMightContain("k", bits = 100))
    intercept[IllegalArgumentException](Sketches.bloomMightContain("k", hashes = -1))
  }

  test("error stays within ~5% at 50k distinct (raw-harmonic regime)") {
    val n = 50000L
    val df = (1L to n).map(i => ("k", i)).toDF("g", "v")
    val est = Sketches.hllDistinct(df, Seq("g"), "v").collect()(0).getLong(1)
    assert(math.abs(est - n).toDouble / n < 0.05, s"estimate $est for exact $n")
  }

  // --- Misra–Gries heavy hitters ------------------------------------------

  /** Skewed stream: a few genuinely heavy terms over a big uniform tail —
    * the regime where MG actually evicts (vocab ≫ k). */
  private def skewedTerms = {
    val heavy = Seq("alpha" -> 900, "beta" -> 700, "gamma" -> 500)
      .flatMap { case (t, n) => Seq.fill(n)(t) }
    val tail = (1 to 4000).map(i => s"tail${i % 800}") // 800 distinct, 5 each
    (heavy ++ tail).zipWithIndex
      .map { case (t, i) => (t, i * 2654435761L % 6100) } // deterministic scramble
      .sortBy(_._2).map(_._1)
  }

  test("MG guarantee: every term with count·(k+1) > N survives as a candidate, any partitioning") {
    import graft.functions.MisraGriesAgg.misra_gries
    val terms = skewedTerms
    val n = terms.size
    val k = 16
    val mustSurvive = terms.groupBy(identity).collect {
      case (t, occ) if occ.size.toLong * (k + 1) > n => t
    }.toSet
    assert(mustSurvive === Set("alpha", "beta", "gamma"), s"fixture sanity: $mustSurvive")
    for (parts <- Seq(1, 7, 32)) {
      val cands = terms.toDF("term").repartition(parts)
        .agg(misra_gries(col("term"), k).as("c"))
        .select(explode(col("c")).as("c")).select("c.term")
        .collect().map(_.getString(0)).toSet
      assert(cands.size <= k, s"summary exceeded k: ${cands.size}")
      assert(mustSurvive.subsetOf(cands),
        s"parts=$parts lost a guaranteed heavy hitter: ${mustSurvive -- cands}")
    }
  }

  test("MG counters are within-N/(k+1) lower bounds on true counts") {
    import graft.functions.MisraGriesAgg.misra_gries
    val terms = skewedTerms
    val n = terms.size
    val k = 16
    val exact = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val counters = terms.toDF("term").repartition(13)
      .agg(misra_gries(col("term"), k).as("c"))
      .select(explode(col("c")).as("c")).select("c.term", "c.mg_count")
      .collect().map(r => r.getString(0) -> r.getLong(1))
    counters.foreach { case (t, c) =>
      val tc = exact(t)
      assert(c <= tc, s"$t: MG counter $c overcounts true $tc")
      assert(c >= tc - n / (k + 1), s"$t: MG counter $c below error bound for true $tc")
    }
  }

  test("heavyHitters two-pass output is exactly the guaranteed set, with exact counts") {
    val terms = skewedTerms
    val k = 16
    val docs = terms.grouped(50).map(_.mkString(" ")).toSeq.toDF("text")
      .withColumn("doc_id", monotonically_increasing_id())
    val out = Sketches.heavyHitters(docs, k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("alpha", 900L), ("beta", 700L), ("gamma", 500L)),
      s"two-pass result must be exact and thresholded: $out")
  }
}
