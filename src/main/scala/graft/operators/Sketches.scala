package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed cardinality sketching — the "novel sketch" custom-operator
  * class of the design brief, composed entirely from built-in codegen'd
  * expressions + one bounded aggregation (preference (a): no custom
  * Expression needed).
  *
  * HyperLogLog (Flajolet et al. 2007), made DETERMINISTIC and therefore
  * hash-gateable against the DuckDB oracle — the same trick as the ANN /
  * BM25 families:
  *  - the element hash is md5-derived (engine-independent), 60 bits from
  *    15 hex chars, split into a p-bit register index and a 51-bit tail;
  *  - rho (leading-zero rank) comes from `length(bin(w))` — integer string
  *    length, never a float log2 whose ulp could flip a boundary;
  *  - register harmonic sums are EXACT INTEGERS: each register contributes
  *    2^(52−r) (a BIGINT shift, max total < 2^63), so the aggregation is
  *    order- and partition-independent; the single double division happens
  *    once at the end with a literal numerator mirrored textually in the
  *    oracle;
  *  - the small-range linear-counting branch rounds its ln() to 6 dp
  *    immediately (the BM25 rule: the transcendental is the only
  *    engine-sensitive step).
  *
  * Scale shape (the reason this operator exists): exact count-distinct of
  * a high-cardinality key shuffles EVERY distinct value; the sketch
  * shuffles at most `groups × 512` register rows (map-side max-combined),
  * giving ~2% error at any corpus size. Registers merge by MAX, so
  * sketches are unionable across partitions, days, or tables — the
  * incremental-maintenance property a 100 TB rollup needs (re-sketching
  * yesterday is a register-level max, not a rescan).
  */
object Sketches {

  /** Register-index bits; m = 2^p = 512 registers (~1.6% std error). */
  val HllP = 9
  val HllM: Int = 1 << HllP

  /** Register-contribution scale 2^52: r ∈ [1, 52] ⇒ 2^(52−r) stays
    * integral and the 512-register total stays below 2^63 (exact BIGINT
    * sums on both engines). */
  val HllRegScale: Long = 1L << 52

  /** alpha_m · m² · 2^52 — the estimator numerator, precomputed to ONE
    * double so the estimate is a single literal-over-integer division. */
  val HllNumerator: Double =
    (0.7213 / (1.0 + 1.079 / (1 << HllP).toDouble)) *
      (1 << HllP).toDouble * (1 << HllP).toDouble * HllRegScale.toDouble

  /** HLL register table: one row per (group, register) with the max rank —
    * the mergeable sketch state (merge = groupBy + max again).
    *
    * NULL keys are dropped up front, matching `count(DISTINCT key)` (which
    * ignores NULLs) and the streaming path (whose non-nullable encoder
    * rejects them loudly): without the filter, md5(NULL) makes a NULL-index
    * register row that inflates `__n_present` while adding NULL to the
    * harmonic sum — a silent one-register skew. The oracle SQL mirrors the
    * filter (`WHERE key IS NOT NULL`), and `null_hll_distinct` gates the
    * path with a NULL-seeded key column. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val gc = groupCols.map(col)
    // Narrow-scan spread before the per-row md5 (guide §2.5) — hash on
    // the value column (high-cardinality), no-op on wide inputs.
    SkewUtils.spreadCompute(
      df.filter(col(valueCol).isNotNull)
        .select((groupCols :+ valueCol).distinct.map(col): _*), col(valueCol))
      .select(gc :+ graft.functions.Md5Hash60
        .md5_hash60(col(valueCol).cast("string")).as("__h"): _*)
      .select(gc ++ Seq(
        expr(s"__h & ${HllM - 1}").as("__idx"),
        expr(s"shiftright(__h, $HllP)").as("__w")): _*)
      .withColumn("__rho",
        when(col("__w") === 0, lit(52)).otherwise(lit(52) - length(bin(col("__w")))))
      .groupBy(gc :+ col("__idx"): _*)
      .agg(max(col("__rho")).as("__r"))
  }

  /** Approximate distinct count of `valueCol` per `groupCols` (global when
    * empty): (groupCols..., n_hll). Deterministic — identical under any
    * partitioning, and bit-identical to the mirrored oracle SQL. */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame =
    estimateRegisterTable(hllRegisters(df, groupCols, valueCol), groupCols)

  /** The estimator over a register TABLE (groupCols..., __idx, __r) — the
    * shared tail of [[hllDistinct]] and the register-merge rollup
    * ([[hllRunningDistinct]]): exact-integer harmonic sum, one
    * literal-over-integer division, linear-counting branch with its ln
    * rounded at once (see class doc). */
  def estimateRegisterTable(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gc = groupCols.map(col)
    regs
      .groupBy(gc: _*)
      .agg(
        count(lit(1)).as("__n_present"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 52 - __r)")).as("__s_present"))
      // absent registers (never hit) each contribute 2^(52-0) = 2^52
      .withColumn("__s",
        col("__s_present") + (lit(HllM.toLong) - col("__n_present")) * lit(HllRegScale))
      .withColumn("__v", lit(HllM.toLong) - col("__n_present"))
      .withColumn("__raw", lit(HllNumerator) / col("__s").cast("double"))
      .withColumn("__est",
        when(col("__raw") <= lit(2.5 * HllM) && col("__v") > 0,
          lit(HllM.toDouble) * round(log(lit(HllM.toDouble) / col("__v").cast("double")), 6))
          .otherwise(col("__raw")))
      .select(gc :+ round(col("__est")).cast("long").as("n_hll"): _*)
  }

  /** CUMULATIVE distinct count by `dayCol` — the incremental-rollup
    * pattern the register-merge property exists for: day d's count covers
    * every day ≤ d, computed by a register-level running MAX over the
    * per-day sketch table, never by rescanning history. At 100 TB the
    * per-day register tables are the stored artifact (≤ 512 rows/day);
    * extending the rollup by one day touches yesterday's 512 registers
    * plus the new day's — a metadata-sized merge where the exact
    * recompute rereads the whole corpus prefix.
    *
    * Shape: the per-day sketch densifies to every (day, register) cell
    * via a generated sequence (|days|·512 rows — no join, no cartesian),
    * the running max windows PARTITION BY REGISTER (512 balanced
    * partitions, |days| rows each — never a corpus-sized window), absent
    * prefixes stay NULL and drop before the shared estimator tail, so a
    * day's merged register vector is exactly the vector a from-scratch
    * sketch of the prefix would build — same estimator, same answer,
    * oracle-provable.
    *
    * PRECONDITION: `dayCol`'s natural sort order must be chronological —
    * ISO 'yyyy-MM-dd' strings, DATE, or numeric epoch days all qualify;
    * ambiguous formats like 'M/d/yyyy' do NOT (the running max would merge
    * a lexical, not temporal, prefix). Callers with such a column must
    * normalize (`to_date`) before calling. */
  def hllRunningDistinct(df: DataFrame, dayCol: String, valueCol: String): DataFrame = {
    val daily = hllRegisters(df, Seq(dayCol), valueCol)
    val dense = daily.select(col(dayCol)).distinct()
      .select(col(dayCol), explode(expr(s"sequence(0, ${HllM - 1})")).as("__idx"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__idx")).orderBy(col(dayCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val merged = dense.join(daily, Seq(dayCol, "__idx"), "left_outer")
      .withColumn("__rm", max(col("__r")).over(w))
      .filter(col("__rm").isNotNull)
      .select(col(dayCol), col("__idx"), col("__rm").as("__r"))
    estimateRegisterTable(merged, Seq(dayCol))
  }

  /** Row-side register update for the STREAMING keyed-state path — the
    * same 60-bit digest ([[graft.functions.Md5Hash60.hash60]], the ONE
    * shared byte-assembly definition batch SQL also compiles to), low p
    * bits index, rho = 52 − bit-length of the 51-bit tail — so a register
    * vector folded row by row in `mapGroupsWithState` is bit-identical to
    * the batch aggregate's. regs(idx) holds max rho; 0 = never hit. */
  def updateRegisters(regs: Array[Int], value: String): Unit = {
    val h = graft.functions.Md5Hash60.hash60(value.getBytes("UTF-8"))
    val idx = (h & (HllM - 1)).toInt
    val w = h >> HllP
    val rho = if (w == 0) 52 else 52 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    if (rho > regs(idx)) regs(idx) = rho
  }

  /** Pure estimator over a register vector — the same arithmetic as
    * [[hllDistinct]]'s column pipeline (exact integer harmonic sum, one
    * literal-over-integer division, linear-counting branch with its ln
    * rounded to 6 dp), shared by the streaming path so stream state and
    * batch sketch agree exactly. */
  def estimateFromRegisters(regs: Array[Int]): Long = {
    var s = 0L
    var v = 0L
    var i = 0
    while (i < regs.length) {
      if (regs(i) == 0) v += 1
      s += 1L << (52 - regs(i))
      i += 1
    }
    val raw = HllNumerator / s.toDouble
    val est =
      if (raw <= 2.5 * HllM && v > 0)
        HllM.toDouble * BigDecimal(math.log(HllM.toDouble / v))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      else raw
    // positive, so HALF_UP ≡ Spark round()'s half-away-from-zero
    BigDecimal(est).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
  }

  /** Count-min sketch (Cormode & Muthukrishnan, "An Improved Data Stream
    * Summary: The Count-Min Sketch and its Applications") depth
    * (independent hash rows) and width (counters per row). 4×1024
    * counters ≈ overcount ≤ e·N/1024 with prob 1−e⁻⁴. */
  val CmsD = 4
  val CmsW = 1024

  /** Count-min counter table over a token column, summed into (row, idx)
    * cells — the aggregate state is AT MOST d·w rows regardless of corpus
    * size (map-side combined), which is the whole point: frequency
    * estimates for an unbounded vocabulary in 4 KB of counters, no
    * per-term shuffle. Counters are exact integer sums, so the sketch —
    * unlike a sampled frequency table — is fully deterministic and
    * mergeable by cell-wise addition.
    *
    * Row hashes come from ONE md5 per occurrence via Kirsch–Mitzenmacher
    * double hashing — idx_j = (h1 + j·h2) mod w with h1/h2 the low/high 30
    * bits of the 60-bit digest (measured: the 4-independent-md5 form spent
    * 4× the hashing for no accuracy the ε–δ bound needs). The digest is
    * the native [[graft.functions.Md5Hash60]] prefix (no hex string) and
    * binds to a lambda variable (transform over a 1-element array) so it
    * evaluates once even after CollapseProject inlining. */
  def cmsCounters(toks: DataFrame, termCol: String): DataFrame = {
    val cells = flatten(transform(
      array(graft.functions.Md5Hash60.md5_hash60(col(termCol))),
      h => transform(sequence(lit(0), lit(CmsD - 1)),
        j => struct(j.as("j"),
          ((h.bitwiseAND(lit(1073741823L)) + j.cast("long") * shiftright(h, 30))
            % lit(CmsW.toLong)).as("idx")))))
    toks.select(explode(cells).as("c"))
      .select(col("c.j").as("j"), col("c.idx").as("idx"))
      .groupBy("j", "idx").agg(count(lit(1)).as("cnt"))
  }

  /** Bloom filter (Bloom 1970, "Space/Time Trade-offs in Hash Coding with
    * Allowable Errors") default bits (m) and hash count (d). 8192 bits /
    * 3 hashes give ~1.5% false positives at 1k keys — the
    * runtime-prefilter regime. Size m ≈ −n·ln(p)/ln²2 to the BUILD-side
    * key count: an overloaded filter degrades to all-pass silently (the
    * result stays correct — the exact join removes false positives — but
    * the prefilter stops paying for itself), so callers with fact-scale
    * key sets pass explicit bits/hashes ([[bloomBuild]] params). */
  val BloomBits = 8192
  val BloomHashes = 3

  /** SQL text for the key's 60-bit base hash. UNLIKE the oracle-visible
    * sketches, bloom membership is result-INVISIBLE (the exact join removes
    * false positives, and the gate query shares the plain join's oracle),
    * so the hash needs no cross-engine reproducibility — codegen'd
    * xxhash64 instead of md5-hex parsing, which measured 0.9 s/600k rows
    * on the probe hot path. Build and probe must pass the SAME key TYPE
    * (xxhash64 hashes the physical value). */
  private def bloomHashSql(keyCol: String): String =
    s"(xxhash64($keyCol) & ${(1L << 60) - 1})"

  /** The d bit positions — Kirsch–Mitzenmacher split of the base hash,
    * as the CMS rows; array<bigint> (build side only). */
  private def bloomPositionsSql(keyCol: String, bits: Int, hashes: Int): String =
    s"""flatten(transform(
       |  array(${bloomHashSql(keyCol)}),
       |  h -> transform(sequence(0, ${hashes - 1}),
       |       j -> ((h & 1073741823) + j * shiftright(h, 30)) % $bits)))""".stripMargin

  /** Build a Bloom filter over `keys` as ONE row holding the word array —
    * declaratively: keys explode to d bit positions, positions aggregate
    * to per-word OR masks (≤ m/64 = $BloomWords rows regardless of key
    * count, map-side combined), and the words assemble into a dense array
    * via a map lookup. Broadcast the result and pre-filter a fact table
    * with [[bloomMightContain]] BEFORE an exact join — the runtime-filter
    * pattern that cuts the fact side's shuffle volume to (matches + false
    * positives) at 100 TB. Exact integer bit math end to end: the filter
    * is deterministic and its effect provably result-invisible (the exact
    * join afterwards removes false positives; the gate query shares the
    * plain join's oracle). */
  def bloomBuild(keys: DataFrame, keyCol: String,
                 bits: Int = BloomBits, hashes: Int = BloomHashes): DataFrame = {
    // bits must be word-aligned: a position p with p/64 ≥ bits/64 would fall
    // off the truncated word array, element_at would return NULL, and the
    // probe would silently drop genuinely-present keys — a false NEGATIVE,
    // the one failure mode a Bloom filter must never have.
    require(bits > 0 && bits % 64 == 0, s"bloom bits must be a positive multiple of 64, got $bits")
    require(hashes > 0, s"bloom hashes must be positive, got $hashes")
    keys.select(explode(expr(bloomPositionsSql(keyCol, bits, hashes))).as("pos"))
      .select(expr("CAST(pos div 64 AS INT)").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("mask"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("mask")))).as("mp"))
      .select(expr(
        s"transform(sequence(0, ${bits / 64 - 1}), w -> coalesce(element_at(mp, w), CAST(0 AS BIGINT)))")
        .as("bloom_words"))
  }

  /** Membership probe against the `bloom_words` column of a broadcast
    * [[bloomBuild]] row: all d bits set. False positives possible (callers
    * follow with the exact join), false negatives impossible.
    *
    * Probe shape is the FACT-side hot path, so the d checks are FLAT
    * conjuncts — not the build side's nested transforms: plain codegen'd
    * xxhash64 arithmetic and array ops, no per-position lambda dispatch. */
  def bloomMightContain(keyCol: String,
                        bits: Int = BloomBits,
                        hashes: Int = BloomHashes): org.apache.spark.sql.Column = {
    // Same word-alignment guard as bloomBuild — a mismatched or unaligned
    // bits here would index past the build side's word array (NULL lookup →
    // dropped present keys).
    require(bits > 0 && bits % 64 == 0, s"bloom bits must be a positive multiple of 64, got $bits")
    require(hashes > 0, s"bloom hashes must be positive, got $hashes")
    // Flat conjuncts, no higher-order lambda: the whole predicate stays in
    // whole-stage codegen, and xxhash64 is re-inlined per reference, which
    // is cheaper than one interpreted forall dispatch per row (measured on
    // a 600k-row probe: md5+forall 1.62 s → xxhash64+forall 1.02 s → flat
    // xxhash64 conjuncts 0.74 s, vs 0.35 s for the bare scan+join).
    val h = bloomHashSql(keyCol)
    val conds = (0 until hashes).map { j =>
      val pos = s"((($h & 1073741823) + $j * shiftright($h, 30)) % $bits)"
      s"(element_at(bloom_words, CAST($pos div 64 AS INT) + 1)" +
        s" & shiftleft(CAST(1 AS BIGINT), CAST($pos % 64 AS INT))) != 0"
    }
    expr(conds.mkString(" AND "))
  }

  /** Point-query the sketch for `terms`: estimate = min over the d cells a
    * term hashes to (classic CMS upper bound — never undercounts). The
    * probe indices are computed DRIVER-side with the same md5 construction
    * as the column expression; the ≤ d·w-row counter table broadcasts
    * under the probe frame (left-outer keeps never-hashed cells at 0). */
  def cmsEstimate(counters: DataFrame, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "terms must not be empty")
    val spark = counters.sparkSession
    import spark.implicits._
    val probes = terms.flatMap { t =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val h = java.lang.Long.parseLong(hex, 16)
      (0 until CmsD).map(j => (t, j, ((h & 1073741823L) + j * (h >> 30)) % CmsW))
    }.toDF("term", "j", "idx")
    probes
      .join(broadcast(counters), Seq("j", "idx"), "left_outer")
      .groupBy("term")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
  }

  /** Deterministic heavy hitters via the classic two-pass plan:
    * Misra–Gries candidates (bounded O(k) memory per partition, mergeable
    * — [[graft.functions.MisraGriesAgg]]), then an EXACT re-count of only
    * the ≤ k candidates, filtered to the guaranteed region
    * `exact·(k+1) > N` (integer arithmetic — no float threshold).
    *
    * Why this equals "terms with true count > N/(k+1)" EXACTLY, despite
    * the order-dependent first pass: MG guarantees every such term is in
    * the candidate set on any partitioning/merge order, and the exact
    * filter removes any below-threshold candidate that happened to
    * survive. Sound superset ∘ exact filter = deterministic set — which
    * is what lets a sketch-driven query hash-match a full-count oracle.
    *
    * 100 TB shape: pass 1 shuffles one ≤ k-entry summary per partition
    * (vs a full groupBy shuffling the whole vocabulary); pass 2 is a
    * broadcast semi-join (≤ k terms) and a groupBy whose input is already
    * reduced to candidate occurrences. The long tail never shuffles. */
  def heavyHitters(docs: DataFrame, k: Int): DataFrame = {
    val toks = CacheRegistry.persistBounded(
      SkewUtils.spreadCompute(
        docs.select(col("doc_id"), col("text")), col("doc_id"))
        .select(explode(TextAnalysis.wordsExpr).as("term")))
    val cands = toks
      .agg(graft.functions.MisraGriesAgg.misra_gries(col("term"), k).as("cand"))
      .select(explode(col("cand")).as("c"))
      .select(col("c.term").as("term"))
    val total = toks.agg(count(lit(1)).as("n"))
    toks.join(broadcast(cands), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(total))
      .filter(col("n_exact") * (k + 1) > col("n"))
      .select(col("term"), col("n_exact"),
        (col("n_exact").cast("double") / col("n").cast("double")).as("share"))
      .orderBy(col("n_exact").desc, col("term"))
  }
}
