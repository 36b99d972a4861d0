package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mergeable quantile sketch — the KLL compactor hierarchy
  * (Karnin, Lang & Liberty, "Optimal Quantile Approximation in Streams",
  * FOCS 2016) with two engineering choices that make it reproducible and
  * self-certifying:
  *
  *  - **md5-driven compaction decisions**: the keep-odd/keep-even bit of
  *    each compaction comes from [[graft.functions.Md5Hash60]] over
  *    (level, per-level compaction counter) — no RNG anywhere, so the
  *    sketch is a pure function of its input sequence, like the HLL/CMS
  *    tier's register constructions.
  *  - **an exact, tracked rank-error bound**: one compaction at level h
  *    (item weight 2^h) moves the weighted rank of any fixed value by at
  *    most 2^h, so B = Σ_h m_h·2^h over the m_h performed compactions is a
  *    deterministic worst-case bound on |sketchRank(v) − trueRank(v)| —
  *    not a with-high-probability statement. The sketch carries its m_h
  *    counters and reports B, and the query gates |trueRank(est) −
  *    sketchRank(est)| ≤ B against the corpus (oracle-visible).
  *
  * Simplification vs the paper: every level uses the same capacity k
  * (the Manku–Rajagopalan–Lindsay regime, B/n ≈ log₂(n/k)/k) instead of
  * KLL's geometrically-decaying capacities — the bound above is tracked
  * exactly either way, and fixed capacity keeps the compactor state a
  * plain ragged array that Spark's product encoder ships between stages.
  *
  * Distribution + determinism at scale: Spark's aggregate merge ORDER is
  * scheduling-dependent, so a naive UDAF sketch would differ run to run.
  * Instead the corpus hash-shards on the row key's md5 (shard membership
  * is data-determined), each shard folds ITS rows in (md5, value, key)
  * order inside one task after a partition-local Tungsten sort —
  * streaming insert, memory bounded by the compactor stack, never a
  * corpus-sized buffer — and the ≤ `shards` resulting sketches merge in
  * fixed shard order. Every step is a pure function of the data, so the
  * estimate is bit-identical across runs, partitionings, and cluster
  * sizes; shard count scales with the corpus (rows per shard bounded),
  * merge cost is O(shards · sketch size).
  */
object Kll {

  /** Per-level compactor capacity. B/n ≈ log₂(n/k)/k: at k = 256 and
    * n = 6×10⁵ the certified rank error is ≲ 4%. */
  val DefaultK = 256

  /** Deterministic shard fan-out for the distributed build. */
  val DefaultShards = 32

  /** A compactor stack in transit: ragged level buffers (level h items
    * weigh 2^h), per-level compaction counters (the error certificate),
    * and the exact item count. */
  final case class State(
      shard: Int, levels: Seq[Seq[Double]], compactions: Seq[Long], n: Long)

  /** One quantile's verdict, broadcast back over the corpus for the
    * true-rank check: `srank_le` is the sketch's weighted rank of `est`,
    * `target` = ⌈q·n⌉ the exact-selection rank, `bound` = B. */
  final case class Est(
      q: Double, est: Double, srank_le: Long, target: Long, bound: Long, n: Long)

  /** Mutable compactor hierarchy — partition-local only, never shipped. */
  private final class Builder(k: Int) {
    val levels = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Double])
    val compactions = scala.collection.mutable.ArrayBuffer(0L)
    var n = 0L

    def insert(v: Double): Unit = {
      levels(0) += v
      n += 1
      compactFrom(0)
    }

    /** Compact any level at/above capacity, cascading upward. The
      * keep-odd/keep-even bit is md5(level, counter) — deterministic, and
      * varying per compaction so systematic min/max bias cancels the way
      * the paper's random bit does. An odd buffer leaves its largest item
      * behind (weight must be conserved exactly: Σ weights ≡ n always). */
    private def compactFrom(start: Int): Unit = {
      var h = start
      while (h < levels.length && levels(h).length >= k) {
        val sorted = levels(h).sorted
        val even = sorted.length & ~1
        val bit = (graft.functions.Md5Hash60.hash60(
          s"kll:$h:${compactions(h)}".getBytes("UTF-8")) & 1L).toInt
        if (levels.length == h + 1) {
          levels += scala.collection.mutable.ArrayBuffer.empty[Double]
          compactions += 0L
        }
        var i = bit
        while (i < even) {
          levels(h + 1) += sorted(i)
          i += 2
        }
        levels(h).clear()
        if (even < sorted.length) levels(h) += sorted(even) // odd leftover
        compactions(h) += 1
        h += 1
      }
    }

    def state(shard: Int): State =
      State(shard, levels.map(_.toSeq).toSeq, compactions.toSeq, n)
  }

  /** The certified worst-case rank error B = Σ m_h·2^h. */
  def bound(s: State): Long =
    s.compactions.zipWithIndex.map { case (m, h) => m * (1L << h) }.sum

  /** Quantile estimates from a final state: flatten to (value, weight),
    * sort, walk cumulative weight; est(q) = the first value whose
    * cumulative weight reaches ⌈q·n⌉, `srank_le` its full weighted rank
    * (duplicates across levels included). Total weight ≡ n exactly —
    * compaction conserves weight. */
  def estimates(s: State, qs: Seq[Double]): Seq[Est] = {
    val items = (for {
      (buf, h) <- s.levels.zipWithIndex
      v <- buf
    } yield (v, 1L << h)).sortBy(_._1)
    val w = items.map(_._2).sum
    require(w == s.n, s"weight conservation broken: Σw=$w n=${s.n}")
    val b = bound(s)
    val cum = items.scanLeft(0L)(_ + _._2).tail
    qs.sorted.map { q =>
      val target = math.max(1L, math.ceil(q * s.n).toLong)
      val i = cum.indexWhere(_ >= target)
      val idx = if (i < 0) items.length - 1 else i
      val est = items(idx)._1
      var j = idx
      while (j + 1 < items.length && items(j + 1)._1 == est) j += 1
      Est(q, est, cum(j), target, b, s.n)
    }
  }

  /** Distributed deterministic build: one shuffle on the md5 shard key,
    * a partition-local (spillable) sort for the deterministic feed order,
    * streaming compactor folds, then a fixed-order merge of the ≤ `shards`
    * shard sketches on a single tiny task. Returns ONE State row. */
  def sketch(df: DataFrame, valueCol: String, keyCols: Seq[String],
             k: Int = DefaultK, shards: Int = DefaultShards): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
      col(valueCol).cast("double").as("value"),
      graft.functions.Md5Hash60.md5_hash60(
        concat_ws(":", keyCols.map(col): _*)).as("__h"))
      .withColumn("__shard", pmod(col("__h"), lit(shards.toLong)).cast("int"))
    val perShard = keyed
      .repartition(shards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__h"), col("value"))
      .select("__shard", "value")
      .as[(Int, Double)]
      .mapPartitions { it =>
        val states = scala.collection.mutable.ArrayBuffer.empty[State]
        var cur = -1
        var b: Builder = null
        it.foreach { case (shard, v) =>
          if (shard != cur) {
            if (b != null) states += b.state(cur)
            b = new Builder(k)
            cur = shard
          }
          b.insert(v)
        }
        if (b != null) states += b.state(cur)
        states.iterator
      }
    perShard
      .repartition(1)
      .mapPartitions { it =>
        val sorted = it.toSeq.sortBy(_.shard)
        if (sorted.isEmpty) Iterator.empty
        else Iterator(sorted.reduceLeft((a, c) => mergeStates(a, c, k)))
      }
      .toDF()
  }

  /** Grouped build: ONE sketch per group. Shard cells are (group, shard)
    * — each cell folds its rows deterministically exactly like [[sketch]],
    * then every group's ≤ `shards` cell sketches merge in fixed shard
    * order. This exercises mergeability the way a production pipeline
    * does: per-shard sub-sketches roll up into per-group sketches without
    * revisiting data, and the same merge would roll groups into a corpus
    * sketch. mapGroups buffers only a group's cell sketches (≤ shards ·
    * sketch size), never its rows. */
  def sketchGrouped(df: DataFrame, valueCol: String, groupCol: String,
                    keyCols: Seq[String], k: Int = DefaultK,
                    shards: Int = DefaultShards): org.apache.spark.sql.Dataset[(String, State)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(
      col(groupCol).cast("string").as("grp"),
      col(valueCol).cast("double").as("value"),
      graft.functions.Md5Hash60.md5_hash60(
        concat_ws(":", keyCols.map(col): _*)).as("__h"))
      .withColumn("__shard", pmod(col("__h"), lit(shards.toLong)).cast("int"))
    val perCell = keyed
      .repartition(col("grp"), col("__shard"))
      .sortWithinPartitions(col("grp"), col("__shard"), col("__h"), col("value"))
      .select("grp", "__shard", "value")
      .as[(String, Int, Double)]
      .mapPartitions { it =>
        val states = scala.collection.mutable.ArrayBuffer.empty[(String, State)]
        var curG: String = null
        var curS = -1
        var b: Builder = null
        it.foreach { case (g, shard, v) =>
          if (g != curG || shard != curS) {
            if (b != null) states += ((curG, b.state(curS)))
            b = new Builder(k)
            curG = g
            curS = shard
          }
          b.insert(v)
        }
        if (b != null) states += ((curG, b.state(curS)))
        states.iterator
      }
    perCell.groupByKey(_._1).mapGroups { (g, it) =>
      val sorted = it.map(_._2).toSeq.sortBy(_.shard)
      (g, sorted.reduceLeft((a, c) => mergeStates(a, c, k)))
    }
  }

  /** Per-group twin of [[quantileGate]]: for each (group, q), the exact
    * per-group order statistic (grouped distributed selection — DuckDB
    * recomputes it) and the same data-verified rank certificate. */
  def quantileGateGrouped(df: DataFrame, valueCol: String, groupCol: String,
                          keyCols: Seq[String],
                          qs: Seq[Double] = Seq(0.01, 0.25, 0.5, 0.75, 0.99),
                          k: Int = DefaultK, shards: Int = DefaultShards): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val st = CacheRegistry.persistBounded(
      sketchGrouped(df, valueCol, groupCol, keyCols, k, shards)
        .map { case (g, s) => (g, estimates(s, qs)) }
        .toDF("grp", "ests"))
    val vals = df.select(
      (col(groupCol).cast("string").as("grp") +:
        col(valueCol).cast("double").as("value") +: keyCols.map(col)): _*)
    // |groups| sketch rows — broadcast; the rank check is one map-side-
    // combining pass over the corpus, |qs| rows per (group, task).
    val checked = vals
      .join(broadcast(st), Seq("grp"))
      .select(col("grp"), explode(col("ests")).as("e"), col("value"))
      .groupBy(col("grp"), col("e.q").as("q"))
      .agg(
        sum(when(col("value") <= col("e.est"), 1L).otherwise(0L)).as("true_rank_le"),
        first(col("e.srank_le")).as("srank_le"),
        first(col("e.bound")).as("bound"),
        first(col("e.n")).as("n"))
      .select(col("grp"), col("q"), col("n"),
        when(abs(col("true_rank_le") - col("srank_le")) <= col("bound"), 1L)
          .otherwise(0L).as("within_bound"))
    val targets = st.select(col("grp").as("__g"), explode(col("ests")).as("e"))
      .select(col("__g"), col("e.q").as("__q"), col("e.target").as("target"))
    val ranked = RankUtils.groupedRowNumber(
      vals, Seq("grp"), col("value") +: keyCols.map(col), "__rank")
    val exact = ranked
      .join(broadcast(targets), col("grp") === col("__g") && col("__rank") === col("target"))
      .select(col("grp"), col("__q").as("q"), col("value").as("exact_v"))
    checked.join(exact, Seq("grp", "q"))
      .select(col("grp").as(groupCol), col("q"), col("exact_v"), col("n"), col("within_bound"))
      .orderBy(groupCol, "q")
  }

  /** Straightforward merge: concatenate level buffers, add counters, then
    * cascade-compact bottom-up with the same md5 bit rule. */
  def mergeStates(a: State, b: State, k: Int = DefaultK): State = {
    val bl = new Builder(k)
    val depth = math.max(a.levels.length, b.levels.length)
    bl.levels.clear(); bl.compactions.clear()
    (0 until depth).foreach { h =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[Double]
      if (h < a.levels.length) buf ++= a.levels(h)
      if (h < b.levels.length) buf ++= b.levels(h)
      bl.levels += buf
      bl.compactions += (if (h < a.compactions.length) a.compactions(h) else 0L) +
        (if (h < b.compactions.length) b.compactions(h) else 0L)
    }
    bl.n = a.n + b.n
    // Cascade: mirror Builder's loop over every level from the bottom.
    var h = 0
    while (h < bl.levels.length) {
      if (bl.levels(h).length >= k) {
        val sorted = bl.levels(h).sorted
        val even = sorted.length & ~1
        val bit = (graft.functions.Md5Hash60.hash60(
          s"kll:$h:${bl.compactions(h)}".getBytes("UTF-8")) & 1L).toInt
        if (bl.levels.length == h + 1) {
          bl.levels += scala.collection.mutable.ArrayBuffer.empty[Double]
          bl.compactions += 0L
        }
        var i = bit
        while (i < even) { bl.levels(h + 1) += sorted(i); i += 2 }
        bl.levels(h).clear()
        if (even < sorted.length) bl.levels(h) += sorted(even)
        bl.compactions(h) += 1
      }
      h += 1
    }
    bl.state(math.min(a.shard, b.shard))
  }

  /** The oracle-gated query: for each q, the EXACT order-statistic value
    * (distributed selection via [[RankUtils.globalRowNumber]] — DuckDB
    * recomputes it) plus `within_bound` = 1 iff the corpus-verified rank
    * of the sketch estimate sits within the certificate B of the sketch's
    * claimed rank — the KLL theorem checked against the data itself. The
    * estimate affects only `within_bound`, so a broken sketch flips the
    * hash instead of hiding. */
  def quantileGate(df: DataFrame, valueCol: String, keyCols: Seq[String],
                   qs: Seq[Double] = Seq(0.01, 0.25, 0.5, 0.75, 0.99),
                   k: Int = DefaultK, shards: Int = DefaultShards): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // The 1-row estimate frame feeds two consumers (the rank check and the
    // exact-selection targets) — persisted so the sketch builds once.
    val st = CacheRegistry.persistBounded(
      sketch(df, valueCol, keyCols, k, shards).as[State]
        .mapPartitions(it => it.map(s => Tuple1(estimates(s, qs))))
        .toDF("ests"))
    val vals = df.select(
      (col(valueCol).cast("double").as("value") +: keyCols.map(col)): _*)
    // True weighted-rank check: one pass, explode×|qs| stays in-pipeline
    // (map-side partial agg reduces to |qs| rows per task).
    val checked = vals
      .crossJoin(broadcast(st)) // 1-row estimate frame (allowlisted BNLJ)
      .select(explode(col("ests")).as("e"), col("value"))
      .groupBy(col("e.q").as("q"))
      .agg(
        sum(when(col("value") <= col("e.est"), 1L).otherwise(0L)).as("true_rank_le"),
        first(col("e.srank_le")).as("srank_le"),
        first(col("e.bound")).as("bound"),
        first(col("e.n")).as("n"))
      .select(col("q"), col("n"),
        when(abs(col("true_rank_le") - col("srank_le")) <= col("bound"), 1L)
          .otherwise(0L).as("within_bound"))
    // Exact order statistics at the same targets (DuckDB-replicable).
    val targets = st.select(explode(col("ests")).as("e"))
      .select(col("e.q").as("__q"), col("e.target").as("target"))
    val ranked = RankUtils.globalRowNumber(
      vals, col("value") +: keyCols.map(col), "__rank")
    val exact = ranked
      .join(broadcast(targets), col("__rank") === col("target"))
      .select(col("__q").as("q"), col("value").as("exact_v"))
    checked.join(exact, Seq("q"))
      .select(col("q"), col("exact_v"), col("n"), col("within_bound"))
      .orderBy("q")
  }
}
