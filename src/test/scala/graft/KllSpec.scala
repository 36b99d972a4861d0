package graft

import graft.operators.Kll
import org.apache.spark.sql.functions._

/** The deterministic KLL sketch: the tracked certificate B must really
  * bound the rank error (worst-case, not w.h.p.), the estimate must be a
  * pure function of the data (partitioning-independent), and merge must
  * agree with single-stream construction up to the combined bound. */
class KllSpec extends SparkSpec {
  import spark.implicits._

  /** Single-stream reference build via the public merge path: fold values
    * through a 1-shard sketch using mergeStates on singleton states. */
  private def foldSketch(values: Seq[Double], k: Int): Kll.State = {
    val b = values.grouped(4096).map { chunk =>
      chunk.foldLeft(Kll.State(0, Seq(Seq.empty), Seq(0L), 0L)) { (s, v) =>
        Kll.mergeStates(s, Kll.State(0, Seq(Seq(v)), Seq(0L), 1L), k)
      }
    }
    b.reduceLeft((x, y) => Kll.mergeStates(x, y, k))
  }

  private def trueRankLe(values: Seq[Double], v: Double): Long =
    values.count(_ <= v).toLong

  test("certificate B bounds the rank error on adversarial streams (sorted, reverse, heavy-dup)") {
    val n = 60000
    val streams = Map(
      "sorted" -> (1 to n).map(_.toDouble),
      "reverse" -> (n to 1 by -1).map(_.toDouble),
      "heavy-dup" -> (1 to n).map(i => (i % 13).toDouble),
      "zipf-ish" -> (1 to n).map(i => math.floor(n.toDouble / i)))
    for ((name, vs) <- streams) {
      val s = foldSketch(vs, k = 256)
      val b = Kll.bound(s)
      assert(b < 0.06 * n, s"$name: certificate B=$b too loose for k=256 at n=$n")
      for (e <- Kll.estimates(s, Seq(0.01, 0.25, 0.5, 0.75, 0.99))) {
        val tr = trueRankLe(vs, e.est)
        assert(math.abs(tr - e.srank_le) <= b,
          s"$name q=${e.q}: |trueRank=$tr - sketchRank=${e.srank_le}| exceeds B=$b")
        // Selection sanity: est's TRUE rank interval [rank_lt+1, rank_le]
        // must reach the target window [target−(B+wMax), target+(B+wMax)].
        // (An interval, not a point: under heavy duplication one value
        // legitimately spans many ranks — e.g. 13 distinct values over
        // 60k rows — so distance-to-target is not a meaningful gate.)
        val wMax = 1L << (s.levels.length - 1)
        val trLt = vs.count(_ < e.est).toLong
        assert(trLt < e.target + b + wMax && tr >= e.target - b - wMax,
          s"$name q=${e.q}: rank interval [${trLt + 1}, $tr] misses target ${e.target} ± ${b + wMax}")
      }
    }
  }

  test("weight conservation: Σ level weights ≡ n at every size, odd leftovers included") {
    for (n <- Seq(1, 255, 256, 257, 4095, 10000)) {
      val s = foldSketch((1 to n).map(_.toDouble), k = 64)
      val w = (for ((buf, h) <- s.levels.zipWithIndex) yield buf.length.toLong << h).sum
      assert(w === n.toLong, s"n=$n: total weight $w")
      // estimates() asserts this too; exercise it.
      Kll.estimates(s, Seq(0.5))
    }
  }

  test("distributed sketch is bit-deterministic across partitionings and runs") {
    val df = spark.range(50000).select(
      (pmod(col("id") * 2654435761L, lit(99991L)).cast("double")).as("v"),
      col("id"))
    def ests(d: org.apache.spark.sql.DataFrame) =
      Kll.sketch(d, "v", Seq("id")).as[Kll.State]
        .collect().toSeq.map(s => Kll.estimates(s, Seq(0.1, 0.5, 0.9)))
    val a = ests(df.repartition(3))
    val b = ests(df.repartition(17, col("v")))
    val c = ests(df.orderBy(desc("id")))
    assert(a === b && b === c,
      "sketch must be a pure function of the data, not the partitioning")
  }

  test("merge agrees with the single-stream sketch within the combined certificate") {
    val xs = (1 to 30000).map(_.toDouble)
    val (l, r) = xs.splitAt(13000)
    val merged = Kll.mergeStates(foldSketch(l, 256), foldSketch(r, 256), 256)
    assert(merged.n === 30000L)
    val b = Kll.bound(merged)
    for (e <- Kll.estimates(merged, Seq(0.25, 0.5, 0.75))) {
      val tr = trueRankLe(xs, e.est)
      assert(math.abs(tr - e.srank_le) <= b, s"merged q=${e.q}: error exceeds B=$b")
    }
  }

  test("quantileGate emits exact order statistics and a passing bound check") {
    val df = spark.range(20000).select(
      (pmod(col("id") * 48271L, lit(65537L)).cast("double")).as("v"), col("id"))
    val out = Kll.quantileGate(df, "v", Seq("id"), qs = Seq(0.1, 0.5, 0.9)).collect()
    assert(out.length === 3)
    val vs = df.select("v").collect().map(_.getDouble(0)).sorted
    for (r <- out) {
      val q = r.getDouble(0)
      assert(r.getLong(2) === 20000L)
      assert(r.getLong(3) === 1L, s"q=$q must be within its certificate")
      val target = math.max(1L, math.ceil(q * 20000).toLong).toInt
      assert(r.getDouble(1) === vs(target - 1), s"q=$q exact value")
    }
  }

  test("grouped gate: per-group exact order statistics, certificates pass, partitioning-proof") {
    // Two groups with very different distributions; keys unique per row.
    val df = spark.range(30000).select(
      when(col("id") % 3 === 0, "a").otherwise("b").as("g"),
      when(col("id") % 3 === 0,
        pmod(col("id") * 48271L, lit(65537L)).cast("double"))
        .otherwise((col("id") % 97L).cast("double") * 1000.0).as("v"),
      col("id"))
    val expected = df.collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (g, rows) => g -> rows.map(_._2).sorted }
    for (parts <- Seq(1, 7)) {
      val out = Kll.quantileGateGrouped(
        df.repartition(parts), "v", "g", Seq("id"), qs = Seq(0.1, 0.5, 0.9)).collect()
      assert(out.length === 6, "2 groups x 3 quantiles")
      for (r <- out) {
        val (g, q) = (r.getString(0), r.getDouble(1))
        val vs = expected(g)
        assert(r.getLong(3) === vs.length.toLong, s"group $g n")
        assert(r.getLong(4) === 1L, s"($g, $q) must be within its certificate")
        val target = math.max(1L, math.ceil(q * vs.length).toLong).toInt
        assert(r.getDouble(2) === vs(target - 1), s"($g, $q) exact value")
      }
    }
  }

  test("grouped sketch states are bit-identical to each group's own global sketch") {
    val df = spark.range(8000).select(
      when(col("id") % 2 === 0, "x").otherwise("y").as("g"),
      pmod(col("id") * 1103L, lit(4099L)).cast("double").as("v"),
      col("id"))
    val grouped = Kll.sketchGrouped(df, "v", "g", Seq("id")).collect().toMap
    for (g <- Seq("x", "y")) {
      val solo = Kll.sketch(df.filter(col("g") === g), "v", Seq("id"))
        .as[Kll.State].collect()(0)
      assert(grouped(g).levels === solo.levels, s"group $g levels")
      assert(grouped(g).n === solo.n)
      assert(grouped(g).compactions === solo.compactions)
    }
  }
}
