package graft

import graft.functions.ZOrder.zorder_key
import org.apache.spark.sql.functions._

/** Z-order key: the fused shift-mask interleave equals the definitional
  * bit loop, the SQL surface works, and — the reason the expression
  * exists — sorting by the key bounds BOTH dimensions within every chunk,
  * where a single-column sort leaves the second dimension unbounded. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def reference(a: Long, b: Long): Long = {
    var z = 0L
    for (j <- 0 until 31)
      z |= (((a >> j) & 1L) << (2 * j)) | (((b >> j) & 1L) << (2 * j + 1))
    z
  }

  test("fused interleave equals the definitional bit loop; key never negative") {
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (123456L, 789012L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (0x12345678L, 0x0FEDCBA9L),
      // out-of-contract high bits are MASKED, not allowed to reach the
      // sign bit (a negative key would sort large-b rows first)
      (0xFFFFFFFFL, 0xFFFFFFFFL))
    val out = pairs.toDF("a", "b")
      .select(col("a"), col("b"), zorder_key(col("a"), col("b")).as("z"))
      .collect()
    out.foreach { r =>
      assert(r.getLong(2) === reference(r.getLong(0), r.getLong(1)),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
      assert(r.getLong(2) >= 0L, "z-key must be non-negative for ordering")
    }
  }

  test("zorder_key is callable from SQL") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT zorder_key(3L, 5L)").collect().head.getLong(0) === 39L)
  }

  test("z-order chunks bound BOTH dimensions; a single-dim sort leaves one unbounded") {
    // The full 64x64 grid chunked into 16 runs of 256 rows ("row groups").
    // What min/max pruning sees is each chunk's value RANGE per column: a
    // scan predicated on b skips chunks whose b-range excludes the value.
    // Sorted by `a` alone, every chunk spans the full b domain (nothing
    // prunable); sorted by the z-key, chunks are 16x16 tiles, so a point
    // predicate on EITHER dimension hits only 4 of 16 chunks.
    val pts = for (a <- 0L until 64L; b <- 0L until 64L) yield (a, b)
    def bSpans(sorted: Seq[(Long, Long)]): Seq[Long] =
      sorted.grouped(256).map { c => c.map(_._2).max - c.map(_._2).min + 1 }.toSeq
    val byZ = pts.toDF("a", "b")
      .withColumn("z", zorder_key(col("a"), col("b")))
      .orderBy("z").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val byA = pts.sortBy(identity)
    assert(bSpans(byA).forall(_ === 64L), "a-sorted chunks span the whole b domain")
    assert(bSpans(byZ).forall(_ === 16L), s"z-sorted chunks must be 16-wide in b: ${bSpans(byZ)}")
    // and the a-dimension stays bounded too (16x16 tiles, not slivers)
    assert(byZ.grouped(256).forall { c => c.map(_._1).max - c.map(_._1).min + 1 === 16L })
  }

  test("written z-ordered parquet prunes on BOTH dimensions (file min/max vs a real predicate)") {
    // The layout claim proven against ACTUAL written files, not tile math:
    // each output file's footer min/max per column is what row-group /
    // file pruning consults, so the fraction of files whose [min, max]
    // overlaps a predicate IS the scan fraction after pruning. Full
    // 128x128 (a, b) grid; each layout's file boundaries are EXPLICIT
    // bucket columns written via partitionBy from a single task — one
    // file per bucket, no sampled range-partitioner boundaries, so the
    // expected fractions are exact and the test is deterministic under
    // any suite load. File == row group here; the same stats argument
    // applies per row group inside larger files.
    val root = java.nio.file.Files.createTempDirectory("zorder").toString
    try {
      val df = spark.range(1L << 14).select(
        (col("id") % 128).as("a"),
        (col("id") / 128).cast("long").as("b")) // full grid: every (a, b) pair once
      // z layout: zk runs 0..16383; consecutive blocks of 1024 are exact
      // 32x32 tiles, so bucket = zk/1024 gives 16 tile files.
      df.withColumn("zk", zorder_key(col("a"), col("b")))
        .withColumn("zbkt", (col("zk") / 1024).cast("long"))
        .coalesce(1).sortWithinPartitions("zk").drop("zk")
        .write.partitionBy("zbkt").parquet(s"$root/byz")
      // control layout: 16 files of 8 consecutive a-values, each spanning
      // the full b domain (the grid guarantees it).
      df.withColumn("abkt", (col("a") / 8).cast("long"))
        .coalesce(1).sortWithinPartitions("a")
        .write.partitionBy("abkt").parquet(s"$root/bya")
      // fraction of files a predicate c ∈ [lo, hi] must still read
      def scanFrac(dir: String, c: String, lo: Long, hi: Long): Double = {
        val st = spark.read.parquet(dir)
          .groupBy(input_file_name()).agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
          .collect()
        st.count(r => r.getLong(1) <= hi && r.getLong(2) >= lo).toDouble / st.length
      }
      // predicate selecting 1/8 of either domain
      val (lo, hi) = (0L, 15L)
      // single-column sort: leading column prunes hard (exactly 2/16 files)…
      assert(scanFrac(s"$root/bya", "a", lo, hi) === 0.125,
        "a-sorted layout must prune a-predicates to exactly 2/16 files")
      // …but the other dimension reads EVERYTHING (the 100 TB failure mode)
      assert(scanFrac(s"$root/bya", "b", lo, hi) === 1.0,
        "a-sorted layout cannot prune b-predicates")
      // z-ordered: 32x32 tiles; [0,15] overlaps the 4 tiles in one band
      assert(scanFrac(s"$root/byz", "a", lo, hi) === 0.25,
        "z-layout must prune a-predicates to the 4 overlapping tiles")
      assert(scanFrac(s"$root/byz", "b", lo, hi) === 0.25,
        "z-layout must prune b-predicates to the 4 overlapping tiles")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
