package graft

import graft.operators.{Dedup, SetJoin}
import org.apache.spark.sql.functions._

/** Prefix-filtering completeness: the pruned join must equal the naive
  * all-pairs threshold join — exactness is the operator's whole claim. */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(docs: org.apache.spark.sql.DataFrame, t: Double) = {
    val sh = Dedup.shingles(docs)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    sh.as("a").join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("c"))
      .join(sizes.as("na"), col("id_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("id_b") === col("nb.doc_id"))
      .filter(col("c") / (col("na.n") + col("nb.n") - col("c")) >= t)
      .select(col("id_a"), col("id_b"))
  }

  test("prefix-filtered pairs equal the brute-force threshold join") {
    // Vocabulary drawn from a small pool so docs share shingles at varied
    // similarity; a planted near-dup pair must always be found.
    val words = Array("red", "blue", "green", "stone", "tree", "water", "sun", "moon")
    val docs = ((1 to 40).map { i =>
      val n = 6 + i % 9
      (i.toLong, (0 until n).map(j => words((i * 7 + j * 3) % words.length)).mkString(" "))
    } :+ (100L -> "red blue green stone tree water")
      :+ (101L -> "red blue green stone tree water sun")).toDF("doc_id", "text")
    for (t <- Seq(0.4, 0.6, 0.8)) {
      val fast = SetJoin.similarPairs(docs, t).select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val naive = brute(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast === naive, s"threshold $t")
      // Collision-audited mode: the vocabulary audit certifies the
      // 64-bit pass (no collisions here), so the result must reproduce
      // the exact join verbatim at 64-bit cost.
      val audited = SetJoin.similarPairs(docs, t, auditCollisions = true)
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(audited === naive, s"collision-audited, threshold $t")
      // The COLLISION WORLD, forced: a deliberately truncated fingerprint
      // (6 bits over a multi-hundred-token vocabulary guarantees many
      // cross-string collisions) run through the same pluggable pipeline
      // the string fallback uses. The result must STILL equal the naive
      // join — proving the fallback path (fp = the shingle string itself)
      // is unconditionally exact, and that the audit would route to it.
      val sh = Dedup.shingles(docs)
      val stamped = sh.join(sh.groupBy("sh").agg(count(lit(1)).as("df")), Seq("sh"))
      val truncFp = pmod(xxhash64(col("sh")), lit(64))
      assert(!SetJoin.fingerprintCollisions(stamped, truncFp).isEmpty,
        "the truncated fingerprint must actually collide on this corpus")
      assert(SetJoin.fingerprintCollisions(stamped, xxhash64(col("sh"))).isEmpty,
        "real xxhash64 must not collide on a test-sized vocabulary")
      val viaStrings = SetJoin.pipelineFp(stamped, t, col("sh"))
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaStrings === naive, s"string-fingerprint fallback, threshold $t")
    }
    val at06 = SetJoin.similarPairs(docs, 0.6).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at06.contains((100L, 101L)), "planted near-dup pair must be found")
  }

  test("df stamping plans no per-shingle window (hot-key straggler gate)") {
    // A count(*) over Window.partitionBy(sh) puts EVERY row of one shingle
    // into ONE task — and skewed WINDOW partitions get no AQE splitting, so
    // a boilerplate shingle at corpus scale is a straggler buffering
    // billions of rows. similarPairs instead stamps df via groupBy(sh)
    // .count + equi-join over one persisted tokenization — a shuffle AQE
    // can skew-split; this gate keeps the window form from re-entering the
    // plan silently. (A zero-shuffle broadcast-CMS df estimate was measured
    // and rejected — collision noise flattens rarest-first ordering.)
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d f")).toDF("doc_id", "text")
    val plan = SetJoin.similarPairs(docs, 0.5).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "similarPairs must not plan a window for df stamping")
  }

  test("incremental exact join equals the full join restricted to batch×corpus pairs") {
    val words = Array("red", "blue", "green", "stone", "tree", "water", "sun", "moon")
    val docs = ((1 to 30).map { i =>
      val n = 6 + i % 9
      (i.toLong, (0 until n).map(j => words((i * 7 + j * 3) % words.length)).mkString(" "))
    } :+ (100L -> "red blue green stone tree water")
      :+ (101L -> "red blue green stone tree water sun")).toDF("doc_id", "text")
    for (t <- Seq(0.4, 0.6)) {
      val full = SetJoin.similarPairs(docs, t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .collect { case (a, b, n, j) if a % 2 != b % 2 =>
          val (newId, oldId) = if (a % 2 == 1) (a, b) else (b, a)
          (newId, oldId, n, j)
        }.sortBy(p => (p._1, p._2)).toSeq
      // Corpus side as the artifact would provide it: (doc_id, sh, df)
      // with df over the CORPUS — and a second run with df over ALL docs
      // (the shared-store superset), which must not change results.
      val corpusDocs = docs.filter(col("doc_id") % 2 === 0)
      val newDocs = docs.filter(col("doc_id") % 2 === 1)
      def stamped(base: org.apache.spark.sql.DataFrame) = {
        val sh = Dedup.shingles(base)
        Dedup.shingles(corpusDocs)
          .join(sh.groupBy("sh").agg(count(lit(1)).as("df")), Seq("sh"))
      }
      for (dfSource <- Seq(corpusDocs, docs)) {
        val inc = SetJoin.similarPairsIncremental(stamped(dfSource), newDocs, t)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
        assert(inc === full, s"threshold $t, dfSource superset=${dfSource eq docs}")
      }
    }
  }

  test("IEEE boundary thresholds keep completeness (prefix slack regression)") {
    // t = 0.14, |x| = 50, y ⊂ x with 7 shingles: real J = 7/50 = 0.14 and
    // the double comparison J >= t passes, but fl(0.14·50) = 7.000…001 so
    // ceil gives 8 — without the one-token prefix slack, x's prefix
    // excluded all 7 shared shingles and the pair was silently dropped.
    val words = (0 until 60).map(i => s"w$i")
    // doc x: 52 words → 50 distinct shingles; doc y: first 9 words → 7
    val x = (1L, words.take(52).mkString(" "))
    val y = (2L, words.take(9).mkString(" "))
    val docs = Seq(x, y).toDF("doc_id", "text")
    val fast = SetJoin.similarPairs(docs, 0.14).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = brute(docs, 0.14)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.contains((1L, 2L)), "fixture must actually sit on the boundary")
    assert(fast === naive, "prefix filtering must not drop the boundary pair")
  }
}
