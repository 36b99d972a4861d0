package graft

import graft.functions.{BpeRanks, BpeTokenizer}
import graft.operators.BpeStore
import org.apache.spark.sql.functions._

/** Byte-level BPE: deterministic training, hand-derived golden encodings,
  * greedy-encoder ≡ replay-encoder equivalence (the query path vs the
  * oracle path), and the artifact round trip. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training learns the hand-derived merge sequence (deterministic, tie-broken)") {
    // "aaab" x3: pair counts (a,a)=6, (a,b)=3 -> merge1 (a,a);
    // then (aa,a)=3 ties (a,b)=3 -> lexicographically smaller (a,b);
    // then (aa,ab)=3 -> merge3; nothing mergeable remains.
    val merges = BpeTokenizer.train(Seq("aaab aaab aaab"), maxMerges = 10)
    assert(merges === Vector(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("hand-computed token counts for known strings (greedy AND replay)") {
    val ranks = new BpeRanks(Vector(("a", "a"), ("a", "b"), ("aa", "ab")))
    val cases = Seq(
      "aaab" -> 1L,   // full merge chain
      "aaa" -> 2L,    // (a,a) applies once; (aa,a) never learned
      "aab" -> 2L,    // (a,a) outranks (a,b) at the shared 'a'
      "aabab" -> 3L,  // aa + b + ab
      "b" -> 1L,
      "" -> 0L,
      "   " -> 0L,    // whitespace never tokenized
      "aa ab" -> 2L,  // two chunks, merged within each
      "a1a" -> 3L)    // digits split chunks: alpha|digit|alpha
    for ((s, n) <- cases) {
      assert(ranks.countTokens(s) === n, s"greedy '$s'")
      assert(ranks.countTokensReference(s) === n, s"replay '$s'")
    }
  }

  test("greedy encoder equals replay encoder on fuzzed unicode text under a trained table") {
    val corpus = (0 until 200).map { i =>
      val ws = Seq("the", "them", "then", "there", "other", "mother",
        "12", "123", "中文", "éé", "café", "a.b", "x,y")
      (0 until 12).map(j => ws((i * 7 + j * 3) % ws.length)).mkString(" ")
    }
    val merges = BpeTokenizer.train(corpus, maxMerges = 64)
    assert(merges.nonEmpty)
    val ranks = new BpeRanks(merges)
    val probes = corpus ++ Seq(
      "totally unseen wording préférence 456789 中文中文中文 !!!",
      "the mother of all other thens, there.",
      "ééé éé é", "....", "mixed 中the文 1a2b3c")
    probes.foreach { p =>
      assert(ranks.countTokens(p) === ranks.countTokensReference(p),
        s"encoders must agree on '$p'")
    }
  }

  test("multi-byte UTF-8 is segmented at BYTE level (no out-of-vocabulary)") {
    val ranks = new BpeRanks(Vector.empty) // no merges: every byte a token
    assert(ranks.countTokens("中") === 3L, "CJK char = 3 UTF-8 bytes")
    assert(ranks.countTokens("é") === 2L)
    assert(ranks.countTokens("ab") === 2L)
  }

  test("bpe_count expression: codegen path equals direct calls; NULL text -> NULL") {
    val merges = BpeTokenizer.train(Seq("red blue red blue red green"), 32)
    val ranks = new BpeRanks(merges)
    val df = Seq((1L, "red blue green"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        BpeTokenizer.bpe_count(col("text"), ranks).as("n")).orderBy("doc_id")
      .collect()
    assert(got(0).getLong(1) === ranks.countTokens("red blue green"))
    assert(got(1).getLong(1) === 0L)
    assert(got(2).isNullAt(1), "NULL text must count NULL, not 0")
  }

  test("BpeStore round trip: stored merges reload identically; golden equals replay counts") {
    val root = java.nio.file.Files.createTempDirectory("bpe").toString
    try {
      val docs = Seq(
        (1L, "the quick brown fox jumps over the lazy dog"),
        (2L, "the quick brown fox"),
        (3L, "pack my box with five dozen liquor jugs 12345"),
        (4L, "中文 text mixed with café and 42 numbers"))
        .toDF("doc_id", "text")
      docs.write.mode("overwrite").parquet(s"$root/docs")
      val src = spark.read.parquet(s"$root/docs")
      BpeStore.ensure(src, s"$root/art", maxMerges = 48)
      val ranks = BpeStore.readRanks(spark, s"$root/art")
      assert(ranks.merges === BpeTokenizer.train(
        src.orderBy("doc_id").collect().map(_.getString(1)).toSeq, 48),
        "stored merges must reload exactly as trained")
      val golden = spark.read.parquet(BpeStore.goldenDir(s"$root/art"))
        .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val expect = src.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), ranks.countTokensReference(r.getString(1)))).toSeq
      assert(golden === expect, "golden counts = replay encoder over the corpus")
      // and the query-path greedy encoder reproduces them
      golden.zip(expect).foreach { case ((id, g), _) =>
        val t = src.filter(col("doc_id") === id).head().getString(1)
        assert(ranks.countTokens(t) === g, s"greedy == golden for doc $id")
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }
}
