package graft

import graft.operators.Packing

/** Sequence-packing semantics: sharded streaming concatenation with the
  * boundary-straddling approximation (a doc's chunk comes from the
  * cumulative total BEFORE it). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("single-shard packing follows the preceding-cumsum rule") {
    val docs = Seq(
      (0L, "a b c d"),          // 4 tokens, cum-before 0  -> chunk 0
      (1L, "a b c d e"),        // 5 tokens, cum-before 4  -> chunk 0
      (2L, "a b c d"),          // 4 tokens, cum-before 9  -> chunk 0 (straddles)
      (3L, "a b c d e f g h i") // 9 tokens, cum-before 13 -> chunk 1
    ).toDF("doc_id", "text")
    val out = Packing.packDocuments(docs, budget = 10, shards = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(0L) === (0L, 4L))
    assert(out(1L) === (0L, 5L))
    assert(out(2L) === (0L, 4L))
    assert(out(3L) === (1L, 9L))
  }

  test("packing is total and token-conserving on the fixture corpus") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val packed = Packing.packDocuments(docs)
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    val stats = Packing.chunkStats(docs)
    val (nDocs, tokens) = stats.collect()
      .map(r => (r.getLong(2), r.getLong(3))).reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(nDocs === docs.count())
    val directTokens = packed.collect().map(_.getLong(3)).sum
    assert(tokens === directTokens)
    // every shard starts packing at chunk offset 0
    val firstChunks = packed.collect().groupBy(_.getLong(1))
      .map { case (shard, rows) => rows.map(_.getLong(2)).min - shard * 1000000000L }
    assert(firstChunks.forall(_ === 0L))
  }

  test("totality and per-shard ordering hold for shards in {1, 8, 64}") {
    // The shard count is the scale knob (cumsum parallelism); the packing
    // invariants must be independent of it: every doc packed exactly once,
    // tokens conserved, and within a shard the preceding-cumsum rule means
    // chunk ids are non-decreasing in doc_id order.
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    val nDocs = docs.count()
    for (shards <- Seq(1, 8, 64)) {
      val packed = Packing.packDocuments(docs, budget = 512, shards = shards).collect()
      assert(packed.length === nDocs, s"shards=$shards: total")
      assert(packed.map(_.getLong(0)).distinct.length === nDocs, s"shards=$shards: unique")
      packed.groupBy(_.getLong(1)).foreach { case (_, rows) =>
        val byDoc = rows.sortBy(_.getLong(0)).map(_.getLong(2))
        assert(byDoc.zip(byDoc.tail).forall { case (a, b) => a <= b },
          s"shards=$shards: chunk ids must be non-decreasing within a shard")
      }
      // shard ids actually live in [0, shards)
      assert(packed.map(_.getLong(1)).forall(s => s >= 0 && s < shards))
    }
  }

  test("sliding windows: full coverage with stride overlap; short docs are one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens, size 4 stride 3
      (2L, "a b c")                                   // shorter than one window
    ).toDF("doc_id", "text")
    val out = Packing.slidingWindows(docs, windowSize = 4, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // starts 1, 4, 7 — the window at 7 reaches token 10, so no tail chunk
    // is needed; every token covered exactly once or in an overlap
    assert(d1.map(x => (x._3, x._4)).toSeq === Seq((1L, 4L), (4L, 4L), (7L, 4L)))
    val covered = d1.flatMap(x => x._3 until (x._3 + x._4)).toSet
    assert(covered === (1L to 10L).toSet)
    assert(out.filter(_._1 == 2L).map(x => (x._2, x._3, x._4)).toSeq === Seq((0L, 1L, 3L)))
  }

  test("auto-sharding derives the shard count from corpus size") {
    val docs = sources.Tables.documents(spark, "/root/testdata/sf0.001")
    // tiny corpus, tiny docsPerShard: derived count = ceil(n / 100)
    val n = docs.count()
    val out = Packing.packDocumentsAuto(docs, budget = 512, docsPerShard = 100, minShards = 1)
    val shardsSeen = out.select("shard").distinct().count()
    val expectedMax = (n + 99) / 100
    assert(shardsSeen >= 1 && shardsSeen <= expectedMax)
    assert(out.count() === n)
  }

  test("length batches: equal-rank buckets, fixed batch size, exact padding fraction") {
    import spark.implicits._
    // 32 docs with token counts 1..32 (doc i = i tokens)
    val docs = (1 to 32).map(i => (i.toLong, ("w " * i).trim)).toDF("doc_id", "text")
    val out = Packing.lengthBatches(docs, nBuckets = 4, batchSize = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // 32 docs / 4 buckets = 8 per bucket, 2 batches of 4 each -> 8 batches
    assert(out.size === 8)
    assert(out.keySet === (for (b <- 0L to 3L; i <- 0L to 1L) yield (b, i)).toSet)
    // bucket 0 batch 0 = token counts 1..4: max 4, sum 10, padding (16-10)/16
    assert(out((0L, 0L)) === ((4L, 4L, 10L, 6.0 / 16.0)))
    // bucket 3 batch 1 = token counts 29..32: max 32, sum 122
    assert(out((3L, 1L)) === ((4L, 32L, 122L, (128.0 - 122.0) / 128.0)))
    // adjacent-length batching: every batch spans at most batchSize ranks,
    // so padding waste is bounded by the local length spread (here <= 3)
    for (((_, _), (n, mx, sm, frac)) <- out) {
      assert(n === 4L)
      assert(mx * n - sm <= 3L * (n - 1), "batch members are adjacent lengths")
      assert(frac === (mx * n - sm).toDouble / (mx * n).toDouble)
    }
  }

  test("CDC chunks tile each document exactly; short docs are one chunk") {
    import spark.implicits._
    val words = (1 to 120).map(i => s"w${i * 37 % 101}")
    val docs = Seq((1L, words.mkString(" ")), (2L, "just two"), (3L, "a b c")).toDF("doc_id", "text")
    val chunks = Packing.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    for ((id, n) <- Seq((1L, 120L), (2L, 2L), (3L, 3L))) {
      val cs = chunks.filter(_._1 == id).sortBy(_._2)
      assert(cs.map(_._4).sum === n, s"doc $id chunks must cover every word exactly once")
      assert(cs.head._3 === 1L)
      cs.sliding(2).foreach {
        case Array(a, b) => assert(b._3 === a._3 + a._4, "chunks are contiguous")
        case _ =>
      }
    }
    assert(chunks.count(_._1 == 2L) === 1, "sub-gram docs are a single chunk")
    assert(chunks.filter(_._1 == 1L).length > 1, "a 120-word doc must split (divisor 8)")
  }

  test("CDC boundaries are content-stable: a prefix edit leaves suffix chunks' hashes intact") {
    import spark.implicits._
    val tail = (1 to 100).map(i => s"t${i * 53 % 89}")
    val a = ("lead in words before the stable tail " + tail.mkString(" "))
    val b = ("a completely different and also longer preamble now precedes " + tail.mkString(" "))
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val chunks = Packing.cdcChunks(docs).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val ha = chunks.filter(_._1 == 1L).map(_._2).toSet
    val hb = chunks.filter(_._1 == 2L).map(_._2).toSet
    val shared = ha intersect hb
    assert(shared.size >= 5,
      s"the shared 100-word tail must re-share most of its chunks, got ${shared.size}")
    // Contrast: fixed-size sliding windows share (almost) nothing under a
    // length-changing prefix edit — the property CDC exists to restore.
    val sw = Packing.slidingWindows(docs, windowSize = 16, stride = 16).collect()
      .map(r => (r.getLong(0), r.getString(4)))
    val swShared = sw.filter(_._1 == 1L).map(_._2).toSet
      .intersect(sw.filter(_._1 == 2L).map(_._2).toSet)
    assert(swShared.size < shared.size,
      "fixed-size chunking must share fewer chunks than CDC under the same edit")
  }

  test("cross-snapshot chunk diff: an edit disturbs only the touched chunks' rows") {
    import spark.implicits._
    val words = (1 to 200).map(i => s"w${i * 37 % 101}")
    val docA = words.mkString(" ")
    // Edit ONE word mid-document; everything else is byte-identical.
    val docB = words.updated(100, "EDITED").mkString(" ")
    val a = Seq((1L, docA), (2L, "shared doc stays put"), (3L, "gone in b"))
      .toDF("doc_id", "text")
    val b = Seq((1L, docB), (2L, "shared doc stays put"), (4L, "new in b"))
      .toDF("doc_id", "text")
    val out = Packing.chunkDiffSnapshots(a, b).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // doc 1: the single-word edit may disturb at most the chunks whose
    // content or boundary 3-grams include the edited word — a bounded
    // few — while every other chunk stays unchanged at its position.
    val (na, nb, unchanged, moved, added, removed) = out(1L)
    assert(na > 10, s"fixture must chunk into many pieces, got $na")
    assert(unchanged >= na - 4,
      s"a 1-word edit must leave all but a few chunks unchanged: $out")
    assert(added <= 4 && removed <= 4 && added >= 1 && removed >= 1,
      s"the touched chunks show up as added/removed: $out")
    assert(moved === 0L)
    assert(unchanged + moved + removed === na, "A-side chunks partition exactly")
    assert(unchanged + moved + added === nb, "B-side chunks partition exactly")
    // untouched doc: fully unchanged; dropped/new docs: all removed/added
    assert(out(2L)._3 === out(2L)._1 && out(2L)._5 === 0L && out(2L)._6 === 0L)
    assert(out(3L) === ((1L, 0L, 0L, 0L, 0L, 1L)), "doc only in A is all-removed")
    assert(out(4L) === ((0L, 1L, 0L, 0L, 1L, 0L)), "doc only in B is all-added")
  }

  test("cross-snapshot chunk diff: a prepended chunk shifts positions into 'moved', content intact") {
    import spark.implicits._
    val words = (1 to 200).map(i => s"p${i * 53 % 89}")
    val base = Packing.cdcChunks(Seq((1L, words.mkString(" "))).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    // Prepend exactly one full chunk's worth of words WITH its boundary:
    // re-chunking the concatenation keeps every original chunk's content
    // but shifts each chunk_idx by the number of new leading chunks.
    val prefix = (1 to 300).map(i => s"q${i * 31 % 97}")
    val a = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val b = Seq((1L, (prefix ++ words).mkString(" "))).toDF("doc_id", "text")
    val Array(row) = Packing.chunkDiffSnapshots(a, b).collect()
    val (na, nb, unchanged, moved, added) =
      (row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4), row.getLong(5))
    assert(nb > na, "the prepend must create leading chunks")
    assert(moved > 0,
      s"hash-preserved chunks at shifted positions must count as moved, got $row")
    assert(unchanged + moved >= na - 2,
      s"all but the seam chunk survive the prepend (unchanged or moved): $row")
    assert(added >= nb - na, "the new leading chunks are added content")
    assert(base.nonEmpty) // fixture sanity: the base doc did chunk
  }
}
