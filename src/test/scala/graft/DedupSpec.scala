package graft

import graft.operators.Dedup

/** Planted-duplicate fixtures: the driver corpus has no near-dups, so the
  * operators' detection behavior is proven here (FIXTURES.md §B edge
  * cases; exact-dup grouping, MinHash recall on a one-word edit, SimHash
  * hamming proximity, Jaccard ranking). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
  private lazy val docs = Seq(
    (0L, base),
    (1L, base),                                    // exact dup of 0
    (2L, base.replace("lazy", "sleepy")),          // near dup (1-word edit)
    (3L, "completely different text about spark catalyst optimizer rules and codegen stages working"),
    (4L, "THE  quick   brown fox jumps over the lazy dog and runs far away into the woods tonight") // ws/case dup of 0
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeper = min doc_id") {
    val groups = Dedup.exact(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(groups.length === 3)
    val big = groups.find(_._2 === 3L)
    assert(big.exists(_._3 === 0L), "dup group keeps doc 0")
  }

  test("minhash finds the exact and near dup pairs, not the unrelated doc") {
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 1L)))
    assert(pairs.contains((0L, 4L)))
    assert(pairs.contains((0L, 2L)), "one-word edit is a near dup")
    assert(!pairs.exists(p => p._1 === 3L || p._2 === 3L), "unrelated doc excluded")
  }

  test("simhash: identical docs share the signature; near dup is close; unrelated far") {
    val sig = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // doc_id -> simhash? col order: doc_id, n_words, simhash
    val bySel = Dedup.simhash(docs).select("doc_id", "simhash").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bySel(0L) === bySel(1L))
    assert(bySel(0L) === bySel(4L), "normalization makes ws/case dup identical")
    assert(java.lang.Long.bitCount(bySel(0L) ^ bySel(2L)) <= 8)
    assert(java.lang.Long.bitCount(bySel(0L) ^ bySel(3L)) > 8)
    assert(sig.nonEmpty)
  }

  test("simhash pairs surfaces the dup cluster via band join") {
    val pairs = Dedup.simhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.exists(p => p._1 === 0L && p._2 === 1L && p._3 === 0L))
    assert(pairs.exists(p => p._1 === 0L && p._2 === 2L))
  }

  test("ngram jaccard ranks the exact dup above the near dup") {
    val top = Dedup.ngramJaccardTop(docs, minCommon = 1, k = 10).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(top((0L, 1L)) === 1.0)
    assert(top((0L, 2L)) < 1.0 && top((0L, 2L)) > 0.5)
  }

  test("connected components: transitive chains collapse to the min-id keeper") {
    import spark.implicits._
    // chain 1-2, 2-3 (3 never compared to 1) + isolated pair 7-9
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("connected components: a long path converges within the iteration bound") {
    import spark.implicits._
    // path 0-1-2-...-9: min label must travel the whole diameter
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet === Set(0L))
    assert(comp.keySet === (0L to 9L).toSet)
  }

  test("dedupClusters: dup family maps to one keeper, singletons keep themselves") {
    val out = Dedup.dedupClusters(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    val m = out.map(x => x._1 -> x._2).toMap
    // docs 0/1 are exact dups (cluster keeper 0); every doc appears once
    assert(m(1L) === 0L && m(0L) === 0L)
    assert(out.count(_._3) === out.count(x => x._1 != x._2))
    assert(out.map(_._1).toSet === docs.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("ngram df-cap: a corpus-wide hot shingle contributes to neither pairs nor sizes") {
    import spark.implicits._
    // "common boiler plate" appears in ALL 4 docs (df=4 > cap=3) — it must
    // not create candidates. Docs 10/11 additionally share two informative
    // shingles; docs 12/13 share ONLY the hot shingle.
    val hotDocs = Seq(
      (10L, "alpha beta gamma delta common boiler plate"),
      (11L, "alpha beta gamma delta common boiler plate"),
      (12L, "one two three common boiler plate"),
      (13L, "four five six common boiler plate")
    ).toDF("doc_id", "text")
    val top = Dedup.ngramJaccardTop(hotDocs, minCommon = 1, k = 10, maxDocFreq = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(!top.contains((12L, 13L)), "hot-shingle-only pair must not surface")
    // 10/11 are identical docs: every surviving shingle shared. With the
    // hot shingle dropped from SIZES as well, jaccard is exactly 1.0 —
    // if sizes still counted it, jaccard would come out below 1.
    assert(top((10L, 11L)) === 1.0)
  }

  test("star connected components equal hash-to-min on random pair sets") {
    import spark.implicits._
    // deterministic pseudo-random edges over 60 nodes: mixed component
    // shapes (stars, paths, merged blobs)
    val pairs = (1 to 120).map { i =>
      val a = (i * 2654435761L) % 60
      val b = (i * 40503L + 7) % 60
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).toDF("id_a", "id_b")
    val viaHashToMin = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaStar = Dedup.connectedComponentsStar(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaStar === viaHashToMin)
  }

  test("star connected components converge on a chain deeper than hash-to-min's round budget") {
    import spark.implicits._
    // a 60-hop path: hash-to-min needs ~60 rounds (diameter), star rounds
    // contract it in a handful — run star with a budget hash-to-min would
    // blow and check exact labels.
    val chain = (0L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponentsStar(chain, maxIters = 10).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.keySet === (0L to 60L).toSet)
    assert(comp.values.toSet === Set(0L))
  }

  test("ngram doc-list aggregation uses the bounded buffer, never collect_list") {
    // The memory bound is structural: the doc-list aggregate must be the
    // capped heap (O(cap) per group regardless of group size, NULL on
    // overflow), not an unbounded collect_list that would buffer a hot
    // shingle's full corpus-wide doc list before any filter runs.
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val lp = Dedup.ngramJaccardTop(docs).queryExecution.optimizedPlan
    val aggExprs = lp.collect { case a: Aggregate => a }
      .flatMap(_.aggregateExpressions.map(_.toString))
    assert(!aggExprs.exists(_.contains("collect_list")),
      "unbounded collect_list must not appear in the ngram plan")
    assert(aggExprs.exists(_.contains("capped_collect_longs")),
      "expected the capped doc-list aggregate")
  }

  test("capped collect returns complete ascending lists under the cap, NULL above it") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1L to 250L).map(v => (if (v <= 7) "small" else "big", 251L - v))
      .toDF("g", "v").repartition(13)
    val out = df.groupBy("g")
      .agg(graft.functions.CappedCollectLongs.capped_collect(col("v"), 100).as("ids"))
      .collect().map(r => r.getString(0) -> Option(r.getSeq[Long](1))).toMap
    assert(out("small") === Some(244L to 250L), "complete and ascending under the cap")
    assert(out("big") === None, "groups above the cap collapse to NULL, not a huge array")
  }

  test("incremental minhash equals the full run restricted to batch×corpus pairs") {
    import org.apache.spark.sql.functions.col
    // Docs 0/2/4 are the corpus, 1/3/5 the batch; 1 duplicates 0, 3 nearly
    // duplicates 2, 5 is unrelated, and 2/4 are corpus-internal dups that
    // must NOT appear (incremental never emits corpus×corpus).
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "structured streaming keeps running totals fresh for every user daily"),
      (4L, "structured streaming keeps running totals fresh for every user daily"),
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (3L, "structured streaming keeps running totals fresh for every user hourly"),
      (5L, "completely different content about nothing in particular at all here now")
    ).toDF("doc_id", "text")
    val full = Dedup.minhashPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .collect { case (a, b, n, j) if a % 2 != b % 2 => // cross pairs, batch id first
        val (newId, oldId) = if (a % 2 == 1) (a, b) else (b, a)
        (newId, oldId, n, j)
      }.sortBy(p => (p._1, p._2)).toSeq
    val inc = Dedup.minhashPairsIncremental(
        Dedup.shingles(docs.filter(col("doc_id") % 2 === 0)),
        docs.filter(col("doc_id") % 2 === 1))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(inc === full, "incremental must reproduce exactly the cross-restricted full result")
    assert(inc.map(_._1).toSet.subsetOf(Set(1L, 3L, 5L)) &&
      inc.map(_._2).forall(_ % 2 == 0), "new_id from the batch, corpus_id from the corpus")
    assert(inc.exists(p => p._1 == 1L && p._2 == 0L && p._4 == 1.0), "exact dup found")
  }

  test("leak-free split: near-dup clusters never straddle the split; partition-invariant") {
    // Two planted near-dup clusters (exact + near copies) amid singletons:
    // whatever side a cluster draws, EVERY member must draw it too.
    val base1 = "the quick brown fox jumps over the lazy dog again and again today"
    val base2 = "structured streaming keeps running totals fresh for every user daily"
    val docs = (Seq(
      (1L, base1), (2L, base1), (3L, base1 + " tonight"),
      (10L, base2), (11L, base2)) ++
      (20L to 39L).map(i => (i, s"singleton document number $i about topic ${i % 7} entirely original content piece"))
    ).toDF("doc_id", "text")
    val out = Dedup.leakFreeSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byKeeper = out.groupBy(_._2)
    assert(byKeeper.forall { case (_, rows) => rows.map(_._3).distinct.length == 1 },
      "split must be constant within a cluster (structural guarantee)")
    assert(byKeeper(1L).map(_._1).toSet === Set(1L, 2L, 3L), "planted cluster 1 intact")
    assert(byKeeper(10L).map(_._1).toSet === Set(10L, 11L), "planted cluster 2 intact")
    assert(out.map(_._3).toSet.subsetOf(Set("train", "test")))
    val repart = Dedup.leakFreeSplit(docs.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(repart.toSeq === out.toSeq, "partition-invariant")
  }
}
