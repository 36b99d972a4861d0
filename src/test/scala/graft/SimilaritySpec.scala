package graft

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // 64-dim vectors: unit basis-ish patterns with a known similarity order.
  private def vec(weights: (Int, Float)*): Array[Float] = {
    val a = Array.fill(64)(0.0f)
    weights.foreach { case (i, w) => a(i) = w }
    a
  }

  private lazy val emb = Seq(
    (0L, vec(0 -> 1.0f, 1 -> 1.0f)),        // query
    (10L, vec(0 -> 1.0f, 1 -> 0.9f)),       // nearly parallel -> top1
    (11L, vec(0 -> 1.0f)),                  // cos = 1/sqrt(2) -> top2
    (12L, vec(5 -> 1.0f)),                  // orthogonal -> last
    (13L, vec(0 -> -1.0f, 1 -> -1.0f))      // opposite -> negative
  ).toDF("vec_id", "embedding")

  test("brute-force cosine top-k ranks by true similarity") {
    val r = Similarity.cosineTopK(emb, numQueries = 1, k = 4).collect()
      .map(x => (x.getLong(1), x.getLong(3)))
    assert(r.map(_._1).toSeq === Seq(10L, 11L, 12L, 13L))
    assert(r.map(_._2).toSeq === Seq(1L, 2L, 3L, 4L))
  }

  test("cosine values are correct to 6dp") {
    val m = Similarity.cosineTopK(emb, numQueries = 1, k = 4).collect()
      .map(x => x.getLong(1) -> x.getDouble(2)).toMap
    assert(math.abs(m(11L) - 1.0 / math.sqrt(2)) < 1e-6)
    assert(m(12L) === 0.0)
    assert(m(13L) === -1.0)
  }

  test("ann_lsh results are a subset of brute force with identical scores") {
    val bf = Similarity.cosineTopK(emb, numQueries = 1, k = 4).collect()
      .map(x => (x.getLong(1), x.getDouble(2))).toMap
    val lsh = Similarity.annLsh(emb, numQueries = 1, k = 4).collect()
      .map(x => (x.getLong(1), x.getDouble(2)))
    assert(lsh.nonEmpty, "identical-bucket neighbors exist")
    lsh.foreach { case (cid, cos) => assert(bf(cid) === cos) }
  }

  test("ann_lsh on the fixture corpus achieves nonzero overlap with brute force") {
    val docs = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bf = Similarity.cosineTopK(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLsh(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert((bf intersect lsh).nonEmpty)
  }

  test("LSH near-dup pairs are a subset of brute force with identical scores") {
    val docs = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bf = Similarity.embeddingNearDup(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.embeddingNearDupLsh(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(lsh.nonEmpty, "bucket-colliding near-dup pairs exist in the fixture")
    lsh.foreach { case (pair, cos) =>
      assert(bf.contains(pair), s"LSH pair $pair missing from brute force")
      assert(bf(pair) === cos, s"score mismatch for $pair")
    }
  }

  test("near-identical vectors collide in some LSH table (near-dup recall on planted dups)") {
    // A vector and a tiny perturbation of it agree on almost every
    // hyperplane sign; multi-table amplification makes a full miss
    // (different bucket in all 8 tables) essentially impossible.
    val planted = Seq(
      (0L, vec(0 -> 1.0f, 1 -> 1.0f, 2 -> 0.5f)),
      (1L, vec(0 -> 1.0f, 1 -> 1.0f, 2 -> 0.5001f)),
      (2L, vec(5 -> 1.0f, 9 -> -1.0f))
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDupLsh(planted, threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((0L, 1L)))
  }

  test("ann_ivf results are a subset of brute force with identical scores") {
    val docs = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bf = Similarity.cosineTopK(docs, numQueries = 10, k = 500).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.annIvf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.nonEmpty)
    ivf.foreach { case (qid, cid, cos) =>
      assert(bf((qid, cid)) === cos, s"IVF score for ($qid,$cid) must equal brute force")
    }
  }

  test("IVF assignment is a total partition: every vector lands in exactly one cluster") {
    val docs = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (assigned, centroids) = Similarity.ivfModel(docs)
    val n = docs.count()
    assert(assigned.count() === n)
    assert(assigned.select("vec_id").distinct().count() === n)
    assert(centroids.count() === 16)
  }

  test("int8 pack/unpack: 1 byte per dim, round-trip error within scale/254") {
    import graft.functions.VectorExprs.{pack_int8, unpack_int8}
    import org.apache.spark.sql.functions._
    val df = emb
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("scale", expr("array_max(transform(e, x -> abs(x)))"))
      .withColumn("packed", pack_int8(col("e"), col("scale")))
      .withColumn("back", unpack_int8(col("packed"), col("scale")))
    val rows = df.select("e", "scale", "packed", "back").collect()
    rows.foreach { r =>
      val e = r.getSeq[Double](0); val scale = r.getDouble(1)
      val packed = r.getAs[Array[Byte]](2); val back = r.getSeq[Double](3)
      assert(packed.length === 64, "exactly one byte per dimension")
      // max quantization error is half a step: scale/127/2
      e.zip(back).foreach { case (x, y) =>
        assert(math.abs(x - y) <= scale / 254.0 + 1e-12, s"error too large: $x vs $y")
      }
    }
  }

  test("int8-quantized top-k stays close to the exact ranking") {
    val docs = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val exact = Similarity.cosineTopK(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val quant = Similarity.cosineTopKInt8(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 64-dim int8 quantization perturbs cosines by ~1e-3: most of the top-5
    // sets must agree (exact agreement is not required — that is the point
    // of hash-checking the quantized variant separately).
    val overlap = (exact intersect quant).size.toDouble / exact.size
    assert(overlap >= 0.8, s"quantized ranking drifted too far: overlap $overlap")
  }

  test("annRecall emits one row per query with recall in [0,1] consistent with overlap") {
    val docs = sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val recall = Similarity.annRecall(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(recall.map(_._1).toSeq === (0L until 10L))
    recall.foreach { case (_, nHit, rec) =>
      assert(nHit >= 0L && nHit <= 5L)
      assert(math.abs(rec - nHit / 5.0) < 1e-12)
    }
    // cross-check one aggregate against the raw sets
    val bf = Similarity.cosineTopK(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.annLsh(docs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(recall.map(_._2).sum === (bf intersect lsh).size.toLong)
  }

  /** A PQ-friendly corpus: enough vectors to seed 16 codebook centroids,
    * with a planted near-duplicate of the query. */
  private lazy val pqEmb = {
    // Hash-based spread (sin(i·c) is near-periodic and plants accidental
    // near-dups); values in [−0.5, 0.5).
    def coord(i: Long, d: Int): Float =
      (((i * 2654435761L + d * 40503L) % 1000L + 1000L) % 1000L - 500L).toFloat / 1000f
    val rows = (0L until 40L).map(i => (i, Array.tabulate(64)(coord(i, _)))) :+ (50L, {
      val a = Array.tabulate(64)(coord(0L, _))
      a(0) = a(0) + 0.01f; a // near-dup of vec 0
    })
    rows.toDF("vec_id", "embedding")
  }

  test("PQ codes: every vector gets exactly M codes in [0, ksub)") {
    val baseQ = Similarity.annPq(pqEmb, numQueries = 1, k = 3) // force model path
    baseQ.collect() // materialize
    // model internals re-derived through the public surface: each (vec, m)
    // appears once, codes within range — checked via the ADC join's inputs
    // by rebuilding codes with the package-private model.
    import org.apache.spark.sql.functions.{col, expr}
    val withQ = pqEmb
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("q", expr("transform(e, x -> round(x * 1000000))"))
    val (codes, books) = Similarity.pqModelOn(withQ)
    val c = codes.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(c.length === 41 * Similarity.PqM, "one code per (vector, subspace)")
    assert(c.forall { case (_, m, code) => m >= 0 && m < Similarity.PqM &&
      code >= 0 && code < Similarity.PqKsub })
    assert(books.count() === Similarity.PqM * Similarity.PqKsub)
  }

  test("PQ ADC ranking is partition-invariant and finds the planted near-dup") {
    val a = Similarity.annPq(pqEmb, numQueries = 1, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    val b = Similarity.annPq(pqEmb.repartition(7), numQueries = 1, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(a === b, "ADC ranking must not depend on partitioning")
    assert(a.head._2 === 50L, s"the planted near-dup must rank first: $a")
  }

  test("exact re-rank of the ADC shortlist never lowers recall") {
    val adc = Similarity.pqRecall(pqEmb, numQueries = 1, k = 5).collect()
      .map(r => r.getDouble(2)).sum
    val rr = Similarity.pqRerankRecall(pqEmb, numQueries = 1, k = 5, shortlist = 20)
      .collect().map(r => r.getDouble(2)).sum
    assert(rr >= adc, s"re-rank recall $rr must be >= ADC recall $adc")
    // The re-ranked list is ordered by EXACT cosine, so its scores agree
    // with brute force on the same pairs.
    val bf = Similarity.cosineTopK(pqEmb, numQueries = 1, k = 40).collect()
      .map(r => (r.getLong(1), r.getDouble(2))).toMap
    Similarity.annPqRerank(pqEmb, numQueries = 1, k = 5, shortlist = 20).collect()
      .foreach(r => assert(bf(r.getLong(1)) === r.getDouble(2)))
  }

  test("filtered ANN: every neighbor satisfies the predicate; pre-filter equals probe-then-discard") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val embs = graft.sources.Tables.embeddings(spark, dir)
    val out = Similarity.annIvfFiltered(embs, labelValue = 1).collect()
    assert(out.nonEmpty)
    val label1 = embs.filter(col("label") === 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    out.foreach(r => assert(label1.contains(r.getAs[Long]("cid")),
      s"cid ${r.getAs[Long]("cid")} must carry label=1"))
    // post-filter reference: run the UNfiltered probe deep, discard
    // non-matching, re-rank — cell choice depends only on the query, so
    // the two formulations must agree on the same candidate set
    val post = Similarity.annIvf(embs, numQueries = 10, k = 1000)
      .filter(col("cid").isin(label1.toSeq: _*))
      .withColumn("rank", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("qid")
          .orderBy(col("cos_sim").desc, col("cid").asc)).cast("long"))
      .filter(col("rank") <= 5)
      .select("qid", "cid", "cos_sim", "rank")
      .orderBy("qid", "rank")
    assert(out.map(_.toSeq).toSeq === post.collect().map(_.toSeq).toSeq,
      "pre-filter and probe-then-discard must produce identical neighbors")
  }

  test("adaptive nprobe widens as the filter tightens, clamped to [minProbe, nlist]") {
    // broad filter: fixed floor; tightening: ceil(3k·nlist/m); tiny m: nlist
    assert(Similarity.adaptiveNprobe(m = 250, nlist = 16, k = 5, minProbe = 4) === 4)
    assert(Similarity.adaptiveNprobe(m = 48, nlist = 16, k = 5, minProbe = 4) === 5)
    assert(Similarity.adaptiveNprobe(m = 20, nlist = 16, k = 5, minProbe = 4) === 12)
    assert(Similarity.adaptiveNprobe(m = 5, nlist = 16, k = 5, minProbe = 4) === 16)
    assert(Similarity.adaptiveNprobe(m = 1, nlist = 16, k = 5, minProbe = 4) === 16)
  }

  test("tight-filter ANN: clamped probe width makes the search exact over the matching slice") {
    import org.apache.spark.sql.functions.col
    // 60 vectors in 3 planted direction families; the filter keeps 4 (~7%)
    val embs = (0 until 60).map { i =>
      (i.toLong, vec(i % 3 -> 1.0f, 3 + i % 7 -> (0.1f * (i % 5 + 1))))
    }.toDF("vec_id", "embedding")
    val keep = embs.filter(col("vec_id") % 15 === 2).select("vec_id")
    // m = 4 ≤ 3k → nprobe clamps to nlist → every matching vector is a
    // candidate → the gate must read EXACTLY 1.0 for every query
    val gate = Similarity.ivfFilteredRecallAdaptive(embs, keep, numQueries = 5, k = 5)
      .collect()
    assert(gate.length === 5)
    gate.foreach { r =>
      assert(r.getAs[Double]("recall") === 1.0,
        s"clamped tight-filter search must be exact over the slice: $r")
      assert(r.getAs[Long]("n_truth") === 4L || r.getAs[Long]("n_truth") === 3L,
        "truth is bounded by the matching slice (minus self)")
    }
    // and every returned neighbor satisfies the predicate
    val out = Similarity.annIvfFilteredAdaptive(embs, keep, numQueries = 5, k = 5).collect()
    val keepSet = keep.collect().map(_.getLong(0)).toSet
    out.foreach(r => assert(keepSet.contains(r.getAs[Long]("cid"))))
  }

  test("cluster-balanced sample: per-cluster cap, hash-prefix selection, partition-invariant") {
    import org.apache.spark.sql.functions.col
    // 80 vectors in 4 planted direction families → dominated clusters;
    // capping at 5 must flatten every cluster to ≤ 5 kept vectors.
    val embs = (0 until 80).map { i =>
      (i.toLong, vec(i % 4 -> 1.0f, 4 + i % 5 -> (0.05f * (i % 3 + 1))))
    }.toDF("vec_id", "embedding")
    val out = Similarity.clusterBalancedSample(embs, perCluster = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byCluster = out.groupBy(_._1)
    assert(byCluster.values.forall(_.length <= 5), "cap respected per cluster")
    byCluster.values.foreach(rows =>
      assert(rows.map(_._2).sorted.toSeq === (1L to rows.length.toLong).toSeq,
        "ranks within a cluster are a 1..n prefix"))
    assert(out.map(_._3).distinct.length === out.length, "no vector sampled twice")
    val repart = Similarity.clusterBalancedSample(embs.repartition(7), perCluster = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(repart.toSeq === out.toSeq, "partition-invariant")
  }
}
