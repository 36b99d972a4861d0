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
}
