package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode features: byte length, head/tail bytes, checksum") {
    val docs = Seq((1L, "abc"), (2L, "z")).toDF("doc_id", "text")
    val f = Multimodal.decodeFeatures(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(f(0) === ((1L, 3L, 97L, 99L, (97 + 98 + 99) % 997)))
    assert(f(1) === ((2L, 1L, 122L, 122L, 122L)))
  }

  test("batching handles partitions larger than one batch") {
    val docs = (0L until 300L).map(i => (i, s"doc$i")).toDF("doc_id", "text").repartition(2)
    val f = Multimodal.decodeFeatures(docs)
    assert(f.count() === 300)
    assert(f.select("doc_id").distinct().count() === 300)
  }

  test("asset table carries binary payload + typed metadata") {
    val a = Multimodal.assets(Seq((1L, "hi")).toDF("doc_id", "text")).collect().head
    assert(a.getAs[Array[Byte]]("payload").toSeq === "hi".getBytes("UTF-8").toSeq)
    assert(a.getAs[Long]("n_bytes") === 2L)
    assert(a.getAs[String]("media_type") === "application/x-fake")
  }
}
