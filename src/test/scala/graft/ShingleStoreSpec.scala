package graft

import graft.operators.{DataHygiene, Dedup, SetJoin, ShingleStore}
import org.apache.spark.sql.functions._

/** The maintained shingle table: the stored (doc_id, sh, df) artifact must
  * reproduce every recompute path exactly, rebuild only when its source
  * data changes, and survive a crash at any publish step. */
class ShingleStoreSpec extends SparkSpec {
  import spark.implicits._

  /** Docs parquet on disk (the store's freshness is fingerprinted off
    * source FILES; an in-memory frame would degrade to first-use-only). */
  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.toDF("doc_id", "text").write.mode("overwrite").parquet(dir)

  private val fixture = Seq(
    (1L, "red blue green stone tree water sun moon"),
    (2L, "red blue green stone tree water sun"),
    (3L, "moon sun water tree stone green blue red"),
    (4L, "entirely different words live in this document here"),
    (5L, "red blue green stone tree hill"),
    (6L, "entirely different words live in this document too"))

  test("stored shingles + df equal the recompute (rows and df values)") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      ShingleStore.ensure(docs, s"$root/art")
      val stored = ShingleStore.read(spark, s"$root/art")
        .select("doc_id", "sh", "df").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      val toks = Dedup.shingles(docs)
      val expect = toks.join(
          toks.groupBy("sh").agg(count(lit(1)).as("df")), Seq("sh"))
        .select("doc_id", "sh", "df").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(stored === expect)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("every FromShingles path over the store equals its recompute sibling") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      ShingleStore.ensure(docs, s"$root/art")
      val sh = ShingleStore.read(spark, s"$root/art")

      assert(Dedup.minhashPairsFromShingles(sh.select("doc_id", "sh")).collect().toSeq
        === Dedup.minhashPairs(docs).collect().toSeq, "minhash")
      assert(SetJoin.similarPairsFromShingles(sh).collect().toSeq
        === SetJoin.similarPairs(docs).collect().toSeq, "setjoin")
      val even = docs.filter(col("doc_id") % 2 === 0)
      val odd = docs.filter(col("doc_id") % 2 === 1)
      val shs = sh.select("doc_id", "sh")
      assert(DataHygiene.contaminationFromShingles(
          shs.filter(col("doc_id") % 2 === 0), shs.filter(col("doc_id") % 2 === 1),
          minCommon = 1).collect().toSeq
        === DataHygiene.contamination(even, odd, minCommon = 1).collect().toSeq,
        "contamination")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("ensure() skips rebuild for unchanged source, rebuilds on regenerated data") {
    val root = java.nio.file.Files.createTempDirectory("shstore").toString
    try {
      writeDocs(s"$root/docs", fixture)
      val docs = spark.read.parquet(s"$root/docs")
      ShingleStore.ensure(docs, s"$root/art")
      val mtime1 = new java.io.File(s"$root/art").lastModified()
      ShingleStore.ensure(docs, s"$root/art") // same fingerprint → no-op
      assert(new java.io.File(s"$root/art").lastModified() === mtime1,
        "unchanged source must not trigger a rebuild")
      Thread.sleep(1100) // ensure an mtime-visible difference
      writeDocs(s"$root/docs", fixture :+ (7L, "a brand new document arrives right now"))
      val docs2 = spark.read.parquet(s"$root/docs")
      ShingleStore.ensure(docs2, s"$root/art")
      assert(ShingleStore.read(spark, s"$root/art")
        .filter(col("doc_id") === 7L).count() > 0,
        "regenerated source data must rebuild the artifact in-process")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

}
