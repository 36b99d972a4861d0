package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.BpeTokenizer
import graft.operators.BpeStore

/** One-shot measurement for the production-vocabulary BPE tokenizer
  * (PERF.md's tokens/sec row): on `sfDir`'s documents,
  *
  *   1. time the trainer alone (the incremental heap-based learner) on
  *      the same bounded sample [[BpeStore.ensure]] uses,
  *   2. time the full artifact build (train + distributed replay-encoder
  *      golden pass over the whole corpus),
  *   3. time the GREEDY codegen'd encoder over the corpus twice — cold
  *      memo, then warm — and report tokens/sec plus memo telemetry
  *      (hits/misses/wholesale clears/resident entries), the numbers the
  *      1<<17 cap's behavior at a real vocabulary is judged by,
  *   4. gate greedy == stored golden (replay) per doc — 0 mismatches or
  *      the probe aborts.
  *
  * Fresh-JVM protocol like the scale legs. Usage: runMain graft.BpeProbe
  * <sfDir> [maxMerges]. */
object BpeProbe {

  // ---- deterministic Zipfian stress corpus ------------------------------
  // The testdata documents have only ~31 distinct words, so BPE training
  // SATURATES there (~89 merges exhausts every mergeable pair) — a
  // production vocabulary is untrainable from that corpus by
  // construction. The stress corpus exists to exercise the trainer,
  // encoder, and memo at a REAL vocabulary: ~hundreds of thousands of
  // distinct words, log-uniform (Zipf-like) frequencies, fully
  // deterministic (own xorshift mix — no RNG state, same text every run).

  private def mix(x0: Long): Long = {
    var x = x0
    x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
    x * 0x2545F4914F6CDD1DL
  }

  /** Injective rank→word: base-26 letters of r, mirrored (so frequent
    * words are short, like real text, and every word has merge-rich
    * internal structure). */
  private def wordOf(r: Long): String = {
    val sb = new StringBuilder
    var x = r
    while ({ sb.append(('a' + (x % 26)).toChar); x /= 26; x > 0 }) ()
    val s = sb.toString
    s + s.reverse
  }

  private val StressRanks = 400000L
  private val WordsPerDoc = 60

  /** Doc i: 60 words, ranks drawn log-uniformly over [1, StressRanks]
    * (P(rank) ≈ 1/rank — the Zipf shape real chunk distributions have). */
  def stressDoc(i: Long): String = {
    val sb = new StringBuilder
    var s = mix(i + 0x9E3779B97F4A7C15L)
    var j = 0
    while (j < WordsPerDoc) {
      s = mix(s)
      val u = (s >>> 11).toDouble / (1L << 53).toDouble
      val r = math.max(1L, math.pow(StressRanks.toDouble, u).toLong)
      sb.append(wordOf(r)).append(' ')
      j += 1
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxMerges = args.lift(1).map(_.toInt).getOrElse(8192)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "7")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.sources.Tables.documents(spark, sfDir)
    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // 1. trainer alone, on BpeStore's exact sample discipline
    val collected = docs.select(col("doc_id"), col("text"))
      .orderBy("doc_id").limit(4000).collect()
    val sample = scala.collection.mutable.ArrayBuffer.empty[String]
    var bytes = 0L
    collected.foreach { r =>
      val t = r.getString(1)
      if (t != null && bytes < (4L << 20)) {
        sample += t
        bytes += t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
      }
    }
    val tTrain0 = System.nanoTime()
    val merges = BpeTokenizer.train(sample, maxMerges)
    val trainSec = secs(tTrain0)

    // 2. full artifact build (re-trains inside ensure + golden pass)
    val art = java.nio.file.Files.createTempDirectory("graft-bpeprobe").toString + "/art"
    val tBuild0 = System.nanoTime()
    BpeStore.ensure(docs, art, maxMerges = maxMerges)
    val buildSec = secs(tBuild0)
    val ranks = BpeStore.readRanks(spark, art)

    // 3. greedy encoder over the corpus: cold memo, then warm
    def encodePass(): (Double, Long) = {
      val t0 = System.nanoTime()
      val total = docs.select(
        sum(BpeTokenizer.bpe_count(col("text"), ranks)).as("n")).head().getLong(0)
      (secs(t0), total)
    }
    val (coldSec, totalTokens) = encodePass()
    val (h1, m1, c1, e1) = ranks.memoStats
    val (warmSec, totalWarm) = encodePass()
    val (h2, m2, c2, e2) = ranks.memoStats
    require(totalWarm == totalTokens, "memo must not change results")

    // 4. greedy == stored golden replay, per doc
    val mismatches = docs
      .select(col("doc_id"), BpeTokenizer.bpe_count(col("text"), ranks).as("n"))
      .join(spark.read.parquet(BpeStore.goldenDir(art)), "doc_id")
      .filter(col("n") =!= col("n_tokens")).count()
    require(mismatches == 0L,
      s"greedy and golden replay disagree on $mismatches docs")

    println(s"""{"metric":"bpe_probe","sf_dir":"$sfDir",""" +
      s""""max_merges":$maxMerges,"learned_merges":${merges.size},""" +
      s""""sample_bytes":$bytes,""" +
      f""""train_sec":$trainSec%.3f,"build_sec":$buildSec%.3f,""" +
      f""""encode_cold_sec":$coldSec%.3f,"encode_warm_sec":$warmSec%.3f,""" +
      s""""total_tokens":$totalTokens,""" +
      f""""tokens_per_sec_cold":${totalTokens / coldSec}%.0f,""" +
      f""""tokens_per_sec_warm":${totalTokens / warmSec}%.0f,""" +
      s""""memo_cold":{"hits":$h1,"misses":$m1,"capped":$c1,"entries":$e1},""" +
      s""""memo_warm":{"hits":${h2 - h1},"misses":${m2 - m1},"capped":${c2 - c1},"entries":$e2},""" +
      s""""golden_mismatches":$mismatches}""")

    // ---- stress leg: the same machinery at a PRODUCTION vocabulary ----
    import spark.implicits._
    val trainSample = (0L until 8000L).map(stressDoc)
    val tS0 = System.nanoTime()
    val stressMerges = BpeTokenizer.train(trainSample, maxMerges)
    val stressTrainSec = secs(tS0)
    val stressRanks = new graft.functions.BpeRanks(stressMerges)

    // greedy == replay at the big table (the equivalence the golden
    // oracle rests on), checked driver-side on held-out docs
    (8000L until 8500L).foreach { i =>
      val t = stressDoc(i)
      require(stressRanks.countTokens(t) == stressRanks.countTokensReference(t),
        s"encoders disagree at the production vocabulary on stress doc $i")
    }

    val stress = spark.range(40000).as[Long].map(stressDoc).toDF("text").persist()
    val stressBytes = stress.select(sum(length(col("text")))).head().getLong(0)
    def stressPass(): (Double, Long) = {
      val t0 = System.nanoTime()
      val total = stress.select(
        sum(BpeTokenizer.bpe_count(col("text"), stressRanks)).as("n")).head().getLong(0)
      (secs(t0), total)
    }
    val (sh0, sm0, sc0, _) = stressRanks.memoStats
    val (sColdSec, sTokens) = stressPass()
    val (sh1, sm1, sc1, se1) = stressRanks.memoStats
    val (sWarmSec, sTokensW) = stressPass()
    val (sh2, sm2, sc2, se2) = stressRanks.memoStats
    require(sTokensW == sTokens, "stress memo must not change results")
    stress.unpersist()

    println(s"""{"metric":"bpe_stress","distinct_word_space":$StressRanks,""" +
      s""""max_merges":$maxMerges,"learned_merges":${stressMerges.size},""" +
      f""""train_sec":$stressTrainSec%.3f,""" +
      s""""corpus_bytes":$stressBytes,"total_tokens":$sTokens,""" +
      f""""encode_cold_sec":$sColdSec%.3f,"encode_warm_sec":$sWarmSec%.3f,""" +
      f""""tokens_per_sec_cold":${sTokens / sColdSec}%.0f,""" +
      f""""tokens_per_sec_warm":${sTokens / sWarmSec}%.0f,""" +
      s""""memo_cold":{"hits":${sh1 - sh0},"misses":${sm1 - sm0},"capped":${sc1 - sc0},"entries":$se1},""" +
      s""""memo_warm":{"hits":${sh2 - sh1},"misses":${sm2 - sm1},"capped":${sc2 - sc1},"entries":$se2}}""")

    val p = new org.apache.hadoop.fs.Path(art).getParent
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    spark.stop()
  }
}
