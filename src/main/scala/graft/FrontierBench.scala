package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-cost FRONTIER for the ANN index family — the index-selection
  * guidance a user actually needs: one sweep over the three approximate
  * indexes' operating knobs (IVF nprobe, LSH tables × bits, PQ shortlist
  * depth) plus the adaptive tight-filter path, each row reporting
  * recall@k against the exact cosine ground truth AND cold wall seconds,
  * on the same corpus. Run at sf1 (`FrontierBench <dir> [out.json]`);
  * the brute-force exact scan rides along as the recall-1.0 cost anchor.
  *
  * Protocol matches [[ScaleBench]]: one untimed warmup per config
  * (codegen + models), then REPS timed runs COLD w.r.t. the session
  * cache registry, min taken. Recall is computed driver-side from the
  * collected (qid, cid) pairs — numQueries × k rows, not data-scale.
  */
object FrontierBench {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/tmp/graft-sf1")
    val out = args.lift(1).getOrElse("FRONTIER_LOCAL.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val numQueries = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_Q", "20").toInt
    val k = sys.env.getOrElse("SPARK_GRAFT_FRONTIER_K", "10").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, dir)

    def pairs(df: DataFrame): Set[(Long, Long)] =
      df.select(col("qid").cast("long"), col("cid").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // Ground truth once (its own cost is the brute-force anchor row).
    val truth = pairs(graft.operators.Similarity.cosineTopK(emb, numQueries, k))

    def run(name: String)(mk: => DataFrame): (String, Double, Double) = {
      val got = pairs(mk) // warmup + recall in one pass
      val recall = if (truth.isEmpty) 1.0
        else got.intersect(truth).size.toDouble / truth.size
      val ts = (1 to reps).map { _ =>
        graft.operators.CacheRegistry.clear(blocking = true)
        System.gc()
        val t0 = System.nanoTime()
        mk.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      graft.operators.CacheRegistry.clear(blocking = true)
      System.gc()
      val t = ts.min
      System.err.println(f"[frontier] $name%-28s recall=$recall%5.3f  $t%7.2f s")
      (name, recall, t)
    }

    val S = graft.operators.Similarity
    val rows = Seq(
      run("brute_exact")(S.cosineTopK(emb, numQueries, k)),
      run("ivf_nprobe1")(S.annIvf(emb, numQueries, k, nlist = 16, nprobe = 1)),
      run("ivf_nprobe2")(S.annIvf(emb, numQueries, k, nlist = 16, nprobe = 2)),
      run("ivf_nprobe4")(S.annIvf(emb, numQueries, k, nlist = 16, nprobe = 4)),
      run("ivf_nprobe8")(S.annIvf(emb, numQueries, k, nlist = 16, nprobe = 8)),
      run("lsh_4t8b")(S.annLsh(emb, numQueries, k, numTables = 4, bitsPerTable = 8)),
      run("lsh_8t8b")(S.annLsh(emb, numQueries, k, numTables = 8, bitsPerTable = 8)),
      run("lsh_8t6b")(S.annLsh(emb, numQueries, k, numTables = 8, bitsPerTable = 6)),
      run("lsh_16t8b")(S.annLsh(emb, numQueries, k, numTables = 16, bitsPerTable = 8)),
      run("pq_adc")(S.annPq(emb, numQueries, k)),
      run("pq_rerank50")(S.annPqRerank(emb, numQueries, k, shortlist = 50)),
      run("pq_rerank200")(S.annPqRerank(emb, numQueries, k, shortlist = 200)))

    // Adaptive tight-filter: recall is against the exact top-k OF THE
    // MATCHING SLICE (per the operator's contract), so it reports its own
    // recall via ivfFilteredRecallAdaptive rather than the global truth.
    val keep = emb.filter(col("vec_id") % 100 === 7).select("vec_id")
    val adaptiveRecall = S.ivfFilteredRecallAdaptive(emb, keep)
      .agg(avg(col("recall"))).head().getDouble(0)
    val tAdaptive = {
      val mk = S.annIvfFilteredAdaptive(emb, keep)
      mk.queryExecution.toRdd.count() // warmup
      val ts = (1 to reps).map { _ =>
        graft.operators.CacheRegistry.clear(blocking = true)
        System.gc()
        val t0 = System.nanoTime()
        S.annIvfFilteredAdaptive(emb, keep).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    System.err.println(f"[frontier] ivf_filtered_adaptive        recall=$adaptiveRecall%5.3f  $tAdaptive%7.2f s")
    val all = rows :+ (("ivf_filtered_adaptive", adaptiveRecall, tAdaptive))

    val js = all.map { case (n, r, t) =>
      s""""$n":{"recall":$r,"sec":$t}""" }.mkString("{", ",", "}")
    val line = s"""{"metric":"ann_frontier","dir":"$dir","num_queries":$numQueries,"k":$k,"reps":$reps,"configs":$js}"""
    println(line)
    val w = new java.io.PrintWriter(out, "UTF-8")
    try w.println(line) finally w.close()
    spark.stop()
  }
}
