package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM/codegen/FileIndex startup otherwise lands on
    // whichever query happens to run first).
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // toRdd.count() materializes every output column — a plain count()
      // lets Catalyst prune the expensive expressions and times nothing.
      // One untimed warmup run first: it pays the per-query Janino codegen
      // compilation (0.5-2 s regardless of data volume), so the timed run
      // measures engine throughput, not compiler startup.
      // Failures are recorded loudly: a broken query must never show up as
      // a near-zero timing that quietly shrinks the total.
      def run(): Either[String, Long] =
        try Right(fn(spark, sfDir).queryExecution.toRdd.count())
        catch { case t: Throwable => Left(s"${t.getClass.getName}: ${t.getMessage}") }
      run() match {
        case Left(err) => name -> Left(err)
        case Right(_) =>
          val t0 = System.nanoTime()
          run() match {
            case Right(_) => name -> Right((System.nanoTime() - t0) / 1e9)
            case Left(err) => name -> Left(err)
          }
      }
    }
    def jstr(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
        .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t") + "\""
    val ok = results.collect { case (k, Right(v)) => k -> v }
    val errs = results.collect { case (k, Left(e)) => k -> e }
    errs.foreach { case (k, e) => System.err.println(s"BENCH FAILURE $k: $e") }
    val qs = ok.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    val es = errs.map { case (k, e) => jstr(k) + ":" + jstr(e) }.mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":"$sfDir"}""")
    spark.stop()
    if (errs.nonEmpty) sys.exit(1)
  }
}
