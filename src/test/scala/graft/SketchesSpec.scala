package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** HLL sketch properties: partition-independence (the determinism claim),
  * register-level mergeability (the incremental-maintenance claim), and
  * bounded error at a cardinality the fixture gate doesn't cover. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is identical under any partitioning") {
    val df = (1L to 5000L).map(i => (i % 7, i * 31 % 4001)).toDF("g", "v")
    val a = Sketches.hllDistinct(df.repartition(13), Seq("g"), "v")
      .orderBy("g").collect().toSeq
    val b = Sketches.hllDistinct(df.coalesce(1), Seq("g"), "v")
      .orderBy("g").collect().toSeq
    assert(a === b)
  }

  test("register tables merge by max: sketch(a ∪ b) == merge(sketch(a), sketch(b))") {
    val left = (1L to 3000L).map(i => ("all", i)).toDF("g", "v")
    val right = (2000L to 6000L).map(i => ("all", i)).toDF("g", "v")
    val mergedRegs = Sketches.hllRegisters(left, Seq("g"), "v")
      .unionByName(Sketches.hllRegisters(right, Seq("g"), "v"))
      .groupBy("g", "__idx").agg(max(col("__r")).as("__r"))
      .orderBy("g", "__idx").collect().toSeq
    val unionRegs = Sketches.hllRegisters(left.unionByName(right), Seq("g"), "v")
      .orderBy("g", "__idx").collect().toSeq
    assert(mergedRegs === unionRegs)
  }

  test("error stays within ~5% at 50k distinct (raw-harmonic regime)") {
    val n = 50000L
    val df = (1L to n).map(i => ("k", i)).toDF("g", "v")
    val est = Sketches.hllDistinct(df, Seq("g"), "v").collect()(0).getLong(1)
    assert(math.abs(est - n).toDouble / n < 0.05, s"estimate $est for exact $n")
  }
}
