package graft

import graft.operators.SkewUtils

class SkewUtilsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join is row-identical to a plain join on a hot key") {
    // 10k rows of one hot key + a long tail, unique-keyed dimension side
    val left = ((1 to 10000).map(_ => (1L, "hot")) ++ (2L to 50L).map(k => (k, s"k$k")))
      .toDF("k", "payload")
    val right = (1L to 50L).map(k => (k, s"dim$k")).toDF("k", "attr")
    val plain = left.join(right, Seq("k")).groupBy("k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val salted = SkewUtils.saltedJoin(left, right, "k", buckets = 8).groupBy("k").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(salted === plain)
    assert(salted(1L) === 10000L)
  }
}
