package graft

import graft.operators.QualityChecks
import graft.operators.QualityChecks.Check
import org.apache.spark.sql.functions.col

class QualityChecksSpec extends SparkSpec {
  import spark.implicits._

  test("row checks count planted violations in one pass") {
    val df = Seq(
      (1L, 10.0, 0.05),  // clean
      (2L, -5.0, 0.05),  // negative price
      (3L, 10.0, 1.5),   // bad discount
      (4L, -1.0, 2.0)    // both
    ).toDF("id", "price", "discount")
    val out = QualityChecks.rowChecks(df, Seq(
      Check("neg_price", col("price") <= 0),
      Check("bad_discount", col("discount") < 0 || col("discount") > 1)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("neg_price" -> 2L, "bad_discount" -> 2L))
  }

  test("orphan check counts dangling foreign keys") {
    val fact = Seq((1L, "a"), (2L, "b"), (99L, "orphan")).toDF("fk", "v")
    val dim = Seq(Tuple1(1L), Tuple1(2L)).toDF("k")
    val out = QualityChecks.orphanCheck("orphans", fact, "fk", dim, "k")
      .collect().head
    assert(out.getString(0) === "orphans")
    assert(out.getLong(1) === 1L)
  }

  test("fixture suite is clean (zero violations on generated data)") {
    val out = QualityChecks.lineitemSuite(
      sources.Tables.lineitem(spark, "/root/testdata/sf0.001"),
      sources.Tables.orders(spark, "/root/testdata/sf0.001"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.size === 5)
    assert(out.values.forall(_ === 0L), s"expected clean fixtures, got $out")
  }
}
