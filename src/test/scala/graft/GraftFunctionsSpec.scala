package graft

/** SQL-surface registration: the native expressions callable from
  * spark.sql, matching their Column-API results. */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("skill_points from SQL") {
    val r = spark.sql("SELECT skill_points(20, 'sword') AS p, skill_points(NULL, 'fishing') AS z")
      .collect().head
    assert(r.getLong(0) === 28L)
    assert(r.getLong(1) === 0L)
  }

  test("vec_dot from SQL") {
    val r = spark.sql(
      "SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d").collect().head
    assert(r.getDouble(0) === 32.0)
  }

  test("top_k from SQL as a grouped aggregate") {
    Seq(("g", 1.0, 1L), ("g", 9.0, 2L), ("g", 5.0, 3L)).toDF("g", "s", "id")
      .createOrReplaceTempView("tk")
    val r = spark.sql(
      "SELECT top_k(struct(s, id), 2) AS top FROM tk GROUP BY g").collect().head
    val top = r.getSeq[org.apache.spark.sql.Row](0).map(x => (x.getDouble(0), x.getLong(1)))
    assert(top === Seq((9.0, 2L), (5.0, 3L)))
  }

  test("misra_gries from SQL: bounded summary keeps the guaranteed heavy hitter") {
    (Seq.fill(30)("hot") ++ (1 to 40).map(i => s"t$i"))
      .toDF("term").createOrReplaceTempView("mg")
    val cands = spark.sql("SELECT misra_gries(term, 8) AS c FROM mg").collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(x => (x.getString(0), x.getLong(1)))
    assert(cands.size <= 8)
    assert(cands.head._1 === "hot", s"the 43% term must survive k=8: $cands")
  }

  test("pack_int8 / unpack_int8 from SQL round-trip") {
    val r = spark.sql(
      """SELECT unpack_int8(pack_int8(array(1.0D, -0.5D, 0.0D), 1.0D), 1.0D) AS back,
        |       length(pack_int8(array(1.0D, -0.5D, 0.0D), 1.0D)) AS n""".stripMargin)
      .collect().head
    val back = r.getSeq[Double](0)
    assert(r.getInt(1) === 3)
    assert(back.head === 1.0)
    assert(math.abs(back(1) - (-0.5)) <= 1.0 / 254 + 1e-12)
    assert(back(2) === 0.0)
  }

  test("capped_collect_longs from SQL: complete list under the cap, NULL above") {
    Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 1L), ("b", 2L), ("b", 3L), ("b", 4L))
      .toDF("g", "v").createOrReplaceTempView("cc")
    val r = spark.sql(
      "SELECT g, capped_collect_longs(v, 3) AS ids FROM cc GROUP BY g ORDER BY g").collect()
    assert(r(0).getSeq[Long](1) === Seq(1L, 2L, 3L))
    assert(r(1).isNullAt(1), "over-cap group collapses to NULL")
  }

  test("pack_int8 input types are an analysis-time contract") {
    // array<int> is implicitly cast to array<double> by the analyzer (the
    // previous behavior read int-encoded ArrayData as doubles — garbage
    // bytes at runtime); an uncastable scale fails analysis, not execution.
    val ok = spark.sql(
      "SELECT unpack_int8(pack_int8(array(1, -1, 0), 1.0D), 1.0D) AS back").collect().head
    assert(ok.getSeq[Double](0) === Seq(1.0, -1.0, 0.0))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT pack_int8(array(1.0D), array(1.0D))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("pack_int8"))
  }

  test("non-literal skill name is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT skill_points(20, concat('sw', 'ord'))").collect()
    }
    assert(e.getMessage.contains("string literal"))
  }
}
