package graft

import graft.functions.Md5Hash60.md5_hash60
import org.apache.spark.sql.functions._

/** The native 60-bit md5 prefix must equal the textual-hex SQL chain it
  * replaces, bit for bit, on every input class an operator feeds it —
  * the oracles keep the hex form, so value equality IS the contract. */
class Md5Hash60Spec extends SparkSpec {
  import spark.implicits._

  test("native value equals CAST(conv(substring(md5(s),1,15),16,10) AS BIGINT)") {
    val inputs = Seq(
      "", "a", "word gram shingle", "ÜñíçødÊ têxt ✓", "line\nbreak\ttab",
      "0", "ffffffffffffffff", " leading and trailing  ",
      (1 to 500).map(i => s"tok$i").mkString(" ")) ++
      (1 to 2000).map(i => s"shingle word $i")
    val df = inputs.toDF("s")
    val out = df.select(
        md5_hash60(col("s")).as("native"),
        expr("CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)").as("hex"))
      .collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("NULL propagates; interpreted eval equals codegen; streaming helper agrees") {
    val df = Seq(Some("x"), None).toDF("s")
    val rows = df.select(md5_hash60(col("s"))).collect()
    assert(rows.exists(_.isNullAt(0)) && rows.exists(!_.isNullAt(0)))
    // the streaming HLL register path shares the same byte assembly
    val h = graft.functions.Md5Hash60.hash60("abc".getBytes("UTF-8"))
    val viaSql = spark.sql("SELECT CAST(conv(substring(md5('abc'), 1, 15), 16, 10) AS BIGINT)")
      .collect().head.getLong(0)
    assert(h === viaSql)
  }
}
