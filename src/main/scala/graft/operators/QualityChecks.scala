package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (the validation layer a training-data
  * pipeline runs before anything else consumes a batch).
  *
  * Scale shape: all row-level predicates evaluate in ONE scan as
  * conditional counts inside a single hash aggregate — adding a check
  * costs one expression, never a pass. Referential integrity is one anti
  * join (broadcast when the key side is a dimension). Output is a tidy
  * (check_name, n_violations) frame a scheduler can gate on.
  */
object QualityChecks {

  /** A named row-level predicate counting its VIOLATIONS (rows where the
    * expectation does not hold). */
  final case class Check(name: String, violation: org.apache.spark.sql.Column)

  /** Count violations for row-level checks in one scan. */
  def rowChecks(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = checks.map(c => count(when(c.violation, lit(1))).as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = checks.map(c => s"'${c.name}', ${c.name}").mkString(", ")
    wide.selectExpr(
      s"stack(${checks.length}, $stackArgs) AS (check_name, n_violations)")
  }

  /** Orphaned foreign keys: rows of `fact` whose `factKey` has no match in
    * `dim.dimKey` — one anti join, no fanout. */
  def orphanCheck(name: String, fact: DataFrame, factKey: String,
                  dim: DataFrame, dimKey: String): DataFrame =
    fact
      .join(dim.select(col(dimKey)), col(factKey) === col(dimKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .select(lit(name).as("check_name"), col("n_violations"))

  /** The fixture suite: lineitem sanity + referential integrity. */
  def lineitemSuite(lineitem: DataFrame, orders: DataFrame): DataFrame =
    rowChecks(lineitem, Seq(
      Check("discount_range", col("l_discount") < 0 || col("l_discount") > 1),
      Check("negative_price", col("l_extendedprice") <= 0),
      Check("null_orderkey", col("l_orderkey").isNull),
      Check("quantity_range", col("l_quantity") < 1 || col("l_quantity") > 50)))
      .unionByName(orphanCheck("orphan_lineitems", lineitem, "l_orderkey", orders, "o_orderkey"))
      .orderBy("check_name")
}
