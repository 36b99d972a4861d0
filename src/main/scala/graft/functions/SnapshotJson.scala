package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON blob compatibility layer (SURVEY.md §2.8 X3).
  *
  * The reference stores a whole leaderboard as one JSON document per day
  * (`Record.toJson` -> `data` column, etl.dart:110,140,226) and parses it
  * back with `Record.fromJson` / `fromJsonExpanded` (etl.dart:76,495).
  * Our engine's native model is exploded rows; these helpers prove we can
  * round-trip the blob format — ingest legacy documents and emit them —
  * without ever computing on blobs.
  */
object SnapshotJson {

  /** The per-entry schema inside a `data` blob (FIXTURES.md §B,
    * HighscoresEntry): nullable throughout, like the reference. */
  val entrySchema: StructType = StructType(Seq(
    StructField("rank", IntegerType),
    StructField("name", StringType),
    StructField("level", IntegerType),
    StructField("value", LongType),
    StructField("world", StringType),
    StructField("vocation", StringType)))

  val blobSchema: ArrayType = ArrayType(entrySchema)

  /** Blob -> rows: parse a JSON leaderboard document and explode to one row
    * per entry. Malformed documents yield NULL (F6 shape-guard semantics:
    * `from_json` returns NULL on mismatch, callers filter). */
  def explodeBlob(docs: DataFrame, dataCol: String = "data"): DataFrame =
    docs
      .filter(validBlob(col(dataCol)))
      .withColumn("entries", from_json(col(dataCol), blobSchema))
      .filter(col("entries").isNotNull)
      .select(
        docs.columns.filter(_ != dataCol).map(col).toIndexedSeq :+
          explode(col("entries")).as("entry"): _*)
      .select(
        docs.columns.filter(_ != dataCol).map(col).toIndexedSeq :+
          col("entry.rank").as("rank") :+ col("entry.name").as("name") :+
          col("entry.level").as("level") :+ col("entry.value").as("value") :+
          col("entry.world").as("world") :+ col("entry.vocation").as("vocation"): _*)

  /** Rows -> blob: re-serialize a day's entries into one JSON document,
    * ordered by rank (the reference emits the sorted list). */
  def toBlob(rows: DataFrame, keyCols: Seq[String]): DataFrame =
    rows
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(
        struct(col("rank"), col("name"), col("level"), col("value"),
          col("world"), col("vocation")))).as("entries"))
      .withColumn("data", to_json(col("entries")))
      .drop("entries")

  /** Shape guard (F6, etl.dart:95-96): true only when the payload is a
    * JSON *array* (the reference rejects non-list payloads with `is!
    * List`). Note `from_json` alone is not enough — Spark wraps a lone
    * JSON object into a 1-element array for array schemas. */
  def validBlob(c: Column): Column = json_array_length(c).isNotNull

  // --- worlds-dimension payload (X3/F6 over the wire) --------------------

  /** One world of the reference's dimension payload (etl.dart:92-105). */
  val worldSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("location", StringType),
    StructField("pvp_type", StringType)))

  /** Parse a `{"worlds": {"regular_worlds": [World, …]}}` document with
    * the reference's shape guards (etl.dart:95-96, :101), each mapped to a
    * null-degrading `from_json` step instead of an exception:
    *  - `worlds` not a map / `regular_worlds` not a list → the outer parse
    *    nulls the field → explode emits ZERO rows (reference: `return
    *    <World>[]`);
    *  - a non-map ENTRY inside a valid list → that element's inner parse
    *    nulls → filtered, the valid siblings survive (reference: `if (e is
    *    Map…)` keeps the good ones).
    * The two-stage parse (elements as raw JSON strings, then per-element
    * struct parse) is what makes the guard ELEMENT-wise — a single
    * `from_json` of the full nested schema nulls the whole document on one
    * bad element. */
  def parseWorlds(spark: org.apache.spark.sql.SparkSession, json: String): DataFrame = {
    import spark.implicits._
    val outer = StructType(Seq(StructField("worlds", StructType(Seq(
      StructField("regular_worlds", ArrayType(StringType)))))))
    Seq(json).toDF("payload")
      .select(from_json(col("payload"), outer).as("p"))
      .select(explode(col("p.worlds.regular_worlds")).as("entry_json"))
      .select(from_json(col("entry_json"), worldSchema).as("w"))
      .filter(col("w").isNotNull && col("w.name").isNotNull)
      .select(col("w.name").as("name"), col("w.location").as("location"),
        col("w.pvp_type").as("pvp_type"))
  }

  // --- `expanded` nested per-skill compat (fromJsonExpanded) -------------
  //
  // The reference's rookmaster blob carries a nested `expanded` object per
  // entry — one {value, position, points} stat per skill plus experience
  // (etl.dart:495, :507-509, :557-566). These helpers extend the blob
  // schema with that struct so a legacy expanded document round-trips.

  /** The reference's skill keys (etl.dart:573-580) plus `experience`
    * (etl.dart:507-509). */
  val ExpandedSkills: Seq[String] =
    Seq("experience", "fist", "axe", "club", "sword", "distance", "shielding", "fishing")

  /** One per-skill stat: {value, position, points} (etl.dart:559-564). */
  val skillStatSchema: StructType = StructType(Seq(
    StructField("value", LongType),
    StructField("position", IntegerType),
    StructField("points", IntegerType)))

  /** `expanded` as a struct keyed by skill name — fields absent from a
    * given blob parse as NULL (nullable throughout, like the reference). */
  def expandedSchema(skills: Seq[String] = ExpandedSkills): StructType =
    StructType(skills.map(s => StructField(s, skillStatSchema)))

  /** Entry schema including the nested `expanded` struct. */
  def entrySchemaExpanded(skills: Seq[String] = ExpandedSkills): StructType =
    StructType(entrySchema.fields :+ StructField("expanded", expandedSchema(skills)))

  def blobSchemaExpanded(skills: Seq[String] = ExpandedSkills): ArrayType =
    ArrayType(entrySchemaExpanded(skills))

  /** Blob -> rows, keeping `expanded` as a nested struct column. Same
    * guard semantics as [[explodeBlob]]. */
  def explodeBlobExpanded(docs: DataFrame, dataCol: String = "data",
                          skills: Seq[String] = ExpandedSkills): DataFrame = {
    val keep = docs.columns.filter(_ != dataCol).map(col).toIndexedSeq
    docs
      .filter(validBlob(col(dataCol)))
      .withColumn("entries", from_json(col(dataCol), blobSchemaExpanded(skills)))
      .filter(col("entries").isNotNull)
      .select(keep :+ explode(col("entries")).as("entry"): _*)
      .select(keep :+
        col("entry.rank").as("rank") :+ col("entry.name").as("name") :+
        col("entry.level").as("level") :+ col("entry.value").as("value") :+
        col("entry.world").as("world") :+ col("entry.vocation").as("vocation") :+
        col("entry.expanded").as("expanded"): _*)
  }

  /** Nested struct -> one row per present skill: (skill, value, position,
    * points). The relational view of `expanded` (rookmaster_categories
    * exposes the same data computed natively). */
  def explodeSkills(rows: DataFrame, skills: Seq[String] = ExpandedSkills): DataFrame = {
    val branches = skills.map(s => s"'$s', expanded.`$s`").mkString(", ")
    rows
      .select(rows.columns.filter(_ != "expanded").map(col).toIndexedSeq :+
        expr(s"stack(${skills.length}, $branches)").as(Seq("skill", "st")): _*)
      .filter(col("st").isNotNull)
      .withColumn("skill_value", col("st.value"))
      .withColumn("skill_position", col("st.position"))
      .withColumn("skill_points", col("st.points"))
      .drop("st")
  }

  /** Rows (with an `expanded` struct column) -> blob, including the nested
    * struct. NULL skill fields are omitted from the JSON (to_json drops
    * nulls), exactly like an absent key in the reference's documents. */
  def toBlobExpanded(rows: DataFrame, keyCols: Seq[String]): DataFrame =
    rows
      .groupBy(keyCols.map(col): _*)
      .agg(sort_array(collect_list(
        struct(col("rank"), col("name"), col("level"), col("value"),
          col("world"), col("vocation"), col("expanded")))).as("entries"))
      .withColumn("data", to_json(col("entries")))
      .drop("entries")
}
