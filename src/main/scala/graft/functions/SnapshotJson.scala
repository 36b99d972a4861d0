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
        docs.columns.filter(_ != dataCol).map(col) :+
          explode(col("entries")).as("entry"): _*)
      .select(
        docs.columns.filter(_ != dataCol).map(col) :+
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
}
