package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star extensions, SURVEY.md §7.2
  * step 8): media payloads travel as opaque `binary` columns with typed
  * metadata; decode / feature-extract runs as batched partition-local
  * processing.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB ([[FakeDecoder]]) — but the Spark-side
  * plumbing is real and tested: binary column schema, typed Dataset
  * round-trip, `mapPartitions` with explicit batch shape (the Scala
  * equivalent of `mapInPandas` arrow batches), and deterministic features
  * the DuckDB oracle can recompute from the source bytes.
  *
  * Scale notes: payload processing is embarrassingly parallel — no
  * shuffle, one pass per partition; batch size bounds peak memory per
  * task regardless of document size skew. At 100 TB the payloads would be
  * read from a binary-file DataSource with the same downstream shape.
  */
object Multimodal {

  /** One decoded asset batch row. `checksum` is a running byte sum mod 997
    * (== total mod 997, so SQL can verify it with SUM over code points). */
  final case class AssetFeatures(
      doc_id: Long, n_bytes: Long, head_byte: Long, tail_byte: Long, checksum: Long)

  // NOT private: Catalyst's generated deserializer needs public access.
  final case class AssetRow(doc_id: Long, payload: Array[Byte])

  /** STUB decoder — stands in for image/audio decode (libs absent here).
    * Deterministic features of the raw bytes; a real deployment swaps this
    * body for the codec call and keeps the batch plumbing unchanged. */
  object FakeDecoder {
    val BatchSize = 64
    def decode(a: AssetRow): AssetFeatures = {
      val b = a.payload
      AssetFeatures(
        doc_id = a.doc_id,
        n_bytes = b.length.toLong,
        head_byte = if (b.nonEmpty) (b(0) & 0xff).toLong else -1L,
        tail_byte = if (b.nonEmpty) (b(b.length - 1) & 0xff).toLong else -1L,
        checksum = b.foldLeft(0L)((acc, x) => (acc + (x & 0xff)) % 997))
    }
  }

  /** The asset table: documents' text bytes posing as media payloads —
    * binary column + typed metadata, the schema a real multimodal corpus
    * would carry. */
  def assets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("application/x-fake").as("media_type"),
      octet_length(col("text")).cast("long").as("n_bytes"))

  /** One sampled frame of a payload (video-frame-sampling shape): payloads
    * chop into fixed `frameSize` windows, every `every`-th frame is kept
    * with deterministic per-frame features. */
  final case class Frame(doc_id: Long, frame_idx: Long, n_bytes: Long, checksum: Long)

  /** Frame sampling over binary payloads — the media pipeline's
    * decode→sample step as partition-local typed processing (a real codec
    * would decode before slicing; the slicing/sampling plumbing is what's
    * exercised here). */
  def frameSample(docs: DataFrame, frameSize: Int = 32, every: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    assets(docs)
      .select(col("doc_id"), col("payload"))
      .as[AssetRow]
      .mapPartitions { it =>
        it.flatMap { a =>
          a.payload.grouped(frameSize).zipWithIndex.collect {
            case (frame, idx) if idx % every == 0 =>
              Frame(a.doc_id, idx.toLong, frame.length.toLong,
                frame.foldLeft(0L)((acc, x) => acc + (x & 0xff)) % 997)
          }
        }
      }
      .toDF()
      .orderBy("doc_id", "frame_idx")
  }

  /** Batched decode over the binary payloads: partition-local, batch shape
    * explicit (`grouped(BatchSize)`), typed in/out. */
  def decodeFeatures(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    assets(docs)
      .select(col("doc_id"), col("payload"))
      .as[AssetRow]
      .mapPartitions { it =>
        it.grouped(FakeDecoder.BatchSize).flatMap { batch =>
          batch.iterator.map(FakeDecoder.decode)
        }
      }
      .toDF()
      .orderBy("doc_id")
  }
}
