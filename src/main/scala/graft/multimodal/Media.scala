package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: opaque payload bytes + typed metadata.
 *  Image/audio/video payloads all ride the same shape — `binary` is
 *  format-agnostic, `mime` discriminates. */
final case class MediaRecord(doc_id: Long, bytes: Array[Byte], mime: String)

/** Decoded/extracted features. In a real deployment width/height/
 *  n_frames come from the codec; here they come from [[Media.decode]]
 *  (a deterministic stub — see its scaladoc). */
final case class MediaFeatures(
    doc_id: Long, mime: String, n_bytes: Long,
    width: Int, height: Int, n_frames: Int)

/**
 * Multimodal-column plumbing for the LLM-data-pipeline surface:
 * binary payload columns with typed metadata, batch-shaped decode /
 * feature-extraction over `mapPartitions`.
 *
 * The Spark-side shape is the real thing a 100 TB media pipeline
 * needs and is fully tested: typed `Dataset[MediaRecord]` with
 * kryo-free product encoders, per-PARTITION batched iteration (the
 * JVM analog of `mapInPandas` batches — decoder state is initialized
 * once per partition, amortized over every record in it), and an
 * explicit repartition knob so decode cost balances across executors
 * independently of upstream file splits.
 *
 * ONLY the innermost byte→pixels step is a STUB: this container ships
 * no image/audio codecs, so [[Media.decode]] derives deterministic
 * pseudo-features from the byte length. Swapping in a real codec
 * changes one function body and nothing else — signature, schema,
 * batching, and partitioning stay as tested here.
 */
object Media {

  /** Wrap text-derived payloads as a media table: UTF-8 bytes +
   *  mime derived from the source tag. (Stand-in for reading real
   *  blobs; binary column semantics are identical.) */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("bytes"),
      concat(lit("application/x-"), col("source")).as("mime")
    ).as[MediaRecord]
  }

  /** STUB DECODER — deterministic fake. A real implementation opens
   *  the payload with a codec (e.g. javax.imageio / ffmpeg bindings)
   *  and reads true dimensions; unavailable in this environment, so
   *  features are derived from the byte payload deterministically.
   *  The formulas are mirrored in [[decodeSql]] for the oracle. */
  def decode(r: MediaRecord): MediaFeatures = {
    val n = r.bytes.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      mime = r.mime,
      n_bytes = n,
      width = ((n % 640) + 1).toInt,
      height = (((n * 7) % 480) + 1).toInt,
      n_frames = ((n % 30) + 1).toInt)
  }

  /** DuckDB mirror of the stub decode (oracle). */
  def decodeSql(table: String): String =
    s"""SELECT doc_id, 'application/x-' || source AS mime,
       |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       |  CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
       |  CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height,
       |  CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
       |FROM $table""".stripMargin

  /**
   * Batched feature extraction: one decoder per PARTITION (init cost
   * amortized), records streamed through it lazily — the mapInPandas
   * batch shape, JVM-native. `parallelism` rebalances decode work
   * across executors when upstream splits are skewed (binary blobs
   * rarely split evenly); pass 0 to keep the upstream partitioning.
   */
  def extractFeatures(media: Dataset[MediaRecord], parallelism: Int = 0): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val balanced =
      if (parallelism > 0) media.repartition(parallelism) else media
    balanced.mapPartitions { records =>
      // Real codecs would be opened HERE, once per partition.
      records.map(decode)
    }
  }
}
