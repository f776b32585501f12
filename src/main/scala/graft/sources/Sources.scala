package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Ingestion surface. The reference consumes whatever fluent-bit inputs
 * emit (msgpack event stream, SURVEY §2.2 H1); the engine's batch path
 * reads the driver-provided parquet star schema, and the schemaless
 * path parses JSON-ish payloads into `MapType(String, Double)` —
 * reproducing the reference's dynamic typing (math.c:149-163): a key
 * whose value is non-numeric parses to a null map entry, which the
 * resolver skips exactly like the msgpack type check does.
 *
 * Scale posture: parquet scans are vectorized and column-pruned;
 * filters and required-column projections push into the scan (verify
 * with `.explain("formatted")` → PushedFilters / ReadSchema).
 */
object Sources {

  /** One driver testdata table: `spark.read.parquet(dir/name.parquet)`. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Event-time normalization at the source boundary. The engine
   *  contract downstream is `ts` = epoch MICROS as BIGINT (the
   *  reference treats event time as an opaque scalar it repacks
   *  verbatim, math.c:239 — integer micros is the engine's canonical
   *  carrier). The lake has served two physical encodings across
   *  driver generations: TIMESTAMP(NANOS) parquet (read as raw
   *  nanosecond longs under `nanosAsLong`) and TIMESTAMP(MICROS)
   *  parquet (read as TIMESTAMP_NTZ). Both normalize here; the
   *  session is pinned UTC so the NTZ→LTZ cast is offset-free and
   *  `unix_micros` is exact. Absent or already-BIGINT-micros columns
   *  pass through untouched (a micros long is detected as NOT nanos
   *  only by generation: LongType from this lake is always nanos). */
  def withTsMicros(df: DataFrame, c: String = "ts"): DataFrame =
    df.schema.fields.find(_.name == c).map(_.dataType) match {
      case Some(LongType)         => df.withColumn(c, expr(s"$c div 1000"))
      case Some(TimestampNTZType) =>
        df.withColumn(c, unix_micros(col(c).cast(TimestampType)))
      case Some(TimestampType)    => df.withColumn(c, unix_micros(col(c)))
      case _                      => df
    }

  val payloadType: MapType = MapType(StringType, DoubleType)

  /** Schemaless ingestion: a column of JSON objects → `payload`
   *  map<string,double>. Non-numeric values become null entries
   *  (kept — key presence matters for duplicate-key scans); malformed
   *  documents become null maps (reference passes unparseable records
   *  through untouched, math.c:349-352). */
  def jsonPayload(df: DataFrame, jsonCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, from_json(col(jsonCol), payloadType))

  /** Spark-4-native schemaless ingestion: JSON → VARIANT. Unlike the
   *  map path this keeps heterogeneous value types (and shreds
   *  efficiently in storage); key access is exact-match (Variant
   *  paths are case-sensitive — the reference-faithful
   *  case-insensitive scan stays on the map path). `try_parse_json`
   *  keeps malformed documents as NULL payloads, matching the
   *  reference's pass-through of undecodable records
   *  (math.c:349-352). */
  def variantPayload(df: DataFrame, jsonCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, try_parse_json(col(jsonCol)))

  /** OPT-IN case-insensitive variant ingestion: lower-case the
   *  payload's top-level keys at ingest, so the (inherently
   *  case-sensitive) variant path can be resolved case-insensitively
   *  by lowering the query key too
   *  ([[graft.core.MathCompiler.applyToVariantCI]]) — the documented
   *  case-sensitivity divergence of the plain variant mode becomes a
   *  choice. Costs one JSON round-trip per record at INGEST (values
   *  re-enter the variant as strings and resolve through numeric
   *  casts; duplicate keys that collide after lowering keep the last
   *  occurrence — use the map/JSON-kernel modes when the reference's
   *  first-numeric-wins duplicate scan matters).
   *
   *  TOP-LEVEL SCALAR FIELDS ONLY: the map<string,string> round-trip
   *  stringifies non-scalar top-level values, so a nested object or
   *  array re-enters the variant as an ESCAPED JSON STRING — any
   *  nested-path access through the CI payload (e.g.
   *  `payload:a.b`) returns null. The engine's reference surface only
   *  reads top-level numerics (math.c operand resolution), which is
   *  why this trade is acceptable here; if nested access must
   *  survive, use [[variantPayload]] (case-sensitive) instead. */
  def variantPayloadCI(df: DataFrame, jsonCol: String, payloadCol: String = "payload"): DataFrame = {
    // keep-last must be explicit: transform_keys on a map whose keys
    // COLLIDE after lowering throws DUPLICATED_MAP_KEY under the
    // default dedup policy — and case-colliding keys are precisely
    // the input this mode exists for. Scan the reversed entry list
    // and keep each lowered key's first (i.e. originally LAST)
    // occurrence before rebuilding the map.
    val entries = s"reverse(transform(map_entries(" +
      s"from_json(`$jsonCol`, 'map<string,string>')), " +
      "e -> struct(lower(e.key) as key, e.value as value)))"
    df.withColumn(payloadCol, try_parse_json(to_json(expr(
      s"map_from_entries(filter($entries, " +
        s"(e, i) -> NOT exists(slice($entries, 1, i), x -> x.key = e.key)))"))))
  }

  /** msgpack event ingestion — the reference's ACTUAL wire format:
   *  each element of `chunks` is a fluent-bit chunk of concatenated
   *  `[ts, {k=>v}]` msgpack events. Decoding happens per-partition
   *  ([[Msgpack]] codec); output is (ts nanos, payload
   *  map<string,double>) feeding the engine's map-payload math mode.
   *  Narrow transformation — chunk parallelism is source
   *  partitioning, exactly like fluent-bit's per-chunk filter calls. */
  def msgpackEvents(chunks: org.apache.spark.sql.Dataset[Array[Byte]]): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.flatMap(Msgpack.decodeEvents(_))
      .select(col("ts"), map_from_entries(col("payload")).as("payload"))
  }

  /** WARC web-archive ingestion (ISO 28500 — the Common Crawl
   *  container): each element of `chunks` is a `.warc.gz` byte blob
   *  (one gzip member per record, members concatenated). Decoding is
   *  per-partition via the pure-JVM [[Warc]] codec — a narrow 1→N
   *  flatMap, so chunk/file parallelism IS the source partitioning
   *  and no shuffle precedes the first real operator, exactly the
   *  posture of [[msgpackEvents]]. Payload bytes surface raw
   *  (`binary`); text extraction is the caller's typed decision. */
  def warcRecords(chunks: org.apache.spark.sql.Dataset[Array[Byte]]): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.flatMap(Warc.decode(_).map(r =>
        (r.uri, r.recordType, r.contentType, r.payload)))
      .toDF("uri", "record_type", "content_type", "payload")
  }

  /** Permissive delimited/JSON file ingestion with the reference's
   *  malformed-record tolerance (math.c:349-352: undecodable records
   *  pass through, never abort the stream): PERMISSIVE mode keeps bad
   *  rows with their raw text in `_corrupt` instead of failing the
   *  job — at 100 TB a single bad file must not kill a pipeline. */
  def permissiveCsv(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .option("header", "true")
      .csv(path)

  def permissiveJson(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt", StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
}
