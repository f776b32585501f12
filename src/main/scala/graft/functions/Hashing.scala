package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Cross-engine deterministic hashing.
 *
 * Every hash the engine uses for dedup/LSH derives from md5 — the one
 * cryptographic hash Spark and DuckDB share bit-for-bit — so every
 * hash-dependent operator (MinHash, SimHash, LSH buckets, exact dedup)
 * has an exactly reproducible DuckDB oracle. `h60` takes the first 15
 * hex chars (60 bits) so the value is always a positive BIGINT in both
 * engines.
 *
 * At scale this is NOT the cheapest possible hash (xxhash64 is), but
 * md5 on shingle-sized strings is still > 10^6 ops/core/s and the
 * dedup pipelines are shuffle-bound, not hash-bound; oracle-able
 * correctness wins. Swap `h60` for `xxhash64` in production if the
 * oracle constraint is dropped — every operator takes the hash as a
 * `Column => Column`.
 */
object Hashing {

  /** Modulus for MinHash permutations: 2^31 − 1 (Mersenne prime).
   *  h < 2^31 and a < 2^6 keep a*h+b < 2^37 — no BIGINT overflow in
   *  either engine. */
  val P: Long = 2147483647L

  /** 60-bit positive hash of a string column. */
  def h60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  def h60Sql(c: String): String =
    s"CAST('0x' || substr(md5($c), 1, 15) AS BIGINT)"

  /** MinHash permutation parameters — small odd multipliers keep the
   *  products overflow-safe (see P). Quality is ample for banding. */
  def permA(i: Int): Long = 2L * i + 1
  def permB(i: Int): Long = 1L * i * i + 7L
}
