package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * CDC / MERGE-INTO application (X61): fold a change stream (upserts +
 * deletes, ordered by a sequence column) into a keyed base table —
 * the standard lake "apply changes" step (the relational core of
 * Delta/Hudi/Iceberg MERGE), expressed as pure DataFrame ops.
 *
 * Semantics (latest-wins):
 *   - per key, the change with the HIGHEST `seqCol` value decides:
 *     op `u` → the key takes the change's payload (update if the key
 *     exists in base, insert if not); op `d` → the key is absent
 *     from the result;
 *   - keys with no change keep their base row untouched.
 *
 * Contract: `(key, seq)` pairs are unique (a CDC log offset / LSN —
 * true by construction in real change streams). Ties would make
 * latest-wins ill-defined in ANY engine; the oracle's
 * `row_number() OVER (ORDER BY seq DESC)` assumes the same.
 *
 * Shape at 100 TB: reducing the change log to one winner per key is
 * ONE hash aggregation (`max_by(struct(payload), seq)` — map-side
 * partial winners merge on the exchange; never a window sort over
 * the log). Applying winners to base is ONE full-outer equi-join on
 * the key — broadcastable when the change batch is small relative to
 * base (the common incremental case), hash-partitioned otherwise.
 * Nothing buffers more than one row per key.
 */
object Cdc {

  /** The latest change per key: `(key, op, payload…)` of the max-seq
   *  row. One partial-aggregated pass over the change log. */
  def latestChanges(changes: DataFrame, key: String, seqCol: String,
      opCol: String, payload: Seq[String]): DataFrame =
    changes.groupBy(col(key))
      .agg(max_by(struct((opCol +: payload).map(col): _*), col(seqCol)).as("__w"))
      .select(col(key) +: (opCol +: payload).map(n => col(s"__w.$n")): _*)

  /** Apply a change log to `base`. `base` columns = `key` + payload;
   *  `changes` columns = `key`, `seqCol`, `opCol` ('u' | 'd'), and the
   *  same payload names. Result has base's schema. */
  def applyChanges(base: DataFrame, changes: DataFrame, key: String,
      seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filterNot(_ == key).toSeq
    val latest = latestChanges(changes, key, seqCol, opCol, payload)
      .withColumnRenamed(key, "__k")
      .withColumnRenamed(opCol, "__op")
    val renamed = payload.foldLeft(latest)(
      (df, n) => df.withColumnRenamed(n, s"__c_$n"))
    base.join(renamed, col(key) === col("__k"), "full_outer")
      .filter(col("__op").isNull || col("__op") =!= "d")
      .select(coalesce(col(key), col("__k")).as(key) +:
        payload.map(n =>
          when(col("__op").isNotNull, col(s"__c_$n")).otherwise(col(n)).as(n)): _*)
  }

  /** SCD2 history build: turn the same change log [[applyChanges]]
   *  folds into latest-wins state into the FULL versioned history —
   *  one row per (key, version) with its validity interval, the lake
   *  "slowly changing dimension type 2" shape (audit tables, as-of
   *  reprocessing, feature-store time travel). Per key ordered by
   *  `seqCol`:
   *   - every op-`u` change opens a version at `valid_from = seq`;
   *   - the version closes at the NEXT change's seq (`valid_to`,
   *     whatever its op — an op-`d` closes the interval without
   *     opening one), NULL while current (`is_current`).
   *  Feed the base table in as seq-0 `u` rows to version an initial
   *  load + increment in one pass. Same `(key, seq)` uniqueness
   *  contract as [[applyChanges]].
   *
   *  Shape at 100 TB: ONE hash exchange on the key + a per-key sort
   *  inside the window — each key's partition is its own change
   *  count (bounded, typically a handful), never the whole log; the
   *  exchange is the same partitioning [[applyChanges]]'s join uses,
   *  and a pathological hot key is the X24 salting case. No
   *  driver-side state, no global sort. */
  def scd2History(changes: DataFrame, key: String, seqCol: String,
      opCol: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    changes
      .withColumn("__next",
        lead(col(seqCol), 1).over(
          Window.partitionBy(col(key)).orderBy(col(seqCol))))
      .filter(col(opCol) =!= "d")
      .select(col(key) +: payload.map(col) :+
        col(seqCol).as("valid_from") :+ col("__next").as("valid_to") :+
        col("__next").isNull.as("is_current"): _*)
  }

  /** DuckDB oracle twin: the identical windowed formulation (the
   *  change relation exposes `k`, `seq`, `op` + the payload names). */
  def scd2HistorySql(changesSql: String, payload: Seq[String]): String =
    s"""SELECT k, ${payload.mkString(", ")},
       |  seq AS valid_from, __next AS valid_to,
       |  __next IS NULL AS is_current
       |FROM (
       |  SELECT *, lead(seq) OVER (PARTITION BY k ORDER BY seq) AS __next
       |  FROM ($changesSql))
       |WHERE op <> 'd'""".stripMargin

  /** DuckDB oracle twin over inline `base`/`changes` SQL (the change
   *  relation exposes `k`, `seq`, `op` + the payload names). */
  def applyChangesSql(baseSql: String, changesSql: String, key: String,
      payload: Seq[String]): String = {
    val resolved = payload.map(n =>
      s"CASE WHEN l.op IS NOT NULL THEN l.$n ELSE b.$n END AS $n").mkString(",\n  ")
    s"""SELECT coalesce(b.$key, l.k) AS $key,
       |  $resolved
       |FROM ($baseSql) b FULL OUTER JOIN (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC) AS __rn
       |    FROM ($changesSql)
       |  ) WHERE __rn = 1
       |) l ON b.$key = l.k
       |WHERE l.op IS NULL OR l.op <> 'd'""".stripMargin
  }
}
