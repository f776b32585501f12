package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Measured ENGINE-level z-order skip proof (round-11 item 5): writes
 *  lineitem under [[Layout.zOrderBy]] (l_orderkey, l_partkey) and
 *  under the linear l_orderkey layout, then probes both through
 *  Spark's own parquet reader and reports the scan-metric rows each
 *  layout could not skip. One JSON line per probe box — the artifact
 *  PLANS.md's X102 row cites. Usage:
 *    SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.ProbeLayout'
 */
object ProbeLayout {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val numFiles = sys.env.getOrElse("SPARK_GRAFT_LAYOUT_FILES", "32").toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = graft.sources.Sources.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    val base = graft.streaming.Streams.scratchDir("graft_probe_layout_")
    Layout.zOrderBy(li, "l_orderkey", "l_partkey", 16, numFiles)
      .write.mode("overwrite").parquet(s"$base/z")
    li.repartitionByRange(numFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$base/linear")
    val mm = li.agg(min("l_orderkey"), max("l_orderkey"),
      min("l_partkey"), max("l_partkey")).head()
    val (k1lo, k1hi, k2lo, k2hi) =
      (mm.getLong(0), mm.getLong(1), mm.getLong(2), mm.getLong(3))
    def at(lo: Long, hi: Long, permille: (Long, Long)): (Long, Long) =
      (lo + (hi - lo) * permille._1 / 1000, lo + (hi - lo) * permille._2 / 1000)
    // the q132 probe shapes: tight 2-D box, dim2-only slab (linear's
    // blind spot), dim1-only slab (linear's home game)
    val probes = Seq(
      ("box2d", (100L, 150L), (100L, 150L)),
      ("dim2_slab", (0L, 1000L), (450L, 500L)),
      ("dim1_slab", (450L, 500L), (0L, 1000L)))
    val total = li.count()
    for ((name, p1, p2) <- probes) {
      val (lo1, hi1) = at(k1lo, k1hi, p1)
      val (lo2, hi2) = at(k2lo, k2hi, p2)
      val (zScan, zHit) = Layout.probeScanRows(spark, s"$base/z",
        "l_orderkey", lo1, hi1, "l_partkey", lo2, hi2)
      val (lScan, lHit) = Layout.probeScanRows(spark, s"$base/linear",
        "l_orderkey", lo1, hi1, "l_partkey", lo2, hi2)
      require(zHit == lHit, s"$name: layouts disagree on matches")
      println(s"""{"probe":"$name","rows_total":$total,"rows_matched":$zHit,""" +
        s""""rows_scanned_z":$zScan,"rows_scanned_linear":$lScan,""" +
        s""""files":$numFiles,"sf":"$sfDir"}""")
    }
    // ---- k = 3 (round-12 item 7): the same engine-level evidence on
    // a 3-predicate box — l_suppkey joins the cluster, probes are the
    // 3-D analogues (tight box; k2+k3 slab invisible to linear;
    // single-dim k3 slab where 3-way interleaving pays its dilution)
    val li3 = graft.sources.Sources.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    Layout.zOrderByK(li3, Seq("l_orderkey", "l_partkey", "l_suppkey"),
        10, numFiles)
      .write.mode("overwrite").parquet(s"$base/z3")
    li3.repartitionByRange(numFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$base/linear3")
    val mm3 = li3.agg(min("l_suppkey"), max("l_suppkey")).head()
    val (k3lo, k3hi) = (mm3.getLong(0), mm3.getLong(1))
    val probes3 = Seq(
      ("box3d", (100L, 200L), (100L, 200L), (100L, 200L)),
      ("dim23_slab", (0L, 1000L), (450L, 550L), (450L, 550L)),
      ("dim3_slab", (0L, 1000L), (0L, 1000L), (450L, 500L)))
    for ((name, p1, p2, p3) <- probes3) {
      val (lo1, hi1) = at(k1lo, k1hi, p1)
      val (lo2, hi2) = at(k2lo, k2hi, p2)
      val (lo3, hi3) = at(k3lo, k3hi, p3)
      val preds = Seq(("l_orderkey", lo1, hi1), ("l_partkey", lo2, hi2),
        ("l_suppkey", lo3, hi3))
      val (zScan, zHit) = Layout.probeScanRowsK(spark, s"$base/z3", preds)
      val (lScan, lHit) = Layout.probeScanRowsK(spark, s"$base/linear3", preds)
      require(zHit == lHit, s"$name: layouts disagree on matches")
      println(s"""{"probe":"$name","rows_total":$total,"rows_matched":$zHit,""" +
        s""""rows_scanned_z3":$zScan,"rows_scanned_linear":$lScan,""" +
        s""""files":$numFiles,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
