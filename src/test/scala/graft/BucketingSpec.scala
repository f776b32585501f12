package graft

import graft.sources.Bucketing

/** Bucketed co-located join: the plan must contain no shuffle. */
class BucketingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  private def cleanup(): Unit =
    for (t <- Seq("orders_b", "lineitem_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }

  test("bucketed-by-key join plans without any Exchange") {
    cleanup()
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val lineitem = spark.read.parquet(s"$dir/lineitem.parquet")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(lineitem, "lineitem_b", "l_orderkey", 4)

    // Force the large⋈large planning path this tool exists for — at
    // testdata scale Spark would otherwise broadcast (and rightly
    // skip bucketed reads).
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "orders_b", "lineitem_b",
        "o_orderkey", "l_orderkey")
      val physical = joined.queryExecution.executedPlan.toString

      assert(!physical.contains("Exchange"), physical.take(600))
      assert(physical.contains("SortMergeJoin"), physical.take(600))
      assert(physical.contains("Bucketed: true"), physical.take(600))
      // and it still computes the right thing
      val expected = orders.join(lineitem,
        orders("o_orderkey") === lineitem("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      cleanup()
    }
  }
}
