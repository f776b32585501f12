package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salted aggregation/join must be result-identical to the plain
 *  formulations — only the partitioning changes. */
class SkewSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"

  test("saltedAggregate == plain groupBy sum/count") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("sum_l_quantity"), count(lit(1)).as("n"))
      .orderBy("l_returnflag").collect()
    val salted = Skew.saltedAggregate(li, "l_returnflag", "l_quantity", 8)
      .orderBy("l_returnflag").collect()
    assert(salted.length == plain.length)
    plain.zip(salted).foreach { case (p, s) =>
      assert(p.getString(0) == s.getString(0))
      // double sums may associate differently across salt partials
      assert(math.abs(p.getDouble(1) - s.getDouble(1)) < 1e-6)
      assert(p.getLong(2) == s.getLong(2))
    }
  }

  test("saltedJoin == plain join (row multiset)") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
    val plain = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_custkey").orderBy("o_orderkey").collect()
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", "c_custkey", 4)
      .select("o_orderkey", "c_custkey").orderBy("o_orderkey").collect()
    assert(salted.sameElements(plain))
  }

  test("salted join spreads a hot key over multiple partitions") {
    import spark.implicits._
    val hot = Seq.fill(1000)((1L, "x")).toDF("k", "payload")
    val dim = Seq((1L, "dim")).toDF("dk", "name")
    val joined = Skew.saltedJoin(hot, dim, "k", "dk", 8)
    assert(joined.count() == 1000)
  }
}
