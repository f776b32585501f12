package graft.tools
import org.apache.spark.sql.functions._
import graft.functions.{HashExpressions, TextFunctions}
object ProbeQ16 {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val k = 3; val tau = 0.5
    val s0 = docs.select(col("doc_id").as("id"), col("lang").as("blk"),
        TextFunctions.lowerTokens(col("text")).as("toks"))
      .select(col("id"), col("blk"), TextFunctions.wordShingles("toks", k).as("sh"))
      .withColumn("sz", size(col("sh")))
      .withColumn("hs", sort_array(HashExpressions.h60Array(col("sh"))))
      .withColumn("pfx", (col("sz") - ceil(col("sz") * lit(tau)).cast("int") + lit(1)))
      .select(col("blk"), col("id"), col("sz"), col("hs"), col("pfx"))
    val s = s0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("shingle+hash+sort persist") { s.count() }
    val posts = s.select(col("blk"), col("id"), col("sz"),
        explode(slice(col("hs"), lit(1), col("pfx"))).as("h"))
    t("posts count") { println("posts=" + posts.count()) }
    val cand = posts.select(col("blk"), col("h"), col("id").as("id_a"), col("sz").as("sz_a"))
      .join(posts.select(col("blk"), col("h"), col("id").as("id_b"), col("sz").as("sz_b")),
        Seq("blk", "h"))
      .filter(col("id_a") < col("id_b") &&
        col("sz_b") >= col("sz_a") * lit(tau) && col("sz_a") >= col("sz_b") * lit(tau))
      .select(col("id_a"), col("id_b")).distinct()
    t("candidates") { println("cand=" + cand.count()) }
    val la = s.select(col("id").as("id_a"), col("hs").as("hs_a"), col("sz").as("sz_a"))
    val lb = s.select(col("id").as("id_b"), col("hs").as("hs_b"), col("sz").as("sz_b"))
    val fin = cand.join(la, "id_a").join(lb, "id_b")
      .withColumn("i", size(array_intersect(col("hs_a"), col("hs_b"))))
      .select(col("id_a"), col("id_b"),
        (col("i").cast("double") / (col("sz_a") + col("sz_b") - col("i")).cast("double")).as("jac"))
      .filter(col("jac") >= tau)
    t("verify") { println("pairs=" + fin.count()) }
    spark.stop()
  }
}
