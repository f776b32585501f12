package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Dedup, Sampling}

/** Semantics of the round-2 operators: as-of join, deterministic
 *  sampling, multi-index SimHash. */
class AsOfSamplingSpec extends SparkTestBase {

  import spark.implicits._

  test("asof join: inclusive at equal time, latest-prior otherwise, null before first") {
    val left = Seq((1L, 5L, "e1"), (1L, 10L, "e2"), (1L, 20L, "e3"),
      (2L, 7L, "e4")).toDF("k", "t", "name")
    val right = Seq((1L, 10L, 100.0), (1L, 15L, 150.0), (3L, 1L, 999.0))
      .toDF("k", "t", "v")
    val out = AsOf.joinAsOf(left, right, "k", "t", "v", "asof_v")
      .orderBy("t").select("name", "asof_v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("e1").isEmpty) // before any snapshot
    assert(out("e2").contains(100.0)) // equal time is inclusive
    assert(out("e3").contains(150.0)) // latest prior, not first
    assert(out("e4").isEmpty) // key with no snapshots at all
  }

  test("asof join preserves every left row (left-join cardinality)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val right = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("value"))
    val n = AsOf.joinAsOf(ev, right, "user_id", "ts", "value", "pv").count()
    assert(n == ev.count())
  }

  test("hash sampling is deterministic, salt-sensitive, and ~rate-sized") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val a1 = Sampling.hashSample(docs, col("doc_id"), 0.2, "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val a2 = Sampling.hashSample(docs, col("doc_id"), 0.2, "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs, col("doc_id"), 0.2, "s2")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a1 == a2) // pure function of the data
    assert(a1 != b) // independent draw per salt
    val n = docs.count().toDouble
    assert(math.abs(a1.size / n - 0.2) < 0.06) // binomial tolerance
    // rate monotonicity: a 10% sample is a subset of the 20% sample
    val sub = Sampling.hashSample(docs, col("doc_id"), 0.1, "s1")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sub.subsetOf(a1))
  }

  test("stratified cap keeps at most n per stratum, deterministically") {
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = Sampling.stratifiedCap(docs, "source", "doc_id", 7, "s1")
    val per = out.groupBy("source").count().collect()
    assert(per.nonEmpty)
    per.foreach(r => assert(r.getLong(1) <= 7))
    val again = Sampling.stratifiedCap(docs, "source", "doc_id", 7, "s1")
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("clusters: chains collapse transitively, singletons keep their own id") {
    val vertices = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L).toDF("id")
    // chain 1-2-3-4 (never directly 1-4), pair 5-6, singleton 7
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("id_a", "id_b")
    val out = Dedup.clusters(vertices, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("clusters converge on deep chains within maxIter (path compression)") {
    // a 200-deep path needs 199 rounds under plain one-hop propagation;
    // pointer doubling must finish it well inside the default bound
    val n = 200L
    val vertices = (0L until n).toDF("id")
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.clusters(vertices, "id", pairs).collect()
    assert(out.length == n)
    assert(out.forall(_.getLong(1) == 0L), "chain did not fully collapse")
  }

  test("clusters converge on cycles and star-joined components") {
    // a ring has no chain endpoints (every vertex degree 2) and a
    // 2-cycle of min-labels if propagation were naive; plus a star
    // whose center connects 50 leaves, bridged to the ring
    val ringN = 101L
    val ring = (0L until ringN).map(i => (i, (i + 1) % ringN))
    val star = (1000L until 1050L).map(l => (999L, l))
    val bridge = Seq((50L, 999L))
    val vertices = ((0L until ringN) ++ (999L until 1050L)).toDF("id")
    val pairs = (ring ++ star ++ bridge).toDF("id_a", "id_b")
    val out = Dedup.clusters(vertices, "id", pairs).collect()
    assert(out.length == ringN + 51)
    assert(out.forall(_.getLong(1) == 0L),
      "ring+star component did not collapse to the min id")
  }

  test("range join: bucketized result ≡ nested-loop result, without the nested loop") {
    import graft.operators.RangeJoin
    val cust = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    val supp = spark.read.parquet("/root/testdata/sf0.001/supplier.parquet")
      .select(col("s_suppkey"),
        (col("s_acctbal") - 50.0).as("lo"), (col("s_acctbal") + 50.0).as("hi"))
    val fast = RangeJoin.pointInInterval(cust, "c_acctbal", supp, "lo", "hi", 100.0)
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = cust.crossJoin(supp)
      .filter(col("c_acctbal") >= col("lo") && col("c_acctbal") <= col("hi"))
      .select("c_custkey", "s_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == naive)
    assert(fast.nonEmpty)
    val plan = RangeJoin.pointInInterval(cust, "c_acctbal", supp, "lo", "hi", 100.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("kmeans: Lloyd objective is non-increasing and partitions the corpus") {
    import graft.operators.Similarity
    import graft.functions.VectorExpressions
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val e = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x as double))").as("v"))
    def objective(iters: Int): Double = {
      val cents = Similarity.kmeansCentroids(emb, 8, iters)
      // min squared-L2 to any centroid, summed over the corpus
      e.crossJoin(broadcast(cents))
        .select(col("vec_id"),
          (VectorExpressions.dot(col("v"), col("v"))
            - VectorExpressions.dot(col("v"), col("cv")) * 2.0
            + VectorExpressions.dot(col("cv"), col("cv"))).as("d2"))
        .groupBy("vec_id").agg(min("d2").as("d2"))
        .agg(sum("d2")).collect()(0).getDouble(0)
    }
    val objs = (0 to 3).map(objective)
    objs.sliding(2).foreach { case Seq(a, b) => assert(b <= a + 1e-9, objs) }
    assert(objs.last < objs.head) // it actually moved
    val sum43 = Similarity.kmeansSummary(emb, 8, 2)
      .agg(sum("n_members")).collect()(0).getLong(0)
    assert(sum43 == emb.count()) // every vector lands in exactly one cell
  }

  test("decontamination: clean + contaminated partition the corpus; no false hits") {
    import graft.operators.Decontamination
    val bench = Seq((1L, "the quick brown fox jumps over lazy dogs")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "quick brown fox seen again today"), // shares "quick brown fox"
      (11L, "completely different vocabulary here entirely"), // clean
      (12L, "over lazy dogs they jumped")).toDF("doc_id", "text") // shares "over lazy dogs"
    val hits = Decontamination.contaminated(corpus, bench, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == Set(10L, 12L))
    assert(hits(10L) == 1L && hits(12L) == 1L)
    val clean = Decontamination.clean(corpus, bench, "text", "doc_id", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(11L))
  }

  test("bloom decontamination: superset screen, never a false negative") {
    import graft.operators.Decontamination
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter(col("doc_id") < 20)
    val corpus = docs.filter(col("doc_id") >= 20)
    val exact = Decontamination.contaminated(corpus, bench, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Decontamination.contaminatedBloom(corpus, bench, "text", "doc_id", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // no false negatives: every exactly-contaminated doc is flagged,
    // with at LEAST its exact hit count (fp can only add hits)
    assert(exact.keySet.subsetOf(bloom.keySet))
    exact.foreach { case (id, n) => assert(bloom(id) >= n, s"doc $id") }
    // clean side: bloom-clean is a subset of exactly-clean
    val cleanExact = Decontamination.clean(corpus, bench, "text", "doc_id", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cleanBloom = Decontamination.cleanBloom(corpus, bench, "text", "doc_id", 3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(cleanBloom.subsetOf(cleanExact))
    // at 1% fpp on this corpus the screen should be near-exact
    assert(cleanBloom.size >= (cleanExact.size * 0.95).toInt)
    // plan shape: a FILTER, not a join — the bloom path's point
    val plan = Decontamination.contaminatedBloom(corpus, bench, "text", "doc_id", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("might_contain"), plan)
  }

  test("multi-index simhash finds EXACTLY the brute-force hamming pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = Dedup.simhashPairsMultiIndex(docs, "text", "doc_id", 2)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force over all pairs on the same simhash values
    val s = docs.select(col("doc_id").as("id"),
      graft.functions.HashExpressions.simhash32(col("text")).as("sh32"))
    val brute = s.as("a").join(s.as("b"), col("a.id") < col("b.id"))
      .filter(expr("bit_count(a.sh32 ^ b.sh32)") <= 2)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fast == brute)
    // and at the 60-bit scale width with a wider hamming budget
    val fastWide = Dedup.simhashPairsMultiIndex(docs, "text", "doc_id", 3, bits = 60)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sWide = docs.select(col("doc_id").as("id"),
      graft.functions.HashExpressions.simhashBits(col("text"), 60).as("sh"))
    val bruteWide = sWide.as("a").join(sWide.as("b"), col("a.id") < col("b.id"))
      .filter(expr("bit_count(a.sh ^ b.sh)") <= 3)
      .select(col("a.id"), col("b.id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fastWide == bruteWide)
  }
}
