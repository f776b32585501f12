package graft

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Quality, Sampling, Similarity}

/** Round-7 second-wave operators: deterministic corpus shuffle (X73),
 *  hashed linear classifier (X74), SCD2 history (X75), CSV
 *  interchange (X76), Gram matrix + PCA basis (X77). */
class ShuffleScd2GramSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  /** JVM twin of [[graft.functions.Hashing.h60]] for hand oracles. */
  private def h60jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  // -------------------------------------------- X73 deterministic shuffle

  test("deterministicShuffle assigns a 0..n-1 bijection") {
    val out = Sampling.deterministicShuffle(docs, "doc_id", "s1|")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = docs.count()
    assert(out.length == n)
    assert(out.map(_._2).sorted.toSeq == (0L until n).toSeq)
  }

  test("deterministicShuffle is partitioning-invariant and salt-sensitive") {
    val a = Sampling.deterministicShuffle(docs.repartition(3), "doc_id", "s1|")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Sampling.deterministicShuffle(docs.repartition(7), "doc_id", "s1|")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "same salt must give the same permutation under any partitioning")
    val c = Sampling.deterministicShuffle(docs, "doc_id", "s2|")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a != c, "a different salt must draw a different permutation")
  }

  // ------------------------------------------------ X74 hashed classifier

  test("hashedClassifierScore matches the per-occurrence hand model") {
    val df = Seq((1L, " The  quick fox  "), (2L, ""), (3L, "a")).toDF("id", "t")
    val out = Quality.hashedClassifierScore(df, "id", "t", 4096, "w7")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    def w(tok: String): Long =
      h60jvm("w7|" + (h60jvm(tok) % 4096)) % 2001 - 1000
    val exp1 = Seq("the", "quick", "fox").map(w).sum.toDouble / 3
    assert(out(1L) == ((3L, Some(exp1))))
    assert(out(2L) == ((0L, None)), "token-free doc scores NULL")
    assert(out(3L) == ((1L, Some(w("a").toDouble))))
  }

  test("hashedClassifierScore kernel path equals the split/explode model") {
    def wCol(t: org.apache.spark.sql.Column) =
      graft.functions.Hashing.h60(concat(lit("w7|"),
        (graft.functions.Hashing.h60(t) % 4096).cast("string"))) % 2001L - 1000L
    val model = docs.select(col("doc_id"),
        explode(graft.functions.TextFunctions.lowerTokens(col("text"))).as("t"))
      .filter(col("t") =!= "")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        (sum(wCol(col("t"))).cast("double") / count(lit(1))).as("score"))
    val kernel = Quality.hashedClassifierScore(docs, "doc_id", "text", 4096, "w7")
      .filter(col("n_tok") > 0)
    assert(kernel.exceptAll(model).isEmpty && model.exceptAll(kernel).isEmpty)
  }

  test("hashedClassifierScore is one narrow pass — no shuffle, no explode") {
    val plan = Quality.hashedClassifierScore(docs, "doc_id", "text", 4096, "w7")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Generate"), plan)
  }

  // ------------------------------------------------------ X75 SCD2 history

  test("scd2History: versions chain, deletes close, one current per live key") {
    val log = Seq(
      // key 1: base insert → update → update (three versions)
      (1L, 0L, "u", "v0", 10.0), (1L, 5L, "u", "v1", 11.0),
      (1L, 9L, "u", "v2", 12.0),
      // key 2: base insert closed by a delete — history only, no current
      (2L, 0L, "u", "b", 20.0), (2L, 7L, "d", null, 0.0),
      // key 3: untouched base insert
      (3L, 0L, "u", "c", 30.0)
    ).toDF("k", "seq", "op", "s", "v")
    val out = Cdc.scd2History(log, "k", "seq", "op", Seq("s", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5))).toList
      .sortBy(t => (t._1, t._3))
    assert(out == List(
      (1L, "v0", 0L, Some(5L), false),
      (1L, "v1", 5L, Some(9L), false),
      (1L, "v2", 9L, None, true),
      (2L, "b", 0L, Some(7L), false), // closed by the delete, not current
      (3L, "c", 0L, None, true)))
  }

  test("scd2History's current versions agree with applyChanges") {
    val base = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "s", "v")
    val changes = Seq(
      (1L, 4L, "u", "a2", 1.5), (1L, 6L, "u", "a3", 1.7),
      (2L, 5L, "d", null, 0.0), (9L, 2L, "u", "new", 9.0)
    ).toDF("k", "seq", "op", "s", "v")
    val log = base.select(col("k"), lit(0L).as("seq"), lit("u").as("op"),
      col("s"), col("v")).unionAll(changes)
    val current = Cdc.scd2History(log, "k", "seq", "op", Seq("s", "v"))
      .filter(col("is_current"))
      .select("k", "s", "v")
    val merged = Cdc.applyChanges(base, changes, "k", "seq", "op")
    assert(current.exceptAll(merged).isEmpty && merged.exceptAll(current).isEmpty)
  }

  // --------------------------------------------------- X76 CSV interchange

  test("csv round-trip survives quotes, commas, and embedded newlines") {
    val gnarly = Seq(
      (1L, "plain text"),
      (2L, "comma, separated, values"),
      (3L, "a \"quoted\" phrase"),
      (4L, "line one\nline two"),
      (5L, "trailing backslash \\ and \"q\",")).toDF("id", "t")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_spec_").toString
    gnarly.write.mode("overwrite").option("compression", "gzip")
      .option("header", "true").option("escape", "\"").csv(dir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("t",
        org.apache.spark.sql.types.StringType)))
    val back = spark.read.schema(schema).option("header", "true")
      .option("escape", "\"").option("multiLine", "true").csv(dir)
    assert(back.exceptAll(gnarly).isEmpty && gnarly.exceptAll(back).isEmpty)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  // ------------------------------------------- X78 vocabulary coverage

  test("vocabCoverage counts OOV occurrences against the top-V cut") {
    val df = Seq(
      (1L, "a a a b b c"),    // a:3 b:2 c:1
      (2L, "a b c d"),        // d is rare
      (3L, "d d")).toDF("doc_id", "text")
    // corpus counts: a=4, b=3, d=3, c=2 → top-2 vocab (cnt DESC, t
    // ASC tiebreak): {a, b} — b beats d on the tie
    val out = graft.operators.Curation.vocabCoverage(df, "text", "doc_id", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((6L, 1L, 1.0 / 6.0)))  // c OOV
    assert(out(2L) == ((4L, 2L, 0.5)))        // c, d OOV
    assert(out(3L) == ((2L, 2L, 1.0)))        // all OOV
  }

  test("vocabCoverage broadcasts the vocab into the posting join") {
    val plan = graft.operators.Curation.vocabCoverage(docs, "text", "doc_id", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  // --------------------------------------------- X79 shard assignment

  test("shardAssign slices the permutation into contiguous near-equal shards") {
    val out = Sampling.shardAssign(docs, "doc_id", "s1|", 7)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val n = out.length
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet == (0L until 7L).toSet)
    // sizes differ by at most one
    val sizes = byShard.values.map(_.size).toSeq
    assert(sizes.max - sizes.min <= 1, sizes.toString)
    // contiguous position ranges, in shard order, covering 0..n-1
    val ranges = byShard.toSeq.sortBy(_._1)
      .map { case (s, xs) => (s, xs.map(_._1).min, xs.map(_._1).max) }
    assert(ranges.head._2 == 0L && ranges.last._3 == n - 1)
    ranges.sliding(2).foreach { case Seq((_, _, hi), (_, lo, _)) =>
      assert(lo == hi + 1, s"shards must tile the position range: $ranges")
    case _ => ()
    }
  }

  test("shardManifest totals reconcile with the corpus") {
    val m = Sampling.shardManifest(docs, "doc_id", "n_chars", "s1|", 5)
      .collect()
    assert(m.map(_.getLong(1)).sum == docs.count())
    val chars = docs.agg(sum(col("n_chars"))).head().getLong(0)
    assert(m.map(_.getLong(2)).sum == chars)
  }

  // ------------------------------------------------- X77 gram matrix / PCA

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("gramMatrix equals the naive driver-side computation") {
    val out = Similarity.gramMatrix(emb, "embedding", 64)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt) -> r.getLong(2))
      .toMap
    assert(out.size == 64 * 65 / 2)
    val vecs = emb.select("embedding").collect()
      .map(_.getSeq[Float](0).map(x =>
        math.floor(x.toDouble * 1024.0 + 0.5).toLong).toArray)
    for (i <- 0 until 64; j <- i until 64) {
      val expect = vecs.map(v => v(i) * v(j)).sum
      assert(out((i, j)) == expect, s"gram($i,$j)")
    }
  }

  test("pcaBasis: eigenpairs satisfy A·v = λ·v, descending, orthonormal") {
    val gram = Similarity.gramMatrix(emb, "embedding", 64)
      .collect().map(r => (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2)))
      .toSeq
    val (eigs, vecs) = Similarity.pcaBasis(gram, 64)
    val a = Array.ofDim[Double](64, 64)
    gram.foreach { case (i, j, s) =>
      a(i)(j) = s / 1048576.0; a(j)(i) = a(i)(j)
    }
    assert(eigs.zip(eigs.tail).forall { case (x, y) => x >= y - 1e-9 },
      "eigenvalues must descend")
    val scale = eigs.map(math.abs).max
    for (k <- 0 until 64) {
      val v = vecs(k)
      val av = (0 until 64).map(i =>
        (0 until 64).map(j => a(i)(j) * v(j)).sum)
      for (i <- 0 until 64)
        assert(math.abs(av(i) - eigs(k) * v(i)) <= 1e-6 * scale,
          s"eigen equation fails at component $i of vector $k")
    }
    for (k <- 0 until 64; l <- k until 64) {
      val d = (0 until 64).map(i => vecs(k)(i) * vecs(l)(i)).sum
      val expect = if (k == l) 1.0 else 0.0
      assert(math.abs(d - expect) <= 1e-9, s"orthonormality ($k,$l): $d")
    }
  }

  test("gramMatrix randomized: naive-equal, null-safe, partitioning-invariant") {
    val dim = 8
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 20 + rnd.nextInt(30)
      val rows: Seq[Option[Seq[Float]]] = (0 until n).map { i =>
        if (i % 11 == 10) None // null vectors must be skipped, not crash
        else Some(Seq.fill(dim)((rnd.nextDouble() * 8 - 4).toFloat))
      }
      val df = rows.toDF("embedding")
      val out = Similarity.gramMatrix(df.repartition(7), "embedding", dim)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val out1 = Similarity.gramMatrix(df.repartition(1), "embedding", dim)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(out == out1, "partitioning must not change exact sums")
      val qs = rows.flatten.map(_.map(x =>
        math.floor(x.toDouble * 1024.0 + 0.5).toLong).toArray)
      for (i <- 0 until dim; j <- i until dim)
        assert(out((i.toLong, j.toLong)) == qs.map(v => v(i) * v(j)).sum,
          s"seed=$seed gram($i,$j)")
    }
  }

  test("scd2History randomized: interval chains partition each key's timeline") {
    for (seed <- Seq(3, 19)) {
      val rnd = new scala.util.Random(seed)
      val log = (0 until 120).map { i =>
        val k = rnd.nextInt(12).toLong
        val op = if (rnd.nextInt(4) == 0) "d" else "u"
        (k, i.toLong, op, s"p$i", rnd.nextDouble())
      }
      val df = log.toDF("k", "seq", "op", "s", "v")
      val out = Cdc.scd2History(df, "k", "seq", "op", Seq("s", "v"))
        .collect().map(r => (r.getLong(0), r.getLong(3),
          Option(r.get(4)).map(_.asInstanceOf[Long]), r.getBoolean(5)))
      assert(out.length == log.count(_._3 != "d"))
      for ((k, changes) <- log.groupBy(_._1)) {
        val seqs = changes.map(_._2).sorted
        val next = seqs.zip(seqs.drop(1).map(Option(_)) :+ None).toMap
        val mine = out.filter(_._1 == k)
        for ((_, vf, vt, cur) <- mine) {
          assert(vt == next(vf), s"seed=$seed key=$k version at $vf")
          assert(cur == vt.isEmpty)
        }
        // exactly one current version iff the key's LAST op is not a delete
        val lastIsDelete = changes.maxBy(_._2)._3 == "d"
        assert(mine.count(_._4) == (if (lastIsDelete) 0 else 1),
          s"seed=$seed key=$k currents")
      }
    }
  }

  test("gramMatrix's exchange carries one dense buffer per task, not corpus rows") {
    val plan = Similarity.gramMatrix(emb, "embedding", 64)
      .queryExecution.executedPlan.toString
    // the dense gramSum aggregate partial-folds per task; the ONLY
    // exchange is the single-partition buffer merge — no per-entry
    // (i,j) hash exchange, and the posexplode unpack sits ABOVE the
    // aggregate (one merged row), never below it on corpus rows
    assert(plan.contains("graft_gram_sum"), plan)
    assert(plan.contains("Exchange SinglePartition"), plan)
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    val genAt = plan.indexOf("Generate")
    val aggAt = plan.lastIndexOf("Aggregate")
    assert(genAt >= 0 && genAt < aggAt,
      s"posexplode must sit above the aggregate in the plan tree:\n$plan")
  }
}
