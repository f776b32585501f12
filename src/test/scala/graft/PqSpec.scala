package graft

import graft.operators.Similarity

/** Product-quantization contracts (X124–X126):
 *   - pqEncode ≡ an INDEPENDENT plain-Scala replay of the documented
 *     Lloyd contract (k-lowest-id init, fixed-point quantized means,
 *     lower-c_id ties, empty-cell inheritance) applied per subspace;
 *   - the m=1 slice is EXACTLY kmeansAssign — one degenerate subspace
 *     is the judged q43/q148 codebook, so the PQ path can never drift
 *     from the k-means rows it reuses;
 *   - distortion is analytically ZERO when every vector is its own
 *     centroid (the fixed-point mean of a singleton cell dequantizes
 *     within 2⁻³¹ per dim — under the ⌊err·2³⁰+½⌋ quantum), and
 *     otherwise ≡ the reference's quantize-then-sum integers;
 *   - ivfPqTopK ≡ an independent replay of probe → LUT → integer ADC
 *     → (adc DESC, n_id) rank, and probing ALL cells equals the
 *     unpruned PQ-ADC brute ranking. */
class PqSpec extends SparkTestBase {

  private val dim = 16

  private def vec(id: Long, salt: Int): Seq[Float] =
    (0 until dim).map { d =>
      val h = scala.util.hashing.MurmurHash3
        .productHash((id, d, salt)) & 0xffff
      (h.toFloat / 65536.0f) * 2.0f - 1.0f
    }

  private def embDF(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  private def corpus(n: Int, salt: Int): Map[Long, Seq[Double]] =
    (0L until n.toLong).map(i => i -> vec(i, salt).map(_.toDouble)).toMap

  private def corpusDF(vs: Map[Long, Seq[Double]]) =
    embDF(vs.toSeq.sortBy(_._1)
      .map { case (id, v) => (id, v.map(_.toFloat), 0) })

  // ---------------------------------------------- independent reference

  private def dot(a: Seq[Double], b: Seq[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < math.min(a.length, b.length)) { s += a(i) * b(i); i += 1 }
    s
  }

  private def q30(x: Double): Long =
    math.floor(x * 1073741824.0 + 0.5).toLong

  private def nearest(v: Seq[Double],
      cents: Seq[(Long, Seq[Double])]): Long =
    cents.map { case (cid, cv) =>
      (dot(v, cv) * -2.0 + dot(cv, cv), cid) }.minBy(identity)._2

  /** The documented Lloyd contract, re-implemented from the prose —
   *  no shared code with Similarity. */
  private def refLloyd(vs: Map[Long, Seq[Double]], k: Int,
      iters: Int): Seq[(Long, Seq[Double])] = {
    var cents = vs.filter(_._1 < k).toSeq.sortBy(_._1)
    for (_ <- 0 until iters) {
      val byCell = vs.toSeq.map { case (_, v) => (nearest(v, cents), v) }
        .groupBy(_._1).map { case (cid, xs) =>
          val d = xs.head._2.length
          cid -> (0 until d).map { p =>
            val sq = xs.map(x => q30(x._2(p))).sum
            (sq.toDouble / xs.size.toDouble) / 1073741824.0
          }
        }
      cents = cents.map { case (cid, cv) => (cid, byCell.getOrElse(cid, cv)) }
    }
    cents
  }

  private def slices(v: Seq[Double], m: Int): Seq[Seq[Double]] = {
    val d = v.length / m
    (0 until m).map(j => v.slice(j * d, (j + 1) * d))
  }

  private def refBooks(vs: Map[Long, Seq[Double]], m: Int, ks: Int,
      iters: Int): Seq[Seq[(Long, Seq[Double])]] =
    (0 until m).map { j =>
      refLloyd(vs.map { case (id, v) => id -> slices(v, m)(j) }, ks, iters)
    }

  private def refCodes(vs: Map[Long, Seq[Double]], m: Int, ks: Int,
      iters: Int): Map[(Long, Long), Long] = {
    val books = refBooks(vs, m, ks, iters)
    vs.flatMap { case (id, v) =>
      slices(v, m).zipWithIndex.map { case (vj, j) =>
        (id, j.toLong) -> nearest(vj, books(j))
      }
    }
  }

  // ----------------------------------------------------------- encode

  test("pqEncode ≡ independent per-subspace Lloyd reference") {
    val vs = corpus(60, 3)
    val got = Similarity.pqEncode(corpusDF(vs), 4, 4, 2, dim).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.size === 60 * 4)
    assert(got === refCodes(vs, 4, 4, 2))
  }

  test("pqEncode m=1 is EXACTLY kmeansAssign — the degenerate subspace is q43's codebook") {
    val vs = corpus(50, 5)
    val codes = Similarity.pqEncode(corpusDF(vs), 1, 5, 3, dim).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val cells = Similarity.kmeansAssign(corpusDF(vs), 5, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(codes === cells)
  }

  // ------------------------------------------------------- distortion

  test("pqDistortion ≡ reference quantize-then-sum; zero when every vector is a centroid") {
    val vs = corpus(40, 7)
    val m = 4; val ks = 4; val iters = 2
    val books = refBooks(vs, m, ks, iters)
    val want = (0 until m).map { j =>
      val errs = vs.values.map { v =>
        val vj = slices(v, m)(j)
        val cv = books(j).find(_._1 == nearest(vj, books(j))).get._2
        val w = vj.zip(cv).map { case (a, b) => a - b }
        q30(dot(w, w))
      }
      (j.toLong, errs.size.toLong, errs.sum)
    }
    val got = Similarity.pqDistortion(corpusDF(vs), m, ks, iters, dim)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got === want)
    // singleton cells: the fixed-point mean dequantizes within 2⁻³¹
    // per dim — err·2³⁰ < ½ everywhere, so the report is exactly 0
    val tiny = corpus(6, 9)
    val zero = Similarity.pqDistortion(corpusDF(tiny), 2, 6, 1, dim)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(zero.toSeq === Seq.fill(2)((6L, 0L)))
  }

  // ----------------------------------------------------------- IVF-PQ

  private def refIvfPq(vs: Map[Long, Seq[Double]], nQueries: Int, k: Int,
      kc: Int, m: Int, ks: Int, iters: Int,
      nprobe: Int): Seq[(Long, Long, Long, Long)] = {
    val coarse = refLloyd(vs, kc, iters)
    val books = refBooks(vs, m, ks, iters)
    val codes = refCodes(vs, m, ks, iters)
    val cells = vs.map { case (id, v) => id -> nearest(v, coarse) }
    vs.keys.filter(_ < nQueries).toSeq.sorted.flatMap { qid =>
      val qv = vs(qid)
      val probed = coarse.map { case (cid, cv) =>
        (dot(qv, cv) * -2.0 + dot(cv, cv), cid) }
        .sorted.take(nprobe).map(_._2).toSet
      val lut = slices(qv, m).zipWithIndex.map { case (qj, j) =>
        books(j).map { case (cid, cv) => cid -> q30(dot(qj, cv)) }.toMap
      }
      val scored = vs.keys
        .filter(id => id != qid && probed(cells(id))).toSeq
        .map { id =>
          (id, (0 until m).map(j => lut(j)(codes((id, j.toLong)))).sum)
        }
      scored.sortBy { case (id, adc) => (-adc, id) }.take(k)
        .zipWithIndex.map { case ((id, adc), r) =>
          (qid, id, (r + 1).toLong, adc) }
    }
  }

  test("ivfPqTopK ≡ independent probe→LUT→integer-ADC→rank replay") {
    val vs = corpus(80, 11)
    val got = Similarity.ivfPqTopK(corpusDF(vs), 3, 4, 4, 4, 4, 2, dim, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(got === refIvfPq(vs, 3, 4, 4, 4, 4, 2, 2))
    // pruning is real: fewer candidates reachable than the corpus
    assert(got.nonEmpty && got.size <= 3 * 4)
  }

  test("ivfPqRerank ≡ reference ADC candidates re-scored in exact cosine") {
    val vs = corpus(70, 17)
    val (nq, k, kc, m, ks, iters, nprobe, rr) = (3, 3, 4, 4, 4, 2, 2, 3)
    val got = Similarity.ivfPqRerank(corpusDF(vs), nq, k, kc, m, ks,
        iters, dim, nprobe, rr).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    def nrm(v: Seq[Double]) = math.sqrt(dot(v, v))
    val want = refIvfPq(vs, nq, k * rr, kc, m, ks, iters, nprobe)
      .groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (qid, cands) =>
        cands.map { case (_, id, _, _) =>
          (id, dot(vs(qid), vs(id)) / (nrm(vs(qid)) * nrm(vs(id)))) }
          .sortBy { case (id, sim) => (-sim, id) }.take(k)
          .zipWithIndex.map { case ((id, _), r) => (qid, id, (r + 1).toLong) }
      }
    assert(got === want)
  }

  test("ivfPqRerank exhaustive limit (probe ALL, rerank ≥ n/k) ≡ knnBrute exactly") {
    val vs = corpus(36, 19)
    val kc = 3
    val got = Similarity.ivfPqRerank(corpusDF(vs), 2, 4, kc, 4, 4, 2,
        dim, kc, 9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    val brute = Similarity.knnBrute(corpusDF(vs), 2, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(x => (x._1, x._4)).toSeq
    assert(got === brute)
  }

  // ------------------------------------------------- residual IVF-PQ

  private def refIvfPqRes(vs: Map[Long, Seq[Double]], nQueries: Int,
      k: Int, kc: Int, m: Int, ks: Int, iters: Int,
      nprobe: Int): Seq[(Long, Long, Long, Long)] = {
    val coarse = refLloyd(vs, kc, iters)
    val cents = coarse.toMap
    val cells = vs.map { case (id, v) => id -> nearest(v, coarse) }
    val residuals = vs.map { case (id, v) =>
      id -> v.zip(cents(cells(id))).map { case (a, b) => a - b } }
    val books = refBooks(residuals, m, ks, iters)
    val codes = residuals.flatMap { case (id, r) =>
      slices(r, m).zipWithIndex.map { case (rj, j) =>
        (id, j) -> nearest(rj, books(j)) }
    }
    vs.keys.filter(_ < nQueries).toSeq.sorted.flatMap { qid =>
      val qv = vs(qid)
      val probed = coarse.map { case (cid, cv) =>
        (dot(qv, cv) * -2.0 + dot(cv, cv), cid) }
        .sorted.take(nprobe).map(_._2).toSet
      val wc = coarse.map { case (cid, cv) => cid -> q30(dot(qv, cv)) }.toMap
      val lutr = slices(qv, m).zipWithIndex.map { case (qj, j) =>
        books(j).map { case (cid, cv) => cid -> q30(dot(qj, cv)) }.toMap
      }
      vs.keys.filter(id => id != qid && probed(cells(id))).toSeq
        .map { id =>
          (id, wc(cells(id))
            + (0 until m).map(j => lutr(j)(codes((id, j)))).sum)
        }
        .sortBy { case (id, adc) => (-adc, id) }.take(k)
        .zipWithIndex.map { case ((id, adc), r) =>
          (qid, id, (r + 1).toLong, adc) }
    }
  }

  test("ivfPqResTopK ≡ independent residual-IVFADC replay") {
    val vs = corpus(75, 23)
    val got = Similarity.ivfPqResTopK(corpusDF(vs), 3, 4, 4, 4, 4, 2,
        dim, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(got === refIvfPqRes(vs, 3, 4, 4, 4, 4, 2, 2))
  }

  test("residual codes beat raw-vector codes: lower reconstruction error on a clustered corpus") {
    // tight clusters around far-apart centers: the residual (within-
    // cluster displacement) has far lower variance than the vector,
    // so residual codebooks reconstruct better — the reason IVFADC
    // encodes residuals. Measured via each family's own ADC score
    // error against the exact dot product, summed over query 0.
    val centers = (0 until 3).map(c => vec(c * 100L + 57L, 29).map(_ * 3.0f))
    val vs: Map[Long, Seq[Double]] = (0L until 60L).map { i =>
      val c = centers((i % 3).toInt)
      i -> c.zipWithIndex.map { case (x, d) =>
        x + 0.05 * (((i * 17 + d * 3) % 9) - 4) }.map(_.toFloat.toDouble)
    }.toMap
    val (kc, m, ks, iters) = (3, 4, 4, 2)
    def adcErr(rows: Seq[(Long, Long, Long, Long)]): Double = {
      val exact = vs.map { case (id, v) => id -> dot(vs(0L), v) }
      rows.filter(_._1 == 0L)
        .map { case (_, id, _, adc) =>
          math.abs(adc / 1073741824.0 - exact(id)) }.sum
    }
    val plain = Similarity.ivfPqTopK(corpusDF(vs), 1, 59, kc, m, ks,
        iters, dim, kc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val resid = Similarity.ivfPqResTopK(corpusDF(vs), 1, 59, kc, m, ks,
        iters, dim, kc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(plain.size === 59 && resid.size === 59)
    assert(adcErr(resid) < adcErr(plain),
      s"residual ADC error ${adcErr(resid)} not below plain ${adcErr(plain)}")
  }

  test("materialized PQ index ≡ the direct ivfPqTopK; foreign fingerprint rejected") {
    import org.apache.spark.sql.functions.col
    val vs = corpus(60, 31)
    val df = corpusDF(vs)
    val dir = java.nio.file.Files.createTempDirectory("graft_pqix_spec")
      .toString
    Similarity.materializePqIndex(df, dir, 4, 4, 4, 2, dim, "fp1")
    val q = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val got = Similarity.ivfPqTopKIndexed(spark, dir, q, 4, 2, Some("fp1"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    val direct = Similarity.ivfPqTopK(df, 3, 4, 4, 4, 4, 2, dim, 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    assert(got === direct,
      "stored-codebook probe must equal the direct one-shot search")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopKIndexed(spark, dir, q, 4, 2, Some("other"))
    }
    assert(ex.getMessage.contains("fp1"))
  }

  test("ivfPqTopK probing ALL cells ≡ the unpruned PQ-ADC brute ranking") {
    val vs = corpus(48, 13)
    val kc = 3
    val got = Similarity.ivfPqTopK(corpusDF(vs), 2, 5, kc, 4, 4, 2, dim, kc)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    // reference with every cell probed = no coarse filter at all
    val books = refBooks(vs, 4, 4, 2)
    val codes = refCodes(vs, 4, 4, 2)
    val want = vs.keys.filter(_ < 2).toSeq.sorted.flatMap { qid =>
      val lut = slices(vs(qid), 4).zipWithIndex.map { case (qj, j) =>
        books(j).map { case (cid, cv) => cid -> q30(dot(qj, cv)) }.toMap
      }
      vs.keys.filter(_ != qid).toSeq
        .map(id => (id, (0 until 4).map(j => lut(j)(codes((id, j.toLong)))).sum))
        .sortBy { case (id, adc) => (-adc, id) }.take(5)
        .zipWithIndex.map { case ((id, adc), r) => (qid, id, (r + 1).toLong, adc) }
    }
    assert(got === want)
  }

  // --------------------------------- X131 appendable IVF-PQ index

  /** Independent replay of a probe against an index TRAINED on
   *  `trainIds` and currently holding `visibleIds` — the frozen-
   *  codebook contract re-derived from the prose: books/coarse from
   *  the train slice only, every visible row encoded against them. */
  private def refAppendProbe(vs: Map[Long, Seq[Double]],
      trainIds: Set[Long], visibleIds: Set[Long], qids: Seq[Long],
      k: Int, kc: Int, m: Int, ks: Int, iters: Int,
      nprobe: Int): Seq[(Long, Long, Long, Long)] = {
    val trainVs = vs.filter(t => trainIds(t._1))
    val coarse = refLloyd(trainVs, kc, iters)
    val books = (0 until m).map { j =>
      refLloyd(trainVs.map { case (id, v) => id -> slices(v, m)(j) },
        ks, iters)
    }
    qids.sorted.flatMap { qid =>
      val qv = vs(qid)
      val probed = coarse.map { case (cid, cv) =>
          (dot(qv, cv) * -2.0 + dot(cv, cv), cid) }
        .sortBy(identity).take(nprobe).map(_._2).toSet
      val lut = slices(qv, m).zipWithIndex.map { case (qj, j) =>
        books(j).map { case (cid, cv) => cid -> q30(dot(qj, cv)) }.toMap
      }
      visibleIds.filter(_ != qid).toSeq
        .filter(id => probed(nearest(vs(id), coarse)))
        .map { id =>
          val adc = slices(vs(id), m).zipWithIndex
            .map { case (vj, j) => lut(j)(nearest(vj, books(j))) }.sum
          (id, adc)
        }
        .sortBy { case (id, adc) => (-adc, id) }.take(k)
        .zipWithIndex.map { case ((id, adc), r) =>
          (qid, id, (r + 1).toLong, adc) }
    }
  }

  test("appendToPqIndex: frozen-codebook growth ≡ replay; un-appended rows invisible; idempotent; foreign fp rejected") {
    import org.apache.spark.sql.functions.col
    val vs = corpus(60, 47)
    val df = corpusDF(vs)
    val train = vs.keys.filter(_ % 4 != 3).toSet
    val b1 = vs.keys.filter(_ % 8 == 3).toSet
    val b2 = vs.keys.filter(_ % 8 == 7).toSet
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqix_append_spec").toString
    Similarity.materializePqIndex(df.filter(col("vec_id") % 4 =!= 3),
      dir, 4, 4, 4, 2, dim, "fpA")
    Similarity.appendToPqIndex(dir,
      df.filter(col("vec_id") % 8 === 3), "b1", Some("fpA"))
    val q = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    def probe() = Similarity
      .ivfPqTopKIndexed(spark, dir, q, 4, 2, Some("fpA"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    val got1 = probe()
    assert(got1 === refAppendProbe(vs, train, train ++ b1,
      Seq(0L, 1L, 2L), 4, 4, 4, 4, 2, 2))
    // segment isolation: nothing from the un-appended b2 surfaces
    assert(got1.forall(t => !b2.contains(t._2)))
    Similarity.appendToPqIndex(dir,
      df.filter(col("vec_id") % 8 === 7), "b2", Some("fpA"))
    val got2 = probe()
    assert(got2 === refAppendProbe(vs, train, vs.keySet,
      Seq(0L, 1L, 2L), 4, 4, 4, 4, 2, 2))
    // redelivered append (same segment name) replaces itself
    Similarity.appendToPqIndex(dir,
      df.filter(col("vec_id") % 8 === 7), "b2", Some("fpA"))
    assert(probe() === got2)
    val ex = intercept[IllegalArgumentException] {
      Similarity.appendToPqIndex(dir, df, "bX", Some("other"))
    }
    assert(ex.getMessage.contains("fpA"))

    // ---- X133 compaction: content identity, one live segment,
    // redelivered folded append invisible, second compact a no-op
    assert(Similarity.compactPqIndex(spark, dir),
      "three live segments must fold")
    val liveAfter = graft.operators.Layout.zLiveSegments(s"$dir/codes")
    assert(liveAfter.size === 1 &&
      graft.core.StoreFs.name(liveAfter.head).startsWith("cbase-"))
    assert(probe() === got2,
      "compaction is content identity: probe unchanged")
    // a redelivered append of a FOLDED segment name must be a no-op
    Similarity.appendToPqIndex(dir,
      df.filter(col("vec_id") % 8 === 7), "b2", Some("fpA"))
    assert(graft.operators.Layout.zLiveSegments(s"$dir/codes").size === 1)
    assert(probe() === got2)
    // nothing left to fold
    assert(!Similarity.compactPqIndex(spark, dir))
  }

  test("pqIngest (X141): drained stream ≡ sequential appends; full redelivery replaces, never duplicates") {
    import org.apache.spark.sql.functions.col
    val vs = corpus(60, 48)
    val df = corpusDF(vs)
    val out = graft.streaming.Streams.scratchDir("graft_pqingest_spec_")
    val ix = s"$out/pqix"
    Similarity.materializePqIndex(df.filter(col("vec_id") % 4 =!= 3),
      ix, 4, 4, 4, 2, dim, "fpS")
    val b1 = df.filter(col("vec_id") % 8 === 3)
    val b2 = df.filter(col("vec_id") % 8 === 7)
    b1.coalesce(1).write.parquet(s"$out/stream/b1")
    b2.coalesce(1).write.parquet(s"$out/stream/b2")
    // order the two files' mtimes so the file source batches b1 first
    val fs = new java.io.File(s"$out/stream")
    def partOf(sub: String) = new java.io.File(fs, sub).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    partOf("b1").setLastModified(1600000000000L)
    partOf("b2").setLastModified(1600000060000L)
    val q = df.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding"))
    def probe() = Similarity
      .ivfPqTopKIndexed(spark, ix, q, 4, 2, Some("fpS"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(x => (x._1, x._3)).toSeq
    def drain(ckpt: String): Unit = {
      val stream = spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$out/stream/*/")
      val sq = graft.streaming.Streams.pqIngest(stream, ix, Some("fpS")) {
          _ => ()
        }
        .option("checkpointLocation", s"$out/$ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      sq.awaitTermination()
    }
    drain("ckpt1")
    val got = probe()
    // drained stream ≡ the sequential appendToPqIndex replay
    val train = vs.keys.filter(_ % 4 != 3).toSet
    assert(got === refAppendProbe(vs, train, vs.keySet,
      Seq(0L, 1L, 2L), 4, 4, 4, 4, 2, 2))
    val segs = graft.operators.Layout.zLiveSegments(s"$ix/codes").sorted
    // a FRESH checkpoint replays every batch: segments named by
    // batchId overwrite themselves, so the index must be unchanged —
    // the at-least-once contract of the ingest
    drain("ckpt2")
    assert(probe() === got, "redelivered drain must be content identity")
    assert(graft.operators.Layout.zLiveSegments(s"$ix/codes").sorted === segs,
      "redelivered drain must not add segments")
  }
}
