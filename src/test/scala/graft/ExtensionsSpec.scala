package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.multimodal.Media
import graft.operators.{Dedup, Similarity}

/** Regression spec for the LLM-pipeline extension operators. Deep
 *  correctness is covered by the DuckDB oracle (local_verify.py);
 *  these pin structural invariants that survive without an oracle. */
class ExtensionsSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("exact dedup groups partition the corpus") {
    val g = Dedup.exactGroups(docs, "text", "doc_id")
    assert(g.agg(sum("n_copies")).collect()(0).getLong(0) == docs.count())
  }

  test("jaccard pairs are symmetric-free and within threshold") {
    val p = Dedup.jaccardPairs(docs, "text", "doc_id", "lang", 3, 0.5).collect()
    assert(p.forall(r => r.getLong(0) < r.getLong(1)))
    assert(p.forall(_.getDouble(2) >= 0.5))
  }

  test("minhash LSH candidates superset the blocked-jaccard pairs at equal tau") {
    val brute = Dedup.jaccardPairs(docs, "text", "doc_id", "lang", 3, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 16, 4, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 16 perms / 4 bands has ≈1.0 catch probability at j≥0.8 on this data
    assert(brute.subsetOf(lsh), s"missed: ${brute -- lsh}")
  }

  test("bipartite incremental dedup ≡ the cross-split slice of the self-join") {
    import org.apache.spark.sql.functions.col
    val newDf = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val bi = Dedup.minhashLshPairsAgainst(newDf, corpus,
        "text", "doc_id", 3, 16, 4, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = Dedup.minhashLshPairs(docs, "text", "doc_id", 3, 16, 4, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val cross = full.flatMap { case (a, b) =>
      Seq(a -> b, b -> a).filter { case (n, c) => n % 10 == 0 && c % 10 != 0 }
    }.toSet
    assert(bi === cross, s"only-bi=${bi -- cross} only-self=${cross -- bi}")
    // re-ingesting a corpus doc flags itself at jac 1.0
    val self = Dedup.minhashLshPairsAgainst(
        corpus.limit(3), corpus, "text", "doc_id", 3, 16, 4, 0.8)
      .filter(col("new_id") === col("corpus_id")).collect()
    assert(self.length === 3 && self.forall(_.getDouble(2) === 1.0))
  }

  test("simhash is deterministic and pairs respect hamming bound") {
    val p = Dedup.simhashPairs(docs, "text", "doc_id", "lang", 3).collect()
    assert(p.forall(_.getLong(2) <= 3))
  }

  test("knn: cosine in [-1,1], k rows per query, self excluded") {
    val r = Similarity.knnBrute(emb, 3, 4).collect()
    assert(r.length == 3 * 4)
    assert(r.forall(x => math.abs(x.getDouble(2)) <= 1.0 + 1e-12))
    assert(r.forall(x => x.getLong(0) != x.getLong(1)))
  }

  test("ann lsh buckets: every reported neighbor shares the query bucket") {
    val e = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("bucket", Similarity.lshBucket("v", 6, 64))
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nn = Similarity.annLsh(emb, 6, 64).collect()
    assert(nn.nonEmpty)
    assert(nn.forall(r => e(r.getLong(0)) == e(r.getLong(1))))
  }

  test("adaptive planes: integer thresholds exact at powers of two, prefix-stable buckets") {
    import Similarity.adaptivePlanes
    // boundary exactness is the whole point (a float log2 could be off
    // by an ulp at exact powers of two and desync from the SQL twin)
    assert(adaptivePlanes(0) == 6 && adaptivePlanes(64L << 6) == 6)
    assert(adaptivePlanes((64L << 6) + 1) == 7)
    assert(adaptivePlanes(64L << 7) == 7 && adaptivePlanes((64L << 7) + 1) == 8)
    assert(adaptivePlanes(Long.MaxValue) == 16)
    // at driver SFs the adaptive form must be bit-identical to the
    // fixed 6-plane form (planeWeight is (p,d)-keyed ⇒ prefix-stable)
    assert(adaptivePlanes(emb.count()) == 6)
    val fixed = Similarity.annLsh(emb, 6, 64).collect().map(_.toSeq).toSet
    val adapt = Similarity.annLshAdaptive(emb, 64).collect().map(_.toSeq).toSet
    assert(adapt == fixed)
  }

  test("jaccard prefix filter stays lossless across thresholds") {
    // a lower tau widens prefixes and weakens every prune; if the 0.5
    // run's df-ordered prefix dropped a true pair, the relaxed run
    // would surface it here
    val hi = Dedup.jaccardPairs(docs, "text", "doc_id", "lang", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lo = Dedup.jaccardPairs(docs, "text", "doc_id", "lang", 3, 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._3 >= 0.5).toSet
    assert(hi == lo)
  }

  test("grid ann: neighbors share the query's cell; level thresholds integer-exact") {
    import Similarity.adaptiveGridLevel
    assert(adaptiveGridLevel(500) == 2 && adaptiveGridLevel(1500) == 2)
    assert(adaptiveGridLevel(1501) == 3 && adaptiveGridLevel(12001) == 4)
    assert(adaptiveGridLevel(200000) == 6)
    val k = adaptiveGridLevel(emb.count())
    val e = emb.select(col("vec_id"),
        expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("nrm",
        sqrt(graft.functions.VectorExpressions.dot(col("v"), col("v"))))
      .withColumn("bucket", Similarity.gridCellExpr("v", "nrm", 4, k, 64))
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nn = Similarity.annGrid(emb, 64).collect()
    assert(nn.nonEmpty)
    assert(nn.forall(r => e(r.getLong(0)) == e(r.getLong(1))))
  }

  test("termCounts kernel ≡ builtin split/filter counts; bm25 shape is sane") {
    import graft.operators.Retrieval
    val terms = Seq("join", "hash", "zyzzyva")
    // kernel vs the builtin formulation it fuses (same tokenizer contract)
    val both = docs.select(
      graft.functions.HashExpressions.termCounts(col("text"), terms).as("tc"),
      expr("size(filter(split(trim(lower(text)), '\\\\s+'), x -> x <> ''))").as("dl"),
      expr("size(filter(split(trim(lower(text)), '\\\\s+'), x -> x = 'join'))").as("c0"),
      expr("size(filter(split(trim(lower(text)), '\\\\s+'), x -> x = 'hash'))").as("c1"),
      expr("size(filter(split(trim(lower(text)), '\\\\s+'), x -> x = 'zyzzyva'))").as("c2"))
      .collect()
    both.foreach { r =>
      val tc = r.getSeq[Long](0)
      assert(tc == Seq(r.getInt(1).toLong, r.getInt(2).toLong,
        r.getInt(3).toLong, r.getInt(4).toLong))
    }
    // operator shape: per query ≤ k rows, rank contiguous from 1,
    // scores non-increasing; OOV-only query yields no rows
    val out = Retrieval.bm25TopK(docs, "text", "doc_id",
      Seq(1L -> "join hash", 2L -> "zyzzyva"), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet == Set(1L))
    val q1 = byQ(1L).sortBy(_._4)
    assert(q1.map(_._4).toSeq == (1L to q1.length))
    assert(q1.sliding(2).forall(p => p.length < 2 || p(0)._3 >= p(1)._3))
  }

  test("lexicon-backed bm25 ≡ inline bm25 (same stats from the materialized tables)") {
    import graft.operators.Retrieval
    val qs = Seq(1L -> "join hash", 2L -> "big slow qqqzzz")
    val inline = Retrieval.bm25TopK(docs, "text", "doc_id", qs, 4)
      .collect().map(_.toSeq).toSet
    val dir = java.nio.file.Files.createTempDirectory("lex").toString
    val lex = Retrieval.materializeLexicon(docs, "text", dir)
    val indexed = Retrieval.bm25TopKIndexed(docs, "text", "doc_id", lex, qs, 4)
      .collect().map(_.toSeq).toSet
    assert(indexed == inline)
    // the lexicon covers the full corpus vocabulary; OOV terms miss
    assert(lex.termDf.filter(col("t") === "qqqzzz").count() == 0)
    assert(lex.termDf.count() > 0)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("retrieval/grid edges: oversized k, tiny corpora, rejected empty query") {
    import graft.operators.Retrieval
    import spark.implicits._
    // k far beyond the match count: every matching doc ranks, no pad rows
    val tiny = Seq((1L, "alpha beta"), (2L, "alpha gamma"), (3L, "delta")).toDF("doc_id", "text")
    val r = Retrieval.bm25TopK(tiny, "text", "doc_id", Seq(1L -> "alpha"), 100)
      .collect()
    assert(r.map(_.getLong(1)).toSet == Set(1L, 2L) && r.map(_.getLong(3)).toSet == Set(1L, 2L))
    // empty / whitespace-only query is a loud construction error
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(tiny, "text", "doc_id", Seq(1L -> "   "), 5)
    }
    intercept[IllegalArgumentException] {
      Retrieval.bm25TopKSql("documents", "text", "doc_id", Seq(1L -> ""), 5)
    }
    // annGrid: single vector -> singleton cell -> no output row, no crash
    val one = Seq((0L, 0L, Array.fill(64)(0.5f))).toDF("vec_id", "label", "embedding")
    assert(graft.operators.Similarity.annGrid(one, 64).collect().isEmpty)
    // nproj beyond the packing width is rejected at construction
    intercept[IllegalArgumentException] {
      graft.operators.Similarity.gridCellExpr("v", "nrm", 6, 3, 64)
    }
  }

  test("media: decode is deterministic, features survive mapPartitions round-trip") {
    val feats = Media.extractFeatures(Media.fromDocuments(docs), parallelism = 7)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(f => f.width >= 1 && f.width <= 640))
    assert(rows.forall(f => f.n_bytes > 0))
    val again = Media.extractFeatures(Media.fromDocuments(docs)).collect()
    assert(rows.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq)
  }

  test("media: imageio reads true dimensions from real PNG/JPEG/GIF headers") {
    // round-trip through the JDK's own encoders — decode must return
    // the real rendered dimensions, not the stub formula
    val png = Media.encodePng(42L, 17, 23)
    assert(Media.imageDims(png) == Some((17, 23)))
    assert(png.take(8).toSeq ==
      Seq(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte.toInt & 0xff).map(_.toByte))
    val img = new java.awt.image.BufferedImage(5, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (fmt <- Seq("jpg", "gif", "bmp")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), fmt)
      assert(Media.imageDims(bos.toByteArray) == Some((5, 9)), fmt)
    }
    // non-image bytes: no reader claims them → None → decode falls
    // back to the stub instead of failing the task
    assert(Media.imageDims("not an image".getBytes) == None)
    assert(Media.imageDims(Array.emptyByteArray) == None)
    // truncated header: reader may claim it but fails → None
    assert(Media.imageDims(png.take(16).toArray) == None)
    val feats = Media.decode(graft.multimodal.MediaRecord(7L, png, "image/png"))
    assert((feats.width, feats.height, feats.n_frames) == ((17, 23, 1)))
  }

  test("media: javax.sound reads true WAV parameters from real headers") {
    val wav = Media.encodeWav(42L, 16000, 777)
    assert(wav.take(4).map(_.toChar).mkString == "RIFF")
    assert(Media.audioMeta(wav) == Some((16000.0f, 1, 777L)))
    // malformed / non-audio bytes: None, never an exception
    assert(Media.audioMeta("not audio".getBytes) == None)
    assert(Media.audioMeta(Array.emptyByteArray) == None)
    assert(Media.audioMeta(wav.take(10).toArray) == None)
  }

  test("media: animated-GIF frames round-trip with per-frame pixel content") {
    val gif = Media.encodeGif(9L, 12, 7, 5)
    assert(gif.take(6).map(_.toChar).mkString == "GIF89a")
    // demux: real frame count and dims off the container
    import spark.implicits._
    val one = Seq(graft.multimodal.MediaRecord(9L, gif, "image/gif")).toDS()
    val frames = Media.decodeFrames(one, 1).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3))).sorted
    assert(frames.toSeq == (0 until 5).map(i => (i, 12, 7)))
    // and the sampled PIXELS are the encoded ones (marker at 0,0)
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(gif))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    (0 until 5).foreach { f =>
      assert((reader.read(f).getRGB(0, 0) & 0xFFFF) == (((9L * 131) + f * 17) & 0xFFFF).toInt)
    }
    reader.dispose(); iis.close()
    // non-container payloads produce no frame rows
    val junk = Seq(graft.multimodal.MediaRecord(1L, "junk".getBytes, "video/mp4")).toDS()
    assert(Media.decodeFrames(junk, 1).collect().isEmpty)
  }

  test("media: resize really decodes, scales, and re-encodes image payloads") {
    import spark.implicits._
    val src = Seq(
      graft.multimodal.MediaRecord(1L, Media.encodePng(1L, 40, 30), "image/png"),
      graft.multimodal.MediaRecord(2L, Media.encodePng(2L, 3, 5), "image/png")).toDS()
    val out = Media.resize(src, 16, 12).collect().sortBy(_.doc_id)
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.mime == "image/png;resized=16x12")
      // re-decode: the emitted bytes are a REAL 16x12 PNG
      assert(Media.imageDims(r.bytes) == Some((16, 12)))
    }
    // scaled pixels derive from the source raster, not a constant fill
    assert(!java.util.Arrays.equals(out(0).bytes, out(1).bytes))
    // image mime with undecodable bytes falls back to the stub
    val bad = Seq(graft.multimodal.MediaRecord(3L, "junk".getBytes, "image/png")).toDS()
    val stub = Media.resize(bad, 16, 12).collect()(0)
    assert(stub.bytes.length == 16 * 12 / 64 && stub.mime.endsWith(";resized=16x12"))
  }

  test("media: resize normalizes every payload to the target size, tags mime") {
    val resized = Media.resize(Media.fromDocuments(docs), 64, 64).collect()
    assert(resized.length == docs.count())
    assert(resized.forall(_.bytes.length == 64 * 64 / 64))
    assert(resized.forall(_.mime.endsWith(";resized=64x64")))
    val again = Media.resize(Media.fromDocuments(docs), 64, 64).collect()
    assert(resized.map(_.bytes.toSeq).toSeq.sortBy(_.hashCode) ==
      again.map(_.bytes.toSeq).toSeq.sortBy(_.hashCode))
  }

  test("media: frame sampling explodes blobs into every-Nth fixed-size frames") {
    val media = Media.fromDocuments(docs)
    val frames = Media.sampleFrames(media, 2).collect()
    val byDoc = frames.groupBy(_.doc_id)
    media.collect().foreach { r =>
      val n = math.max((r.bytes.length + Media.FrameBytes - 1) / Media.FrameBytes, 1)
      val expectIdx = (0 until n by 2).toSeq
      val got = byDoc(r.doc_id).sortBy(_.frame_idx)
      assert(got.map(_.frame_idx).toSeq == expectIdx)
      got.foreach { f =>
        val start = f.frame_idx * Media.FrameBytes
        val expLen = math.max(math.min(Media.FrameBytes, r.bytes.length - start), 0)
        assert(f.bytes.length == expLen)
      }
    }
  }

  test("fingerprint/langid/quality are non-degenerate on real docs") {
    val r = docs.select(
      TextFunctions.fingerprint("text").as("fp"),
      TextFunctions.langId(col("text")).as("lang"),
      TextFunctions.qualityScore(col("text")).as("q"))
    assert(r.select("fp").distinct().count() > docs.count() / 2)
    assert(r.filter(col("q") < 0 || col("q") > 1).count() == 0)
  }
}
