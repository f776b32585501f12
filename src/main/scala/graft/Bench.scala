package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // Shuffle partitions must track DATA VOLUME, not core count: the
    // sf10 (100x) sweep OOMed q51's final sort with 32 partitions x
    // ~44M rows/task — 256 partitions bound each sort task's footprint
    // the way a real cluster would (SCALE.md). Default stays the core
    // count for driver-scale runs.
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus.toString).toInt
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", shuffle).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // noop sink: computes EVERY column (count() would let Catalyst prune
    // the derived expressions away and bench nothing but the scan).
    def exhaust(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // Untimed warmup: one cheap query through the full parquet-scan →
    // codegen → shuffle → noop-sink path, so the first TIMED query
    // measures the engine, not JVM/classloading/codegen-compiler
    // startup (which was billed to whichever query sorted first).
    try exhaust(SparkEntry.queries("q1_sum_fields")(spark, sfDir).limit(1000))
    catch { case e: Throwable => System.err.println(s"[bench] warmup failed: ${e.getMessage}") }
    // codec-path warmup (10 synthetic images): the FIRST touch of
    // javax.imageio/java.awt loads the plugin registry + color stack —
    // measured 4-5 s of one-time class init that otherwise lands on
    // whichever single query touches codecs first (q54), swamping its
    // actual per-record cost. Same classloading-startup category the
    // q1 warmup exists to exclude.
    try {
      val tiny = spark.range(10).selectExpr("id AS doc_id", "100 AS n_chars")
      exhaust(graft.multimodal.Media.extractFeatures(
        graft.multimodal.Media.imagesFromDocuments(tiny)).toDF())
    } catch { case e: Throwable => System.err.println(s"[bench] codec warmup failed: ${e.getMessage}") }
    // Each query runs `runs` times (default 3) and reports the MEDIAN
    // — single-run sub-second timings on a shared host carry ±25%+
    // noise, which round after round faked 2x "regressions" on plans
    // that hadn't changed. The min is recorded too (best-case, least
    // contended). Cache is cleared between repeats so every repeat
    // pays its own persists.
    // tolerate malformed values: a typo'd env var must not abort the
    // whole bench before a single query runs
    val runs = math.max(1, sys.env.get("SPARK_GRAFT_RUNS")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(3))
    // iteration aid: bench only queries whose name contains a token of
    // SPARK_GRAFT_ONLY (comma-separated); the driver never sets it.
    // SPARK_GRAFT_SKIP excludes by the same match — for scale sweeps
    // where a deliberately-quadratic form (exact in-block all-pairs)
    // is out of its documented operating range.
    val only = sys.env.get("SPARK_GRAFT_ONLY").toSeq.flatMap(_.split(','))
    val skip = sys.env.get("SPARK_GRAFT_SKIP").toSeq.flatMap(_.split(','))
    def timeOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { exhaust(fn(spark, sfDir)); true } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      // progress to stderr: long scale sweeps are otherwise a silent
      // multi-hour JSON-at-the-end box
      System.err.println(f"[bench] $name%s ${dt}%.2f s")
      // queries are self-contained: drop any intermediate a query
      // persisted so later queries aren't squeezed by stale cache
      // (the persist+compute cost stays inside the owning query's dt)
      spark.catalog.clearCache()
      // a failed query records sentinel -1.0 (never a plausible time)
      // and is excluded from the total, so it can't shrink the 2x gate
      if (ok) dt else -1.0
    }
    // ISOLATED-ONLY queries (round-11 item 8): names matching
    // SPARK_GRAFT_ISOLATED_ONLY are pulled OUT of the in-sequence
    // pass and measured exclusively as fresh-JVM isolated controls —
    // the slot for q51 at sf10, whose in-sequence repeats climbed
    // 367→535 s on inherited heap state while its isolated number
    // held: one output-contract row must not dominate (and distort)
    // the sweep total. They ride the artifact under
    // `queries_isolated` + `isolated_only`, never `queries`/`value`.
    val isoOnly = sys.env.get("SPARK_GRAFT_ISOLATED_ONLY")
      .toSeq.flatMap(_.split(','))
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.exists(name.contains) }
    val (skipped, runAll) =
      selected.partition { case (name, _) => skip.exists(name.contains) }
    val (isoOnlyQ, run0) =
      runAll.partition { case (name, _) => isoOnly.exists(name.contains) }
    val timed: Seq[(String, Seq[Double])] =
      run0.map { case (name, fn) => (name, Seq.fill(runs)(timeOnce(name, fn))) }
    val results: Seq[(String, Double, Double)] =
      timed.map { case (name, ts) =>
        if (ts.exists(_ < 0)) (name, -1.0, -1.0)
        else {
          val sortedTs = ts.sorted
          (name, sortedTs(runs / 2), sortedTs.head)
        }
      }
    // ISOLATED CONTROLS (round-10 item 5, the q86-control methodology
    // automated): the in-sequence numbers carry position-dependent
    // drift — heap/GC state inherited from whatever ran before (r9's
    // builder-vs-driver totals differed 86.6 vs 96.1 s on identical
    // code, all of it in-sequence noise). After the sequence pass, the
    // noisiest queries (largest relative spread across repeats) re-run
    // 5x each in a FRESH child JVM (same flags/classpath, single
    // query) and their isolated medians ride the artifact alongside
    // the in-sequence medians, so round-over-round comparisons stop
    // needing manual adjudication. Round-11 item 3: SWEEP runs
    // (SPARK_GRAFT_SKIP) now emit controls too — the sf10 artifact
    // previously carried contaminated in-sequence numbers with the
    // adjudicating controls living only in SCALE.md prose; the child
    // repeat count is tunable (SPARK_GRAFT_ISOLATED_RUNS, default 5 —
    // sweeps set 3 so multi-minute rows don't double the wall-clock).
    // Off for SPARK_GRAFT_ONLY iteration runs; SPARK_GRAFT_ISOLATED
    // overrides the count (0 disables).
    val isolatedN = sys.env.get("SPARK_GRAFT_ISOLATED")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
      .getOrElse(if (only.nonEmpty) 0 else 6)
    val isolatedRuns = math.max(1, sys.env.get("SPARK_GRAFT_ISOLATED_RUNS")
      .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(5))
    val isolatedTimeoutMin = math.max(1,
      sys.env.get("SPARK_GRAFT_ISOLATED_TIMEOUT_MIN")
        .flatMap(s => scala.util.Try(s.trim.toInt).toOption).getOrElse(15))
    def runIsolated(name: String): Option[(String, Double)] = {
      val javaBin = new java.io.File(
        new java.io.File(sys.props("java.home"), "bin"), "java").toString
      val opens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke",
        "java.base/java.lang.reflect", "java.base/java.io",
        "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic",
        "java.base/sun.nio.ch", "java.base/sun.nio.cs",
        "java.base/sun.security.action", "java.base/sun.util.calendar"
      ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      // child heap defaults to the parent's but can be capped
      // independently (SPARK_GRAFT_ISOLATED_MEM) so sweep-scale
      // controls fit beside whatever the host still holds
      val childMem = sys.env.getOrElse("SPARK_GRAFT_ISOLATED_MEM",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      val cmd = Seq(javaBin) ++ opens ++ Seq(
        "-Dspark.ui.enabled=false", "-Dspark.sql.session.timeZone=UTC",
        s"-Xmx$childMem",
        "-XX:+ExplicitGCInvokesConcurrent",
        "-cp", sys.props("java.class.path"), "graft.Bench")
      val pb = new ProcessBuilder(cmd: _*)
      pb.environment().put("SPARK_GRAFT_ONLY", name)
      pb.environment().put("SPARK_GRAFT_RUNS", isolatedRuns.toString)
      pb.environment().put("SPARK_GRAFT_ISOLATED", "0")
      // the child must actually RUN the query: a sweep parent's skip /
      // isolated-only filters would otherwise filter it straight back
      // out of the child's own selection
      pb.environment().remove("SPARK_GRAFT_SKIP")
      pb.environment().remove("SPARK_GRAFT_ISOLATED_ONLY")
      // the child must never run its own regression/extra selection
      pb.environment().remove("SPARK_GRAFT_PREV_BENCH")
      pb.environment().remove("SPARK_GRAFT_ISOLATED_EXTRA")
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      // stdout goes to a FILE and waitFor runs FIRST: reading the
      // child's stdout to EOF before waitFor made the timeout +
      // destroyForcibly unreachable when a child JVM hung without
      // closing stdout — one wedged control could stall the whole
      // sweep indefinitely (round-11 advice fix)
      val outFile = java.io.File.createTempFile("graft_iso_", ".out")
      pb.redirectOutput(outFile)
      try {
        val proc = pb.start()
        val done = proc.waitFor(isolatedTimeoutMin.toLong,
          java.util.concurrent.TimeUnit.MINUTES)
        if (!done) {
          System.err.println(s"[bench] isolated $name timed out after " +
            s"$isolatedTimeoutMin min — killed")
          proc.destroyForcibly()
          proc.waitFor(30, java.util.concurrent.TimeUnit.SECONDS)
        }
        val out = new String(
          java.nio.file.Files.readAllBytes(outFile.toPath), "UTF-8")
        // first "name":<num> match is the queries map (queries_min
        // repeats the name later)
        val parsed = (s""""${java.util.regex.Pattern.quote(name)}":(-?[0-9.eE+-]+)""").r
          .findFirstMatchIn(out)
          .map(m => name -> m.group(1).toDouble)
        // a child whose query FAILED records sentinel -1.0 — surface
        // it instead of publishing it as a valid isolated median
        parsed.filter(_._2 < 0).foreach { _ =>
          System.err.println(s"[bench] isolated $name FAILED in the " +
            "child JVM (sentinel -1.0) — excluded from queries_isolated")
        }
        parsed.filter(_._2 >= 0)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] isolated $name failed: ${e.getMessage}")
        None
      } finally { outFile.delete(); () }
    }
    // ROUND-OVER-ROUND regression adjudication (round-11 verdict item
    // 3: the in-run-variance rule alone let q27/q34/q35/q37's sf10
    // regressions escape fresh-JVM controls): when
    // SPARK_GRAFT_PREV_BENCH names the prior round's artifact, any
    // query whose in-sequence median exceeds 1.5x its prior value
    // (and is slow enough to adjudicate) joins the isolated set.
    // SPARK_GRAFT_ISOLATED_EXTRA force-adds names (comma tokens,
    // substring match) regardless of either rule.
    val prevMedians: Map[String, Double] =
      sys.env.get("SPARK_GRAFT_PREV_BENCH").toSeq.flatMap { path =>
        try {
          val txt = new String(
            java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
            "UTF-8")
          val qSec = """"queries":\{([^}]*)\}""".r.findFirstMatchIn(txt)
            .map(_.group(1)).getOrElse("")
          """"([^"]+)":(-?[0-9.eE+-]+)""".r.findAllMatchIn(qSec)
            .map(m => m.group(1) -> m.group(2).toDouble).toSeq
        } catch { case e: Throwable =>
          System.err.println(s"[bench] prev-bench parse failed: ${e.getMessage}")
          Seq.empty
        }
      }.toMap
    val medianOf: Map[String, Double] = timed.collect {
      case (name, ts) if ts.forall(_ >= 0) =>
        name -> ts.sorted.apply(ts.size / 2) }.toMap
    // capped at the 8 worst ratios: a systematically-slow RUN (host
    // contention inflating everything) must queue a bounded control
    // set, not one child JVM per query
    val regressed: Seq[String] =
      if (isolatedN <= 0 || prevMedians.isEmpty) Seq.empty
      else medianOf.toSeq.collect { case (name, med)
        if med >= 0.3 && prevMedians.get(name).exists(p => p > 0 && med > 1.5 * p) =>
          (name, med / prevMedians(name))
      }.sortBy(-_._2).take(8).map { case (name, ratio) =>
        System.err.println(f"[bench] $name regressed vs prior artifact " +
          f"(${prevMedians(name)}%.2f -> ${medianOf(name)}%.2f s, " +
          f"${ratio}%.1fx) — isolated control queued")
        name
      }
    // guarded by isolatedN like every other selection rule: a child
    // JVM runs with SPARK_GRAFT_ISOLATED=0 and must NEVER select
    // isolated controls itself (an inherited EXTRA token matching the
    // child's own query would otherwise recurse — child spawning
    // child forever; found by a runaway smoke run, and the child env
    // now also drops the variable, belt and braces)
    val extra =
      if (isolatedN <= 0) Seq.empty
      else sys.env.get("SPARK_GRAFT_ISOLATED_EXTRA")
        .toSeq.flatMap(_.split(','))
        .flatMap(tok => medianOf.keys.filter(_.contains(tok)))
    val isolatedNames: Seq[String] =
      ((if (isolatedN <= 0) Seq.empty[String]
       else timed
         // sub-0.3 s rows are all jitter — an isolated child JVM on one
         // of them would burn ~40 s to adjudicate nothing
         .filter { case (_, ts) =>
           ts.forall(_ >= 0) && ts.sorted.apply(ts.size / 2) >= 0.3 }
         .map { case (name, ts) =>
           (name, (ts.max - ts.min) / ts.sorted.apply(ts.size / 2)) }
         .sortBy(-_._2).take(isolatedN).map(_._1)
      ) ++ regressed ++ extra).distinct ++ isoOnlyQ.map(_._1)
    // the parent's Spark session stops BEFORE any child launches: at
    // sweep scale the parent holds a multi-ten-GB heap it no longer
    // needs (controls run in fresh JVMs), and parent + 64g child
    // together tripped the host OOM killer mid-control (round-11,
    // first sf10 attempt: runner exit 137 during q51's child). A full
    // GC after stop() lets G1 uncommit the retired heap.
    if (isolatedNames.nonEmpty) {
      spark.stop()
      // two passes + settle: under -XX:+ExplicitGCInvokesConcurrent
      // these only start concurrent cycles (heap stays COMMITTED —
      // run sweeps with SPARK_GRAFT_STW_EXPLICIT_GC=1 so this is a
      // compacting full GC that uncommits); the RSS line below is the
      // audit trail for whether the release actually happened
      System.gc(); Thread.sleep(3000); System.gc(); Thread.sleep(2000)
      val rt = Runtime.getRuntime
      System.err.println("[bench] parent heap before controls: " +
        s"committed=${(rt.totalMemory() / (1L << 20))}M " +
        s"used=${((rt.totalMemory() - rt.freeMemory()) / (1L << 20))}M")
    }
    val isolated: Seq[(String, Double)] =
      isolatedNames.sorted.flatMap { name =>
        System.err.println(s"[bench] isolated control: $name")
        runIsolated(name)
      }
    // raw per-run values in SEQUENCE order: an in-sequence
    // contamination window (rounds 10-12 all carried one) shows up as
    // one deviant run per affected row, adjudicable straight from the
    // artifact without waiting on fresh-JVM controls
    val runsJson = timed.map { case (k, ts) =>
      s"\"" + k + "\":" + ts.mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    val qs = results.map { case (k, med, _) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    val mins = results.map { case (k, _, mn) => s"\"" + k + "\":" + mn }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, med, _) if med < 0 => "\"" + k + "\"" }
    val total = results.collect { case (_, med, _) if med >= 0 => med }.sum
    // skipped names ride the artifact so a partial map is
    // SELF-DESCRIBING — a consumer can see what was excluded instead
    // of mistaking a sweep run for full coverage
    val skippedJson = skipped.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val isoOnlyJson = isoOnlyQ.map("\"" + _._1 + "\"").mkString("[", ",", "]")
    val isoJson = isolated.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","runs":$runs,"isolated_runs":$isolatedRuns,"queries":$qs,"queries_min":$mins,"queries_runs":$runsJson,"queries_isolated":$isoJson,"isolated_only":$isoOnlyJson,"failed":${failed.mkString("[", ",", "]")},"skipped":$skippedJson,"sf":"$sfDir"}"""
    // the driver's BENCH_r{N}.json tail truncates (r5 lost q1/q10-q24
    // for the judge) — ALSO persist the complete per-query map to a
    // file in the repo so every round's numbers stay parseable.
    // Filtered iteration runs (SPARK_GRAFT_ONLY) skip the write, and a
    // SPARK_GRAFT_SKIP run only writes when an explicit BENCH_OUT names
    // a destination: a partial map must never clobber the committed
    // full artifact.
    if (only.isEmpty &&
        (skipped.isEmpty || sys.env.contains("SPARK_GRAFT_BENCH_OUT"))) {
      try java.nio.file.Files.writeString(
        java.nio.file.Paths.get(sys.env.getOrElse(
          "SPARK_GRAFT_BENCH_OUT", "bench_full.json")), line + "\n")
      catch { case e: Throwable =>
        System.err.println(s"[bench] artifact write failed: ${e.getMessage}") }
    }
    // The PRINTED line is a COMPACT summary (round-14 measurement-bug
    // fix, documented in OPTIMIZATION_r14.md): at 175 queries the full
    // line (medians + mins + 3 raw runs each) is ~21.6 KB, which the
    // driver's bounded tail/parser has failed to hold for two rounds
    // running (PERF per_query empty) — so the stdout line carries the
    // contract fields (metric/value/unit/queries/sf) with per-query
    // MEDIANS at millisecond precision plus failed/skipped/isolated,
    // ~5 KB, and the full-precision maps (queries_min, queries_runs)
    // live in the bench_full.json artifact above. Same methodology,
    // same timed subject, same query set — only the printed summary
    // shrank. Printed AFTER spark.stop() so no concurrent executor
    // stderr can interleave with the line in a combined capture.
    def ms3(d: Double): String =
      if (d < 0) "-1.0"
      else BigDecimal(d).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qsCompact = results.map { case (k, med, _) =>
      "\"" + k + "\":" + ms3(med) }.mkString("{", ",", "}")
    val isoCompact = isolated.map { case (k, v) => "\"" + k + "\":" + ms3(v) }
      .mkString("{", ",", "}")
    val compact = s"""{"metric":"total","value":${ms3(total)},"unit":"sec","runs":$runs,"queries":$qsCompact,"queries_isolated":$isoCompact,"isolated_only":$isoOnlyJson,"failed":${failed.mkString("[", ",", "]")},"skipped":$skippedJson,"sf":"$sfDir"}"""
    spark.stop()
    println(compact)
    System.out.flush()
  }
}
