package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality
import graft.operators.Quality._

/** X54/X55 data-quality gates: known violation counts on a corrupted
 *  synthetic frame, zero-not-null on empty input, one scan total. */
class QualitySpec extends SparkTestBase {

  import spark.implicits._

  // 10 rows: id 7 duplicated (9→7), v null at id 3, v=999 at id 5,
  // tag "BAD!" at id 6
  private lazy val frame = Seq.tabulate(10) { i =>
    val id = if (i == 9) 7L else i.toLong
    val v: java.lang.Double = if (i == 3) null else if (i == 5) 999.0 else i * 1.0
    val tag = if (i == 6) "BAD!" else "ok"
    (id, v, tag)
  }.toDF("id", "v", "tag")

  test("expectations count each violation class exactly") {
    val out = Quality.expectations(frame, Seq(
        NotNull("v"), InRange("v", 0.0, 100.0),
        Accepted("tag", Seq("ok")), Matches("tag", "^[a-z]+$"),
        Unique(Seq("id"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "not_null:v" -> 1L, "in_range:v:[0.0,100.0]" -> 1L,
      "accepted:tag" -> 1L, "matches:tag" -> 1L, "unique:id" -> 1L))
  }

  test("unique ignores null-key rows instead of calling them duplicates") {
    // (1,null),(2,null) under a composite key is NOT a duplicate pair;
    // naive count(*) - countDistinct would report 2 violations
    val df = Seq((Some(1L), None: Option[Long]), (Some(2L), None),
      (Some(3L), Some(4L)), (Some(3L), Some(4L))).toDF("a", "b")
    val out = Quality.expectations(df, Seq(Unique(Seq("a", "b"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("unique:a,b" -> 1L))
  }

  test("empty input yields zero violations, never null") {
    val out = Quality.expectations(frame.filter(lit(false)),
        Seq(NotNull("v"), Unique(Seq("id"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("not_null:v" -> 0L, "unique:id" -> 0L))
  }

  test("edge: all-null column profiles with null min/max, not a crash") {
    val df = Seq.tabulate(4)(i => (i.toLong, None: Option[Double]))
      .toDF("id", "v")
    val out = Quality.profile(df, Seq("v")).collect().head
    assert(out.getLong(1) === 4L && out.getLong(2) === 4L &&
      out.getLong(3) === 0L && out.isNullAt(4) && out.isNullAt(5))
    val exp = Quality.expectations(df, Seq(NotNull("v"),
        InRange("v", 0, 1), Unique(Seq("v"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // nulls violate not_null only — range passes them, unique ignores them
    assert(exp("not_null:v") === 4L &&
      exp("in_range:v:[0.0,1.0]") === 0L && exp("unique:v") === 0L)
  }

  test("observed rules ride the job as observation metrics — no second scan") {
    val obs = new org.apache.spark.sql.Observation("gate")
    val observed = Quality.observed(frame,
      Seq(NotNull("v"), InRange("v", 0.0, 100.0), Accepted("tag", Seq("ok"))),
      obs)
    assert(observed.count() === 10) // the action both counts AND observes
    val m = obs.get
    assert(m("not_null:v") === 1L &&
      m("in_range:v:[0.0,100.0]") === 1L && m("accepted:tag") === 1L)
    // distinct-based rules are rejected loudly
    intercept[IllegalArgumentException] {
      Quality.observed(frame, Seq(Unique(Seq("id"))))
    }
  }

  test("profile computes count/null/distinct/min/max per column, no Expand") {
    val out = Quality.profile(frame, Seq("id", "v")).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out("id") === ((10L, 0L, 9L, 0.0, 8.0)))
    assert(out("v") === ((10L, 1L, 9L, 0.0, 999.0)))
    // one PRUNED scan per column, each a single-distinct two-phase
    // agg: the plan must carry NO Expand — the multi-distinct
    // rewrite this replaced widened every row into (cols+1)
    // null-shadow copies, measured inflating isolated medians ~60%
    // under memory pressure (BASELINE.md round-8 control; the
    // replacement re-measured 0.50-0.57 s vs 0.85-0.94 s)
    val plan = Quality.profile(frame, Seq("id", "v"))
      .queryExecution.optimizedPlan
    assert(!plan.toString.contains("Expand"), plan.toString)
    assert(plan.collectLeaves().size === 2, plan.collectLeaves().map(_.nodeName))
  }

  test("profile runs an expensive upstream plan once — never once per column") {
    val runs = spark.sparkContext.longAccumulator("upstream_runs")
    val touch = udf { (id: Long) => runs.add(1); id }.asNondeterministic()
    // a join makes the plan non-bare: the per-column form would
    // re-execute it once per column (3 columns = 3×)
    val expensive = frame.withColumn("id", touch(col("id")))
      .join(frame.select(col("id"), col("v").as("v2")), Seq("id"))
    val prof = Quality.profile(expensive, Seq("id", "v", "v2"))
    // the single-pass path holds NOTHING resident: no checkpoint RDD
    // leaf (the r9 sweep measured localCheckpoint blocks bypassing
    // CacheManager and accumulating until driver GC)
    assert(!prof.queryExecution.optimizedPlan.toString.contains("ExistingRDD") &&
      !prof.queryExecution.optimizedPlan.toString.contains("LogicalRDD"),
      prof.queryExecution.optimizedPlan.toString)
    val out = prof.collect()
    assert(out.length === 3)
    assert(runs.value === 10L,
      s"upstream must execute exactly once (10 rows), ran ${runs.value}")
    // a BARE parquet scan keeps the direct pruned-column plan — no
    // checkpoint RDD leaf ever appears
    val dir = graft.streaming.Streams.scratchDir("graft_prof_bare_")
    frame.write.mode("overwrite").parquet(dir)
    val bare = Quality.profile(spark.read.parquet(dir), Seq("id", "v"))
      .queryExecution.optimizedPlan
    assert(!bare.toString.contains("ExistingRDD") &&
      !bare.toString.contains("LogicalRDD"), bare.toString)
  }

  test("a ScalaUDF over a bare scan is NOT bare — user code runs once, not once per column") {
    val runs = spark.sparkContext.longAccumulator("udf_runs")
    val touch = udf { (id: Long) => runs.add(1); id }.asNondeterministic()
    val dir = graft.streaming.Streams.scratchDir("graft_prof_udf_")
    frame.write.mode("overwrite").parquet(dir)
    // Project(udf) over a parquet relation: structurally project-over
    // -scan, but the expression carries user code — the per-column
    // form would run the UDF once per profiled column (2× here)
    val withUdf = spark.read.parquet(dir).withColumn("id", touch(col("id")))
    val out = Quality.profile(withUdf, Seq("id", "v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("id" -> 10L, "v" -> 10L))
    assert(runs.value === 10L,
      s"UDF must execute exactly once per row (10), ran ${runs.value}")
  }

  test("observed metrics fold additively across a multi-batch drain to the batch gate result") {
    import graft.streaming.Streams
    // two parquet part files + maxFilesPerTrigger=1 → two micro-batches,
    // each contributing partial violation counts
    val dir = Streams.scratchDir("graft_qobs_in_")
    frame.filter(col("id") < 5).coalesce(1).write.mode("append").parquet(dir)
    frame.filter(col("id") >= 5).coalesce(1).write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir)
    val rules = Seq(NotNull("v"), InRange("v", 0.0, 100.0),
      Matches("tag", "^[a-z]+$"))
    val counts = Streams.drainObservedMetrics(
      Quality.observed(stream, rules), "graft_quality")
    val batch = Quality.expectations(frame, rules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === batch)
    assert(counts("not_null:v") === 1L) // sanity: the fixture's known dirt
  }

  test("hostile column names (quotes, spaces) label rows verbatim — no SQL-text parse break") {
    // names with a single quote and spaces: interpolated SQL text
    // would either fail to parse or mislabel; the Column-built
    // unpivot must carry them through verbatim
    val hostile = frame.withColumnRenamed("v", "it's v")
      .withColumnRenamed("tag", "the tag")
    val prof = Quality.profile(hostile, Seq("id", "it's v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(prof.keySet === Set("id", "it's v"))
    assert(prof("it's v") === 10L)
    val exp = Quality.expectations(hostile, Seq(
        NotNull("`it's v`"), Matches("`the tag`", "^[a-z]+$")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exp("not_null:`it's v`") === 1L)
    assert(exp("matches:`the tag`") === 1L)
  }

  // ------------------------------------------ Gopher rule gate (X118)

  private def gopherFlags(texts: (Long, String)*): Map[Long, Map[String, Boolean]] = {
    val df = texts.toSeq.toDF("doc_id", "text")
    Quality.gopherRules(df, "doc_id", "text").collect().map { r =>
      r.getLong(0) -> Seq("r_words", "r_word_len", "r_symbol", "r_bullet",
        "r_ellipsis", "r_alpha", "r_stop", "keep")
        .map(c => c -> r.getBoolean(r.fieldIndex(c))).toMap
    }.toMap
  }

  test("gopher: every ratio rule flips exactly at its cross-multiplied boundary") {
    val w50 = Seq.fill(50)("aaa").mkString(" ")
    val out = gopherFlags(
      1L -> Seq.fill(49)("aaa").mkString(" "), // 49 words: under the floor
      2L -> w50, // 50 words, mean len 3: both word rules hold
      3L -> Seq.fill(50)("aa").mkString(" "), // mean 2 < 3
      4L -> Seq.fill(50)("abcdefghijk").mkString(" "), // mean 11 > 10
      5L -> (w50 + " #####"), // 5 syms over 51 words: 50 <= 51
      6L -> (w50 + " ######"), // 6 syms over 51 words: 60 > 51
      7L -> ((1 to 9).map(i => s"- x$i").mkString("\n") + "\nplain"), // 9/10 bullet lines: 90 <= 90
      8L -> (1 to 10).map(i => s"- x$i").mkString("\n"), // 10/10: 100 > 90
      9L -> ("a...\nb…\nc...\nplain\nplain\nplain\nplain\nplain\nplain\nplain"), // 3/10: 30 <= 30
      10L -> ("a...\nb…\nc...\nd...\nplain\nplain\nplain\nplain\nplain\nplain"), // 4/10: 40 > 30
      11L -> ("a1 b2 c3 d4 e5 f6 g7 h8 99 00"), // 8/10 alpha: 40 >= 40
      12L -> ("a1 b2 c3 d4 e5 f6 g7 88 99 00"), // 7/10: 35 < 40
      13L -> "the the the the", // one DISTINCT stopword
      14L -> "The wiTH them", // case-folds to 2 distinct ("them" is not a hit)
      15L -> "") // empty: zero words, zero-guard sanity
    assert(!out(1L)("r_words") && out(2L)("r_words"))
    assert(out(2L)("r_word_len") && !out(3L)("r_word_len") && !out(4L)("r_word_len"))
    assert(out(5L)("r_symbol") && !out(6L)("r_symbol"))
    assert(out(7L)("r_bullet") && !out(8L)("r_bullet"))
    assert(out(9L)("r_ellipsis") && !out(10L)("r_ellipsis"))
    assert(out(11L)("r_alpha") && !out(12L)("r_alpha"))
    assert(!out(13L)("r_stop") && out(14L)("r_stop"))
    assert(!out(15L)("r_words") && out(15L)("r_word_len") &&
      out(15L)("r_symbol") && !out(15L)("keep"))
  }

  test("gopher: '...' symbol counting is non-overlapping left-to-right and '…' counts line-ends") {
    val w = Seq.fill(60)("word").mkString(" ")
    // '....' = ONE non-overlapping '...' match in both engines; 6 '#'
    // plus it = 7 symbols over 62 words -> 70 > 62
    val out = gopherFlags(
      1L -> (w + " ###### ...."),
      2L -> (w + " ##### ....")) // 6 symbols over 62: 60 <= 62
    assert(!out(1L)("r_symbol") && out(2L)("r_symbol"))
  }

  test("gopher: keep is the exact conjunction and a fully-clean doc passes") {
    val clean = (Seq.fill(48)("alpha").mkString(" ") + " the with")
    val out = gopherFlags(1L -> clean)
    assert(out(1L).forall(_._2), s"every flag should hold: ${out(1L)}")
  }
}
