package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — same config surface the engine
 *  mains use (GraftSession), so tests exercise production semantics
 *  (non-ANSI, UTC, nanosAsLong). */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  @transient lazy val spark: SparkSession = SparkTestBase.shared
}

object SparkTestBase {
  // One session across all suites: SparkContext startup dominates test
  // wall-clock otherwise.
  lazy val shared: SparkSession = {
    val s = graft.core.GraftSession.builder("local[4]", 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
