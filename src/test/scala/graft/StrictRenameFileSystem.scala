package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only Hadoop filesystem with the HDFS rename contract —
 *  `rename(src, dst)` returns false when `dst` exists instead of
 *  silently replacing it (POSIX `rename(2)` semantics of the local
 *  FS). Registered under the `strict:` scheme and backed by local
 *  disk, it lets the store specs drive [[graft.core.StoreFs]]'s
 *  rename-contract branch (claims via no-overwrite rename, CAS
 *  installs, pointer swaps) end-to-end — the branch a real HDFS
 *  deployment uses — on a sandbox that has no HDFS. */
class StrictRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "strict"
  override def getUri: URI = URI.create("strict:///")
  override def rename(src: Path, dst: Path): Boolean =
    if (exists(dst)) false else super.rename(src, dst)
}

object StrictRenameFileSystem {
  /** Bind the `strict:` scheme in the session's Hadoop conf (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.strict.impl", classOf[StrictRenameFileSystem].getName)
  }
}
