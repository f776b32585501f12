package graft

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

/** Test-only Hadoop filesystem with the HDFS rename contract —
 *  `rename(src, dst)` where `dst` is an existing FILE returns false
 *  instead of silently replacing it (the POSIX `rename(2)` semantics
 *  of the local FS), and where `dst` is an existing DIRECTORY moves
 *  `src` INSIDE it as `dst/<srcName>` returning true (HDFS's
 *  move-into-dir rule — the behavior that makes check-then-rename
 *  directory installs racy; round-11 advice fix: the previous model
 *  failed on ANY existing dst, which HDFS only does for files, so the
 *  nested-landing hazard was untestable). Registered under the
 *  `strict:` scheme and backed by local disk, it lets the store specs
 *  drive [[graft.core.StoreFs]]'s rename-contract branch (claims via
 *  no-overwrite rename, CAS installs with the nested-landing probe,
 *  pointer swaps) end-to-end — the branch a real HDFS deployment
 *  uses — on a sandbox that has no HDFS. */
class StrictRenameFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "strict"
  override def getUri: URI = URI.create("strict:///")
  override def rename(src: Path, dst: Path): Boolean =
    if (!exists(dst)) super.rename(src, dst)
    else if (getFileStatus(dst).isFile) false
    else {
      val nested = new Path(dst, src.getName)
      if (exists(nested)) false else super.rename(src, nested)
    }
}

object StrictRenameFileSystem {
  /** Bind the `strict:` scheme in the session's Hadoop conf (idempotent). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.strict.impl", classOf[StrictRenameFileSystem].getName)
  }
}

/** [[StrictRenameFileSystem]] that MATERIALIZES an armed destination
 *  directory inside the `rename` call itself — deterministically
 *  reproducing the check-then-rename TOCTOU window: a racing
 *  compaction installs the target AFTER the caller's existence check
 *  and BEFORE its rename, so under HDFS semantics the rename "wins"
 *  by nesting the scratch inside the racer's install. Drives
 *  StoreFs.casInstallDir's nested-landing detection; also proves the
 *  strict branch is actually routed (the local branch bypasses
 *  `fs.rename` entirely, so an armed path would never fire). */
class RacingInstallFileSystem extends StrictRenameFileSystem {
  override def getScheme: String = "race"
  override def getUri: URI = URI.create("race:///")
  override def rename(src: Path, dst: Path): Boolean = {
    if (RacingInstallFileSystem.armed.remove(dst.toUri.getPath) && !exists(dst))
      mkdirs(dst)
    super.rename(src, dst)
  }
}

object RacingInstallFileSystem {
  private val armed =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** The next `rename` onto this path finds it freshly installed. */
  def arm(path: String): Unit = { armed.add(new Path(path).toUri.getPath); () }
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.race.impl", classOf[RacingInstallFileSystem].getName)
  }
}

/** Test-only OBJECT-STORE model: no atomic rename of any kind (rename
 *  works but models the non-atomic copy+delete an S3 connector
 *  performs — nothing may rely on its atomicity), with the two
 *  conditional-put primitives a modern object store exposes
 *  (`If-None-Match: *` create and object-level atomic overwrite).
 *  Registered under `condput:`, it drives
 *  [[graft.core.StoreFs]]'s [[graft.core.ConditionalPutStore]]
 *  branch — claims/markers via one conditional put, pointer swaps via
 *  one atomic object put, dir installs decided by a commit-key put —
 *  end-to-end on local disk. */
class CondPutFileSystem extends RawLocalFileSystem
    with graft.core.ConditionalPutStore {
  override def getScheme: String = "condput"
  override def getUri: URI = URI.create("condput:///")

  /** One atomic create-if-absent with full content: a hard link of a
   *  fully-written temp (the object appears complete or not at all —
   *  object-store PUT visibility). */
  override def putIfAbsent(p: Path, bytes: Array[Byte]): Boolean = {
    val f = new java.io.File(p.toUri.getPath)
    f.getParentFile.mkdirs()
    val tmp = new java.io.File(f.getParentFile,
      s".condput-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.write(tmp.toPath, bytes)
    try {
      java.nio.file.Files.createLink(f.toPath, tmp.toPath)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally { java.nio.file.Files.deleteIfExists(tmp.toPath); () }
  }

  /** Object-level atomic overwrite: temp + ATOMIC_MOVE (readers see
   *  the old or the new object, never torn/absent). */
  override def putAtomic(p: Path, bytes: Array[Byte]): Unit = {
    val f = new java.io.File(p.toUri.getPath)
    f.getParentFile.mkdirs()
    val tmp = new java.io.File(f.getParentFile,
      s".condput-${java.util.UUID.randomUUID()}")
    java.nio.file.Files.write(tmp.toPath, bytes)
    java.nio.file.Files.move(tmp.toPath, f.toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}

object CondPutFileSystem {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.condput.impl", classOf[CondPutFileSystem].getName)
  }
}
