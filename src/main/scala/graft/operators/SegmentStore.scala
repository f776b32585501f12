package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared primitives of the segmented manifest stores (the X56 LSH
 *  index and the X93 ANN index): the directory-listing contract, the
 *  crash-safe segment rewrite, and the second-writer CAS install.
 *  These three carry the stores' crash-ordering invariants — keeping
 *  ONE copy means a fix to (e.g.) the install-before-delete rule can
 *  never apply to one store and miss the other. The probe-first
 *  revival FLOWS stay per-store (they orchestrate different table
 *  sets), but every ordering-sensitive step they take goes through
 *  here. */
private[graft] object SegmentStore {

  /** Segment subdirectories of one store table, sorted for
   *  deterministic plans. Dot-prefixed names are in-flight scratch
   *  and never read. */
  def segDirs(table: String): Seq[String] =
    Option(new java.io.File(table).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !f.getName.startsWith("."))
      .map(_.toString).sorted.toSeq

  /** CRASH-SAFE segment rewrite: `seg` minus `ids` (keyed by
   *  `idCol`), installed under a FRESH visible name FIRST, then the
   *  old segment dropped — a crash in between leaves both visible
   *  (their union is the old set: conservative, never a
   *  resurrection); empty survivors just drop the segment. Deleting
   *  before installing would lose the segment's OTHER rows on a
   *  crash — the dangerous direction. */
  def rewriteSegmentWithout(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, seg: String, ids: DataFrame,
      idCol: String): Unit = {
    val kept = spark.read.parquet(seg)
      .join(ids, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (kept.isEmpty)
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(seg))
      else {
        val segFile = new java.io.File(seg)
        val taken = segDirs(tableDir)
          .map(new java.io.File(_).getName).toSet
        val target = (1 to taken.size + 1)
          .map(i => s"${segFile.getName}~$i").find(!taken.contains(_)).get
        kept.write.mode("overwrite")
          .parquet(new java.io.File(segFile.getParentFile, target).toString)
        org.apache.commons.io.FileUtils.deleteDirectory(segFile)
      }
    } finally { kept.unpersist(); () }
  }

  /** Second-writer CAS install: rename `scratch` to `target` (a name
   *  derived from the INPUT segment set — [[graft.core.Commit
   *  .inputSetTag]]), atomically. Two writers folding the same input
   *  collide here and exactly one proceeds; the loser's scratch is
   *  cleaned and an [[IllegalStateException]] raised. A crashed
   *  attempt never wedges a retry: any partial install changes the
   *  input set and thus the next target name. */
  def casInstallDir(scratch: java.io.File, target: java.io.File,
      what: String): Unit =
    if (!scratch.renameTo(target)) {
      org.apache.commons.io.FileUtils.deleteDirectory(scratch)
      throw new IllegalStateException(
        s"SECOND WRITER detected at $what: ${target.getName} already " +
          "installed from the same input segments — a concurrent " +
          "compaction raced this one and exactly one may proceed.")
    }
}
