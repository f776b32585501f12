package graft.operators

import org.apache.spark.sql.DataFrame

import graft.core.StoreFs

/** Shared primitives of the segmented manifest stores (the X56 LSH
 *  index and the X93 ANN index): the directory-listing contract, the
 *  crash-safe segment rewrite, and the second-writer CAS install.
 *  These three carry the stores' crash-ordering invariants — keeping
 *  ONE copy means a fix to (e.g.) the install-before-delete rule can
 *  never apply to one store and miss the other. The probe-first
 *  revival FLOWS stay per-store (they orchestrate different table
 *  sets), but every ordering-sensitive step they take goes through
 *  here. All paths are Hadoop-addressable strings routed through
 *  [[graft.core.StoreFs]] (round-10 item 1) — the per-FS atomicity
 *  contract is documented there. */
private[graft] object SegmentStore {

  /** Segment subdirectories of one store table, sorted for
   *  deterministic plans. Dot-prefixed names are in-flight scratch
   *  and never read. */
  def segDirs(table: String): Seq[String] = StoreFs.listDirs(table)

  /** CRASH-SAFE segment rewrite (round-10 item 6; replaces the
   *  round-9 one-segment-per-job form): the union of `segs` minus
   *  `ids`, installed as ONE fresh visible segment first, then every
   *  old segment dropped — one read job + one write job regardless of
   *  how many segments were hit (the round-9 per-segment loop
   *  launched O(segments-hit) sequential driver jobs per revival
   *  batch). Install-then-drop, so any crash
   *  leaves a visible superset (set-semantics reads tolerate the
   *  overlap, the next compaction dedups); empty survivors skip the
   *  install and just drop. The install name derives from the INPUT
   *  segment set ([[graft.core.Commit.inputSetTag]]), so a redelivered
   *  rewrite of the same inputs overwrites its own output
   *  (idempotent) and a different input set never collides. */
  def rewriteSegmentsWithout(spark: org.apache.spark.sql.SparkSession,
      tableDir: String, segs: Seq[String], ids: DataFrame,
      idCol: String): Unit = {
    if (segs.isEmpty) return
    val kept = spark.read.parquet(segs: _*)
      .join(ids, Seq(idCol), "left_anti")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tag = graft.core.Commit.inputSetTag(segs.map(StoreFs.name))
      val target = s"$tableDir/rw-$tag"
      if (!kept.isEmpty)
        kept.write.mode("overwrite").parquet(target)
      segs.filterNot(_.endsWith(s"/rw-$tag")).foreach(StoreFs.deleteRecursive)
    } finally { kept.unpersist(); () }
  }

  /** Second-writer CAS install: move `scratch` to `target` (a name
   *  derived from the INPUT segment set — [[graft.core.Commit
   *  .inputSetTag]]), atomically. Two writers folding the same input
   *  collide here and exactly one proceeds; the loser's scratch is
   *  cleaned and an [[IllegalStateException]] raised. A genuine IO
   *  failure (no collision at the target) rethrows and KEEPS the
   *  scratch — it is the only copy of the just-computed fold. A
   *  crashed attempt never wedges a retry: any partial install
   *  changes the input set and thus the next target name. */
  def casInstallDir(scratch: String, target: String, what: String): Unit =
    StoreFs.casInstallDir(scratch, target, what)
}
