package graft.core

/** Single-writer ENFORCEMENT for the manifest-based stores (round-9
 *  item 8). The evolving LSH index and the bucketed CDC/SCD2 state
 *  are single-writer by contract (Structured Streaming serializes a
 *  stream's own batches) — but nothing used to DETECT a second
 *  writer, and two interleaved folds would silently fork the version
 *  chain (each reading the same predecessor and both committing).
 *
 *  The primitive is an atomic create-if-absent claim file: a claim is
 *  either absent or complete (never torn), and exactly one concurrent
 *  claimant wins. The loser reads the winner's content: equal content
 *  means the SAME logical writer retrying (an at-least-once
 *  redelivery — allowed to proceed and overwrite its own work);
 *  different content is a genuine second writer and fails loudly
 *  instead of interleaving. Routed through [[StoreFs.claim]] (round-10
 *  item 1): hard-link install on local POSIX paths, temp-write +
 *  no-overwrite rename on HDFS-contract filesystems — the per-FS
 *  atomicity contract lives on [[StoreFs]]. */
object Commit {

  /** Claim `target` (any Hadoop-addressable path) with `content`,
   *  atomically. No-op if the claim is already held with the SAME
   *  content (same logical writer retrying); throws
   *  [[IllegalStateException]] if held with different content. `what`
   *  names the store for the error. */
  def claim(target: String, content: String, what: String): Unit =
    StoreFs.claim(target, content, what)

  /** Deterministic content hash for claim/install names derived from
   *  an input SET (e.g. the segment list a compaction folds): two
   *  writers folding the SAME input collide on the same name; a later
   *  fold of different input gets a fresh name — so retries after a
   *  crash never wedge on a stale claim. */
  def inputSetTag(names: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(names.sorted.mkString("\n").getBytes("UTF-8"))
      .take(6).map(b => f"${b & 0xFF}%02x").mkString
  }
}
