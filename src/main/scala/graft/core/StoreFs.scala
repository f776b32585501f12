package graft.core

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, LocalFileSystem, Path, RawLocalFileSystem}

/** Filesystem primitives for the segmented manifest stores (the X56
 *  LSH index, the X93 ANN index, the X95-claimed CDC/SCD2 version
 *  chains), routed through `org.apache.hadoop.fs.FileSystem` so a
 *  store dir can live on any Hadoop-addressable filesystem — local
 *  disk, HDFS, or an object store behind a Hadoop connector — not
 *  just `java.io.File` paths (round-10 item 1: the round-9 stores
 *  were sandbox-correct but bound to POSIX hard links and renames).
 *
 *  ATOMIC-INSTALL CONTRACT, per FS class. The stores need exactly
 *  three atomic primitives; everything else (list/read/write/delete)
 *  is plain FS traffic:
 *
 *   1. `claim` — create-if-absent WITH content (single-writer CAS on
 *      a version edge);
 *   2. `casInstallDir` — move a scratch dir to a deterministic target
 *      name, failing if the target exists (compaction install);
 *   3. `replaceFileAtomic` — swap a root-pointer file (the ANN meta)
 *      so readers see old-or-new, never absent-or-torn.
 *
 *  - **Local POSIX (`file:` / plain paths)**: `claim` installs via
 *    `Files.createLink` (hard-link create-if-absent — one atomic
 *    syscall), `casInstallDir` via `File.renameTo` guarded by a
 *    target-existence check, `replaceFileAtomic` via
 *    `Files.move(ATOMIC_MOVE, REPLACE_EXISTING)`. All atomic at the
 *    syscall level; bit-identical to the round-9 behavior.
 *  - **HDFS-contract filesystems** (rename is atomic and FAILS when
 *    the destination exists — HDFS itself, and the spec's strict test
 *    FS): `claim` writes a writer-unique temp file and renames it to
 *    the claim name — the rename either wins atomically or returns
 *    false, and the loser compares content; `casInstallDir` is one
 *    rename PLUS a nested-landing probe (HDFS renames a dir onto an
 *    existing dir by moving the source INSIDE it, so a
 *    check-then-rename race would otherwise let both installers
 *    "succeed" — round-11 advice fix, raced deterministically by the
 *    `race:` test FS); `replaceFileAtomic` renames to a fresh temp then
 *    delete-old + rename — the pointer is absent only inside a
 *    bounded delete→rename window, and [[readPointerFile]] retries
 *    across it (HDFS deployments wanting a zero-window swap can route
 *    the pointer through `FileContext.rename(OVERWRITE)`; the stores
 *    only require read-retry).
 *  - **Object stores (S3 and friends)**: rename is a non-atomic
 *    copy+delete and none of the three primitives can be built from
 *    it honestly. Filesystems advertising [[ConditionalPutStore]]
 *    route through conditional puts instead (round-11 item 4 — the
 *    round-10 design, now code): `claim` and `createMarker` are one
 *    `putIfAbsent` (`If-None-Match: *` — one request, no temp file,
 *    loser reads the winner's content), `replaceFileAtomic` is one
 *    object-level atomic `putAtomic` (readers see the old or the new
 *    object, NO absence window at all — strictly stronger than the
 *    rename-contract pointer swap), and `casInstallDir` decides the
 *    race with a `putIfAbsent` COMMIT KEY (a hidden sibling,
 *    `.<target>.__commit`, holding a writer-unique nonce — the
 *    Delta/Iceberg commit-object shape) and only then moves the
 *    scratch data under the target with plain, non-atomic FS traffic.
 *    Reader correctness during the non-atomic move is the
 *    install-then-delete ordering every store here already follows: a
 *    partially-moved install is a SUBSET of its input segments, which
 *    stay visible until the caller deletes them after install
 *    returns. A writer that crashes AFTER the move begins leaves the
 *    target present — recovered as the version-chain CAS is: the
 *    partial install changes the next fold's input segment set,
 *    hence its target name and commit key. A writer that crashes
 *    BETWEEN winning the key and starting the move leaves a held key
 *    with an ABSENT target — a STALE claim the next attempt of the
 *    same fold reclaims (delete + one re-contended putIfAbsent;
 *    round-12 advice fix — previously every retry of that fold
 *    re-raised SECOND WRITER forever). Driven
 *    end-to-end by a `condput:` test filesystem exposing exactly the
 *    conditional-put primitives (SecondWriterSpec, EvolvingAnnSpec).
 */
private[graft] trait ConditionalPutStore {
  /** Atomic create-if-absent with full content (`If-None-Match: *`):
   *  true iff this call created the object. Never leaves a torn
   *  object — the put is all-or-nothing at object granularity. */
  def putIfAbsent(p: Path, bytes: Array[Byte]): Boolean
  /** Object-level atomic overwrite: concurrent readers observe the
   *  old content or the new content, never a torn or absent object. */
  def putAtomic(p: Path, bytes: Array[Byte]): Unit
}

private[graft] object StoreFs {

  private def hconf: Configuration =
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration

  private def fsOf(p: Path): FileSystem = p.getFileSystem(hconf)

  /** Is this FS the local POSIX disk (directly, checksum-wrapped, or
   *  filter-wrapped — Spark's Hive ProxyLocalFileSystem extends
   *  FilterFileSystem around a local FS, so it must UNWRAP to match:
   *  round-12 advice fix — the instanceof alone sent proxied local
   *  filesystems down the rename-contract branch, whose claim
   *  exclusivity assumes rename fails on an existing destination,
   *  which local disk does not guarantee)? Decides between the
   *  syscall-atomic local branch and the rename-contract branch of
   *  the three primitives. The match requires the `file` SCHEME on
   *  top of the local classes: the test filesystems (`strict:`,
   *  `race:`, `condput:`) subclass RawLocalFileSystem for storage but
   *  model OTHER stores' semantics — a bare instanceof match silently
   *  sent them down the local hard-link branch, so the
   *  rename-contract code paths were exercised by no spec (round-11
   *  routing fix; the racing-install spec now fails if this
   *  regresses, because the local branch bypasses `fs.rename`). */
  private def isLocal(fs: FileSystem): Boolean =
    fs.getScheme == "file" && (unwrapFilter(fs) match {
      case _: RawLocalFileSystem => true
      case _: LocalFileSystem => true
      case _ => false
    })

  @scala.annotation.tailrec
  private def unwrapFilter(fs: FileSystem): FileSystem = fs match {
    case f: org.apache.hadoop.fs.FilterFileSystem => unwrapFilter(f.getRawFileSystem)
    case other => other
  }

  private def localFile(p: Path): java.io.File =
    new java.io.File(p.toUri.getPath)

  def name(p: String): String = new Path(p).getName

  def exists(p: String): Boolean = { val h = new Path(p); fsOf(h).exists(h) }

  def mkdirs(p: String): Unit = { val h = new Path(p); fsOf(h).mkdirs(h); () }

  /** Recursive delete, quiet when absent. On a conditional-put store
   *  the target's install COMMIT KEY (hidden sibling) goes with it,
   *  so segment GC cannot leak one key per compacted-away dir. */
  def deleteRecursive(p: String): Unit = {
    val h = new Path(p)
    val fs = fsOf(h)
    fs.delete(h, true)
    fs match {
      case _: ConditionalPutStore if h.getParent != null =>
        val key = new Path(h.getParent, s".${h.getName}.__commit")
        if (fs.exists(key)) { fs.delete(key, false); () }
      case _ => ()
    }
  }

  /** Non-recursive delete-if-exists (claim files, commit markers). */
  def deleteFileIfExists(p: String): Unit = {
    val h = new Path(p)
    val fs = fsOf(h)
    if (fs.exists(h)) { fs.delete(h, false); () }
  }

  /** Visible (non-dot) subdirectories of `dir`, sorted by NAME for
   *  deterministic plans; empty when `dir` is absent. Returned as
   *  full path strings (possibly scheme-qualified — every consumer
   *  treats them as opaque read paths). */
  def listDirs(dir: String): Seq[String] = {
    val h = new Path(dir)
    val fs = fsOf(h)
    if (!fs.exists(h)) Seq.empty
    else fs.listStatus(h).toSeq
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .sortBy(_.getPath.getName)
      .map(_.getPath.toString)
  }

  /** Visible file (non-dir) names under `dir`; empty when absent. */
  def listFileNames(dir: String): Seq[String] = {
    val h = new Path(dir)
    val fs = fsOf(h)
    if (!fs.exists(h)) Seq.empty
    else fs.listStatus(h).toSeq
      .filter(st => st.isFile && !st.getPath.getName.startsWith("."))
      .map(_.getPath.getName).sorted
  }

  /** Visible subdirectory NAMES under `dir`; empty when absent. */
  def listDirNames(dir: String): Seq[String] =
    listDirs(dir).map(name)

  def isFile(p: String): Boolean = {
    val h = new Path(p)
    val fs = fsOf(h)
    fs.exists(h) && fs.getFileStatus(h).isFile
  }

  /** Small-file read. Local paths read via java.nio — the local
   *  branch WRITES via java.nio too, so no `.crc` sidecars exist and
   *  out-of-band edits (ops fixing a manifest by hand) never trip
   *  ChecksumFileSystem. */
  def readUTF8(p: String): String = {
    val h = new Path(p)
    val fs = fsOf(h)
    if (isLocal(fs))
      new String(java.nio.file.Files.readAllBytes(localFile(h).toPath), "UTF-8")
    else {
      val in = fs.open(h)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        new String(out.toByteArray, "UTF-8")
      } finally in.close()
    }
  }

  def readUTF8IfExists(p: String): Option[String] =
    if (isFile(p)) Some(readUTF8(p)) else None

  /** Plain (non-atomic) small-file write, parents created. Local
   *  paths write via java.nio (no checksum sidecars — see
   *  [[readUTF8]]). */
  def writeUTF8(p: String, content: String): Unit = {
    val h = new Path(p)
    val fs = fsOf(h)
    if (isLocal(fs)) {
      val f = localFile(h)
      f.getParentFile.mkdirs()
      java.nio.file.Files.write(f.toPath, content.getBytes("UTF-8"))
      ()
    } else {
      val out = fs.create(h, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Create an empty commit marker iff absent (`_SUCCESS`). Returns
   *  whether this call created it. Local: `File.createNewFile` (one
   *  atomic syscall). Other FS: `FileSystem.createNewFile` —
   *  exclusive-create, atomic on HDFS. */
  def createMarker(p: String): Boolean = {
    val h = new Path(p)
    fsOf(h) match {
      case cp: ConditionalPutStore => cp.putIfAbsent(h, Array.emptyByteArray)
      case fs if isLocal(fs) =>
        val f = localFile(h)
        f.getParentFile.mkdirs()
        f.createNewFile()
      case fs => fs.createNewFile(h)
    }
  }

  /** Root-pointer swap: readers of `target` see the OLD content or
   *  the NEW content, never a torn file. Local: `Files.move`
   *  ATOMIC_MOVE+REPLACE. Rename-contract FS: temp write + delete-old
   *  + rename — `target` is absent only inside the bounded
   *  delete→rename window, which [[readPointerFile]] retries across
   *  (see the class contract for the object-store caveat). */
  def replaceFileAtomic(target: String, content: String): Unit = {
    val h = new Path(target)
    val fs = fsOf(h)
    fs match {
      case cp: ConditionalPutStore =>
        // one object-level atomic overwrite: no temp, no delete→rename
        // absence window (the versioned-put pointer swap)
        cp.putAtomic(h, content.getBytes("UTF-8"))
        return
      case _ => ()
    }
    fs.mkdirs(h.getParent)
    val tmp = new Path(h.getParent,
      s".${h.getName}.${java.util.UUID.randomUUID()}")
    if (isLocal(fs)) {
      java.nio.file.Files.write(localFile(tmp).toPath, content.getBytes("UTF-8"))
      java.nio.file.Files.move(localFile(tmp).toPath, localFile(h).toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    } else {
      val out = fs.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      if (fs.exists(h)) fs.delete(h, false)
      if (!fs.rename(tmp, h)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"replaceFileAtomic: rename $tmp -> $h failed on ${fs.getScheme}")
      }
    }
  }

  /** Read a root-pointer file written by [[replaceFileAtomic]],
   *  retrying across the rename-contract branch's bounded
   *  delete→rename absence window. Returns None only when the pointer
   *  genuinely does not exist (never-written store). */
  def readPointerFile(p: String): Option[String] = {
    var attempt = 0
    while (attempt < 3) {
      readUTF8IfExists(p) match {
        case some @ Some(_) => return some
        case None =>
          attempt += 1
          if (attempt < 3) Thread.sleep(25L * attempt)
      }
    }
    None
  }

  /** Single-writer CLAIM: atomically create `target` with `content`.
   *  No-op if already held with the SAME content (the same logical
   *  writer retrying — at-least-once redelivery); throws
   *  [[IllegalStateException]] naming both contents if held with
   *  different content (a genuine second writer).
   *
   *  Local: content written to a writer-unique temp name, then
   *  hard-linked to the claim name — one atomic syscall, a claim is
   *  absent or complete, exactly one concurrent claimant wins.
   *  Rename-contract FS: temp write + rename, which atomically fails
   *  (returns false) when the claim already exists — the loser reads
   *  the winner's content and compares. */
  def claim(target: String, content: String, what: String): Unit = {
    val h = new Path(target)
    val fs = fsOf(h)
    fs.mkdirs(h.getParent)
    def second(held: String): Nothing =
      throw new IllegalStateException(
        s"SECOND WRITER detected at $what: claim ${h.getName} " +
          s"is held by '$held' (this writer: '$content'). The store " +
          "is single-writer; a concurrent fold or compaction raced " +
          "this one and exactly one may proceed.")
    fs match {
      case cp: ConditionalPutStore =>
        // one conditional put; the loser reads the winner's content
        if (!cp.putIfAbsent(h, content.getBytes("UTF-8"))) {
          val held = readUTF8(h.toString)
          if (held != content) second(held)
        }
        return
      case _ => ()
    }
    if (isLocal(fs)) {
      val tf = localFile(h)
      val tmp = new java.io.File(tf.getParentFile,
        s".claim-${java.util.UUID.randomUUID()}")
      java.nio.file.Files.write(tmp.toPath, content.getBytes("UTF-8"))
      try {
        try { java.nio.file.Files.createLink(tf.toPath, tmp.toPath); () }
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            val held = new String(
              java.nio.file.Files.readAllBytes(tf.toPath), "UTF-8")
            if (held != content) second(held)
        }
      } finally { java.nio.file.Files.deleteIfExists(tmp.toPath); () }
    } else {
      val tmp = new Path(h.getParent,
        s".claim-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(content.getBytes("UTF-8")) finally out.close()
      if (!fs.rename(tmp, h)) {
        fs.delete(tmp, false)
        if (!fs.exists(h))
          throw new java.io.IOException(
            s"claim($what): rename $tmp -> $h failed on ${fs.getScheme} " +
              "but the claim does not exist — IO error, not a race")
        val held = readUTF8(h.toString)
        if (held != content) second(held)
      }
    }
  }

  /** Second-writer CAS install: move `scratch` to `target` (a name
   *  derived from the fold's INPUT segment set), atomically. Two
   *  writers folding the same input collide on the same target and
   *  exactly one proceeds; the loser's scratch is cleaned and an
   *  [[IllegalStateException]] raised. Any OTHER failure (IO error,
   *  permissions, cross-device) rethrows as an [[java.io.IOException]]
   *  and KEEPS the scratch — it is the only copy of the just-computed
   *  fold, and deleting it would mask the real cause (round-10 advice
   *  fix: a rename failure is only a race when the target exists). */
  def casInstallDir(scratch: String, target: String, what: String): Unit = {
    val s = new Path(scratch)
    val t = new Path(target)
    val fs = fsOf(t)
    def secondWriter(): Nothing = {
      fs.delete(s, true)
      throw new IllegalStateException(
        s"SECOND WRITER detected at $what: ${t.getName} already " +
          "installed from the same input segments — a concurrent " +
          "compaction raced this one and exactly one may proceed.")
    }
    fs match {
      case cp: ConditionalPutStore =>
        // the race is decided by ONE conditional put of a hidden
        // commit key (writer-unique nonce); data then moves under the
        // target with plain FS traffic — see the class contract for
        // why readers stay correct through the non-atomic move
        if (fs.exists(t)) secondWriter()
        val key = new Path(t.getParent, s".${t.getName}.__commit")
        val nonce = java.util.UUID.randomUUID().toString
        if (!cp.putIfAbsent(key, nonce.getBytes("UTF-8"))) {
          // a held key with an ABSENT target is a STALE claim: its
          // writer crashed after winning the key and before the data
          // move began (once the move starts the target exists), so
          // nothing is installing — reclaim by deleting the stale key
          // and re-contending ONCE (round-12 advice fix: the previous
          // behavior raised SECOND WRITER on every retry of the same
          // logical fold, wedging it forever — the "partial attempt
          // changes the input set" recovery only holds after the move
          // has begun). If the retry ALSO loses, a live writer is
          // mid-claim — a genuine second writer.
          if (fs.exists(t)) secondWriter()
          fs.delete(key, false)
          if (!cp.putIfAbsent(key, nonce.getBytes("UTF-8"))) secondWriter()
        }
        val moved =
          try fs.rename(s, t)
          catch { case _: java.io.FileNotFoundException => false }
        if (!moved) {
          // not a race (the commit key is ours) — surface the IO error
          // and return to the pre-attempt state so a retry of the same
          // input set isn't wedged
          fs.delete(key, false)
          throw new java.io.IOException(
            s"casInstallDir($what): data move $scratch -> $target failed " +
              s"on ${fs.getScheme} after winning the commit key — IO " +
              "error, not a race; the scratch dir is KEPT for diagnosis")
        }
        return
      case _ => ()
    }
    if (isLocal(fs)) {
      if (localFile(t).exists()) secondWriter()
      if (!localFile(s).renameTo(localFile(t))) {
        if (localFile(t).exists()) secondWriter()
        throw new java.io.IOException(
          s"casInstallDir($what): rename $scratch -> $target failed and " +
            "the target does not exist — IO error, not a race; the " +
            "scratch dir is KEPT for diagnosis")
      }
    } else {
      if (fs.exists(t)) secondWriter()
      // some FS implementations throw FileNotFoundException instead of
      // returning false when the source is missing — same IO-error
      // contract either way
      val renamed =
        try fs.rename(s, t)
        catch { case _: java.io.FileNotFoundException => false }
      if (!renamed) {
        if (fs.exists(t)) secondWriter()
        throw new java.io.IOException(
          s"casInstallDir($what): rename $scratch -> $target failed on " +
            s"${fs.getScheme} and the target does not exist — IO error, " +
            "not a race; the scratch dir is KEPT for diagnosis")
      }
      // HDFS renames a dir onto an EXISTING dir by moving the source
      // INSIDE it (returning true) — so a racing install materializing
      // `target` between the existence check and the rename makes BOTH
      // writers "succeed", the loser's scratch nested invisibly at
      // target/<scratchName>. Detect the nested landing and demote to
      // second writer (scratch names are writer-unique, so the probe
      // cannot collide with legitimate installed content). Round-11
      // advice fix; raced deterministically by the `race:` test FS.
      val nested = new Path(t, s.getName)
      if (fs.exists(nested)) {
        fs.delete(nested, true)
        secondWriter()
      }
    }
  }
}
