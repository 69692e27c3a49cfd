package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Stored-artifact manager: resolve-or-build an immutable parquet artifact
 * (an index, a dedup side table) under a configured root, safely shared
 * by CONCURRENT sessions and JVMs.
 *
 * This is the analog of the reference's stored-index lifecycle (an index
 * is built once, then every query serves from it — reference:
 * janus/JanusDatabaseProvider.scala's index setup), re-expressed for a
 * data lake: the artifact is a parquet directory, and "which build is
 * live" is a tiny pointer file.
 *
 * Publish protocol (shared by the ANN index and the incremental-dedup
 * corpus artifacts; stress-covered by IndexRaceSpec): artifact data lives
 * in immutable VERSIONED directories (`<base>_v_<uuid>`), and the live
 * version is named by a pointer file `<base>.ptr` replaced whole-file.
 * Data directories are NEVER renamed — the historical lock-file + rename
 * swap nested a losing writer's tree inside the live dir on local FS
 * (Hadoop create(overwrite=false) is check-then-act there), poisoning
 * concurrent partition discovery. Pointer I/O goes through the RAW
 * filesystem when the root is checksummed: a ChecksumFileSystem file is a
 * (data, .crc-sidecar) PAIR whose rename is two steps and tears under
 * concurrent replaces; without the sidecar a POSIX rename onto an
 * existing file is one atomic syscall. HDFS (internal checksums) takes
 * the FileContext OVERWRITE rename; schemes with neither get
 * delete+rename, whose window a reader survives by rebuilding.
 *
 * Competing builds of one digest produce equivalent content (same source
 * bytes), so WHICHEVER pointer commit lands is valid; unreferenced
 * versions and crashed committers' tmp files age out once older than the
 * stale horizon. Any unreadable pointer — missing, torn (no newline
 * terminator), or naming a dir without Spark's _SUCCESS marker — reads
 * as "no live artifact" and self-heals via a rebuild.
 */
object ArtifactStore {
  import org.apache.hadoop.fs.Path

  /** Digest of a source file's identity (qualified path + size + mtime):
    * regenerated data at the same path yields a different digest, so a
    * stale artifact is never served for new data. */
  def sourceDigest(s: SparkSession, sourceFile: Path, tag: String): String = {
    val fs = sourceFile.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(sourceFile)
    val stamp = s"$tag:${fs.makeQualified(sourceFile)}:${st.getLen}:${st.getModificationTime}"
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(stamp.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString
  }

  /** Resolve the live artifact `baseName` under the root named by conf
    * `rootConfKey` (default: local tmp), building and publishing it via
    * `write(path)` when absent. Returns a DataFrame reading the live
    * parquet directory. `write` must produce a Spark parquet dir (its
    * _SUCCESS marker is the completeness witness). */
  def getOrBuild(s: SparkSession, rootConfKey: String, baseName: String)
                (write: String => Unit): DataFrame = {
    val conf = s.sparkContext.hadoopConfiguration
    val root = new Path(s.conf.get(rootConfKey,
      "file:" + System.getProperty("java.io.tmpdir")))
    val fs = root.getFileSystem(conf)
    val pfs = fs match {
      case c: org.apache.hadoop.fs.ChecksumFileSystem => c.getRawFileSystem
      case other => other
    }
    val ptr = new Path(root, s"$baseName.ptr")

    def resolveLive(): Option[Path] = {
      val name =
        try {
          if (!pfs.exists(ptr)) None
          else {
            val in = pfs.open(ptr)
            val raw = try new String(
              org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
            finally in.close()
            if (raw.endsWith("\n")) Some(raw.trim) else None
          }
        } catch { case _: java.io.IOException => None }
      name.map(new Path(root, _)).filter(p => fs.exists(new Path(p, "_SUCCESS")))
    }

    def commitPointer(dirName: String): Unit = {
      // per-writer unique tmp: concurrent committers never share a tmp
      // file, so a torn mix of two payloads cannot be renamed into place
      val tmp = new Path(root, ptr.getName + ".tmp." +
        java.util.UUID.randomUUID().toString.take(8))
      val out = pfs.create(tmp, true)
      try out.write((dirName + "\n").getBytes("UTF-8")) finally out.close()
      try {
        if (!pfs.rename(tmp, ptr)) {
          // dst-exists rejection (HDFS semantics): atomic overwrite
          // rename via FileContext, else the documented non-atomic
          // fallback — a reader in the window rebuilds, never reads a
          // partial tree
          try {
            val fc = org.apache.hadoop.fs.FileContext.getFileContext(ptr.toUri, pfs.getConf)
            fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          } catch {
            case _: org.apache.hadoop.fs.UnsupportedFileSystemException |
                 _: UnsupportedOperationException =>
              if (pfs.exists(ptr)) pfs.delete(ptr, false)
              if (!pfs.rename(tmp, ptr)) pfs.delete(tmp, false)
          }
        }
      } catch {
        case _: java.io.IOException =>
          // collided with a competing commit: accept any valid survivor,
          // else leave "no pointer" for self-healing readers
          try pfs.delete(tmp, false) catch { case _: java.io.IOException => () }
      }
    }

    val target = resolveLive().getOrElse {
      // stage to a fresh immutable version dir (the expensive part, safe
      // to run concurrently — competitors build equivalent content)
      val staging = new Path(root, s"${baseName}_v_" +
        java.util.UUID.randomUUID().toString.take(8))
      write(staging.toString)
      resolveLive() match {
        case Some(p) => fs.delete(staging, true); p // lost: a competitor published first
        case None =>
          commitPointer(staging.getName)
          // read through the pointer: a competing commit may have
          // overwritten ours, but its tree is complete and equivalent;
          // if the fallback window left no valid pointer, our own
          // staged tree is complete and serves this session
          resolveLive().getOrElse(staging)
      }
    }
    // opportunistic GC: unreferenced versions of this artifact older than
    // the stale horizon (crash leftovers and lost-race losers), plus
    // crashed committers' tmp pointer files
    val staleMs = s.conf.get("spark.graft.artifact.staleMs",
      s.conf.get("spark.graft.ann.staleIndexMs", "600000")).toLong
    fs.globStatus(new Path(root, s"${baseName}_v_*")).foreach { vst =>
      if (vst.getPath.getName != target.getName &&
          System.currentTimeMillis() - vst.getModificationTime > staleMs)
        fs.delete(vst.getPath, true)
    }
    pfs.globStatus(new Path(root, s"$baseName.ptr.tmp.*")).foreach { tst =>
      if (System.currentTimeMillis() - tst.getModificationTime > staleMs)
        pfs.delete(tst.getPath, false)
    }
    s.read.parquet(target.toString)
  }
}
