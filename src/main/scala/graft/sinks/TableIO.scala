package graft.sinks

import java.nio.file.{Files, FileAlreadyExistsException, Paths}
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Storage seam for the [[VersionedTable]] manifest protocol.
  *
  * The protocol needs exactly one non-trivial primitive from its store:
  * ATOMIC CREATE-IF-ABSENT of a fully-written file ([[createExclusive]]) —
  * that single operation is the whole optimistic-concurrency arbiter.
  * Everything else is plain list/read/write/delete. Keeping the surface
  * this small is what lets the same manifest log run on a laptop
  * (`java.nio`, hard links) and on a real 100 TB landing (HDFS/ABFS via
  * Hadoop `FileSystem`), where `java.nio.file` and hard links don't exist.
  *
  * Data files are NOT routed through this seam: Spark's own
  * `df.write.parquet(path)` already speaks every Hadoop filesystem — the
  * seam covers the metadata operations Spark doesn't do for us.
  */
trait TableIO {
  def mkdirs(dir: String): Unit
  def exists(path: String): Boolean

  /** Immediate child NAMES of `dir` (not paths); empty if `dir` missing. */
  def list(dir: String): Seq[String]

  def readLines(path: String): Seq[String]

  /** Plain (non-atomic) write — used only for stats sidecars, which are an
    * optimization layer: a torn stats file degrades to weaker pruning,
    * never to wrong results, so they don't need the atomic primitive. */
  def writeLines(path: String, lines: Seq[String]): Unit

  /** Publish `lines` at `path` atomically, failing with `false` if `path`
    * already exists — the OCC arbiter. Two guarantees callers rely on:
    * (1) exactly one of two concurrent publishers of the same path wins;
    * (2) a reader can never observe a partially-written file at `path`. */
  def createExclusive(path: String, lines: Seq[String]): Boolean

  /** Delete a file or EMPTY directory; missing paths are a no-op. */
  def delete(path: String): Unit

  /** Size in bytes (for compaction bin-packing). */
  def size(path: String): Long

  /** Is `path` a directory? (false for files and missing paths) */
  def isDir(path: String): Boolean

  /** Last-modified epoch millis (for vacuum grace periods); 0 if missing. */
  def mtime(path: String): Long
}

object TableIO {
  /** Default backend: local filesystem via `java.nio`. */
  val local: TableIO = new LocalTableIO
}

/** Forwarding [[TableIO]] with a swappable delegate — the seam that
  * lets the process-wide [[VersionedTable]] singleton (and with it the
  * SQL catalog, which binds the singleton throughout) run over a
  * non-local backend: a real landing configures
  * `spark.sql.catalog.graft.io=hadoop` once and every manifest
  * operation the SQL front door performs rides the Hadoop
  * `FileSystem`. One metadata backend per driver process — the switch
  * happens at catalog initialize, before any table IO. */
class SwitchableTableIO(@volatile private var delegate: TableIO)
    extends TableIO {
  def current: TableIO = delegate
  private[sinks] def set(b: TableIO): Unit = { delegate = b }
  override def mkdirs(dir: String): Unit = delegate.mkdirs(dir)
  override def exists(path: String): Boolean = delegate.exists(path)
  override def list(dir: String): Seq[String] = delegate.list(dir)
  override def readLines(path: String): Seq[String] =
    delegate.readLines(path)
  override def writeLines(path: String, lines: Seq[String]): Unit =
    delegate.writeLines(path, lines)
  override def createExclusive(path: String, lines: Seq[String]): Boolean =
    delegate.createExclusive(path, lines)
  override def delete(path: String): Unit = delegate.delete(path)
  override def size(path: String): Long = delegate.size(path)
  override def isDir(path: String): Boolean = delegate.isDir(path)
  override def mtime(path: String): Long = delegate.mtime(path)
}

/** `java.nio` backend. Atomic create-if-absent is a HARD LINK to a staged
  * temp file: link(2) fails with EEXIST on collision, and the bytes were
  * durable in the staging file before the link existed, so a reader can
  * never see a torn manifest. NOT `Files.move` — POSIX rename REPLACES an
  * existing target silently, which would let a losing writer clobber the
  * winner's manifest. Open (non-final) so specs can interpose failures. */
class LocalTableIO extends TableIO {
  override def mkdirs(dir: String): Unit =
    Files.createDirectories(Paths.get(dir))

  override def exists(path: String): Boolean = Files.exists(Paths.get(path))

  override def list(dir: String): Seq[String] = {
    val p = Paths.get(dir)
    if (!Files.exists(p)) Seq.empty
    else {
      val s = Files.list(p)
      try s.iterator().asScala.map(_.getFileName.toString).toSeq
      finally s.close()
    }
  }

  override def readLines(path: String): Seq[String] =
    Files.readAllLines(Paths.get(path)).asScala.toSeq

  override def writeLines(path: String, lines: Seq[String]): Unit =
    Files.write(Paths.get(path), lines.mkString("\n").getBytes("UTF-8"))

  override def createExclusive(path: String, lines: Seq[String]): Boolean = {
    val target = Paths.get(path)
    Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".staged", "")
    try {
      Files.write(tmp, lines.mkString("\n").getBytes("UTF-8"))
      try { Files.createLink(target, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  override def delete(path: String): Unit =
    Files.deleteIfExists(Paths.get(path))

  override def size(path: String): Long = Files.size(Paths.get(path))

  override def isDir(path: String): Boolean =
    Files.isDirectory(Paths.get(path))

  override def mtime(path: String): Long = {
    val p = Paths.get(path)
    if (!Files.exists(p)) 0L else Files.getLastModifiedTime(p).toMillis
  }
}

/** Hadoop `FileSystem` backend — the one a real landing uses (HDFS, ABFS,
  * or any FS the classpath provides). Atomic create-if-absent stages the
  * bytes in a hidden sibling and renames into place:
  *
  *  - **HDFS**: `FileSystem.rename` is atomic at the NameNode and returns
  *    `false` when the destination file exists (no clobber) — the staged
  *    rename is a true OCC arbiter with full-content visibility.
  *  - **Local (`file://`, used by tests)**: Hadoop's local rename
  *    delegates to POSIX rename, which WOULD clobber — the exists-check
  *    below is load-bearing there (check-then-rename, not atomic; fine
  *    for a test backend, documented so nobody ships it as one).
  *  - **S3**: has no atomic rename at all; a real S3 backend needs a
  *    conditional PUT (`If-None-Match: *`) and belongs in its own
  *    [[TableIO]] impl, not a pretend-rename here.
  */
class HadoopTableIO(conf: Configuration) extends TableIO {
  private def fs(p: HPath): FileSystem = p.getFileSystem(conf)

  override def mkdirs(dir: String): Unit = {
    val p = new HPath(dir); fs(p).mkdirs(p); ()
  }

  override def exists(path: String): Boolean = {
    val p = new HPath(path); fs(p).exists(p)
  }

  override def list(dir: String): Seq[String] = {
    val p = new HPath(dir)
    val f = fs(p)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName)
  }

  override def readLines(path: String): Seq[String] = {
    val p = new HPath(path)
    val in = fs(p).open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
    finally in.close()
  }

  override def writeLines(path: String, lines: Seq[String]): Unit = {
    val p = new HPath(path)
    val out = fs(p).create(p, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  override def createExclusive(path: String, lines: Seq[String]): Boolean = {
    val dst = new HPath(path)
    val f = fs(dst)
    if (f.exists(dst)) return false
    val tmp = new HPath(dst.getParent,
      s".staged-${java.util.UUID.randomUUID}")
    val out = f.create(tmp, false)
    try out.write(lines.mkString("\n").getBytes("UTF-8"))
    finally out.close()
    val ok = try f.rename(tmp, dst) catch { case _: Exception => false }
    if (!ok) f.delete(tmp, false)
    ok
  }

  override def delete(path: String): Unit = {
    val p = new HPath(path)
    val f = fs(p)
    if (f.exists(p)) { f.delete(p, false); () }
  }

  override def size(path: String): Long = {
    val p = new HPath(path); fs(p).getFileStatus(p).getLen
  }

  override def isDir(path: String): Boolean = {
    val p = new HPath(path)
    val f = fs(p)
    f.exists(p) && f.getFileStatus(p).isDirectory
  }

  override def mtime(path: String): Long = {
    val p = new HPath(path)
    val f = fs(p)
    if (!f.exists(p)) 0L else f.getFileStatus(p).getModificationTime
  }
}
