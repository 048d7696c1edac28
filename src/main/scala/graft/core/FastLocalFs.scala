package graft.core

import java.net.URI
import java.nio.file.attribute.PosixFilePermission
import java.nio.file.attribute.PosixFilePermission._
import java.nio.file.{Files, NoSuchFileException}
import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.fs.{DelegateToFileSystem, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.spark.sql.SparkSession

/** Local filesystem without the per-file `chmod` fork.
  *
  * Hadoop's `RawLocalFileSystem.setPermission` shells out to `/bin/chmod`
  * whenever the native hadoop library is unavailable — and it is called on
  * EVERY file create and EVERY mkdir (`LocalFSFileOutputStream` ctor and
  * `mkOneDirWithMode` both dispatch to it virtually). Measured here: a
  * single 4-pass bench of `logstore_optimize` forked 2,865 chmod processes
  * (~2–3 CPU-seconds per pass of other-process time, each fork synchronous
  * inside the file-create path). This subclass replaces the shell-out with
  * an in-process `java.nio` permission set — same bits, no fork. Modes
  * with setuid/setgid/sticky bits (inexpressible via
  * `PosixFilePermission`) fall back to the inherited shell path; the
  * engine never writes such modes.
  *
  * At deployment scale the store is HDFS/S3 and this class is inert — it
  * only rescues local[...] runs (benches, tests, driver-local temp dirs)
  * from paying a process fork per file.
  */
class FastRawLocalFileSystem extends RawLocalFileSystem {
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    val mode = permission.toShort.toInt
    if ((mode & 0xE00) != 0) super.setPermission(p, permission) // suid/sgid/sticky
    else {
      try Files.setPosixFilePermissions(pathToFile(p).toPath, FastRawLocalFileSystem.toPosix(mode))
      catch {
        case e: NoSuchFileException =>
          throw new java.io.FileNotFoundException(e.getFile)
      }
    }
  }
}

object FastRawLocalFileSystem {
  private[core] def toPosix(mode: Int): java.util.Set[PosixFilePermission] = {
    val s = EnumSet.noneOf(classOf[PosixFilePermission])
    if ((mode & 0x100) != 0) s.add(OWNER_READ)
    if ((mode & 0x080) != 0) s.add(OWNER_WRITE)
    if ((mode & 0x040) != 0) s.add(OWNER_EXECUTE)
    if ((mode & 0x020) != 0) s.add(GROUP_READ)
    if ((mode & 0x010) != 0) s.add(GROUP_WRITE)
    if ((mode & 0x008) != 0) s.add(GROUP_EXECUTE)
    if ((mode & 0x004) != 0) s.add(OTHERS_READ)
    if ((mode & 0x002) != 0) s.add(OTHERS_WRITE)
    if ((mode & 0x001) != 0) s.add(OTHERS_EXECUTE)
    s
  }
}

/** Drop-in for `fs.file.impl`: `LocalFileSystem` (checksummed, identical
  * semantics) over the fork-free raw layer. Needs the no-arg ctor Hadoop's
  * reflective instantiation requires. */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

/** Drop-in for `fs.AbstractFileSystem.file.impl` (the FileContext API that
  * Structured Streaming's checkpoint/state managers write through).
  * Delegates straight to the fork-free raw FS; checkpoint files carry
  * their own integrity (and the streaming sessions already disable
  * per-file checkpoint checksums). */
class FastLocalFs(uri: URI, conf: Configuration)
    extends DelegateToFileSystem(uri, new FastRawLocalFileSystem, conf, "file", false)

/** One-line installation into any session builder. */
object FastFs {
  val configs: Map[String, String] = Map(
    "spark.hadoop.fs.file.impl" -> classOf[FastLocalFileSystem].getName,
    "spark.hadoop.fs.AbstractFileSystem.file.impl" -> classOf[FastLocalFs].getName)

  def install(b: SparkSession.Builder): SparkSession.Builder = {
    configs.foreach { case (k, v) => b.config(k, v) }
    b
  }
}
