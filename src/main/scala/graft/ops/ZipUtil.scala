package graft.ops

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, FileInputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}

import scala.jdk.CollectionConverters._

/** S2/K5/K8 + driver-side halves of A2 — ZIP and document utilities
  * (/root/reference/app.py:84-177,565-570).
  *
  * Deliberately driver-side plain Scala (SURVEY §7.4.6): zips are job-artifact
  * packaging, not a table format; at 100 TB the data path is parquet and these
  * touch only metadata-scale artifacts.
  */
object ZipUtil {

  private def normalizeRel(p: String): String =
    p.replace('\\', '/').dropWhile(c => c == '.' || c == '/')

  /** S2 — extract an archive into a directory, replacing prior contents
    * (app.py:565-570). Entry paths are confined to the target (zip-slip guard —
    * the reference's path-confinement check, app.py:483-490, applied here).
    */
  def extractZip(zipPath: String, targetDir: String): Unit = {
    val target = Paths.get(targetDir)
    deleteRecursively(target)
    Files.createDirectories(target)
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala.toSeq.sortBy(_.getName).foreach { e =>
        val out = target.resolve(e.getName).normalize()
        require(out.startsWith(target.toAbsolutePath.normalize()) || out.startsWith(target),
          s"zip entry escapes target dir: ${e.getName}")
        if (e.isDirectory) Files.createDirectories(out)
        else {
          Files.createDirectories(out.getParent)
          val in = zf.getInputStream(e)
          try Files.copy(in, out, StandardCopyOption.REPLACE_EXISTING)
          finally in.close()
        }
      }
    } finally zf.close()
  }

  /** K5 — deterministic zip (app.py:139-146): fixed DOS epoch timestamp, entries
    * in sorted-relpath order, DEFLATE — byte-identical output for identical
    * content, which is what makes the zip itself content-addressable.
    */
  def writeDeterministicZip(sourceDir: String, zipPath: String): Unit = {
    val src = Paths.get(sourceDir)
    val files = walkFiles(src).sortBy(p => normalizeRel(src.relativize(p).toString))
    val out = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(zipPath)))
    try {
      // 1980-01-01T00:00:00 local — the DOS-format floor the reference pins.
      val dosEpoch = new java.util.GregorianCalendar(1980, 0, 1, 0, 0, 0).getTimeInMillis
      files.foreach { p =>
        val entry = new ZipEntry(normalizeRel(src.relativize(p).toString))
        entry.setTime(dosEpoch)
        out.putNextEntry(entry)
        Files.copy(p, out)
        out.closeEntry()
      }
    } finally out.close()
  }

  /** A3 — streaming whole-file SHA-256 (app.py:84-92), 1 MiB chunks. */
  def fileSha256(path: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val in = new BufferedInputStream(new FileInputStream(path))
    try {
      val buf = new Array[Byte](1024 * 1024)
      Iterator.continually(in.read(buf)).takeWhile(_ > 0).foreach(n => md.update(buf, 0, n))
    } finally in.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** A2 — ordered content hash of a directory (app.py:107-119): sorted-relpath
    * frames `rel ⊕ \0 ⊕ bytes ⊕ \0`.
    */
  def contentSha256OfDirectory(dir: String): String = {
    val base = Paths.get(dir)
    val md = MessageDigest.getInstance("SHA-256")
    walkFiles(base)
      .map(p => (normalizeRel(base.relativize(p).toString), p))
      .sortBy(_._1)
      .foreach { case (rel, p) =>
        md.update(rel.getBytes(StandardCharsets.UTF_8)); md.update(0.toByte)
        md.update(Files.readAllBytes(p)); md.update(0.toByte)
      }
    md.digest().map("%02x".format(_)).mkString
  }

  /** A2 — same hash computed from a zip's entries (app.py:121-137); equals
    * [[contentSha256OfDirectory]] of the zip's extraction — the dedup keystone.
    */
  def contentSha256OfZip(zipPath: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    val zf = new ZipFile(zipPath)
    try {
      zf.entries().asScala.toSeq
        .filter(!_.isDirectory)
        .map(e => (normalizeRel(e.getName), e))
        .sortBy(_._1)
        .foreach { case (rel, e) =>
          md.update(rel.getBytes(StandardCharsets.UTF_8)); md.update(0.toByte)
          val in = zf.getInputStream(e)
          try {
            val buf = new Array[Byte](1024 * 1024)
            Iterator.continually(in.read(buf)).takeWhile(_ > 0).foreach(n => md.update(buf, 0, n))
          } finally in.close()
          md.update(0.toByte)
        }
    } finally zf.close()
    md.digest().map("%02x".format(_)).mkString
  }

  /** K8 — atomic document write: temp + move (app.py:171-177). */
  def atomicWrite(path: String, content: String): Unit = {
    val target = Paths.get(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = Files.createTempFile(
      Option(target.getParent).getOrElse(Paths.get(".")), ".tmp-", null)
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  private def walkFiles(base: Path): Seq[Path] = {
    if (!Files.exists(base)) return Nil
    val s = Files.walk(base)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).toSeq
    finally s.close()
  }

  def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}
