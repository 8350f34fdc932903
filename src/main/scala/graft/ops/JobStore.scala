package graft.ops

import java.nio.file.{Files, Paths}

/** J5/P4/A7 — job-store resolution utilities
  * (/root/reference/app.py:454-535,905-910).
  *
  * Driver-side by design: these probe a metadata-scale artifact store, not
  * data. Security shape preserved from the reference: every name is reduced to
  * a basename and the resolved path must stay confined under its base dir.
  */
object JobStore {

  /** P4 — confine a candidate file name to a base directory: basename only,
    * must end `.zip` (case-insensitive), resolved path must stay under base
    * (the reference's commonpath check, app.py:478-491).
    */
  def resolveExistingZip(zipName: String, zipsFolder: String): Option[String] = {
    val candidate = Paths.get(
      Option(zipName).getOrElse("").trim.replace('\\', '/')).getFileName
    val name = Option(candidate).map(_.toString).getOrElse("")
    if (name.isEmpty || !name.toLowerCase.endsWith(".zip")) return None
    val base = Paths.get(zipsFolder).toAbsolutePath.normalize()
    val path = base.resolve(name).normalize()
    if (!path.startsWith(base)) None
    else if (!Files.isRegularFile(path)) None
    else Some(path.toString)
  }

  /** J5 — input-zip resolution chain (app.py:454-476): shared-store relpath →
    * shared-store name → job-local copy → legacy `input.zip`; first hit wins.
    */
  def resolveJobInputZip(jobDir: String, inputZipRelpath: Option[String],
      inputZipName: Option[String], zipsFolder: String): Option[(String, String)] = {
    def basenameOf(v: Option[String]): Option[String] =
      v.map(_.trim).filter(_.nonEmpty)
        .flatMap(s => Option(Paths.get(s.replace('\\', '/')).getFileName).map(_.toString))

    val byRelpath = basenameOf(inputZipRelpath)
      .flatMap(n => resolveExistingZip(n, zipsFolder).map(p => (n, p)))
    def byName = basenameOf(inputZipName)
      .flatMap(n => resolveExistingZip(n, zipsFolder).map(p => (n, p)))
    def byLocal = basenameOf(inputZipName).flatMap { n =>
      val p = Paths.get(jobDir, n)
      if (Files.exists(p)) Some((n, p.toString)) else None
    }
    def byLegacy = {
      val p = Paths.get(jobDir, "input.zip")
      if (Files.exists(p)) Some(("input.zip", p.toString)) else None
    }
    byRelpath.orElse(byName).orElse(byLocal).orElse(byLegacy)
  }

  /** A7 — latest results zip of a job: lexicographic max of `results_*.zip`
    * (timestamp-named ⇒ latest; app.py:905-910,984-988).
    */
  def latestResultsZip(jobDir: String): Option[String] = {
    val d = new java.io.File(jobDir)
    Option(d.listFiles()).getOrElse(Array.empty)
      .map(_.getName)
      .filter(n => n.startsWith("results_") && n.endsWith(".zip"))
      .sorted(Ordering[String].reverse)
      .headOption
  }
}
