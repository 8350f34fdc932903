package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar functions F1–F16 from SURVEY.md §2.6, each a pure `Column => Column`
  * composition of codegen'd Spark built-ins (no UDFs — whole-stage codegen keeps
  * these inside the generated loop at any scale).
  *
  * Reference evidence lines cite /root/reference (read-only).
  */
object Scalars {

  /** F1 — path normalization: backslash→slash, strip any leading '.'/'/' chars.
    * Reference `_normalize_rel_path` (app.py:94-95) / `_normalize_rel`
    * (worker.py:12-13) use Python `lstrip("./")` which strips *characters*, so
    * "..//a" → "a"; reproduced with a char-class anchor.
    */
  def normalizeRelPath(p: Column): Column =
    regexp_replace(regexp_replace(p, "\\\\", "/"), "^[./]+", "")

  /** F2 — lowercase extension incl. dot; no extension → "unknown"
    * (reference worker.py:58,63: `os.path.splitext(...)[1].lower() or "unknown"`).
    */
  def fileExtension(name: Column): Column = {
    // splitext semantics: the extension starts at the LAST dot, and exists
    // only if some NON-dot char precedes it within the basename — dotfiles
    // (".bashrc") and all-dot names ("..md") have no extension; "foo." → "."
    val ext = lower(regexp_extract(name, "[^./\\\\][^/\\\\]*(\\.[^./\\\\]*)$", 1))
    when(ext === "", lit("unknown")).otherwise(ext)
  }

  /** F3 — basename of a slash path (reference `os.path.basename`). */
  def baseName(path: Column): Column = element_at(split(path, "/"), -1)

  /** F3 — stem: basename minus the last extension (reference `os.path.splitext`). */
  def stemName(path: Column): Column =
    regexp_replace(baseName(path), "\\.[^.]*$", "")

  /** F4 — footer append (reference `_append_custom_footer`, worker.py:238-244):
    * blank footer → unchanged; separator "\n" inserted unless the base is empty or
    * already ends with \n or \r.
    */
  def appendFooter(out: Column, footer: Column): Column = {
    val sep = when(out === "" || out.rlike("[\\n\\r]$"), lit("")).otherwise(lit("\n"))
    when(trim(footer) === "" || footer.isNull, out)
      .otherwise(concat(out, sep, footer))
  }

  /** F5/K4 — sequence renumber: every occurrence of the literal 9-char token
    * "000000001" in row i becomes zfill(i, 9) (reference worker.py:224-232).
    * `idx` is 1-based (the reference enumerates from 1, worker.py:227).
    */
  def renumberToken(out: Column, idx: Column, token: String = "000000001"): Column = {
    val s = idx.cast("string")
    // zfill pads to AT LEAST the width; Spark's lpad TRUNCATES longer inputs,
    // which would silently collide indices past 10^9
    val padded = when(length(s) >= token.length, s).otherwise(lpad(s, token.length, "0"))
    replace(out, lit(token), padded)
  }

  /** F6 — the reference's canonical timestamp format "%Y-%m-%d %H:%M:%S"
    * (app.py:236,510,741,1012; worker.py:253,404).
    */
  val TsFormat = "yyyy-MM-dd HH:mm:ss"
  def formatTs(ts: Column): Column = date_format(ts, TsFormat)
  def parseTs(s: Column): Column = to_timestamp(s, TsFormat)

  /** F7 — parse "[N day[s], ]H:MM:SS[.ffffff]" → seconds DOUBLE; malformed → null
    * (reference `parse_elapsed_seconds`, app.py:1038-1057).
    */
  def parseElapsedSeconds(s: Column): Column = {
    val pat = "^(?:(\\d+) days?, )?(\\d+):(\\d{2}):(\\d{2})(\\.\\d+)?$"
    val days = regexp_extract(s, pat, 1)
    val hh = regexp_extract(s, pat, 2)
    val mm = regexp_extract(s, pat, 3)
    val ss = regexp_extract(s, pat, 4)
    val frac = regexp_extract(s, pat, 5)
    // regexp_extract yields "" for unmatched optional groups; ANSI mode (Spark 4
    // default) makes "" → double a hard error, so blank-out via nullif first.
    def num(c: Column) = coalesce(nullif(c, lit("")).cast("double"), lit(0.0))
    when(s.isNull || !s.rlike(pat), lit(null).cast("double")).otherwise(
      num(days) * 86400.0 + num(hh) * 3600.0 + num(mm) * 60.0 + num(ss) + num(frac)
    )
  }

  /** F7 inverse — format seconds as the reference's `str(timedelta)` shape
    * "H:MM:SS" / "N day[s], H:MM:SS" (worker.py:410-411). Fractions dropped
    * (whole-second inputs expected).
    */
  def formatElapsed(seconds: Column): Column = {
    val total = seconds.cast("long")
    val d = (total / 86400L).cast("long")
    val h = ((total % 86400L) / 3600L).cast("long")
    val m = ((total % 3600L) / 60L).cast("long")
    val s = (total % 60L).cast("long")
    val hms = concat(h.cast("string"), lit(":"),
      lpad(m.cast("string"), 2, "0"), lit(":"), lpad(s.cast("string"), 2, "0"))
    when(d > 0, concat(d.cast("string"),
      when(d === 1, lit(" day, ")).otherwise(lit(" days, ")), hms)).otherwise(hms)
  }

  /** F8 — humanized file size (reference `format_file_size`, app.py:73-82):
    * repeated /1024 through B,KB,MB,GB with TB terminal; integer for B, 2 dp above
    * (reference prints Python f"{x:.2f}" — no grouping separators). The value is
    * pre-rounded HALF_UP to 2 dp before formatting so exact-tie values (k/8
    * fractions) don't depend on the formatter's tie-breaking mode.
    */
  def formatFileSize(bytes: Column): Column = {
    val b = bytes.cast("double")
    def two(x: Column) = format_string("%.2f", round(x, 2))
    when(b < 1024, concat(bytes.cast("long").cast("string"), lit(" B")))
      .when(b < 1024d * 1024, concat(two(b / 1024), lit(" KB")))
      .when(b < 1024d * 1024 * 1024, concat(two(b / (1024d * 1024)), lit(" MB")))
      .when(b < 1024d * 1024 * 1024 * 1024, concat(two(b / (1024d * 1024 * 1024)), lit(" GB")))
      .otherwise(concat(two(b / (1024d * 1024 * 1024 * 1024)), lit(" TB")))
  }

  /** F9/S4 — base64 data-URL for a binary column (reference worker.py:89-94). */
  def dataUrl(mime: Column, content: Column): Column =
    concat(lit("data:"), mime, lit(";base64,"), base64(content))

  /** F10 — MIME from extension with the reference's "image/png" default
    * (worker.py:85-87, `mimetypes.guess_type` over its supported set).
    */
  def mimeFromExtension(ext: Column): Column = {
    val mimeMap = map(
      lit(".jpg"), lit("image/jpeg"), lit(".jpeg"), lit("image/jpeg"),
      lit(".png"), lit("image/png"), lit(".tif"), lit("image/tiff"),
      lit(".tiff"), lit("image/tiff"), lit(".txt"), lit("text/plain"),
      lit(".md"), lit("text/markdown"))
    coalesce(element_at(mimeMap, lower(ext)), lit("image/png"))
  }

  /** F12 — lenient JSON repair (reference `_parsed_json_value`, worker.py:186-207):
    * slice from first '{'/'[' to last '}'/']', strip trailing commas, parse.
    * Returns the *normalized candidate string*; pair with [[jsonParseOk]] for the
    * reference's `Any-JSON | false` union (SURVEY §7.4.2).
    */
  def lenientJsonCandidate(raw: Column): Column = {
    // First '{' or '[' through last '}' or ']' (dotall so newlines survive).
    val sliced = regexp_extract(raw, "(?s)([\\[{].*[\\]}])", 1)
    val commaStripped = regexp_replace(sliced, ",(\\s*[}\\]])", "$1")
    when(raw.isNull || sliced === "", lit(null).cast("string")).otherwise(commaStripped)
  }

  /** F12 — does the repaired candidate parse as JSON? Uses Spark's VARIANT parser
    * (try_parse_json → null on malformed input) so arbitrary shapes validate.
    */
  def jsonParseOk(candidate: Column): Column =
    candidate.isNotNull && try_parse_json(candidate).isNotNull

  /** F13 — last 8 chars of a secret for redacted display (app.py:448). */
  def last8(c: Column): Column = substring(c, -8, 8)

  /** F14 — zero pad (reference `str(x).zfill(w)`, worker.py:230). */
  def zfill(c: Column, width: Int): Column = lpad(c.cast("string"), width, "0")

  /** F15 — footer template token substitution {YYYY}/{YYYYMMDD}/{username}
    * (reference marc.html:160-173 + static/config/marc_postfix.txt).
    */
  def substituteTemplate(tpl: Column, now: Column, username: Column): Column =
    replace(
      replace(
        replace(tpl, lit("{YYYY}"), date_format(now, "yyyy")),
        lit("{YYYYMMDD}"), date_format(now, "yyyyMMdd")),
      lit("{username}"), username)

  /** F16 — pluralize "item(s)" (app.py:554). */
  def pluralizeItems(n: Column): Column =
    concat(n.cast("string"), when(n === 1, lit(" item")).otherwise(lit(" items")))
}
