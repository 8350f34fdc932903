package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** F1–F16 edge cases (SURVEY §2.6; fixture corpus FIXTURES.md §1.5). */
class ScalarsSpec extends AnyFunSuite with SparkTestSession {

  private def eval1(c: Column): Any = {
    import spark.implicits._
    Seq(1).toDF("x").select(c.as("r")).collect()(0).get(0)
  }

  test("F1 normalizeRelPath strips leading ./ chars and converts backslashes") {
    assert(eval1(Scalars.normalizeRelPath(lit(".\\a\\b.txt"))) == "a/b.txt")
    assert(eval1(Scalars.normalizeRelPath(lit("..//x/y"))) == "x/y")
    assert(eval1(Scalars.normalizeRelPath(lit("plain.txt"))) == "plain.txt")
  }

  test("F2 fileExtension lowercases and defaults to unknown") {
    assert(eval1(Scalars.fileExtension(lit("A.TXT"))) == ".txt")
    assert(eval1(Scalars.fileExtension(lit("noext"))) == "unknown")
    assert(eval1(Scalars.fileExtension(lit("a.tar.GZ"))) == ".gz")
    // splitext edge semantics (ground truth: python3 os.path.splitext)
    assert(eval1(Scalars.fileExtension(lit(".bashrc"))) == "unknown") // dotfile
    assert(eval1(Scalars.fileExtension(lit(".md"))) == "unknown")
    assert(eval1(Scalars.fileExtension(lit("..md"))) == "unknown")
    assert(eval1(Scalars.fileExtension(lit("a..md"))) == ".md")
    assert(eval1(Scalars.fileExtension(lit("foo."))) == ".")
    assert(eval1(Scalars.fileExtension(lit("x.y.z"))) == ".z")
  }

  test("F3 baseName / stemName") {
    assert(eval1(Scalars.baseName(lit("a/b/c.txt"))) == "c.txt")
    assert(eval1(Scalars.stemName(lit("a/b/c.txt"))) == "c")
    assert(eval1(Scalars.stemName(lit("c"))) == "c")
  }

  test("F4 appendFooter matches worker.py:238-244 branch table") {
    def f(out: String, footer: String) =
      eval1(Scalars.appendFooter(lit(out), lit(footer)))
    assert(f("body", "foot") == "body\nfoot")
    assert(f("body\n", "foot") == "body\nfoot") // no duplicate separator
    assert(f("body\r", "foot") == "body\rfoot")
    assert(f("", "foot") == "foot") // empty base: no separator
    assert(f("body", "   ") == "body") // blank footer: unchanged
  }

  test("F5 renumberToken replaces every occurrence with zfill(idx,9)") {
    assert(eval1(Scalars.renumberToken(lit("x 000000001 y 000000001"), lit(42)))
      == "x 000000042 y 000000042")
  }

  test("F7 elapsed parse: reference formats + malformed → null") {
    def p(s: String) = eval1(Scalars.parseElapsedSeconds(lit(s)))
    assert(p("1:02:03") == 3723.0)
    assert(p("2 days, 1:02:03") == 2 * 86400 + 3723.0)
    assert(p("1 day, 0:00:00.500000") == 86400.5)
    assert(p("garbage") == null)
    assert(p("1:2:3") == null) // reference requires 2-digit MM/SS
  }

  test("F7 formatElapsed inverse matches str(timedelta) shape") {
    assert(eval1(Scalars.formatElapsed(lit(3723L))) == "1:02:03")
    assert(eval1(Scalars.formatElapsed(lit(90061L))) == "1 day, 1:01:01")
    assert(eval1(Scalars.formatElapsed(lit(2 * 86400L))) == "2 days, 0:00:00")
  }

  test("F8 formatFileSize unit ladder (app.py:73-82)") {
    assert(eval1(Scalars.formatFileSize(lit(512L))) == "512 B")
    assert(eval1(Scalars.formatFileSize(lit(1536L))) == "1.50 KB")
    assert(eval1(Scalars.formatFileSize(lit(5L * 1024 * 1024))) == "5.00 MB")
    assert(eval1(Scalars.formatFileSize(lit(3L * 1024 * 1024 * 1024))) == "3.00 GB")
    assert(eval1(Scalars.formatFileSize(lit(2L * 1024 * 1024 * 1024 * 1024))) == "2.00 TB")
  }

  test("F10 mimeFromExtension defaults to image/png") {
    assert(eval1(Scalars.mimeFromExtension(lit(".JPG"))) == "image/jpeg")
    assert(eval1(Scalars.mimeFromExtension(lit(".weird"))) == "image/png")
  }

  test("F12 lenient JSON corpus (FIXTURES.md §1.5)") {
    def ok(raw: String): Boolean = {
      val cand = Scalars.lenientJsonCandidate(lit(raw))
      eval1(Scalars.jsonParseOk(cand)).asInstanceOf[Boolean]
    }
    assert(ok("""{"a": 1}"""))
    assert(ok("Here you go:\n{\"a\": 1}\nHope that helps!"))
    assert(ok("[1, 2, 3,]"))
    assert(ok("""{"a": [1,], "b": {"c": 2,},}"""))
    assert(!ok("no json here"))
    assert(!ok("""{"broken": """))
    assert(!ok(""))
  }

  test("F13/F14/F16") {
    assert(eval1(Scalars.last8(lit("sk-or-v1-abcdefgh12345678"))) == "12345678")
    assert(eval1(Scalars.zfill(lit(7), 9)) == "000000007")
    assert(eval1(Scalars.pluralizeItems(lit(1))) == "1 item")
    assert(eval1(Scalars.pluralizeItems(lit(3))) == "3 items")
  }

  test("F15 template substitution") {
    val out = eval1(Scalars.substituteTemplate(
      lit("Year {YYYY} stamp {YYYYMMDD} by {username}"),
      to_timestamp(lit("2026-08-12 00:00:00")), lit("alice")))
    assert(out == "Year 2026 stamp 20260812 by alice")
  }
}
