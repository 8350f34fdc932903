package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class HeuristicRulesSpec extends AnyFunSuite with SparkTestSession {

  private def flags(text: String): Map[String, Any] = {
    import spark.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
      .withColumn("__r", TextAnalysis.heuristicRules(col("text")))
      .select(col("__r.*"))
    val row = df.collect().head
    df.columns.zip(row.toSeq).toMap
  }

  private val goodText =
    (1 to 12).map(_ => "the quick brown fox jumps over one lazy dog today.").mkString("\n")

  test("a clean 120-word document passes every rule") {
    val f = flags(goodText)
    assert(f("n_words") == 120L, f.toString)
    val rules = f.view.filterKeys(_.startsWith("r_")).toMap
    assert(rules.values.forall(_ == true), rules.toString)
  }

  test("C4 rules: lorem ipsum and curly braces reject") {
    assert(flags(goodText + "\nLorem Ipsum dolor sit.")("r_no_lorem") == false)
    assert(flags(goodText + "\nfunction f() { return 1; }")("r_no_brace") == false)
    assert(flags(goodText)("r_no_lorem") == true)
  }

  test("Gopher word-count and word-length bounds") {
    assert(flags("too short")("r_word_count") == false)
    assert(flags(goodText)("r_word_count") == true)
    // mean word length 13 > 10 → fail
    assert(flags(Seq.fill(60)("incomprehensibly").mkString(" "))("r_mean_word_len") == false)
    // mean word length 2 < 3 → fail
    assert(flags(Seq.fill(60)("ab").mkString(" "))("r_mean_word_len") == false)
  }

  test("line-shape rules: bullets, ellipsis, terminal punctuation") {
    val bullets = (1 to 10).map(_ => "- item one two three").mkString("\n")
    assert(flags(bullets)("r_bullet_ratio") == false)       // 10/10 > 0.9
    val f = flags(goodText + "\n- one bullet line here.")
    assert(f("r_bullet_ratio") == true)                     // 1/13 ≤ 0.9
    val dots = (1 to 10).map(_ => "to be continued...").mkString("\n")
    assert(flags(dots)("r_ellipsis_ratio") == false)        // 10/10 > 0.3
    val unterminated = (1 to 10).map(_ => "no punctuation here").mkString("\n")
    assert(flags(unterminated)("r_terminal_punct") == false) // 0/10 < 0.5
    assert(flags(goodText)("r_terminal_punct") == true)
  }

  test("symbol and alpha-token ratios") {
    val hashy = Seq.fill(30)("## ## word").mkString(" ")
    assert(flags(hashy)("r_symbol_ratio") == false)   // 60 hashes vs 90 words
    assert(flags(goodText)("r_symbol_ratio") == true)
    val numeric = Seq.fill(60)("12345").mkString(" ")
    assert(flags(numeric)("r_alpha_ratio") == false)  // 0% alphabetic tokens
    assert(flags(goodText)("r_alpha_ratio") == true)
  }

  test("ruleProfile: exact counts and Wilson bound properties per group") {
    import spark.implicits._
    val df = (Seq.fill(8)("s1" -> goodText) ++ Seq("s1" -> "short fail") ++
      Seq.fill(3)("s2" -> goodText))
      .zipWithIndex.map { case ((src, t), i) => (i.toLong, src, t) }
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.ruleProfile(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("s1").getLong(1) == 9 && out("s1").getLong(2) == 8)
    assert(out("s2").getLong(1) == 3 && out("s2").getLong(2) == 3)
    // Wilson lower bound is below the rate, in [0,1], and the smaller
    // perfect sample (3/3) ranks BELOW the larger near-perfect one (8/9)
    for (r <- out.values) {
      assert(r.getDouble(4) < r.getDouble(3) || r.getDouble(3) == 0.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
    assert(out("s2").getDouble(4) < out("s1").getDouble(4),
      s"3/3 must rank below 8/9: ${out("s2").getDouble(4)} vs ${out("s1").getDouble(4)}")
  }

  test("langConsistency: mixed-language docs are flagged, pure docs are not") {
    import spark.implicits._
    val en = "the cat is in the hat and it is fine for now."
    val fr = "le chat est dans le sac et il est la du les des."
    val df = Seq(
      (1L, Seq(en, en, en, en, en).mkString("\n")),         // pure en
      (2L, Seq(en, en, fr, fr, fr).mkString("\n")),         // 40% match → mixed
      (3L, ""),                                             // no units
      (4L, en)                                              // single line
    ).toDF("doc_id", "text")
    val out = TextAnalysis.langConsistency(df, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) == "en" && out(1L).getLong(3) == 5 &&
      !out(1L).getBoolean(6) && out(1L).getDouble(5) == 1.0)
    assert(out(2L).getBoolean(6), "40% line agreement must flag as mixed")
    assert(out(3L).getLong(2) == 0 && out(3L).getDouble(5) == 0.0 &&
      !out(3L).getBoolean(6))
    assert(!out(4L).getBoolean(6), "single-unit docs are never 'mixed'")
  }

  test("empty / whitespace-only documents fail all ratio rules") {
    for (t <- Seq("", "   \n  \n")) {
      val f = flags(t)
      assert(f("n_words") == 0L)
      for (k <- Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
        "r_bullet_ratio", "r_ellipsis_ratio", "r_alpha_ratio", "r_terminal_punct"))
        assert(f(k) == false, s"$k on ${t.take(5)}")
      // the substring rules are vacuously true on empty text
      assert(f("r_no_lorem") == true && f("r_no_brace") == true)
    }
  }
}
