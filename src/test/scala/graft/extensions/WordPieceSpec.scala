package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** WordPiece trainer + encoder semantics on hand-computable fixtures: the
  * likelihood argmax (vs BPE's count argmax), the marker/display mapping,
  * greedy longest-match encoding with whole-word UNK, and the degenerate /
  * determinism edges the x163/x165 oracle rows can't isolate.
  */
class WordPieceSpec extends AnyFunSuite with SparkTestSession {

  private val specVocab: Seq[String] = {
    val singles = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    singles ++ singles.map("##" + _) ++
      Seq("the", "th", "##er", "##ll")
  }

  test("wordpieceTrain: likelihood argmax differs from BPE's count argmax") {
    import spark.implicits._
    // pairs: (x,##y) count 2 score 2/(2*2)=0.5 beats (a,##b) count 3 score
    // 3/(13*3)≈0.077 — BPE-by-count would pick (a,##b) first.
    val words = Seq.fill(2)("xy") ++ Seq.fill(3)("ab") ++
      Seq.fill(10)("a") ++ Seq.fill(10)("b")
    val d = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = WordPiece.wordpieceTrain(d, col("text"), nMerges = 8,
      minCount = 2L).orderBy("step").collect()
    assert(out.length == 2, "two merges then no pairs remain")
    val s1 = out(0)
    assert((s1.getString(1), s1.getString(2), s1.getString(3)) ==
      ("x", "##y", "xy"))
    assert(s1.getAs[Long]("pair_count") == 2L &&
      s1.getAs[Long]("left_count") == 2L &&
      s1.getAs[Long]("right_count") == 2L)
    assert(s1.getAs[Double]("score") == 2.0 / (2.0 * 2.0))
    val s2 = out(1)
    assert((s2.getString(1), s2.getString(2), s2.getString(3)) ==
      ("a", "##b", "ab"))
    assert(s2.getAs[Long]("pair_count") == 3L &&
      s2.getAs[Long]("left_count") == 13L &&
      s2.getAs[Long]("right_count") == 3L)
    assert(s2.getAs[Double]("score") == 3.0 / (13.0 * 3.0))
  }

  test("wordpieceTrain: marker keeps word-initial symbols distinct; cp tie-break") {
    import spark.implicits._
    // "aa"×5 → [⟨a, a]; "baa"×4 → [⟨b, a, a]. Scores: (⟨a,a)=5/(5·13)=1/13,
    // (⟨b,a)=4/(4·13)=1/13 (IEEE-identical: both correctly-rounded 1/13),
    // (a,a)=4/169. Tie broken by pair count: (⟨a,a) cp=5 wins.
    val words = Seq.fill(5)("aa") ++ Seq.fill(4)("baa")
    val d = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val out = WordPiece.wordpieceTrain(d, col("text"), nMerges = 1,
      minCount = 2L).collect()
    assert(out.length == 1)
    assert((out(0).getString(1), out(0).getString(2), out(0).getString(3)) ==
      ("a", "##a", "aa"),
      "word-initial 'a' (display bare) merges with continuation '##a'")
    assert(out(0).getAs[Long]("pair_count") == 5L)
  }

  test("wordpieceTrain: minCount filters candidates, it does not stop training") {
    import spark.implicits._
    // (j,##k) occurs ONCE with once-occurring symbols → score 1.0, the
    // global argmax — but below minCount. The trainer must pick the
    // qualifying (a,##b) instead of stopping (the round-14 regression:
    // stop-on-winner-below-minCount trained zero merges here).
    val d = Seq((1L, "jk ab ab ab")).toDF("doc_id", "text")
    val out = WordPiece.wordpieceTrain(d, col("text"), nMerges = 1,
      minCount = 2L).collect()
    assert(out.length == 1)
    assert((out(0).getString(1), out(0).getString(2)) == ("a", "##b"))
    assert(out(0).getAs[Long]("pair_count") == 3L)
  }

  test("wordpieceTrain: degenerate corpus → zero merges; x165 degrades empty") {
    import spark.implicits._
    val d = Seq((1L, "ab", "en", "web", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(WordPiece.wordpieceTrain(d, col("text"), nMerges = 5,
      minCount = 2L).isEmpty, "no pair reaches minCount")
    val dir = java.nio.file.Files.createTempDirectory("wp-degenerate").toString
    d.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("x165_wordpiece_invariants")(spark, dir)
    assert(out.isEmpty, "degenerate corpus → empty invariant relation")
    assert(out.columns.toSeq == Seq("step1_left", "step1_right",
      "step1_merged", "step1_count", "step1_left_count", "step1_right_count",
      "step1_score_p12", "merged_concat_ok", "counts_ok", "steps_contiguous"))
  }

  test("wordpieceTrain: deterministic under repartitioning") {
    import spark.implicits._
    val d = Seq((1L, "the there then th at hat that the there"),
      (2L, "other mother the thermal th in thin"))
      .toDF("doc_id", "text")
    val a = WordPiece.wordpieceTrain(d, col("text"), nMerges = 6).collect()
    val b = WordPiece.wordpieceTrain(d.repartition(13), col("text"),
      nMerges = 6).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.nonEmpty)
  }

  test("wordpieceEncodeProfile: greedy longest match, hand-traced") {
    import spark.implicits._
    // "therother": the|##r|##o|##t|##h|##er = 6 ("the" beats "th" at start)
    // "the": one piece; "hello": h|##e|##ll|##o = 4 (##ll beats ##l)
    val d = Seq((1L, "therother the"), (2L, "hello")).toDF("doc_id", "text")
    val out = WordPiece.wordpieceEncodeProfile(d, col("doc_id"), col("text"),
      specVocab).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_words") == 2L)
    assert(out(1L).getAs[Long]("n_word_chars") == 12L)
    assert(out(1L).getAs[Long]("n_tokens") == 7L)
    assert(out(1L).getAs[Long]("n_unk_words") == 0L)
    assert(out(2L).getAs[Long]("n_tokens") == 4L)
  }

  test("wordpieceEncodeProfile: whole-word UNK and wordless docs") {
    import spark.implicits._
    // "th!er": '!' has no piece → whole word is ONE UNK token even though
    // 'th' matched first. "az" is fully coverable by singles. Doc 3 empty.
    val d = Seq((1L, "th!er az"), (2L, "a"), (3L, "   "))
      .toDF("doc_id", "text")
    val out = WordPiece.wordpieceEncodeProfile(d, col("doc_id"), col("text"),
      specVocab).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_words") == 2L)
    assert(out(1L).getAs[Long]("n_tokens") == 1L + 2L,
      "UNK word counts 1; 'az' = a|##z")
    assert(out(1L).getAs[Long]("n_unk_words") == 1L)
    assert(out(2L).getAs[Long]("n_tokens") == 1L)
    assert(out(3L).getAs[Long]("n_words") == 0L &&
      out(3L).getAs[Long]("n_tokens") == 0L &&
      out(3L).getAs[Long]("n_unk_words") == 0L)
  }

  test("wordpieceEncodeProfile: continuation pieces never match word-start") {
    import spark.implicits._
    // vocab has bare singles ONLY for a/b and continuation '##a' — word "ab"
    // starts fine, but word "ba" at pos 2 needs '##a' (present) while word
    // "ca" can't start: 'c' has no bare piece → UNK.
    val vocab = Seq("a", "b", "##a", "##b")
    val d = Seq((1L, "ab ba ca")).toDF("doc_id", "text")
    val out = WordPiece.wordpieceEncodeProfile(d, col("doc_id"), col("text"),
      vocab).collect()
    assert(out.head.getAs[Long]("n_tokens") == 2L + 2L + 1L)
    assert(out.head.getAs[Long]("n_unk_words") == 1L)
  }

  test("x167 tokenizer comparison: hand-traced rows incl. wordless language") {
    import spark.implicits._
    // lang aa: "the the" — whitespace 2 tokens; BPE under the x99 merges
    // (t+h, e+r, ...) splits each "the" to [th, e] → 4 tokens; WordPiece
    // under the x163 vocab has "the" whole → 2 tokens. lang bb is wordless.
    val d = Seq((1L, "the the", "aa", "web", 7L),
      (2L, "   ", "bb", "web", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("tokcmp").toString
    d.coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.SparkEntry.queries("x167_tokenizer_compare")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 6, "2 langs x 3 tokenizers")
    val ws = out(("aa", "whitespace"))
    assert((ws.getLong(2), ws.getLong(3), ws.getLong(4)) == ((2L, 6L, 2L)))
    assert(ws.getLong(5) == 1000000L && ws.getLong(6) == 3000000L)
    val bpe = out(("aa", "bpe"))
    assert(bpe.getLong(4) == 4L, "th+e per word under the t+h merge")
    assert(bpe.getLong(5) == 2000000L && bpe.getLong(6) == 1500000L)
    val wp = out(("aa", "wordpiece"))
    assert(wp.getLong(4) == 2L, "'the' is a whole vocab piece")
    assert(wp.getLong(5) == 1000000L && wp.getLong(6) == 3000000L)
    val none = out(("bb", "whitespace"))
    assert(none.getLong(2) == 0L && none.isNullAt(5) && none.isNullAt(6))
    assert(out(("bb", "bpe")).getLong(4) == 0L)
    assert(out(("bb", "wordpiece")).getLong(4) == 0L)
  }

  test("wordpieceTrain: '#'-initial corpus word display collision is guarded") {
    import spark.implicits._
    // "##x"×3 → symbols [⟨#, #, x]; merging ⟨# + # gives a word-initial
    // symbol whose display form is "##" + ... — byte-identical to the
    // continuation space (round-14 advisory). The trainer must fail loudly
    // instead of emitting the ambiguous merge row.
    val bad = Seq((1L, "##x ##x ##x")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      WordPiece.wordpieceTrain(bad, col("text"), nMerges = 3, minCount = 2L)
    }
    assert(ex.getMessage.contains("continuation space"))
    // a single '#' prefix stays unambiguous ("#t" is not a ## piece) and
    // must keep training normally
    val ok = Seq((1L, "#tag #tag #tag")).toDF("doc_id", "text")
    val m = WordPiece.wordpieceTrain(ok, col("text"), nMerges = 3,
      minCount = 2L).collect()
    // continuation merges legitimately display as ##…; only WORD-INITIAL
    // pieces (left not ##-prefixed) must stay out of the continuation space
    assert(m.nonEmpty && m.forall { r =>
      r.getAs[String]("left").startsWith("##") ||
        !r.getAs[String]("merged").startsWith("##")
    })
  }

  test("wordpieceEncodeProfile: vocab validation") {
    import spark.implicits._
    val d = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      WordPiece.wordpieceEncodeProfile(d, col("doc_id"), col("text"), Seq())
    }
    intercept[IllegalArgumentException] {
      WordPiece.wordpieceEncodeProfile(d, col("doc_id"), col("text"),
        Seq("a", "a"))
    }
    intercept[IllegalArgumentException] {
      WordPiece.wordpieceEncodeProfile(d, col("doc_id"), col("text"),
        Seq("##"))
    }
  }
}
