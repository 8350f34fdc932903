package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Brute-force equality sweeps at the EXACT threshold boundary for every
  * thresholded pair join — the x101 class, generalized. The round-10
  * sf0.001 sweep proved this bug class ships silently: the exact-Jaccard
  * prefix filter was one token short ONLY at the ⌈t·|d|⌉ ceil boundary and
  * dropped a single pair no smaller unit test noticed. The same integral-
  * threshold arithmetic pattern lives in the deletion-variant blocking of
  * [[Dedup.editDistancePairs]], the round-6-then-compare filters of
  * [[Dedup.ngramJaccardPairs]] / [[Dedup.containmentPairs]], and the
  * cross-side resolution of [[Contamination.nearDupContamination]] — so
  * each gets the same treatment here: a minimal corpus PLANTED with pairs
  * exactly at, one step below, and one step above its boundary, checked for
  * set equality against an independent brute-force reference (local Scala,
  * no Spark machinery shared with the operator under test).
  *
  * These are correctness tests of the blocked/bitset fast paths: candidate
  * generation must lose nothing at the boundary, and every fast path must
  * produce the identical relation to the naive formulation.
  */
class BoundarySweepSpec extends AnyFunSuite with SparkTestSession {

  /** Spark `round(_, 6)` replica: HALF_UP at 6 dp on doubles. */
  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent Levenshtein (full DP, no banding — the reference must not
    * share the banded fast path's arithmetic). */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  // ------------------------------------------------- editDistancePairs --

  /** Keys crafted around every blocking boundary: length 1 (deletion
    * variant is ""), length == maxLen (inclusion boundary), length ==
    * maxLen+1 (exclusion boundary), pairs at distance exactly maxDist and
    * exactly maxDist+1, pure substitutions, pure insert/delete chains, a
    * transposition (lev 2, not 1), and duplicate keys (dist 0 — excluded
    * by the minDist ≥ 1 contract but exercising the id fan-out joins).
    */
  private val edKeys: Seq[(Long, String)] = Seq(
    1L -> "a", 2L -> "b",               // len-1: variant "" shared, dist 1
    3L -> "ab",                         // dist 1 from both len-1 keys
    4L -> "ba",                         // transposition of "ab": dist 2
    5L -> "abcd", 6L -> "abcde",        // one insertion: dist 1
    7L -> "abc",                        // two deletions from "abcde": dist 2
    8L -> "abcdefgh",                   // len == maxLen(8): included
    9L -> "abcdefgx",                   // dist 1 substitution at the tail
    10L -> "xbcdefgx",                  // dist 2 (two substitutions)
    11L -> "abcdefghi",                 // len 9 > maxLen: EXCLUDED entirely
    12L -> "abcdefgh",                  // duplicate of 8: dist 0, never out
    13L -> "zzz", 14L -> "qqq")         // dist 3 apart: out at maxDist=2

  private def edBrute(maxDist: Int, maxLen: Int): Set[(Long, Long, Int)] = {
    val valid = edKeys.filter { case (_, k) => k.nonEmpty && k.length <= maxLen }
    (for {
      (ia, ka) <- valid; (ib, kb) <- valid if ia < ib
      d = lev(ka, kb) if d >= 1 && d <= maxDist
    } yield (ia, ib, d)).toSet
  }

  test("editDistancePairs: brute-force set equality at every blocking boundary") {
    import spark.implicits._
    val df = edKeys.toDF("id", "nm")
    for (maxDist <- Seq(1, 2)) {
      val fast = Dedup.editDistancePairs(df, col("id"), col("nm"),
          maxDist = maxDist, minDist = 1, maxLen = 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(fast == edBrute(maxDist, 8),
        s"maxDist=$maxDist: fast=${fast.toSeq.sorted} brute=${edBrute(maxDist, 8).toSeq.sorted}")
      assert(fast.nonEmpty, "vacuous sweep: planted pairs missing")
    }
  }

  // ------------------------------------------------- ngramJaccardPairs --

  /** Unigram docs with Jaccard exactly AT the threshold (2/4 = 0.5 and
    * 1/3 ≈ 0.333333), one step below (2/5 = 0.4), above (3/4 = 0.75), a
    * dup pair (1.0), and a disjoint doc. n = 1 makes the shingle set the
    * distinct token set, so every ratio is constructed exactly.
    */
  private val njDocs: Seq[(Long, String)] = Seq(
    1L -> "t1 t2 t3",          // A
    2L -> "t1 t2 t4",          // B: A∩B=2, ∪=4 → exactly 0.5
    3L -> "t1 t2 t3 t5",       // C: vs A 3/4=0.75; vs B 2/5=0.4
    4L -> "t1 t6",             // D: vs A 1/4=0.25
    5L -> "t1 t2 t3",          // E=A: 1.0
    6L -> "u1 u2 u3",          // disjoint
    7L -> "p1 p2", 8L -> "p2 p3") // raw ratio exactly 1/3 — r6 rounds it to
                                  // 0.333333 < 1/3, so at t=1/3 BOTH engine
                                  // and reference must exclude it (the
                                  // round-then-compare contract's own edge)

  private def njBrute(threshold: Double): Set[(Long, Long, Int, Double)] = {
    val sets = njDocs.map { case (id, t) => id -> t.split(" ").distinct.toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      j = r6(inter.toDouble / (sa.size + sb.size - inter)) if j >= threshold
    } yield (ia, ib, inter, j)).toSet
  }

  private def njFast(threshold: Double, maxDictVocab: Int)
      : Set[(Long, Long, Int, Double)] = {
    import spark.implicits._
    Dedup.ngramJaccardPairs(njDocs.toDF("id", "text"), col("id"), col("text"),
        lit("blk"), n = 1, threshold = threshold, maxDictVocab = maxDictVocab)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
  }

  test("ngramJaccardPairs: bitset AND array paths ≡ brute force at exact-ratio boundaries") {
    // non-vacuity on RAW ratios: the corpus must hold a pair sitting exactly
    // on each tested threshold before rounding (0.5 keeps it; 1/3 rounds to
    // 0.333333 < 1/3 and is excluded — both sides must agree either way)
    val rawRatios = {
      val sets = njDocs.map { case (id, t) => id -> t.split(" ").distinct.toSet }
      for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = (sa & sb).size
      } yield inter.toDouble / (sa.size + sb.size - inter)
    }
    for (t <- Seq(0.5, 1.0 / 3.0)) {
      assert(rawRatios.exists(x => math.abs(x - t) < 1e-12),
        s"vacuous sweep at t=$t: no pair sits exactly on the boundary")
      val brute = njBrute(t)
      assert(njFast(t, 4096) == brute, s"bitset path diverges at t=$t")
      assert(njFast(t, 0) == brute, s"array path diverges at t=$t")
    }
    // and the 1/3-boundary pair is excluded at t=1/3 by the documented
    // round-then-compare semantics (r6(1/3) < 1/3)
    assert(!njBrute(1.0 / 3.0).exists(p => p._1 == 7L && p._2 == 8L))
  }

  test("ngramJaccardPairs: vocab-cutover boundary changes the path, never the relation") {
    // 9 distinct tokens in the corpus: maxDictVocab=9 takes the bitset path
    // (dict fits exactly), 8 falls back to the array path one token over —
    // the relation must be identical on both sides of the cutover
    val vocab = njDocs.flatMap(_._2.split(" ")).distinct.size
    val a = njFast(0.5, vocab)
    val b = njFast(0.5, vocab - 1)
    assert(a == b, s"cutover at vocab=$vocab changed the relation")
    assert(a == njBrute(0.5))
  }

  // ------------------------------------------------- containment pairs --

  /** min-denominator ratios exactly at 0.8 (4/5), below (3/5), 1.0 subset
    * containment (the operator's raison d'être), and a disjoint doc. */
  private val ctDocs: Seq[(Long, String)] = Seq(
    1L -> "a b c d e",             // base, 5 tokens
    2L -> "a b c d x y z w",       // ∩base=4, min=5 → exactly 0.8
    3L -> "a b c x2 y2",           // ∩base=3, min=5 → 0.6: out
    4L -> "a b c d e f g",         // ⊇ base: min=5, ∩=5 → 1.0
    5L -> "a b",                   // tiny subset: min=2 ∩=2 → 1.0 vs base
    6L -> "m n o p")               // disjoint

  private def ctBrute(threshold: Double): Set[(Long, Long, Int, Double)] = {
    val sets = ctDocs.map { case (id, t) => id -> t.split(" ").distinct.toSet }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      c = r6(inter.toDouble / math.min(sa.size, sb.size)) if c >= threshold
    } yield (ia, ib, inter, c)).toSet
  }

  test("containmentPairs: brute-force equality at the exact min-ratio boundary") {
    import spark.implicits._
    val fast = Dedup.containmentPairs(ctDocs.toDF("id", "text"), col("id"),
        col("text"), lit("blk"), n = 1, threshold = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val brute = ctBrute(0.8)
    assert(fast == brute)
    assert(brute.exists(_._4 == 0.8), "vacuous: no pair exactly at 0.8")
    assert(!brute.exists(p => p._1 == 1L && p._2 == 3L), "0.6 pair leaked in")
  }

  test("containmentPairsAgainst: directional boundary equality vs the self-join") {
    import spark.implicits._
    val corpus = ctDocs.toDF("id", "text")
    val queries = ctDocs.filter(d => d._1 == 1L || d._1 == 5L).toDF("id", "text")
    val fast = Dedup.containmentPairsAgainst(queries, corpus, col("id"),
        col("text"), lit("blk"), n = 1, threshold = 0.8)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    // directional reference: query side fixed, both orientations kept,
    // self-pairs dropped
    val sets = ctDocs.map { case (id, t) => id -> t.split(" ").distinct.toSet }.toMap
    val brute = (for {
      qa <- Seq(1L, 5L); (ib, sb) <- sets if qa != ib
      sa = sets(qa); inter = (sa & sb).size
      c = r6(inter.toDouble / math.min(sa.size, sb.size)) if c >= 0.8
    } yield (qa, ib, inter, c)).toSet
    assert(fast == brute)
    // the exact-0.8 pair must be present in the directional shape too
    assert(fast.contains((1L, 2L, 4, 0.8)))
  }

  // ------------------------------------- nearDupContamination (decontam) --

  test("nearDupContamination: flags ≡ brute-force cross-side reference at the boundary") {
    import spark.implicits._
    // train rows: T1 exactly at threshold vs eval E1 (2/4 = 0.5), T2 just
    // below vs everything, T3 a paraphrase-level near-dup (0.75), T4 a dup
    // of T1 (SAME-side 1.0 — must NOT flag anything by itself), T5 empty.
    val train = Seq(
      (101L, "t1 t2 t3"),        // vs E1 {t1,t2,t4}: 2/4 = 0.5 → flagged
      (102L, "t1 z1 z2 z3"),     // vs E1: 1/6 ≈ 0.167 → clean
      (103L, "t1 t2 t4 t9"),     // vs E1: 3/5 = 0.6 → flagged
      (104L, "t1 t2 t3"),        // same tokens as T1: flagged via E1, and
                                 // the T1–T4 SAME-side 1.0 pair must not count
      (105L, "")).toDF("id", "text")
    val eval = Seq(
      (201L, "t1 t2 t4"),        // E1
      (202L, "w1 w2 w3")).toDF("id", "text")
    val out = Contamination.nearDupContamination(train, eval,
        col("id"), col("text"), lit("blk"), n = 1, threshold = 0.5)
      .select(col("id"), col("n_eval_matches"), col("max_jaccard"),
        col("is_contaminated"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))).toMap
    // brute force, cross-side only
    val tSets = Map(101L -> "t1 t2 t3", 102L -> "t1 z1 z2 z3",
      103L -> "t1 t2 t4 t9", 104L -> "t1 t2 t3")
      .view.mapValues(_.split(" ").distinct.toSet).toMap
    val eSets = Map(201L -> "t1 t2 t4", 202L -> "w1 w2 w3")
      .view.mapValues(_.split(" ").distinct.toSet).toMap
    for ((tid, ts) <- tSets) {
      val js = eSets.values.map { es =>
        val i = (ts & es).size
        r6(i.toDouble / (ts.size + es.size - i))
      }.filter(_ >= 0.5).toSeq
      val (n, mj, flag) = out(tid)
      assert(n == js.size, s"train $tid: $n matches, brute ${js.size}")
      assert(mj == (if (js.isEmpty) None else Some(js.max)), s"train $tid max")
      assert(flag == js.nonEmpty, s"train $tid flag")
    }
    // the empty doc survives to the output, clean
    assert(out(105L) == ((0L, None, false)))
    // and the exact-boundary train row really is the boundary case
    assert(out(101L)._2.contains(0.5))
  }
}
