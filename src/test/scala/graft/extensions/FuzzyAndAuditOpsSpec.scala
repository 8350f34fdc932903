package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Specs for the fuzzy-pair and audit operators: edit-distance pairs
  * (SymSpell deletion blocking vs brute force), robust median/MAD scaling,
  * mixture concentration, l-diversity.
  */
class FuzzyAndAuditOpsSpec extends AnyFunSuite with SparkTestSession {

  // --- Dedup.editDistancePairs ----------------------------------------------

  test("editDistancePairs finds planted typo pairs, skips exact dups") {
    import spark.implicits._
    val df = Seq((1L, "kitten"), (2L, "sitten"), (3L, "sittin"),
      (4L, "kitchen"), (5L, "apple"), (6L, "kitten")).toDF("id", "nm")
    val got = Dedup.editDistancePairs(df, col("id"), col("nm"),
        maxDist = 2, minDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Set((1L, 2L, 1), (2L, 3L, 1), (1L, 3L, 2), (1L, 4L, 2),
      (2L, 6L, 1), (3L, 6L, 2), (4L, 6L, 2))
    assert(got == want) // note: no (1,6) — identical keys are exact dedup's
  }

  test("editDistancePairs deletion block equals brute force on real names") {
    val part = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    val fast = Dedup.editDistancePairs(part, col("p_partkey"), col("p_name"),
        maxDist = 2, minDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val n = part.select(col("p_partkey").as("id"), col("p_name").as("nm"))
    val brute = n.as("a").join(n.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id"), col("b.id"),
        levenshtein(col("a.nm"), col("b.nm")).as("d"))
      .filter(col("d").between(1, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(fast == brute)
    assert(brute.nonEmpty) // the fixture actually exercises the block
  }

  test("editDistancePairs ignores null and over-long keys") {
    import spark.implicits._
    val long = "x" * 80
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, null), (4L, long))
      .toDF("id", "nm")
    val got = Dedup.editDistancePairs(df, col("id"), col("nm"),
      maxDist = 1, minDist = 1).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("editDistancePairs is CHARACTER-based on multibyte keys") {
    import spark.implicits._
    // é is one char (two UTF-8 bytes): café↔cafe is one substitution;
    // byte-based deletion variants would break the block
    val df = Seq((1L, "café"), (2L, "cafe"), (3L, "caf"), (4L, "日本語"),
      (5L, "日本")).toDF("id", "nm")
    val got = Dedup.editDistancePairs(df, col("id"), col("nm"),
        maxDist = 1, minDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 1), (4L, 5L, 1)))
  }

  // --- Ensemble.robustScale -------------------------------------------------

  test("robustScale computes per-group median, MAD and robust z") {
    import spark.implicits._
    // group a: 1,2,3,4,100 -> med 3, abs devs 2,1,0,1,97 -> mad 1
    // group b: constant 7 -> mad 0 -> robust_z NULL
    val df = (Seq(1, 2, 3, 4, 100).zipWithIndex.map { case (v, i) =>
      (i.toLong, "a", v) } ++ Seq((10L, "b", 7), (11L, "b", 7)))
      .toDF("id", "grp", "v")
    val out = Ensemble.robustScale(df, col("id"), col("grp"), col("v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(3), r.getDouble(4), Option(r.get(5))))).toMap
    assert(out(2L) == ((3.0, 1.0, Some(0.0))))
    assert(out(4L) == ((3.0, 1.0, Some(97.0))))
    assert(out(0L) == ((3.0, 1.0, Some(-2.0))))
    assert(out(10L)._3.isEmpty) // zero MAD -> null score
  }

  // --- Mixture.concentrationProfile -----------------------------------------

  test("concentrationProfile HHI/entropy/top-share per group") {
    import spark.implicits._
    val df = (Seq.fill(3)(("g1", "a")) ++ Seq(("g1", "b")) ++
      Seq.fill(5)(("g2", "only"))).toDF("grp", "cat")
    val out = Mixture.concentrationProfile(df, col("grp"), col("cat"))
      .collect().map(r => r.getString(0) -> r).toMap
    val g1 = out("g1")
    assert(g1.getLong(1) == 4L && g1.getLong(2) == 2L)
    assert(g1.getDouble(3) == 0.75)                      // top share
    assert(g1.getDouble(4) == 0.625)                     // (9+1)/16
    val h = math.log(4) - 3 * math.log(3) / 4            // exact entropy
    assert(math.abs(g1.getDouble(5) - h) < 1e-6)
    assert(math.abs(g1.getDouble(6) - h / math.log(2)) < 1e-6)
    val g2 = out("g2")
    assert(g2.getDouble(4) == 1.0 && g2.getDouble(5) == 0.0)
    assert(g2.isNullAt(6))  // single category: no normalizable spread
  }

  // --- TextAnalysis.lDiversity ----------------------------------------------

  test("tCloseness: exact TV distance per class, null contracts, strict-> boundary") {
    import spark.implicits._
    // classes: A skewed toward s1 (plus one NULL-sensitive row that must
    // inherit A's verdict without joining the distribution), B skewed to s2,
    // D balanced, E holding a value absent everywhere else (exercises the
    // (N−cov)·n closed form), C all-NULL (no distribution), and a NULL-QI
    // class (legitimate class per the <=> contract)
    val rows: Seq[(Option[String], Option[String])] = Seq(
      Some("A") -> Some("s1"), Some("A") -> Some("s1"), Some("A") -> Some("s1"),
      Some("A") -> Some("s2"), Some("A") -> None,
      Some("B") -> Some("s1"), Some("B") -> Some("s2"), Some("B") -> Some("s2"),
      Some("B") -> Some("s2"),
      Some("D") -> Some("s1"), Some("D") -> Some("s2"),
      Some("E") -> Some("s3"), Some("E") -> Some("s3"),
      Some("C") -> None, Some("C") -> None,
      None -> Some("s1"))
    // independent integer-arithmetic reference (BigInt cross-multiply, one
    // final double division — the operator's documented contract)
    val nn = rows.collect { case (q, Some(s)) => (q, s) }
    val bigN = BigInt(nn.size)
    val g = nn.groupBy(_._2).view.mapValues(v => BigInt(v.size)).toMap
    def refTv(q: Option[String]): Option[Double] = {
      val cs = nn.filter(_._1 == q).groupBy(_._2)
        .view.mapValues(v => BigInt(v.size)).toMap
      if (cs.isEmpty) None else {
        val n = cs.values.sum
        val sumabs = cs.map { case (s, c) => (c * bigN - g(s) * n).abs }.sum
        val extra = (bigN - cs.keys.map(g).sum) * n
        Some(BigDecimal((sumabs + extra).toDouble /
          (2.0 * n.toDouble * bigN.toDouble))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val out = TextAnalysis.tCloseness(rows.toDF("qi", "sens"),
        Seq(col("qi")), col("sens"), t = 0.2)
      .select(col("qi"), col("sens"), col("tv_distance"), col("suppress"))
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getBoolean(3)))
    assert(out.length == rows.size, "join-back must preserve every row")
    for ((q, _, tv, sup) <- out) {
      assert(tv == refTv(q), s"class $q: engine $tv vs reference ${refTv(q)}")
      assert(sup == tv.exists(_ > 0.2), s"class $q suppress")
    }
    val tvByClass = out.map(o => o._1 -> o._3).toMap
    // E's 2-row own-value class is maximally skewed; D is near-balanced
    assert(tvByClass(Some("E")).exists(_ > 0.8))
    assert(tvByClass(Some("C")).isEmpty) // no distribution → NULL tv
    assert(!out.exists(o => o._1 == Some("C") && o._4)) // …and never suppressed
    // NULL-sensitive member of A carries A's class verdict
    val aNull = out.find(o => o._1 == Some("A") && o._2.isEmpty).get
    assert(aNull._3 == refTv(Some("A")))
    // strict-> boundary: with t set exactly to a class's rounded tv, that
    // class is NOT suppressed (round-then-compare, > not >=)
    val tA = refTv(Some("A")).get
    val atBoundary = TextAnalysis.tCloseness(rows.toDF("qi", "sens"),
        Seq(col("qi")), col("sens"), t = tA)
      .filter(col("qi") === "A").select("suppress")
      .collect().map(_.getBoolean(0))
    assert(atBoundary.nonEmpty && atBoundary.forall(_ == false))
  }

  test("lDiversity flags homogeneous classes, counts distinct non-null") {
    import spark.implicits._
    // class (x): 3 rows, sens {s1,s1,s2} -> diversity 2 -> suppress at l=3
    // class (y): 3 rows, sens {s1,s2,s3} -> diversity 3 -> keep
    // class (null): nulls are class members; null sens not counted
    val df = Seq((1L, "x", "s1"), (2L, "x", "s1"), (3L, "x", "s2"),
      (4L, "y", "s1"), (5L, "y", "s2"), (6L, "y", "s3"),
      (7L, null, "s1"), (8L, null, null)).toDF("id", "qi", "sens")
    val out = TextAnalysis.lDiversity(df, Seq(col("qi")), col("sens"), 3L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(out.size == 8) // null-QI rows are classed, not dropped
    assert(out(1L) == ((3L, 2L, true)))
    assert(out(4L) == ((3L, 3L, false)))
    assert(out(7L) == ((2L, 1L, true))) // null class: 2 rows, 1 distinct
  }

  // --- TextAnalysis.dpCountRelease ------------------------------------------

  /** Driver-side replica of the release chain: sha-uniform → Laplace inverse
    * CDF → round-6 → add → round → clamp. */
  private def dpExpect(seedParts: Seq[String], salt: String, n: Long,
      epsilon: Double): Long = {
    val seed = (seedParts :+ salt).mkString("|")
    val hex = java.security.MessageDigest.getInstance("SHA-256")
      .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    val u = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) / 4294967296.0
    val raw = -(1.0 / epsilon) * math.signum(u - 0.5) *
      math.log(1.0 - 2.0 * math.abs(u - 0.5))
    val noise6 = BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    math.max(0L, BigDecimal(n + noise6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  test("dpCountRelease matches the driver-side chain; exact counts absent") {
    import spark.implicits._
    val df = Seq.tabulate(40)(i => (i.toLong, if (i % 3 == 0) "en" else "lv",
        s"s${i % 2}"))
      .toDF("id", "lang", "source")
    val out = TextAnalysis.dpCountRelease(df,
      Seq(col("lang"), col("source")), epsilon = 0.5, salt = "t1")
    assert(out.columns.toSeq == Seq("lang", "source", "n_released", "epsilon"))
    val got = out.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = df.groupBy("lang", "source").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.keySet == exact.keySet)
    for ((k @ (l, s), n) <- exact)
      assert(got(k) == dpExpect(Seq(l, s), "t1", n, 0.5), s"group $k")
    // repartition invariance: the release is a pure function of the groups
    val re = TextAnalysis.dpCountRelease(df.repartition(17),
        Seq(col("lang"), col("source")), epsilon = 0.5, salt = "t1")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(re == got)
  }

  test("dpCountRelease: NULL group is real and distinct from ''; clamp; salt") {
    import spark.implicits._
    val df = Seq((1L, Option("")), (2L, Option("")), (3L, None), (4L, None),
        (5L, Option("a")))
      .toDF("id", "lang")
    // tiny epsilon → scale 20 noise → small counts can go negative → clamp to 0
    val out = TextAnalysis.dpCountRelease(df, Seq(col("lang")),
        epsilon = 0.05, salt = "t2")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(out.keySet == Set(Option(""), None, Option("a")))
    assert(out(Option("")) ==
      dpExpect(Seq(""), "t2", 2L, 0.05), "empty-string group seeds as ''")
    assert(out(None) ==
      dpExpect(Seq(""), "t2", 2L, 0.05), "NULL group seeds as sentinel")
    assert(out(Option("")) != out(None),
      "sentinel-distinct seeds draw distinct noise here (1 vs 10)")
    // a different salt is a fresh draw, and under t3 the 'a' group's draw is
    // −14.84 on a count of 1 — the clamp genuinely fires
    val other = TextAnalysis.dpCountRelease(df, Seq(col("lang")),
        epsilon = 0.05, salt = "t3")
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(other != out)
    assert(other(Option("a")) == 0L, "negative noisy count clamps to 0")
    intercept[IllegalArgumentException](
      TextAnalysis.dpCountRelease(df, Seq.empty, epsilon = 0.5))
    intercept[IllegalArgumentException](
      TextAnalysis.dpCountRelease(df, Seq(col("lang")), epsilon = 0.0))
  }
}
