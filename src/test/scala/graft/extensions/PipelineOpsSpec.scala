package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for the round-3 pipeline operators: span dedup, mixture
  * sampling, CMS heavy hitters, prototype similarity. */
class PipelineOpsSpec extends AnyFunSuite with SparkTestSession {

  test("span dedup: first occurrence survives, later copies drop, tail kept") {
    import spark.implicits._
    // w=3 tiles; doc 1: [a b c][d e f]; doc 2 repeats [a b c] then fresh
    // tokens + a 2-token tail; doc 3 repeats doc 1 entirely; doc 4 empty
    val d = Seq(
      (1L, "a b c d e f"),
      (2L, "a b c x y z w v"),
      (3L, "a b c d e f"),
      (4L, "")
    ).toDF("id", "text")
    val out = SpanDedup.dedupSpans(d, col("id"), col("text"), w = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 0L, "a b c d e f")))     // all first occurrences
    assert(out(2L) == ((3L, 1L, "x y z w v")))       // [a b c] dropped, tail [w v] kept
    assert(out(3L) == ((2L, 2L, "")))                // full repeat -> empty
    assert(out(4L) == ((0L, 0L, "")))                // empty doc survives
  }

  test("span dedup: duplicate tile WITHIN one doc keeps only the first") {
    import spark.implicits._
    val d = Seq((7L, "p q r p q r")).toDF("id", "text")
    val out = SpanDedup.dedupSpans(d, col("id"), col("text"), w = 3).head()
    assert(out.getLong(1) == 2L && out.getLong(2) == 1L &&
      out.getString(3) == "p q r")
  }

  test("mixture sampling: thresholds hit targets, binding group kept whole") {
    import spark.implicits._
    // 100 'a' + 20 'b', target 50/50 -> T = min(200, 40) = 40:
    // b binds (kept whole-ish), a down-samples to ~20
    val rows = (1 to 100).map(i => (i.toLong, "a")) ++
      (101 to 120).map(i => (i.toLong, "b"))
    val df = rows.toDF("id", "g")
    val out = Mixture.sampleToMixture(df, col("id"), col("g"),
      Map("a" -> 500000L, "b" -> 500000L))
    val kept = out.filter(col("kept")).groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // thresholds: a -> 20*10000/100 = 2000, b -> 20*10000/20 = 10000 (all)
    assert(kept("b") == 20L)
    assert(kept.getOrElse("a", 0L) >= 10L && kept("a") <= 35L) // ~20 by hash
    // unknown groups are dropped
    val out2 = Mixture.sampleToMixture(df, col("id"), col("g"),
      Map("b" -> 1000000L))
    assert(out2.filter(col("kept") && col("g") === "a").count() == 0L)
    // determinism: same keys -> same decisions, independent of partitioning
    val again = Mixture.sampleToMixture(df.repartition(7), col("id"), col("g"),
      Map("a" -> 500000L, "b" -> 500000L))
      .filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    val first = out.filter(col("kept")).select("id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("CMS heavy hitters: exact top-k counts, both bounds hold") {
    import spark.implicits._
    val items = Seq.fill(50)("x") ++ Seq.fill(30)("y") ++ Seq.fill(20)("z") ++
      (1 to 40).map(i => s"rare$i")
    val df = items.toDF("tok")
    val out = HeavyHitters.auditedTopK(df, col("tok"), k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4)))
    assert(out.map(t => (t._1, t._2)).toSeq == Seq(("x", 50L), ("y", 30L), ("z", 20L)))
    assert(out.forall(t => t._4 && t._5)) // estimate within [exact, exact+eps*N]
    assert(out.forall(t => t._3 >= t._2)) // CMS never underestimates
  }

  test("prototype similarity: known geometry, sum-prototype == mean direction") {
    import spark.implicits._
    // label A: two vectors along +x (one scaled), one along +y;
    // prototype = (3, 1, 0) direction; cosines are analytic
    val e = Seq(
      (1L, "A", Seq(1f, 0f, 0f)),
      (2L, "A", Seq(2f, 0f, 0f)),
      (3L, "A", Seq(0f, 1f, 0f)),
      (4L, "B", Seq(0f, 0f, 5f))
    ).toDF("vec_id", "label", "embedding")
    val sims = Similarity.prototypeSimilarity(e, col("vec_id"), col("label"),
        col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val exp1 = 3.0 / math.sqrt(10.0) // cos((1,0,0),(3,1,0))
    assert(math.abs(sims(1L) - math.rint(exp1 * 1e6) / 1e6) < 1e-9)
    assert(sims(1L) == sims(2L)) // scale-invariant
    val exp3 = 1.0 / math.sqrt(10.0)
    assert(math.abs(sims(3L) - math.rint(exp3 * 1e6) / 1e6) < 1e-9)
    assert(sims(4L) == 1.0) // singleton label: vector IS the prototype
  }
}
