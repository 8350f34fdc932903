package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class EnsembleSpec extends AnyFunSuite with SparkTestSession {

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("rankEnsemble: global percent ranks per signal, mean blend") {
    import spark.implicits._
    // signal a ranks docs 1<2<3<4; signal b ranks them 4<3<2<1
    val df = Seq((1L, 10.0, 40.0), (2L, 20.0, 30.0), (3L, 30.0, 20.0),
      (4L, 40.0, 10.0)).toDF("doc_id", "a", "b")
    val out = Ensemble.rankEnsemble(df, col("doc_id"),
        Seq("a" -> col("a"), "b" -> col("b")))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(r.fieldIndex("pct_a")), r.getDouble(r.fieldIndex("pct_b")),
          r.getDouble(r.fieldIndex("ensemble")))).toMap
    assert(out(1L) == ((0.0, 1.0, 0.5)))
    assert(out(4L) == ((1.0, 0.0, 0.5)))
    assert(out(2L)._1 == round6(1.0 / 3) && out(2L)._2 == round6(2.0 / 3))
    // anti-correlated signals blend every row to the same middle rank
    assert(out.values.forall(_._3 == 0.5))
  }

  test("rankEnsemble: ties break by id; single row ranks 0") {
    import spark.implicits._
    val df = Seq((5L, 1.0), (6L, 1.0), (7L, 1.0)).toDF("doc_id", "s")
    val out = Ensemble.rankEnsemble(df, col("doc_id"), Seq("s" -> col("s")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out == Map(5L -> 0.0, 6L -> 0.5, 7L -> 1.0))
    val one = Ensemble.rankEnsemble(Seq((1L, 9.9)).toDF("doc_id", "s"),
      col("doc_id"), Seq("s" -> col("s"))).collect()
    assert(one.head.getDouble(1) == 0.0)
  }

  test("result is independent of input partitioning") {
    import spark.implicits._
    val base = (1 to 1000).map(i => (i.toLong, (i * 37 % 101).toDouble,
      (i * 13 % 89).toDouble))
    val a = Ensemble.rankEnsemble(base.toDF("doc_id", "x", "y"),
      col("doc_id"), Seq("x" -> col("x"), "y" -> col("y")))
    val b = Ensemble.rankEnsemble(
      scala.util.Random.shuffle(base).toDF("doc_id", "x", "y").repartition(17),
      col("doc_id"), Seq("x" -> col("x"), "y" -> col("y")))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("vocabDivergence: uniform source has zero KL, skewed source positive") {
    import spark.implicits._
    // corpus: s1 matches the corpus mix exactly when s2 mirrors it; a
    // skewed s3 diverges. Hand-check: with s1 = s2 = "a b", corpus is
    // {a:3,b:2,c:1} once s3 = "a c" joins — so no source is exactly the
    // corpus mix and every KL is > 0 except... compute the simple case:
    val df = Seq(("s1", "a b"), ("s2", "a b"), ("s3", "a c"))
      .toDF("source", "text")
    val out = LanguageModel.vocabDivergence(df, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("s1") == out("s2"))
    assert(out("s1")._1 == 2 && out("s1")._2 == 2)
    // exact micro-nat replica: p=1/2 for each of a,b; q_a=3/6, q_b=2/6
    def micros(p: Double, q: Double): Long =
      BigDecimal(p * math.log(p / q) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(out("s1")._3 == micros(0.5, 0.5) + micros(0.5, 2.0 / 6))
    assert(out("s3")._3 == micros(0.5, 0.5) + micros(0.5, 1.0 / 6))
    assert(out("s3")._3 > out("s1")._3, "skewed source must diverge more")
  }
}
