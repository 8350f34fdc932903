package graft.extensions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Property test: the SymSpell deletion-neighborhood block in
  * `Dedup.editDistancePairs` is EXACT — randomized corpora over a small
  * alphabet (maximizing collisions and near-misses) must reproduce the
  * brute-force Levenshtein pair set at both supported distances.
  */
class FuzzyPropertySpec extends AnyFunSuite with SparkTestSession {

  private def forAll[T](gen: Gen[T], n: Int = 12)(f: T => Unit): Unit =
    (1 to n).foreach { i =>
      gen.apply(Gen.Parameters.default,
        org.scalacheck.rng.Seed(i.toLong)).foreach(f)
    }

  private val wordGen =
    Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val corpusGen = Gen.chooseNum(2, 18)
    .flatMap(n => Gen.listOfN(n, wordGen))

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j), d(i)(j - 1)) + 1,
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion block equals brute force at d=1 and d=2 (random corpora)") {
    import spark.implicits._
    forAll(corpusGen) { words =>
      val rows = words.zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val df = rows.toDF("id", "nm")
      for (d <- Seq(1, 2)) {
        val got = Dedup.editDistancePairs(df, col("id"), col("nm"),
            maxDist = d, minDist = 1)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toSet
        val kept = rows.filter(_._2.nonEmpty) // empty keys are out of scope
        val want = (for {
          (ia, wa) <- kept; (ib, wb) <- kept
          if ia < ib
          dd = lev(wa, wb)
          if dd >= 1 && dd <= d
        } yield (ia, ib, dd)).toSet
        assert(got == want, s"d=$d corpus=$words")
      }
    }
  }
}
