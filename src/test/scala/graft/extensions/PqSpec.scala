package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Product-quantization semantics on hand-crafted codebooks (the fit itself
  * is invariant-audited by x138; here the codebooks are inputs, so encode
  * and ADC are fully deterministic hand-checkable arithmetic).
  */
class PqSpec extends AnyFunSuite with SparkTestSession {

  // 4-dim space, m=2 subspaces of 2 dims, k=2 codes each
  private val books: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(0.0, 0.0), Seq(10.0, 10.0)),
    Seq(Seq(0.0, 5.0), Seq(5.0, 0.0)))

  private def corpus = {
    import spark.implicits._
    Seq((1L, Seq(1.0, 1.0, 1.0, 4.0)),
        (2L, Seq(9.0, 9.0, 4.0, 1.0)),
        (3L, Seq(6.0, 6.0, 2.5, 2.5)))
      .toDF("vec_id", "embedding")
  }

  test("pqEncode: per-subspace argmin with ties to the lower code") {
    val got = Similarity.pqEncode(corpus, col("vec_id"), col("embedding"), books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    // doc3 subspace 2 is equidistant (12.5) to both codes → code 0
    assert(got == Map(1L -> Seq(0, 0), 2L -> Seq(1, 1), 3L -> Seq(1, 0)))
  }

  test("pqAdcTopK: table-sum estimates, rank order, id tie-break") {
    import spark.implicits._
    val q = Seq((100L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.pqAdcTopK(q, corpus, k = 3, books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).toSet
    // tables for q=0: sub1 → (0, 200); sub2 → (25, 25)
    // doc1 = 0+25, doc2 = 200+25, doc3 = 200+25 → tie breaks by id
    assert(got == Set((100L, 1L, 25.0, 1), (100L, 2L, 225.0, 2),
      (100L, 3L, 225.0, 3)))
  }

  test("pqAdcTopK estimate equals L2^2 to the reconstruction") {
    import spark.implicits._
    val q = Seq((100L, Seq(2.0, -1.0, 3.0, 0.5))).toDF("vec_id", "embedding")
    val est = Similarity.pqAdcTopK(q, corpus, k = 3, books)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val codes = Similarity.pqEncode(corpus, col("vec_id"), col("embedding"),
        books)
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    val qv = Seq(2.0, -1.0, 3.0, 0.5)
    for ((id, cs) <- codes) {
      val recon = cs.zipWithIndex.flatMap { case (c, j) => books(j)(c) }
      val d2 = qv.zip(recon).map { case (x, c) => (x - c) * (x - c) }.sum
      assert(math.abs(est(id) -
        BigDecimal(d2).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        < 1e-9, s"doc $id")
    }
  }

  test("ivfPqTopK: probed-cell pruning, ADC estimates, rank per query") {
    import spark.implicits._
    val cells = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(10.0, 10.0, 10.0, 10.0))
    // corpus cells: doc1 → 0 (19 vs 279), doc2 → 1 (179 vs 119), doc3 → 0
    // (84.5 vs 144.5); query 0-vector probes only cell 0 at nProbe=1
    val q = Seq((100L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    val got = Similarity.ivfPqTopK(q, corpus, k = 10, cells, nProbe = 1, books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3), r.getInt(4))).toSet
    // doc2 is excluded (cell 1 unprobed); ADC estimates as in the ADC test
    assert(got == Set((100L, 1L, 0, 25.0, 1), (100L, 3L, 0, 225.0, 2)))
    // nProbe = all cells → pruning off, doc2 reappears by its ADC estimate
    val all = Similarity.ivfPqTopK(q, corpus, k = 10, cells, nProbe = 2, books)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getInt(4))).toSet
    assert(all == Set((1L, 25.0, 1), (2L, 225.0, 2), (3L, 225.0, 3)))
    intercept[IllegalArgumentException](
      Similarity.ivfPqTopK(q, corpus, 10, cells, nProbe = 3, books))
    intercept[IllegalArgumentException](
      Similarity.ivfPqTopK(q, corpus, 10, Seq.empty, 1, books))
  }

  test("ivfPqRefineTopK: exact re-rank overturns the ADC order; r bounds candidates") {
    import spark.implicits._
    val cells = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(10.0, 10.0, 10.0, 10.0))
    val q = Seq((100L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("vec_id", "embedding")
    // ADC estimates (ADC test): doc1=25, doc2=225, doc3=225 → ADC order 1,2,3
    // exact L2²: doc1=19, doc2=179, doc3=84.5 → exact order 1,3,2:
    // refinement must surface doc3 over doc2, which plain IVF-PQ@2 misses
    val got = Similarity.ivfPqRefineTopK(q, corpus, k = 2, r = 3,
        cells, nProbe = 2, books)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).toSet
    assert(got == Set((100L, 1L, 25.0, 19.0, 1), (100L, 3L, 225.0, 84.5, 2)))
    // r = k: candidates are exactly the ADC top-2 (docs 1,2) — doc3 cannot
    // be recovered, the re-rank only re-scores what the index proposed
    val tight = Similarity.ivfPqRefineTopK(q, corpus, k = 2, r = 2,
        cells, nProbe = 2, books)
      .collect().map(r => (r.getLong(1), r.getDouble(3), r.getInt(4))).toSet
    assert(tight == Set((1L, 19.0, 1), (2L, 179.0, 2)))
    intercept[IllegalArgumentException](
      Similarity.ivfPqRefineTopK(q, corpus, k = 3, r = 2, cells, 1, books))
  }

  test("ivfSq8TopK: exact on grid-aligned vectors; probed-cell pruning; guards") {
    import spark.implicits._
    // vectors whose coordinates sit ON the SQ8 grid (k/255 with mins=0,
    // maxs=255·step) dequantize EXACTLY, so with nProbe = all cells the
    // operator must reproduce bruteForceL2TopK bit-for-bit (self included —
    // the family keeps self-candidates)
    // DOUBLE vectors: k/255.0 is the same double dequantize reconstructs
    // (lo + c/255·(hi−lo) with lo=0, hi=1), so reconstruction is bit-exact
    val rng = new scala.util.Random(23)
    val df = (0L until 80L).map { i =>
      (i, Array.fill(8)(rng.nextInt(256) / 255.0))
    }.toDF("vec_id", "embedding")
    val mins = Array.fill(8)(0.0)
    val maxs = Array.fill(8)(1.0)
    val cells = Similarity.fitCentroids(df, col("embedding"), 4)
    val queries = df.filter(col("vec_id") % 20 === 0)
    val sq8 = Similarity.ivfSq8TopK(queries, df, k = 3, cells, nProbe = 4,
      mins, maxs).select(col("query_id"), col("neighbor_id"),
        col("dist2_est").as("dist2"), col("rank"))
    val brute = Similarity.bruteForceL2TopK(queries, df, k = 3)
    assert(sq8.exceptAll(brute).isEmpty && brute.exceptAll(sq8).isEmpty,
      "grid-aligned SQ8 with probe-all must equal exact brute force")
    // narrow probe: results restricted to the probed cells — every
    // neighbor's own cell must be among the query's nProbe nearest
    val narrow = Similarity.ivfSq8TopK(queries, df, k = 3, cells, nProbe = 1,
      mins, maxs).collect()
    assert(narrow.nonEmpty)
    intercept[IllegalArgumentException] {
      Similarity.ivfSq8TopK(queries, df, k = 0, cells, 1, mins, maxs)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfSq8TopK(queries, df, k = 3, cells, 9, mins, maxs)
    }
    intercept[IllegalArgumentException] {
      Similarity.ivfSq8TopK(queries, df, k = 3, cells, 1, mins,
        Array(1.0))
    }
  }

  test("Quantize.quantize: out-of-range values clamp to [0,255]; dim mismatch raises") {
    import spark.implicits._
    // round-15 advisory: stats fit on a sample can leave corpus values
    // outside [min,max] — codes must clamp to the uint8 contract, and a
    // vector/stats dimension mismatch must raise in-plan rather than
    // zip-pad to NULL codes (which would sort FIRST under an asc rank)
    val mins = Array(0.0, 0.0); val maxs = Array(10.0, 10.0)
    val codes = Quantize.quantize(
        Seq((1L, Seq(-5.0, 20.0))).toDF("id", "v"), col("v"), mins, maxs)
      .select("codes").head.getSeq[Int](0)
    assert(codes == Seq(0, 255), s"expected clamped codes, got $codes")
    val bad = Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("id", "v")
    val ex = intercept[Exception] {
      Quantize.quantize(bad, col("v"), mins, maxs).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(msgs.contains("dimension"), s"unexpected failure: $msgs")
  }

  test("ivfPqResidualTopK: residual codes capture within-cell offsets raw PQ can't") {
    import spark.implicits._
    // two far-apart cells at (0,0,0,0) and (100,100,100,100), each holding
    // vectors at the SAME within-cell offsets; residual codebooks hold
    // exactly those shared offsets, so the residual reconstruction is
    // EXACT and dist2_est equals the true L2² — while raw-vector PQ with
    // these 2-code books must spend its codes on the coarse geometry
    val offs = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 0.0, 0.0, 2.0))
    val base = Seq(Seq(0.0, 0.0, 0.0, 0.0), Seq(100.0, 100.0, 100.0, 100.0))
    val rows = for {
      (b, bi) <- base.zipWithIndex
      (o, oi) <- offs.zipWithIndex
    } yield ((bi * 2 + oi).toLong, b.zip(o).map { case (x, y) => x + y })
    val df = rows.toDF("vec_id", "embedding")
    val cells = base
    // residual books = the exact offset vocabulary per subspace
    val resBooks: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(1.0, 0.0), Seq(0.0, 0.0)),
      Seq(Seq(0.0, 0.0), Seq(0.0, 2.0)))
    val got = Similarity.ivfPqResidualTopK(df, df, k = 2, cells, nProbe = 1,
      resBooks).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Double]("dist2_est"))).toMap
    // query 0 = cell 0 offset (1,0,0,0): rank1 self dist 0 (exact recon),
    // rank2 the other cell-0 member at true L2² = 1+4 = 5
    assert(got((0L, 1)) == (0L, 0.0))
    assert(got((0L, 2)) == (1L, 5.0))
    // probed-cell contract: with nProbe=1, cell-0 queries never see the
    // far cell's members and vice versa
    assert(got.forall { case ((q, _), (n, _)) => (q < 2L) == (n < 2L) })
    val q2 = got.filter { case ((q, _), _) => q == 2L }
    assert(q2((2L, 1)) == (2L, 0.0) && q2((2L, 2)) == (3L, 5.0))
    // cellResiduals: residual of vec 3 is exactly its offset
    val res = Similarity.cellResiduals(df, cells).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](2).toSeq).toMap
    assert(res(3L) == Seq(0.0, 0.0, 0.0, 2.0))
    assert(res(1L) == Seq(0.0, 0.0, 0.0, 2.0))
  }

  test("pqFit: shape contract and guards") {
    val fitted = Similarity.pqFit(corpus, col("embedding"), d = 4, m = 2,
      k = 2, maxTrainRows = 10, maxIter = 4)
    assert(fitted.size == 2 && fitted.forall(b => b.size == 2 &&
      b.forall(_.size == 2)))
    intercept[IllegalArgumentException](
      Similarity.pqFit(corpus, col("embedding"), d = 4, m = 3, k = 2))
    intercept[IllegalArgumentException](
      Similarity.pqFit(corpus, col("embedding"), d = 4, m = 2, k = 1))
    intercept[IllegalArgumentException](
      Similarity.pqAdcTopK(corpus, corpus, k = 0, books))
    intercept[IllegalArgumentException](
      Similarity.pqEncode(corpus, col("vec_id"), col("embedding"), Seq.empty))
  }
}
