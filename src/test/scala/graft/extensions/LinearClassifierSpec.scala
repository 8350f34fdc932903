package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** fastText-shape linear classifier: feature hand-traces, learning on a
  * separable corpus (loss decreasing, accuracy 1.0, beats uniform),
  * bit-exact determinism across runs (the decimal-sum contract), the
  * token-less/bias-only stance, and the lexicographic tie contract.
  */
class LinearClassifierSpec extends AnyFunSuite with SparkTestSession {

  import LinearClassifier._

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "apple pie apple", "fruit"), (2L, "apple tart", "fruit"),
      (3L, "banana apple salad", "fruit"), (4L, "green apple", "fruit"),
      (5L, "steel beam girder", "metal"), (6L, "iron steel rod", "metal"),
      (7L, "copper iron wire", "metal"), (8L, "steel wire", "metal"),
      (9L, "violin cello bow", "music"), (10L, "cello sonata", "music"),
      (11L, "violin duet cello", "music"), (12L, "piano violin", "music")
    ).toDF("doc_id", "text", "cat")
  }

  test("hashedNgramFeatures: unigrams+bigrams, L1-normalized, empty-doc drop") {
    import spark.implicits._
    val df = Seq((1L, "x y z"), (2L, ""), (3L, "solo")).toDF("id", "t")
    val f = hashedNgramFeatures(df, col("id"), col("t"), 64).collect()
    // doc 1: grams = x, y, z, "x y", "y z" → 5 distinct grams of count 1,
    // so the L2-normalized weight vector is 1/√5 per bucket and Σw² = 1
    val d1 = f.filter(_.getLong(0) == 1L)
    assert(math.abs(d1.map(r => r.getDouble(2) * r.getDouble(2)).sum - 1.0)
      < 1e-12)
    assert(d1.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 64))
    assert(d1.forall(r =>
      math.abs(r.getDouble(2) - 1.0 / math.sqrt(5)) < 1e-12))
    // empty doc contributes nothing; single-token doc has w=1
    assert(!f.exists(_.getLong(0) == 2L))
    val d3 = f.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3(0).getDouble(2) == 1.0)
  }

  test("separable corpus: loss non-increasing + improving, beats uniform, acc 1.0") {
    val m = linearTrain(corpus, col("doc_id"), col("cat"), col("text"),
      nBuckets = 128, iters = 8, lr = 2.0)
    assert(m.classes === Seq("fruit", "metal", "music"))
    assert(m.lossesMicro.size === 8)
    // bold-driver contract: non-increasing ALWAYS (rejected rounds repeat
    // the held loss), strictly better end-to-end
    m.lossesMicro.sliding(2).foreach { case Seq(a, b) => assert(b <= a,
      s"loss increased: ${m.lossesMicro}") }
    assert(m.lossesMicro.last < m.lossesMicro.head,
      s"no net improvement: ${m.lossesMicro}")
    assert(m.lossesMicro.last < math.round(math.log(3) * 1e6),
      s"final loss ${m.lossesMicro.last} not better than uniform")
    val pred = linearClassify(corpus, col("doc_id"), col("text"), m)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val truth = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(truth.forall { case (id, c) => pred(id) == c },
      s"misclassified: ${truth.filter { case (id, c) => pred(id) != c }}")
  }

  test("training is bit-deterministic across runs") {
    val m1 = linearTrain(corpus, col("doc_id"), col("cat"), col("text"),
      nBuckets = 128, iters = 4, lr = 1.0)
    val m2 = linearTrain(corpus.repartition(7), col("doc_id"), col("cat"),
      col("text"), nBuckets = 128, iters = 4, lr = 1.0)
    assert(m1.lossesMicro === m2.lossesMicro)
    assert(m1.bias.toSeq === m2.bias.toSeq)
    (0 until 3).foreach(ci =>
      assert(m1.weights(ci).toSeq === m2.weights(ci).toSeq, s"class $ci"))
  }

  test("token-less docs score on bias alone; ties break lexicographically") {
    import spark.implicits._
    val m = linearTrain(corpus, col("doc_id"), col("cat"), col("text"),
      nBuckets = 128, iters = 6, lr = 2.0)
    val empty = Seq((100L, "")).toDF("doc_id", "text")
    val r = linearClassify(empty, col("doc_id"), col("text"), m).collect()(0)
    assert(r.getLong(1) === 0L) // n_features
    val expect = m.classes.zipWithIndex
      .map { case (cl, ci) => (-math.round(m.bias(ci) * 1e6), cl) }.min._2
    assert(r.getString(2) === expect)
    // a zero model scores every class 0 → first class alphabetically wins
    val zero = LinearModel(Seq("b", "a", "c").sorted, 16,
      Seq.fill(3)(Array.fill(16)(0.0)), Array.fill(3)(0.0), Seq(0L))
    val rz = linearClassify(Seq((1L, "w")).toDF("doc_id", "text"),
      col("doc_id"), col("text"), zero).collect()(0)
    assert(rz.getString(2) === "a" && rz.getLong(5) === 0L)
  }

  test("tree aggregation matches the pinned path within micro-loss tolerance") {
    // the cluster-scale gradAgg="tree" path (round-14 verdict ask #6):
    // executor-side treeReduce fan-in trades bit-pinning for driver
    // scalability — same algorithm, double sums merged in scheduler order,
    // so per-round micro losses may differ in the last rounding step and
    // predictions on a separable corpus must not move at all
    val pinned = linearTrain(corpus, col("doc_id"), col("cat"), col("text"),
      nBuckets = 128, iters = 8, lr = 2.0)
    val tree = linearTrain(corpus.repartition(7), col("doc_id"), col("cat"),
      col("text"), nBuckets = 128, iters = 8, lr = 2.0, gradAgg = "tree")
    assert(tree.classes === pinned.classes)
    assert(tree.lossesMicro.size === pinned.lossesMicro.size)
    tree.lossesMicro.zip(pinned.lossesMicro).foreach { case (t, p) =>
      assert(math.abs(t - p) <= 1L, s"micro losses diverged: $t vs $p")
    }
    val predT = linearClassify(corpus, col("doc_id"), col("text"), tree)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val predP = linearClassify(corpus, col("doc_id"), col("text"), pinned)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(predT === predP)
    // validation: unknown aggregation path and oversized dense classify
    intercept[IllegalArgumentException] {
      linearTrain(corpus, col("doc_id"), col("cat"), col("text"),
        gradAgg = "magic")
    }
    intercept[IllegalArgumentException] {
      val big = LinearModel(Seq("a", "b"), 1 << 22,
        Seq.fill(2)(Array.empty[Double]), Array.fill(2)(0.0), Seq(0L))
      linearClassify(corpus, col("doc_id"), col("text"), big)
    }
    // round-15 advisory: the C·B <= 2^22 product bound must also fail at
    // TRAIN time — a legally trained model must never be unclassifiable
    // (corpus has 3 classes; 3 × 2^21 > 2^22)
    val trainEx = intercept[IllegalArgumentException] {
      linearTrain(corpus, col("doc_id"), col("cat"), col("text"),
        nBuckets = 1 << 21, iters = 1, lr = 1.0)
    }
    assert(trainEx.getMessage.contains("2^22"))
  }

  test("model relation: weights sparse, losses enumerated, bias per class") {
    val m = linearTrain(corpus, col("doc_id"), col("cat"), col("text"),
      nBuckets = 128, iters = 3, lr = 1.0)
    val rel = modelRelation(spark, m).collect()
    val byKind = rel.groupBy(_.getString(0))
    assert(byKind("loss").map(r => r.getInt(2) -> r.getLong(3)).sortBy(_._1)
      .map(_._2).toSeq === m.lossesMicro)
    assert(byKind("bias").length === 3)
    assert(byKind("weight").forall(r => r.getLong(3) != 0L))
  }
}
