package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Semantic tests for the round-8 curation operators: cluster-aware splits,
  * domain blocklists, embedding standardization, length-bucketed batching,
  * OOV rate. */
class CurationOpsSpec extends AnyFunSuite with SparkTestSession {

  test("clusterAwareSplit: near-dup cluster members land in the SAME split") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // pairs chain docs into 50 clusters of 4: (1,2),(2,3),(3,4), (5,6)...
    val pairs = (1L to 200L).filter(i => i % 4 != 0)
      .map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Sampling.clusterAwareSplit(docs, col("doc_id"), pairs,
        Seq("train" -> 0.5, "val" -> 0.25, "test" -> 0.25), salt = "s1")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("component"),
        r.getAs[String]("split")))
    assert(out.length == 200)
    // every member of a component shares its split
    out.groupBy(_._2).foreach { case (_, members) =>
      assert(members.map(_._3).distinct.length == 1)
    }
    // components are the 4-chains: component = smallest id in the chain
    out.foreach { case (id, comp, _) => assert(comp == ((id - 1) / 4) * 4 + 1) }
    // and all three splits actually occur across the 50 clusters
    assert(out.map(_._3).distinct.sorted.toSeq == Seq("test", "train", "val"))
  }

  test("domainSuffixes and literal blocklist: longest rule wins") {
    import spark.implicits._
    val d = Seq("a.b.example.com", "example.com", "web.com", "org", "")
      .toDF("domain")
    val sfx = d.select(col("domain"),
      TextAnalysis.domainSuffixes(col("domain")).as("s")).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(sfx("a.b.example.com") ==
      Seq("a.b.example.com", "b.example.com", "example.com", "com"))
    assert(sfx("org") == Seq("org"))
    assert(sfx("") == Seq())
    val rules = Seq("example.com", "b.example.com", "com")
    val hit = d.select(col("domain"),
      TextAnalysis.domainBlockedBy(col("domain"), rules).as("by")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    // most specific (longest) rule wins, not the lexicographic max ("com")
    assert(hit("a.b.example.com").contains("b.example.com"))
    assert(hit("example.com").contains("example.com"))
    assert(hit("web.com").contains("com")) // suffix is the whole label "com"
    assert(hit("org").isEmpty)
  }

  test("markBlockedDomains: DataFrame rules agree with the literal expression") {
    import spark.implicits._
    val rules = Seq("example.com", "b.example.com", "com")
    val docs = Seq(
      (1L, "a.b.example.com"), (2L, "example.com"), (3L, "safe.org"),
      (4L, "x.example.com"), (5L, "")
    ).toDF("id", "domain")
    val marked = TextAnalysis.markBlockedDomains(docs, col("id"), col("domain"),
        rules.toDF("rule")).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Boolean]("is_blocked"), Option(r.getAs[String]("blocked_by"))))).toMap
    assert(marked(1L) == ((true, Some("b.example.com"))))
    assert(marked(2L) == ((true, Some("example.com"))))
    assert(marked(3L) == ((false, None)))
    assert(marked(4L) == ((true, Some("example.com"))))
    assert(marked(5L) == ((false, None)))
    // and the literal-expression path gives the same verdicts
    val lit = docs.select(col("id"),
      TextAnalysis.domainBlockedBy(col("domain"), rules).as("by")).collect()
      .map(r => r.getAs[Long]("id") -> Option(r.getString(1))).toMap
    marked.foreach { case (id, (_, by)) => assert(lit(id) == by, s"id=$id") }
  }

  test("standardizeEmbeddings: z-scores match a driver-side computation") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    val rows = (1L to 50L).map(i => (i, Array.fill(4)(rng.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val got = Similarity.standardizeEmbeddings(df, col("vec_id"), col("embedding"))
      .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("dim")) ->
        r.getAs[Double]("z")).toMap
    assert(got.size == 200)
    for (dim <- 0 until 4) {
      val vs = rows.map(_._2(dim).toDouble)
      val n = vs.size.toDouble
      val s = vs.sum // fine at test scale; the engine's decimal sum is exact
      val ss = vs.map(v => v * v).sum
      val denom = math.sqrt(ss * n - s * s)
      rows.foreach { case (id, arr) =>
        val want = (arr(dim).toDouble * n - s) / denom
        val gotZ = got((id, dim + 1L))
        assert(math.abs(gotZ - want) < 1e-6, s"id=$id dim=$dim")
      }
    }
    // constant dimension -> z = 0, not NaN
    val const = (1L to 5L).map(i => (i, Array(1.5f))).toDF("vec_id", "embedding")
    val z0 = Similarity.standardizeEmbeddings(const, col("vec_id"), col("embedding"))
      .collect().map(_.getAs[Double]("z"))
    assert(z0.forall(_ == 0.0))
  }

  test("batching: deterministic assignment, correct padding accounting") {
    import spark.implicits._
    val docs = Seq(
      (1L, 5), (2L, 7), (3L, 9), (4L, 6), (5L, 8), // bucket 0 (width 10)
      (6L, 15), (7L, 12), // bucket 1
      (8L, 25) // bucket 2
    ).toDF("id", "n_tokens")
    val assigned = Batching.assignBatches(docs, col("id"), col("n_tokens"),
        bucketWidth = 10, batchSize = 2).collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("bucket"),
        r.getAs[Long]("batch_seq"), r.getAs[Long]("batch_id")))).toMap
    // bucket 0 in id order: seqs 1..5, batches [1,2][3,4][5]
    assert(assigned(1L) == ((0L, 1L, 0L)) && assigned(2L) == ((0L, 2L, 0L)))
    assert(assigned(3L) == ((0L, 3L, 1L)) && assigned(4L) == ((0L, 4L, 1L)))
    assert(assigned(5L) == ((0L, 5L, 2L)))
    assert(assigned(6L) == ((1L, 1L, 0L)) && assigned(7L) == ((1L, 2L, 0L)))
    assert(assigned(8L) == ((2L, 1L, 0L)))
    val stats = Batching.batchStats(docs, col("id"), col("n_tokens"),
        bucketWidth = 10, batchSize = 2).collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("batch_id")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("max_tokens"),
          r.getAs[Long]("sum_tokens"), r.getAs[Double]("padding_frac")))).toMap
    // batch (0,0): docs 5,7 -> max 7, sum 12, padding 1 - 12/14
    assert(stats((0L, 0L)) == ((2L, 7L, 12L, math.rint((1 - 12.0 / 14) * 1e6) / 1e6)))
    assert(stats((0L, 2L)) == ((1L, 8L, 8L, 0.0))) // singleton: no padding
    assert(stats((2L, 0L)) == ((1L, 25L, 25L, 0.0)))
  }

  test("oovRate: top-K boundary deterministic, rates exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aa aa aa bb bb cc"), // aa:3 bb:2 cc:1
      (2L, "aa bb dd"), // dd:1 — tie with cc broken by token string: cc < dd
      (3L, "")
    ).toDF("id", "text")
    // vocab top-3 by (count desc, token asc) = aa, bb, cc
    val out = TextAnalysis.oovRate(docs, col("id"), col("text"), topK = 3)
      .collect().map(r => r.getAs[Long]("id") -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate")))).toMap
    assert(out(1L) == ((6L, 0L, 0.0)))
    assert(out(2L) == ((3L, 1L, math.rint(1.0 / 3 * 1e6) / 1e6)))
    assert(!out.contains(3L)) // token-less docs are not rated
  }
}
