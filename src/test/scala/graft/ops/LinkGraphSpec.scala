package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class LinkGraphSpec extends AnyFunSuite with SparkTestSession {

  private val Scale = 1000000000000L

  /** Exact single-threaded replay of the integer PageRank recurrence. */
  private def replay(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int,
      dampingPct: Long = 85L): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val outDeg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    val base = Scale / n
    val baseTerm = ((100L - dampingPct) * base) / 100L
    var rank = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(outDeg.contains).map(rank).sum
      val inSum = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / outDeg(s) }.sum
      }
      rank = nodes.map(v => v ->
        (baseTerm + (dampingPct * (inSum.getOrElse(v, 0L) + dang / n)) / 100L))
        .toMap
    }
    rank
  }

  private def run(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    import spark.implicits._
    LinkGraph.pageRank(nodes.toDF("id"), col("id"),
        edges.toDF("s", "d"), col("s"), col("d"), iterations = iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("matches the exact integer replay on a graph with dangling + hub nodes") {
    val nodes = 0L to 9L
    val edges = Seq(0L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 0L, 3L -> 2L,
      4L -> 2L, 5L -> 2L, 6L -> 7L, 7L -> 6L,
      8L -> 8L, /* self loop: dropped, 8 becomes dangling */
      0L -> 1L) /* parallel duplicate: collapsed */
    val out = run(nodes, edges, iters = 4)
    val exp = replay(nodes, edges, 4)
    assert(out.keySet == nodes.toSet)
    for (v <- nodes) assert(out(v)._2 == exp(v), s"rank mismatch at node $v")
    assert(out(8L)._1 == 0L && out(9L)._1 == 0L) // self-loop dropped → dangling
    assert(out(0L)._1 == 2L)                     // parallel edge collapsed
    // the hub (2) outranks every pure source; sources 3,4,5 tie by symmetry
    assert(out(2L)._2 == out.values.map(_._2).max)
    assert(out(3L)._2 == out(4L)._2 && out(4L)._2 == out(5L)._2)
  }

  test("rank mass is conserved up to integer truncation") {
    val nodes = 0L until 50L
    val edges = nodes.flatMap(v => Seq(v -> ((v * 7 + 3) % 50), v -> ((v * 11 + 5) % 50)))
    val out = run(nodes, edges, iters = 5)
    val total = out.values.map(_._2).sum
    // exact arithmetic conserves Scale; each of the 5 rounds floors away at
    // most ~1 unit per node/edge/percent-div — microscopic against 1e12
    assert(total <= Scale)
    assert(total > Scale - 1000000L, s"lost too much mass: $total")
  }

  test("a pure cycle is a fixpoint: every node keeps the uniform rank") {
    val nodes = 0L until 8L
    val edges = nodes.map(v => v -> ((v + 1) % 8))
    val out = run(nodes, edges, iters = 3)
    val exp = replay(nodes, edges, 3)
    assert(out.values.map(_._2).toSet.size == 1)
    assert(out(0L)._2 == exp(0L))
  }

  /** Exact single-threaded replay of the sum-normalized integer HITS. */
  private def replayHits(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, (Long, Long)] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val base = Scale / nodes.size
    var h = nodes.map(_ -> base).toMap
    var a = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val araw = nodes.map(v => v -> e.filter(_._2 == v).map(x => h(x._1)).sum).toMap
      val adiv = math.max(araw.values.sum / Scale, 1L)
      a = araw.map { case (k, v) => k -> v / adiv }
      val hraw = nodes.map(v => v -> e.filter(_._1 == v).map(x => a(x._2)).sum).toMap
      val hdiv = math.max(hraw.values.sum / Scale, 1L)
      h = hraw.map { case (k, v) => k -> v / hdiv }
    }
    nodes.map(v => v -> ((h(v), a(v)))).toMap
  }

  private def runHits(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, (Long, Long)] = {
    import spark.implicits._
    LinkGraph.hits(nodes.toDF("id"), col("id"),
        edges.toDF("s", "d"), col("s"), col("d"), iterations = iters)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
  }

  test("hits matches the exact integer replay, including isolated nodes") {
    val nodes = 0L to 9L
    // 0 is a pure hub over 1..5; 6..8 also endorse 1; 9 is isolated
    val edges = (1L to 5L).map(0L -> _) ++ Seq(6L -> 1L, 7L -> 1L, 8L -> 1L,
      2L -> 2L /* self loop */, 0L -> 1L /* parallel dup */)
    val out = runHits(nodes, edges, iters = 3)
    val exp = replayHits(nodes, edges, 3)
    for (v <- nodes) assert(out(v) == exp(v), s"node $v")
    assert(out(9L) == ((0L, 0L)), "isolated node must hold zero mass")
    // 0 links to all the authorities → top hub; 1 is endorsed by the top hub
    // and three others → top authority
    assert(out(0L)._1 == out.values.map(_._1).max)
    assert(out(1L)._2 == out.values.map(_._2).max)
    // pure hubs are not authorities and vice versa
    assert(out(0L)._2 == 0L && out(6L)._1 > 0L && out(6L)._2 == 0L)
  }

  test("hits on a symmetric cycle keeps hubs equal to authorities") {
    val nodes = 0L until 6L
    val edges = nodes.map(v => v -> ((v + 1) % 6))
    val out = runHits(nodes, edges, iters = 4)
    val exp = replayHits(nodes, edges, 4)
    for (v <- nodes) assert(out(v) == exp(v), s"node $v")
    assert(out.values.toSet.size == 1, "cycle symmetry")
    assert(out(0L)._1 == out(0L)._2)
  }

  test("coCitation counts shared citers, drops mega-hubs, keeps a total order") {
    import spark.implicits._
    // sources 0,1,2 each cite {10,11}; 3 cites {11,12}; 4 is a mega-hub
    // citing 10..15 (deg 6 > cap 5 → dropped entirely)
    val edges = Seq(0L -> 10L, 0L -> 11L, 1L -> 10L, 1L -> 11L, 2L -> 10L,
      2L -> 11L, 3L -> 11L, 3L -> 12L, 5L -> 5L /* self loop */,
      0L -> 10L /* parallel dup */) ++ (10L to 15L).map(4L -> _)
    val out = LinkGraph.coCitation(edges.toDF("s", "d"), col("s"), col("d"),
        maxOutDeg = 5, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.head == ((10L, 11L, 3L)), "top pair: three shared citers")
    assert(out.toSet == Set((10L, 11L, 3L), (11L, 12L, 1L)),
      "mega-hub 4's deg² pairs must not appear")
    // a < b and sorted by (n_common desc, a, b)
    assert(out.forall { case (a, b, _) => a < b })
    assert(out.map(t => (-t._3, t._1, t._2)).sorted.toSeq ==
      out.map(t => (-t._3, t._1, t._2)).toSeq)
  }

  test("coCitation transposed computes bibliographic coupling") {
    import spark.implicits._
    // 0 and 1 both cite {10, 11} → coupled with strength 2
    val edges = Seq(0L -> 10L, 0L -> 11L, 1L -> 10L, 1L -> 11L, 2L -> 10L)
    val out = LinkGraph.coCitation(edges.toDF("s", "d"), col("d"), col("s"),
        maxOutDeg = 64, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0L, 1L, 2L), (0L, 2L, 1L), (1L, 2L, 1L)))
  }

  /** Exact replay of the deterministic LPA recurrence (self-vote, min-label
    * tie-break). */
  private def replayLpa(nodes: Seq[Long], edges: Seq[(Long, Long)],
      iters: Int): Map[Long, Long] = {
    val und = edges.filter(p => p._1 != p._2)
      .flatMap(p => Seq(p, p.swap)).distinct
    var lab = nodes.map(v => v -> v).toMap
    for (_ <- 1 to iters) {
      lab = nodes.map { v =>
        val votes = (und.collect { case (a, b) if a == v => lab(b) } :+ lab(v))
        val counts = votes.groupBy(identity).view.mapValues(_.size).toMap
        v -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    lab
  }

  private def runLpa(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    import spark.implicits._
    LinkGraph.labelPropagation(nodes.toDF("id"), col("id"),
        edges.toDF("s", "d"), col("s"), col("d"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("hits enforces the maxDeg*scale overflow envelope up front") {
    import spark.implicits._
    // scale floor is 1e6 -> degree bound ~9.2e12; an enormous synthetic
    // bound cannot be exceeded with real rows, so probe the guard with the
    // LARGEST permitted scale instead: degree bound (2^63-1)/scale
    val nodes = (0L to 20L).toDF("id")
    val edges = (1L to 20L).map(0L -> _).toDF("s", "d")
    // scale so large that bound = 9.2e18/9.2e17 = 10 < degree 20
    val ex = intercept[IllegalArgumentException] {
      LinkGraph.hits(nodes, col("id"), edges, col("s"), col("d"),
        iterations = 1, scale = 922337203685477580L)
    }
    assert(ex.getMessage.contains("overflow-safe bound"))
    // default scale: same graph is comfortably in envelope
    assert(LinkGraph.hits(nodes, col("id"), edges, col("s"), col("d"),
      iterations = 1).count() == 21L)
  }

  test("labelPropagation matches the exact replay and finds disjoint blocks") {
    // two 4-cliques bridged by nothing, plus an isolated node
    val nodes = 0L to 8L
    val clique = (g: Long) => for {
      a <- 0L to 3L; b <- 0L to 3L if a < b
    } yield (g * 4 + a) -> (g * 4 + b)
    val edges = clique(0) ++ clique(1)
    val out = runLpa(nodes, edges, iters = 3)
    assert(out == replayLpa(nodes, edges, 3))
    assert((0L to 3L).map(out).toSet == Set(0L), "first clique → min label 0")
    assert((4L to 7L).map(out).toSet == Set(4L), "second clique → min label 4")
    assert(out(8L) == 8L, "isolated node keeps its own label")
  }

  test("labelPropagation self-vote keeps the 2-node graph stable") {
    // without the self-vote, synchronous LPA on a single edge oscillates
    // (each adopts the other's label forever); with it, counts tie at 1:1
    // every round and the min label wins on BOTH sides → converged
    val nodes = Seq(5L, 9L)
    val edges = Seq(5L -> 9L)
    for (k <- 1 to 4) {
      val out = runLpa(nodes, edges, iters = k)
      assert(out == replayLpa(nodes, edges, k), s"iters=$k")
      assert(out(5L) == 5L && out(9L) == 5L, s"iters=$k must already agree")
    }
  }

  private def runKCore(edges: Seq[(Long, Long)], k: Int, rounds: Int)
      : (Map[Long, Long], Boolean) = {
    import spark.implicits._
    val out = graft.ops.LinkGraph.kCore(edges.toDF("src", "dst"),
        col("src"), col("dst"), k, rounds)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    (out.map(t => t._1 -> t._2).toMap, out.headOption.forall(_._3))
  }

  test("kCore: pendant chain peels off, the clique survives as the 3-core") {
    // 4-clique {1,2,3,4} + chain 1–5–6; k=3 removes 5 and 6 in one round
    val clique = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val (core, conv) = runKCore(clique ++ Seq(1L -> 5L, 5L -> 6L), 3, 8)
    assert(conv)
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: cascade needs rounds; a short budget reports converged=false") {
    // triangle 1-2-3 + chain 3–4–5: k=2 peels 5 (round 1) THEN 4 (round 2)
    val edges = Seq(1L -> 2L, 2L -> 3L, 3L -> 1L, 3L -> 4L, 4L -> 5L)
    val (full, conv) = runKCore(edges, 2, 8)
    assert(conv && full == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    val (prefix, conv1) = runKCore(edges, 2, 1)
    assert(!conv1, "node 4 still has degree 1 after one round")
    assert(prefix.keySet == Set(1L, 2L, 3L, 4L), "peel prefix is a superset")
  }

  test("kCore: self-loops and duplicates are canonicalized; guards hold") {
    // parallel + reverse edges collapse to one; self-loop contributes nothing
    val edges = Seq(1L -> 2L, 2L -> 1L, 1L -> 2L, 1L -> 1L, 2L -> 3L, 3L -> 1L)
    val (core, conv) = runKCore(edges, 2, 4)
    assert(conv && core == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    import spark.implicits._
    intercept[IllegalArgumentException](graft.ops.LinkGraph.kCore(
      edges.toDF("src", "dst"), col("src"), col("dst"), 0, 4))
    intercept[IllegalArgumentException](graft.ops.LinkGraph.kCore(
      edges.toDF("src", "dst"), col("src"), col("dst"), 2, 0))
  }
}
