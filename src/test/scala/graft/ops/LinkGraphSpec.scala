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
}
