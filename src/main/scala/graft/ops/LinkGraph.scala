package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph centrality (PageRank) over an explicit edge relation — the
  * classic crawl-curation signal: a domain/page's stationary visit
  * probability under the random-surfer model, used to prioritize crawl
  * frontiers and to weight web sources by authority before training-mix
  * decisions.
  *
  * Engine-reproducible by the repo's integer idiom (TokenEntropy,
  * vocabDivergence): rank is carried as a BIGINT in `scale` units and every
  * division is integral, so the K-iteration fixpoint is bit-identical in any
  * engine that replays the same operation shape — the x83 oracle re-derives
  * all K iterations in DuckDB and hash-matches every rank.
  *
  * Scale design (the 100 TB story): the canonical distributed PageRank —
  * per iteration one rank⋈degree join, one contribution shuffle keyed by
  * `dst`, one join-back to the node set, all hash-joins hinted (the
  * iterated relations carry no stats, so Spark would silently fall back to
  * sort-merge). Lineage is truncated every round with a lazy
  * `localCheckpoint` (GC-owned blocks, CacheHygieneSpec-clean) — without it
  * the plan doubles per iteration and the optimizer re-plans the whole
  * history each round. Dangling mass stays IN-PLAN as a broadcast 1-row
  * aggregate (no per-iteration driver action); the only driver-side scalar
  * is the node count, read once.
  */
object LinkGraph {

  /** PageRank over `nodes`/`edges`, `iterations` rounds of the power method.
    *
    * Per round, with integral division throughout:
    * {{{
    *   contrib(src->dst) = rank(src) div out_deg(src)
    *   dangling          = sum of rank over nodes with no out-edges
    *   rank'(v) = ((100-dampingPct) * (scale div N)) div 100
    *            + (dampingPct * (in_sum(v) + dangling div N)) div 100
    * }}}
    * Self-loops are dropped and parallel edges collapsed before degree
    * counting. Truncation loses a few micro-units of total mass per round
    * (bounded by N + out-degree sum) — the price of a bit-stable fixpoint.
    *
    * Returns one row per node: `node_id`, `out_deg` (0 for dangling nodes),
    * `rank_micro` (BIGINT, `scale` units).
    */
  def pageRank(nodes: DataFrame, id: Column, edges: DataFrame,
      src: Column, dst: Column, iterations: Int = 5, dampingPct: Int = 85,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1,64], got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    require(scale >= 1000000L, s"scale must be at least 1e6, got $scale")
    // r17: checkpoint the loop-invariant relations (the hits/labelProp/kCore
    // pattern pageRank was missing). Uncheckpointed, `n` re-planned the node
    // scan and `e`/`degById` re-ran the distinct/degree shuffles once or
    // twice PER ITERATION — cross-job exchange reuse does not exist, so each
    // round re-paid the whole derivation as fresh query stages. Values are
    // unchanged (checkpointing truncates lineage, nothing else).
    val n = nodes.select(id.cast("long").as("id"))
      .localCheckpoint(eager = false)    // joined back every round
    // the one driver-side scalar: node count (a single long, any corpus)
    val nCount = n.count()
    require(nCount > 0, "pageRank needs a non-empty node set")
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = false)    // contribution join every round
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("out_deg"))
    // r18 (VERDICT #5): the iterated state CARRIES out_deg instead of
    // re-joining rank⋈degree every round — the loop-invariant (id, out_deg)
    // relation is checkpointed once and is the join-back target, so each
    // round runs TWO hinted hash joins (edge contribution + join-back)
    // instead of three, and the final output join disappears. Arithmetic
    // per round is unchanged (same contributions, same dangling mass, same
    // integral divisions) — only which relation supplies out_deg moves.
    val nDeg = n
      .join(outDeg.withColumnRenamed("src", "id").hint("shuffle_hash"),
        Seq("id"), "left")
      .localCheckpoint(eager = false)    // join-back target every round
    val base = scale / nCount                        // positive: floor == trunc
    val baseTerm = ((100L - dampingPct) * base) / 100L
    var ranks = nDeg.withColumn("rank", lit(base))
    for (_ <- 1 to iterations) {
      // dangling mass: in-plan 1-row aggregate, broadcast below — no action
      val dangling = ranks.filter(col("out_deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("__dang"))
      val inSums = ranks.filter(col("out_deg").isNotNull)
        .join(e.hint("shuffle_hash"), col("id") === col("src"))
        .select(col("dst"), expr("rank div out_deg").as("__contrib"))
        .groupBy("dst").agg(sum(col("__contrib")).as("in_sum"))
      ranks = nDeg
        .join(inSums.withColumnRenamed("dst", "id").hint("shuffle_hash"),
          Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("out_deg"),
          (lit(baseTerm) +
            expr(s"($dampingPct * (coalesce(in_sum, 0L) + (__dang div $nCount))) div 100")
          ).as("rank"))
        .localCheckpoint(eager = false)              // truncate per-round lineage
    }
    ranks
      .select(col("id").as("node_id"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        col("rank").as("rank_micro"))
  }

  /** HITS hubs/authorities over `nodes`/`edges`, `iterations` rounds —
    * PageRank's companion crawl signal: a page can matter as a DIRECTORY
    * (hub: links to many authorities) without being an authority itself,
    * which is exactly the distinction crawl-frontier and source-weighting
    * decisions need (boost authorities into the training mix, use hubs only
    * for discovery).
    *
    * Integer variant of the Kleinberg update, sum-normalized instead of
    * L2-normalized (no sqrt — every step is integral division, so the
    * K-round fixpoint is bit-identical in any engine; the x88 oracle
    * replays it as a DuckDB CTE chain):
    * {{{
    *   a_raw(v) = Σ_{u→v} h(u);  a(v) = a_raw(v) div max(Σ a_raw div scale, 1)
    *   h_raw(u) = Σ_{u→v} a(v);  h(u) = h_raw(u) div max(Σ h_raw div scale, 1)
    * }}}
    * Total mass stays ≈ `scale` each half-round, so with Σh ≤ ~scale the
    * raw sums are bounded by maxDeg·scale — 64-bit-safe for max degree
    * ≤ (2⁶³−1)/scale (~9·10⁶ at the default scale). The degree bound is
    * ENFORCED up front (one aggregate over the collapsed edge relation,
    * read with the node count — the shared overflow contract): a denser
    * graph fails loudly with the offending degree instead of silently
    * wrapping the half-round sums; lower `scale` to widen the envelope.
    *
    * Same scale shape as [[pageRank]]: per half-round one contribution
    * shuffle keyed by the receiving endpoint, hinted hash joins (iterated
    * relations carry no stats), in-plan broadcast 1-row normalizers, lazy
    * `localCheckpoint` lineage truncation per round. Self-loops dropped,
    * parallel edges collapsed. Nodes with no in/out edges hold score 0
    * after round 1.
    *
    * Returns one row per node: `node_id`, `hub_micro`, `auth_micro`.
    */
  def hits(nodes: DataFrame, id: Column, edges: DataFrame,
      src: Column, dst: Column, iterations: Int = 5,
      scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1,64], got $iterations")
    require(scale >= 1000000L, s"scale must be at least 1e6, got $scale")
    val n = nodes.select(id.cast("long").as("id"))
      .localCheckpoint(eager = false)    // joined back twice per round (r17)
    val nCount = n.count()
    require(nCount > 0, "hits needs a non-empty node set")
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(eager = false)  // e is scanned 2× per round
    // enforced overflow envelope: half-round raw sums ≤ maxDeg·scale
    val degBound = Long.MaxValue / scale
    val maxDegRow = e.select(col("src").as("v"))
      .unionAll(e.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
      .agg(coalesce(max(col("d")), lit(0L))).collect()(0)
    require(maxDegRow.getLong(0) <= degBound,
      s"hits: max node degree ${maxDegRow.getLong(0)} exceeds the " +
        s"overflow-safe bound $degBound for scale=$scale — the half-round " +
        "sums would overflow 2^63; lower scale or thin the densest nodes")
    val base = scale / nCount
    // r18 (VERDICT #5): the iterated score relations are kept SPARSE — a
    // node absent from `hubs`/`auths` has score 0, and a zero score
    // contributes 0 to every half-round sum, so dropping the per-half-round
    // join-back to the node set changes no value:
    //   - the norm (sum of __raw) is identical — absent rows summed 0;
    //   - the next half-round's e⋈state join loses only edges whose
    //     endpoint scored 0, whose contribution was 0.
    // After round 1 the supports are stable anyway (every edge endpoint has
    // the relevant degree ≥ 1 by construction), so the joins drop nothing.
    // The node set is joined back ONCE at the end with coalesce-to-0 —
    // two hinted hash joins per round instead of four.
    var hubs = n.withColumn("h", lit(base))      // round 1 reads a dense state
    var auths: DataFrame = n.withColumn("a", lit(base))
    for (_ <- 1 to iterations) {
      val aRaw = e.join(hubs.hint("shuffle_hash"), col("src") === col("id"))
        .groupBy("dst").agg(sum(col("h")).as("__raw"))
        .withColumnRenamed("dst", "id")
      val aNorm = aRaw.agg(
        greatest(expr(s"sum(__raw) div $scale"), lit(1L)).as("__div"))
      auths = aRaw.crossJoin(broadcast(aNorm))
        .select(col("id"), expr("__raw div __div").as("a"))
        .localCheckpoint(eager = false)
      val hRaw = e.join(auths.hint("shuffle_hash"), col("dst") === col("id"))
        .groupBy("src").agg(sum(col("a")).as("__raw"))
        .withColumnRenamed("src", "id")
      val hNorm = hRaw.agg(
        greatest(expr(s"sum(__raw) div $scale"), lit(1L)).as("__div"))
      hubs = hRaw.crossJoin(broadcast(hNorm))
        .select(col("id"), expr("__raw div __div").as("h"))
        .localCheckpoint(eager = false)
    }
    n.join(hubs.hint("shuffle_hash"), Seq("id"), "left")
      .join(auths.hint("shuffle_hash"), Seq("id"), "left")
      .select(col("id").as("node_id"),
        coalesce(col("h"), lit(0L)).as("hub_micro"),
        coalesce(col("a"), lit(0L)).as("auth_micro"))
  }

  /** Co-citation counts — the classic "related pages" signal: two targets
    * are related when many sources link to BOTH (Small 1973). Feed it the
    * transposed edge relation (src↔dst swapped) and it computes
    * bibliographic coupling instead (two SOURCES related by shared
    * targets).
    *
    * Scale design: the pair stage is quadratic in per-source out-degree, so
    * sources above `maxOutDeg` are dropped BEFORE pairing (mega-hubs — a
    * portal page linking 10k targets — contribute deg² pairs and no signal;
    * standard practice in co-citation analysis). With the cap, the
    * self-join keyed on `src` produces ≤ maxOutDeg·|E| rows: one key
    * shuffle, hinted hash join, map-side-combinable count, TakeOrdered
    * top-k (never a single-partition global sort). The (n_common DESC, a,
    * b) order is total, so the k-boundary is deterministic in any engine.
    *
    * Returns top-`topK` rows: `a`, `b` (a < b), `n_common` = number of
    * distinct sources citing both.
    */
  def coCitation(edges: DataFrame, src: Column, dst: Column,
      maxOutDeg: Int = 64, topK: Int = 100): DataFrame = {
    require(maxOutDeg >= 2, s"maxOutDeg must be at least 2, got $maxOutDeg")
    require(topK >= 1, s"topK must be positive, got $topK")
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val kept = e.join(
      e.groupBy("src").agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") <= maxOutDeg)
        .select(col("src")).hint("shuffle_hash"),
      Seq("src"))
      .localCheckpoint(eager = false)                // scanned twice below
    kept.as("l")
      .join(kept.as("r").hint("shuffle_hash"), Seq("src"))
      .filter(col("l.dst") < col("r.dst"))
      .groupBy(col("l.dst").as("a"), col("r.dst").as("b"))
      .agg(count(lit(1)).as("n_common"))
      .orderBy(col("n_common").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Label-propagation community detection (Raghavan et al. 2007), the
    * near-linear community algorithm for web-scale graphs — used in crawl
    * curation to group pages into topical/site communities before
    * per-community quality and mixture decisions. Deterministic synchronous
    * variant: each round every node adopts the label most frequent among
    * its undirected neighbors PLUS one self-vote (the self-vote both damps
    * the 2-cycle oscillation synchronous LPA is prone to and keeps
    * isolated nodes stable), ties broken toward the SMALLEST label — no
    * RNG, so the K-round state is bit-identical in any engine and the
    * oracle replays every round as a CTE chain.
    *
    * Scale design: per round one vote shuffle keyed by node (map-side
    * combinable count), the argmax as a `max(struct(cnt, -label))`
    * aggregate in the SAME shuffle — no window, no second shuffle; label
    * join hinted `shuffle_hash` (iterated relations carry no stats), lazy
    * `localCheckpoint` truncates per-round lineage. The undirected edge
    * relation is built once and checkpointed.
    *
    * Returns one row per node: `node_id`, `community` (the final label —
    * community ids are the minimum member id in converged regions).
    */
  def labelPropagation(nodes: DataFrame, id: Column, edges: DataFrame,
      src: Column, dst: Column, iterations: Int = 4): DataFrame = {
    require(iterations >= 1 && iterations <= 64,
      s"iterations must be in [1,64], got $iterations")
    val n = nodes.select(id.cast("long").as("id"))
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = e.select(col("src").as("v"), col("dst").as("nbr"))
      .union(e.select(col("dst").as("v"), col("src").as("nbr")))
      .distinct()
      .localCheckpoint(eager = false)                // scanned every round
    var labels = n.withColumn("lab", col("id"))
    for (_ <- 1 to iterations) {
      val votes = und
        .join(labels.hint("shuffle_hash"), col("nbr") === col("id"))
        .select(col("v"), col("lab"))
        .union(labels.select(col("id").as("v"), col("lab")))   // self-vote
      // r18 (VERDICT #5, guide §2.4 "share one exchange"): both per-round
      // aggregates are keyed by v — repartitioning the votes by v once lets
      // the (v, lab) count AND the per-v argmax run exchange-free
      // (HashPartitioning(v) satisfies both clusterings), replacing two
      // chained exchanges per round with one. Aggregation values are
      // partitioning-independent (exact counts, total-order argmax).
      labels = votes
        .repartition(col("v"))
        .groupBy(col("v"), col("lab"))
        .agg(count(lit(1)).as("__cnt"))
        .groupBy(col("v"))
        .agg(max(struct(col("__cnt"), (-col("lab")).as("__nl"))).as("__m"))
        .select(col("v").as("id"), (-col("__m.__nl")).as("lab"))
        .localCheckpoint(eager = false)              // truncate per-round lineage
    }
    labels.select(col("id").as("node_id"), col("lab").as("community"))
  }

  /** Per-node triangle counts — the local clustering signal crawl curation
    * uses to separate organic link neighborhoods (high closure) from spam
    * farms and scraped link lists (star-shaped, near-zero closure).
    *
    * Degree-ordered orientation (the classic distributed-triangle bound,
    * Suri & Vassilvitskii 2011): direction is undirected-degree order
    * (ties by id), every edge points from the lower-ordered endpoint to the
    * higher, so each triangle is counted exactly once as a wedge
    * `x→y, x→z` closed by `y→z` — and oriented out-degree is O(√m), which
    * caps the wedge relation at O(m^1.5) instead of Σdeg² (the difference
    * between a mega-hub exploding the join and a bounded one at crawl
    * scale). Joins are hinted `shuffle_hash` (derived relations carry no
    * stats); the oriented edge set is checkpointed once and scanned three
    * times (wedge left, wedge right, closure probe).
    *
    * Returns one row per node appearing in ≥1 triangle: `node_id`,
    * `n_triangles` (each triangle credits all three corners).
    */
  /** Bounded k-core peel — the graph-density ladder's rung between degree
    * (x53-style profiles) and triangles: iteratively delete every node whose
    * undirected degree is < `k`; what survives is the k-core, the classic
    * "dense, mutually-connected neighborhood" signal crawl curation uses to
    * find organic link communities (and spam cliques) that raw degree and
    * local closure both miss.
    *
    * Runs EXACTLY `rounds` peel rounds — no driver-side convergence loop, so
    * the result is a pure function of (edges, k, rounds) that an independent
    * engine replays round for round. A converged graph makes later rounds
    * no-ops (peeling a fixed point removes nothing), so fixed rounds ≡ the
    * true k-core whenever the peel converges inside the budget; the
    * `converged` column reports exactly that (recomputed min degree ≥ k on
    * the surviving graph — FALSE means the budget was too small for this
    * graph and the output is the round-`rounds` peel prefix, a SUPERSET of
    * the true k-core). Adversarial chains need O(n) rounds; real link
    * graphs peel in a handful.
    *
    * Output: one row per surviving node — (node_id, core_degree, converged)
    * with `core_degree` its degree INSIDE the surviving subgraph (≥ k when
    * converged). Self-loops dropped, parallel/reverse duplicates collapsed,
    * the [[triangleCounts]] canonicalization.
    *
    * Scale shape: each round is one map-combined degree aggregate + two
    * hinted shuffle-hash semi-joins of the (shrinking) edge set against the
    * (node-sized) keep set; per-round `localCheckpoint` truncates the
    * lineage (the [[labelPropagation]] pattern). The convergence verdict is
    * one more bounded aggregate, broadcast as a 1-row relation.
    */
  def kCore(edges: DataFrame, src: Column, dst: Column, k: Int,
      rounds: Int = 8): DataFrame = {
    require(k >= 1 && k <= 1000000, s"k must be in [1,1e6], got $k")
    require(rounds >= 1 && rounds <= 64,
      s"rounds must be in [1,64], got $rounds")
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    var und = e.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(eager = false)
    def degrees(g: DataFrame): DataFrame =
      g.select(col("a").as("v")).union(g.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("__deg"))
    for (_ <- 1 to rounds) {
      val keep = degrees(und).filter(col("__deg") >= k).select(col("v"))
      und = und
        .join(keep.select(col("v").as("a")).hint("shuffle_hash"), Seq("a"),
          "left_semi")
        .join(keep.select(col("v").as("b")).hint("shuffle_hash"), Seq("b"),
          "left_semi")
        .localCheckpoint(eager = false)
    }
    val finalDeg = degrees(und).localCheckpoint(eager = false)
    // bounded 1-row verdict: would the NEXT round remove anything?
    val conv = finalDeg
      .agg(coalesce(min(col("__deg")) >= k, lit(true)).as("converged"))
    finalDeg.crossJoin(broadcast(conv))
      .select(col("v").as("node_id"), col("__deg").as("core_degree"),
        col("converged"))
  }

  def triangleCounts(edges: DataFrame, src: Column, dst: Column): DataFrame = {
    val e = edges.select(src.cast("long").as("src"), dst.cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
    // canonical undirected edge set: {a, b} with a < b, parallel + reverse
    // duplicates collapsed
    val und = e.select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint(eager = false)                // scanned for degrees + orientation
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient by (deg, id): x→y iff (deg(x), x) < (deg(y), y)
    val o = und
      .join(deg.select(col("v").as("a"), col("deg").as("__da")).hint("shuffle_hash"), Seq("a"))
      .join(deg.select(col("v").as("b"), col("deg").as("__db")).hint("shuffle_hash"), Seq("b"))
      .select(
        when(struct(col("__da"), col("a")) < struct(col("__db"), col("b")),
          struct(col("a").as("x"), col("b").as("y")))
          .otherwise(struct(col("b").as("x"), col("a").as("y"))).as("__e"))
      .select(col("__e.x").as("x"), col("__e.y").as("y"))
      .localCheckpoint(eager = false)                // scanned three times
    val wedges = o.as("l").join(o.as("r").hint("shuffle_hash"), Seq("x"))
      .filter(col("l.y") < col("r.y"))
      .select(col("x"), col("l.y").as("y"), col("r.y").as("z"))
    // closure: wedge (x,y,z) is a triangle iff oriented edge y→z exists
    // (y < z by construction above; orientation is consistent with < only
    // within equal-degree ties, so probe BOTH oriented directions)
    val closed = wedges.join(
      o.select(col("x").as("y"), col("y").as("z"))
        .union(o.select(col("y").as("y"), col("x").as("z")))
        .hint("shuffle_hash"),
      Seq("y", "z"))
    closed.select(explode(array(col("x"), col("y"), col("z"))).as("node_id"))
      .groupBy("node_id").agg(count(lit(1)).as("n_triangles"))
  }
}
