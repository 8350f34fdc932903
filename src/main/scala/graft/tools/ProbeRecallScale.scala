package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Sessions
import graft.extensions.Similarity

/** Dev probe (round-15, verdict ask #4 follow-through): the honest scaled
  * corpus (gen_scaled_sf.py now draws fresh per-label Gaussian vectors
  * instead of noisy copies) reads PQ-family recall@5 at sf1 FAR below the
  * gate-scale floors (pq_adc 0.228 vs floor 0.25, ivfpq 0.236 vs 0.30,
  * refine 0.286 vs 0.45) — the noisy-copy scheme had planted an easy
  * near-duplicate neighbor per query and inflated those readings to
  * 0.69–0.98. The expected cause is codebook RESOLUTION: at 20k vectors the
  * 5th-vs-50th true-neighbor distance gap shrinks below the m=8/k=16
  * quantization error, the classic density regime where production PQ runs
  * k=256 codes (the FAISS default) and a bigger refine candidate set.
  *
  * This probe measures that hypothesis before any param decision (the pqM
  * 4→8 measure-before-adopt stance): recall@5 against exact L2 truth at a
  * grid of codebook sizes (k ∈ 16/64/256 — 16 is the shipped gate config,
  * bounded by the sf0.001 corpus where k must not exceed ~20 rows), refine
  * candidate budgets (r ∈ 20/50), and IVF probe widths (4/6 of 16 cells,
  * cosine side). Truth, query sample, and all non-swept params are exactly
  * x157's.
  *
  * Output: one bare JSON line
  * `{"boot":…,"sf":…,"n_queries":…,"recall_micro":{arm:value,…}}` —
  * aggregate boots into PROBE_recall_scale_r15.json (dev artifact).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sfgen/sf1 SPARK_GRAFT_CPUS=32 \
  *        sbt -batch "runMain graft.tools.ProbeRecallScale <bootLabel>"
  */
object ProbeRecallScale {

  def main(args: Array[String]): Unit = {
    val boot = args.headOption.getOrElse("b0")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfgen/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nVecs = e.count()
    val step = math.max(50L, nVecs / 100L)
    val queries = e.filter(col("vec_id") % step === 0)
    val k = 5
    val truthL2 = Similarity.bruteForceL2TopK(queries, e, k).localCheckpoint()
    val truthCos = Similarity.bruteForceTopK(queries, e, 50)
      .filter(col("rank") <= k).localCheckpoint()

    val results = scala.collection.mutable.LinkedHashMap[String, Long]()
    val secs = scala.collection.mutable.LinkedHashMap[String, Double]()
    // time = end-to-end estimator materialization (localCheckpoint forces
    // it), so per-arm cost includes its candidate-generation fan-out
    def arm(name: String, est: => DataFrame, truth: DataFrame): Unit = {
      val t0 = System.nanoTime()
      val mat = est.localCheckpoint()
      secs(name) = math.round((System.nanoTime() - t0) / 1e6) / 1e3
      results(name) = Similarity.recallAtK(mat, truth, k)
        .agg((round(sum(col("hits")) * 1000000L / sum(col("n_truth"))))
          .cast("long"))
        .collect()(0).getLong(0)
    }

    val cells = Similarity.fitCentroids(e, col("embedding"), 8)
    // k-list env-tunable: k=256 was measured OUT at sf1 (~40x cost, r15) —
    // big-scale boots can skip re-paying it without losing the shipped-k
    // coverage (SPARK_GRAFT_PROBE_KLIST=16)
    val kList = sys.env.getOrElse("SPARK_GRAFT_PROBE_KLIST", "16,64,256")
      .split(",").map(_.trim.toInt).toSeq
    kList.foreach { codes =>
      val books = Similarity.pqFit(e, col("embedding"), d = 64, m = 8,
        k = codes)
      arm(s"pq_adc_k$codes", Similarity.pqAdcTopK(queries, e, k, books),
        truthL2)
      arm(s"ivfpq_k$codes",
        Similarity.ivfPqTopK(queries, e, k, cells, nProbe = 3, books),
        truthL2)
      Seq(20, 50).foreach { r =>
        arm(s"refine_r${r}_k$codes",
          Similarity.ivfPqRefineTopK(queries, e, k, r, cells, nProbe = 3,
            books), truthL2)
      }
    }
    Seq(4, 6).foreach { p =>
      arm(s"ivf_c16_p$p",
        Similarity.ivfTopK(queries, e, k, nCentroids = 16, nProbe = p),
        truthCos)
    }
    // m sweep at the shipped k=16 (round-15 verdict ask #1): k=256 was
    // measured out because the per-row argmin is LINEAR in k, but m's cost
    // is linear too (2x subspaces = 2x table lookups) while HALVING the
    // per-subspace quantization error — the unmeasured axis for the
    // at-scale PQ recall saturation. d=64, m=16 -> 4-dim subspaces.
    locally {
      val books16 = Similarity.pqFit(e, col("embedding"), d = 64, m = 16,
        k = 16)
      arm("pq_adc_m16_k16", Similarity.pqAdcTopK(queries, e, k, books16),
        truthL2)
      arm("ivfpq_m16_k16",
        Similarity.ivfPqTopK(queries, e, k, cells, nProbe = 3, books16),
        truthL2)
      arm("refine_r50_m16_k16",
        Similarity.ivfPqRefineTopK(queries, e, k, r = 50, cells, nProbe = 3,
          books16), truthL2)
      val res = Similarity.cellResiduals(e, cells)
      val rBooks16 = Similarity.pqFit(res, col("residual"), d = 64, m = 16,
        k = 16)
      arm("ivfpq_res_m16_k16",
        Similarity.ivfPqResidualTopK(queries, e, k, cells, nProbe = 3,
          rBooks16), truthL2)
    }
    // residual IVF-PQ arm (round-15 ivfPqResidualTopK): codebooks fit on
    // the cell residuals, same cells/probe/m/k as the raw ivfpq_k16 arm so
    // the encodings compare directly
    locally {
      val res = Similarity.cellResiduals(e, cells)
      val rBooks = Similarity.pqFit(res, col("residual"), d = 64, m = 8,
        k = 16)
      arm("ivfpq_res_k16",
        Similarity.ivfPqResidualTopK(queries, e, k, cells, nProbe = 3,
          rBooks), truthL2)
    }
    // SQ8 arm (added with the round-15 ivfSq8TopK operator): same cells and
    // probe width as the shipped x168 config
    locally {
      val (mins, maxs) = graft.extensions.Quantize.dimStats(e,
        col("embedding"))
      arm("ivfsq8_c8_p3",
        Similarity.ivfSq8TopK(queries, e, k, cells, nProbe = 3, mins, maxs),
        truthL2)
    }
    // the multi-probe LSH radius sweep (round-14 verdict ask #5): single
    // table, one flip, two flips — all cosine-side, shipped nBits=8
    arm("lsh_h0", Similarity.annTopK(queries, e, k, nBits = 8), truthCos)
    arm("lsh_h1", Similarity.annTopKMultiProbe(queries, e, k, nBits = 8),
      truthCos)
    arm("lsh_h2", Similarity.annTopKMultiProbe(queries, e, k, nBits = 8,
      maxHamming = 2), truthCos)
    val nQ = truthL2.select("query_id").distinct().count()
    val body = results.map { case (a, v) => s""""$a":$v""" }.mkString(",")
    val tbody = secs.map { case (a, v) => s""""$a":$v""" }.mkString(",")
    // bare println: the probe contract is one JSON line on stdout
    println(s"""{"boot":"$boot","sf":"$sfDir","n_queries":$nQ,""" +
      s""""recall_micro":{$body},"est_sec":{$tbody}}""")
    spark.stop()
  }
}
