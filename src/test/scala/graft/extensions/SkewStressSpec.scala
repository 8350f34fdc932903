package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Planted-skew stress for the three hottest blocked-pair joins (the
  * round-9 verdict's residual 100-TB risk: plan shapes are audited, but a
  * HOT BLOCKING KEY — one domain/LSH bucket/deletion-variant holding a
  * large corpus share — concentrates a quadratic pair stage into one
  * task). Each test plants one key with ~30% of all rows and pins the
  * EXACT closed-form pair count, so the blocked join's correctness under
  * skew is the assertion, not just survival:
  *
  *   - [[Similarity.nearDupPairs]]: skew is handled by AQE's skew-join
  *     split (the idiomatic Spark answer for an equi-self-join — a hot
  *     key's partition is chunked and chunks are cross-read, distributing
  *     the B² work). The test forces the shuffle path (no broadcast) with
  *     test-scaled skew thresholds and asserts the runtime plan actually
  *     took the skew split, plus the exact pair count either way.
  *   - [[Dedup.minhashPairs]]: skew is handled STRUCTURALLY by the
  *     `maxBucketSize` guard (a degenerate everything-matches band bucket
  *     carries no signal and is dropped); the test pins both sides of the
  *     guard boundary.
  *   - [[Dedup.editDistancePairs]]: a hot deletion-variant block is
  *     OUTPUT-SIZED by construction (members of one variant block are all
  *     within the distance band, so B² candidates ARE the result); the
  *     test pins the exact dist-1/dist-2 split of a 676-name planted
  *     cluster.
  *
  * The committed SKEWPROBE_r10.json (Test/runMain graft.SkewProbe) carries
  * the task-time histograms at 10× this scale.
  */
class SkewStressSpec extends AnyFunSuite with SparkTestSession {

  private def withConfs(kv: (String, String)*)(body: => Unit): Unit = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("nearDupPairs: hot block (30% of rows) splits under AQE, exact count") {
    import spark.implicits._
    val dim = 16
    val n = 4000
    val hot = 1200 // 30% of the corpus behind ONE blocking key
    val rows = (1 to n).map { i =>
      val block = if (i <= hot) "hot" else s"b${i % 200}"
      (i.toLong, block, Seq.tabulate(dim)(d => ((i * 31 + d * 7) % 101) / 101.0))
    }
    val df = rows.toDF("vec_id", "block", "embedding")
    val smallBlocks = (1 to n).filter(_ > hot).groupBy(_ % 200).map(_._2.size)
    val expected = hot.toLong * (hot - 1) / 2 +
      smallBlocks.map(s => s.toLong * (s - 1) / 2).sum
    // The skew-split ENABLEMENT comes from the engine defaults
    // (graft.Sessions, baked into the shared test session) — this test only
    // scales the SIZE thresholds down to test-data scale. If the defaults
    // ever regress (the round-10 gap: the probe-verified flags lived in a
    // spec, not the shipped sessions), the plan assertion below fails.
    val defaults = graft.Sessions.runtimeDefaults.toMap
    assert(defaults.get("spark.sql.adaptive.skewJoin.enabled").contains("true"))
    assert(defaults.get("spark.sql.adaptive.forceOptimizeSkewedJoin").contains("true"))
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true",
      "test session does not carry the engine skew defaults")
    // threshold -2 keeps every in-block pair: the count is the closed form
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16k") {
      // count through the Dataset's own QueryExecution so the FINAL
      // adaptive plan (isFinalPlan=true, with any skew-split reads) is
      // inspectable afterwards — .count() would plan a separate query
      val counted = Similarity.nearDupPairs(df, col("block"), threshold = -2.0)
        .agg(count(lit(1)).as("n"))
      assert(counted.collect()(0).getLong(0) == expected)
      val finalPlan = counted.queryExecution.executedPlan.toString
      assert(finalPlan.toLowerCase.contains("skew"),
        s"AQE did not take the skew-join split on the hot block:\n$finalPlan")
    }
    // and the guard-free default path (broadcast allowed) agrees
    assert(Similarity.nearDupPairs(df, col("block"), -2.0).count() == expected)
  }

  test("minhashPairs: degenerate 30% bucket is kept under, dropped over the guard") {
    import spark.implicits._
    val nHot = 300
    val hotText = "the quick brown fox jumps over the lazy dog again and " +
      "again while the pipeline watches every shingle of it repeat"
    val rows = (1 to 1000).map { i =>
      val text =
        if (i <= nHot) hotText
        else s"unique document $i talks about topic${i * 7} and " +
          s"entity${i * 13} near landmark${i * 29} item${i * 37} " +
          s"with detail${i * 41} plus extra${i * 43} note${i * 47}"
      (i.toLong, text)
    }
    val df = rows.toDF("doc_id", "text")
    def hotPairs(maxBucket: Int): Long =
      Dedup.minhashPairs(df, col("doc_id"), col("text"),
          maxBucketSize = maxBucket)
        .filter(col("id_a") <= nHot && col("id_b") <= nHot).count()
    // identical docs share every band bucket: below the guard all C(300,2)
    // pairs surface (est_jaccard 1.0)…
    assert(hotPairs(1000) == nHot.toLong * (nHot - 1) / 2)
    // …above it the degenerate bucket is dropped in EVERY band — the
    // quadratic stage never runs and no hot pair is emitted
    assert(hotPairs(100) == 0L)
  }

  test("editDistancePairs: 676-name hot deletion-variant block is output-sized") {
    import spark.implicits._
    // 676 names "skewbase"+XY (every 2-letter suffix): ALL share the
    // 2-deletion variant "skewbase", one block with ~33% of distinct keys.
    // Every in-cluster pair is a true result: lev = # differing suffix
    // positions (same length, same prefix) — the block is the output.
    val hotNames = for (a <- 'a' to 'z'; b <- 'a' to 'z')
      yield s"skewbase$a$b"
    val others = (1 to 1400).map(i => f"zz${i * 2654435761L}%014x")
    val all = (hotNames ++ others).zipWithIndex.map { case (nm, i) =>
      (i.toLong + 1, nm)
    }
    val out = Dedup.editDistancePairs(all.toDF("id", "nm"), col("id"),
        col("nm"), maxDist = 2, minDist = 1)
      .filter(col("id_a") <= 676 && col("id_b") <= 676)
      .groupBy("dist").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // dist 1: suffixes agreeing in one position = 2 * 26 * C(26,2)
    assert(out(1) == 2L * 26 * (26 * 25 / 2))
    // dist 2: the rest of C(676,2) — two length-preserving substitutions
    assert(out(2) == 676L * 675 / 2 - 2L * 26 * (26 * 25 / 2))
  }
}
