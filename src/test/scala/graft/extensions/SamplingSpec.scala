package graft.extensions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class SamplingSpec extends AnyFunSuite with SparkTestSession {

  private lazy val ids = spark.range(10000).toDF("id")

  test("split is total, disjoint, and within tolerance of the fractions") {
    val out = Sampling.deterministicSplit(ids, col("id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("train", "val", "test")) // no null split (sums to 1)
    assert(counts.values.sum == 10000)
    assert(math.abs(counts("train") - 8000) < 300, counts.toString)
    assert(math.abs(counts("val") - 1000) < 150, counts.toString)
  }

  test("assignment is stable across runs and independent of partitioning") {
    val a = Sampling.deterministicSplit(ids, col("id"), Seq("x" -> 0.5))
    val b = Sampling.deterministicSplit(ids.repartition(13), col("id"), Seq("x" -> 0.5))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("different salts draw independent assignments") {
    val a = Sampling.deterministicSample(ids, col("id"), 0.5, salt = "s1")
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.deterministicSample(ids, col("id"), 0.5, salt = "s2")
      .collect().map(_.getLong(0)).toSet
    val overlap = (a & b).size.toDouble
    // independent ~50% draws overlap on ~25% of the universe, not ~50%
    assert(overlap > 1500 && overlap < 3500, s"overlap $overlap")
    assert(a != b)
  }

  test("epochShuffle: total permutation, reproducible, epochs uncorrelated") {
    val n = 5000
    val df = spark.range(n).toDF("id")
    val e1 = Sampling.epochShuffle(df, col("id"), epoch = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bijection onto 1..n
    assert(e1.size == n && e1.values.toSet == (1L to n.toLong).toSet)
    // rerun (different partitioning) = identical permutation
    val e1b = Sampling.epochShuffle(df.repartition(17), col("id"), epoch = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(e1 == e1b)
    // a different epoch is a (near-)uncorrelated fresh order, not a shift
    val e2 = Sampling.epochShuffle(df, col("id"), epoch = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fixed = (0L until n.toLong).count(id => e1(id) == e2(id))
    assert(e2 != e1 && fixed < 10, s"$fixed fixed points") // E[fixed]=1 for a random perm
  }

  test("stratified sample applies per-stratum rates; unknown strata use default") {
    import org.apache.spark.sql.functions.{concat, lit}
    val df = spark.range(9000).toDF("id")
      .withColumn("stratum", concat(lit("s"), (org.apache.spark.sql.functions.col("id") % 3)))
    val out = Sampling.stratifiedSample(df, org.apache.spark.sql.functions.col("id"),
      org.apache.spark.sql.functions.col("stratum"),
      Map("s0" -> 1.0, "s1" -> 0.2), default = 0.0)
    val counts = out.groupBy("stratum").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("s0") == 3000) // fraction 1.0 keeps everything
    assert(math.abs(counts("s1") - 600) < 150, counts.toString)
    assert(!counts.contains("s2")) // default 0.0 drops the stratum entirely
  }

  test("remainder fraction gets a null split (excluded rows)") {
    val out = Sampling.deterministicSplit(ids, col("id"), Seq("keep" -> 0.3))
    val n = out.filter(col("split").isNull).count()
    assert(math.abs(n - 7000) < 300, n.toString)
  }

  test("token budget cap: per-stratum budget honored, no straddling, stable") {
    import spark.implicits._
    val rng = new scala.util.Random(47)
    val rows = (1 to 600).map(i => (i.toLong, s"src${i % 3}", 1L + rng.nextInt(20)))
    val df = rows.toDF("id", "source", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.tokenBudgetCap(d, col("id"), col("source"), col("w"),
          budget = 500L, salt = "t")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toList.sorted

    val out = run(df)
    val bySrc = out.groupBy(_._2)
    // every stratum present, every running total within budget
    assert(bySrc.keySet == Set("src0", "src1", "src2"))
    bySrc.values.foreach(g => assert(g.map(_._3).max <= 500L))
    // exact kept set: independent replica of the contract — sha(id ⊕ salt)
    // order, keep the PREFIX whose running total stays within budget (a doc
    // past the budget line never slides in, even if it would fit)
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = rows.groupBy(_._2).toList.flatMap { case (_, g) =>
      var cum = 0L
      g.sortBy(r => (sha(r._1.toString + "t"), r._1)).flatMap { r =>
        cum += r._3
        if (cum <= 500L) Some((r._1, r._2, cum)) else None
      }
    }.sorted
    assert(out == expected)
    // deterministic: identical under arbitrary repartitioning
    assert(run(df.repartition(13)) == out)
  }

  test("fixedKPerStratum: exactly k per stratum, deterministic, salt-independent") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i, if (i <= 60) "a" else if (i <= 97) "b" else "c"))
      .toDF("id", "s")
    def run(d: org.apache.spark.sql.DataFrame, salt: String) =
      Sampling.fixedKPerStratum(d, col("s"), col("id"), k = 5, salt = salt)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
        .sortBy(t => (t._1, t._3)).toSeq
    val out = run(df, "s1")
    // exactly k where the stratum has >= k rows; ALL rows where smaller
    assert(out.count(_._1 == "a") == 5 && out.count(_._1 == "b") == 5)
    assert(out.count(_._1 == "c") == 3) // stratum of 3 yields 3
    assert(out.filter(_._1 == "c").map(_._3) == Seq(1L, 2L, 3L))
    // deterministic under repartitioning
    assert(run(df.repartition(17), "s1") == out)
    // sha-replica: the sample is the first k ids by sha256(id ++ salt)
    def sha(v: String): String = java.security.MessageDigest
      .getInstance("SHA-256").digest(v.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expA = (1L to 60L).sortBy(i => (sha(s"${i}s1"), i.toString)).take(5)
    assert(out.filter(_._1 == "a").sortBy(_._3).map(_._2) == expA)
    // a different salt draws a different sample (overwhelmingly)
    assert(run(df, "s2") != out)
  }

  test("systematicSample rejects total weight outside the 2kW envelope") {
    import spark.implicits._
    // k=10000 -> bound floor((2^63-1)/20000) ~ 4.6e14; one 1e15 weight
    // must raise at the total aggregate, never wrap the probe positions
    val heavy = Seq((1L, 1000000000000000L), (2L, 5L)).toDF("id", "w")
    val ex = intercept[Exception] {
      Sampling.systematicSample(heavy, col("id"), col("w"), 10000).collect()
    }
    val msg = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(c => Option(c.getMessage)).mkString(" | ")
    assert(msg.contains("overflow-safe bound"))
    // the same corpus under a smaller k is IN envelope and still emits k rows
    assert(Sampling.systematicSample(heavy, col("id"), col("w"), 4)
      .count() == 4L)
  }

  test("systematic PPS sample: exactly k hits, grid replica, multiplicity ∝ weight") {
    import spark.implicits._
    val rows = (0L until 60L).map(i => (i, if (i == 7L) 5000L else 10L + i % 7))
    val df = rows.toDF("id", "w")
    val k = 25
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.systematicSample(d, col("id"), col("w"), k, salt = "s9")
        .select(col("sample_idx"), col("id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val out = run(df)
    // driver replica: sort by sha(id+salt), lay intervals, probe the grid
    def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ordered = rows.sortBy(r => (sha(r._1.toString + "s9"), r._1))
    val total = rows.map(_._2).sum
    var cum = 0L
    val intervals = ordered.map { case (id, w) => cum += w; (id, cum - w, cum) }
    val expected = (0 until k).map { j =>
      val t = total * (2L * j + 1) / (2L * k)
      val hit = intervals.find(iv => iv._2 <= t && t < iv._3).get
      (j.toLong, hit._1)
    }
    assert(out == expected)
    assert(out.size == k, "exactly k hits")
    assert(out.map(_._1).toSet == (0L until k).toSet, "every probe hits once")
    // the one mega-row (~76% of mass) is hit by many consecutive probes
    val megaHits = out.count(_._2 == 7L)
    assert(megaHits >= k / 2, s"PPS multiplicity: got $megaHits hits for 76% mass")
    // partition-independent
    assert(run(df.repartition(11)) == out)
    // zero-weight rows never sampled, zero-total → empty
    val z = Sampling.systematicSample(
      Seq((1L, 0L), (2L, 0L)).toDF("id", "w"), col("id"), col("w"), 5)
    assert(z.count() == 0L)
  }

  test("weightedSample: A-ES formula replica, exact k, determinism") {
    import spark.implicits._
    val df = (1L to 40L).map(i => ("s", i, (i % 7 + 1) * 100.0)).toDF("g", "id", "w")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSample(d, col("g"), col("id"), col("w"), k = 8,
        salt = "t1").collect().map(_.getLong(1)).toSet
    val out = run(df)
    assert(out.size == 8)
    // independent local replica of the A-ES pick (sha-derived u, top-8 key)
    val expected = df.select(col("id"), col("w"),
        (conv(substring(sha2(concat(col("id").cast("string"), lit("t1")), 256),
          1, 8), 16, 10).cast("double") + lit(0.5)) / lit(4294967296.0))
      .collect()
      .map(r => (r.getLong(0), math.pow(r.getDouble(2), 1.0 / r.getDouble(1))))
      .sortBy { case (id, key) => (-key, id) }.take(8).map(_._1).toSet
    assert(out == expected)
    assert(run(df.repartition(7)) == out) // partition-independent
  }

  test("weightedSample: heavier rows win more often across salts") {
    import spark.implicits._
    // two rows, weights 1 vs 50: the heavy one should take the k=1 slot in
    // the overwhelming majority of independent draws (salts)
    val df = Seq(("s", 1L, 50.0), ("s", 2L, 1.0)).toDF("g", "id", "w")
    val wins = (1 to 60).count { i =>
      Sampling.weightedSample(df, col("g"), col("id"), col("w"), k = 1,
        salt = s"salt$i").collect().head.getLong(1) == 1L
    }
    assert(wins >= 50, s"heavy row won only $wins/60 draws") // E ≈ 58.8
  }

  test("weightedSample: non-positive weights and null strata excluded; guards") {
    import spark.implicits._
    val df = Seq(("s", 1L, 0.0), ("s", 2L, -3.0), ("s", 3L, 5.0),
      (null.asInstanceOf[String], 4L, 5.0)).toDF("g", "id", "w")
    val out = Sampling.weightedSample(df, col("g"), col("id"), col("w"), k = 10)
      .collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(3L))
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df, col("g"), col("id"), col("w"), k = 0)
    }
  }
}
