package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // engine defaults (Sessions): UTC, nanos-as-long, AQE skew-join split —
    // the bench measures the configuration users actually get
    val spark = Sessions.localBuilder(cpus)
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Sessions.quietPinnedWarnings()   // r18: bounded-window warning class, spec-pinned
    // Warm-up (untimed): session/codegen/scan initialization costs ~4s and
    // would land entirely on whichever query happens to run first, making
    // per-query numbers non-comparable. Steady-state is what the bench
    // measures; queries then run in deterministic name order.
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", sfDir)
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings")
        .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
      // warm the pipeline (grouping/enrich mapPartitions) codegen; by default
      // on the benched dir itself so the warm-up works on any machine — point
      // SPARK_GRAFT_WARM_DIR at a smaller SF to keep it cheap
      graft.pipeline.BatchJob.flagship(spark, warmDir).count()
    } catch { case e: Throwable =>
      // a failed warm-up silently shifts ~4s of init cost onto the first
      // benched query — surface it so runs stay comparable
      System.err.println(s"[bench] WARM-UP FAILED (first query will absorb init cost): $e")
    }
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    // dev knob: SPARK_GRAFT_ONLY=x02,x24 runs just the named queries (prefix
    // match) — for iterating on one query's plan without the full sweep.
    // Empty elements (trailing comma, blank var) are dropped: "" would
    // prefix-match every query and silently run the full sweep; an all-empty
    // value means "run all" explicitly.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    // SPARK_GRAFT_REPS=N runs the sweep N times and reports the per-query
    // MEDIAN — the round-10 variance study showed single-sample per-query
    // numbers on the shared VM jitter up to ~6×. Default 3 since round 11.
    val reps = math.max(1,
      sys.env.get("SPARK_GRAFT_REPS").flatMap(_.toIntOption).getOrElse(3))
    val qseq = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }

    // One timed execution of a query, followed by UNTIMED cache isolation:
    // drop every cached block the query left behind — catalog cache
    // (Dataset.persist) AND RDD-level blocks (localCheckpoint) — so each
    // number measures its own plan, not the memory pressure of everything
    // that ran before it (the round-4 tail collapse). BLOCKING unpersist
    // first: async removal (the clearCache default) overlaps block deletion
    // with the next timed query and bleeds I/O into its measurement.
    def timeQuery(name: String, run: () => Unit): (Double, Boolean) = {
      val t0 = System.nanoTime()
      // noop sink, not count(): count() lets Catalyst prune deterministic
      // projections, so a projection-only query would benchmark an empty
      // scan — the noop write materializes every output column.
      val ok =
        try { run(); true }
        catch { case e: Throwable =>
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      (dt, ok)
    }

    // SWEEP-INTERLEAVED reps (round-13 verdict ask #1): rep = ONE full
    // name-order pass over ALL queries; per-query median ACROSS passes.
    // The old shape (3 back-to-back reps per query) let a sustained VM-load
    // window on the shared driver machine inflate ALL reps of whichever
    // queries were adjacent in name order — the r13 driver artifact showed
    // exactly that signature (x56–x57, x72–x79, x95–x96 stretched 3–13×
    // while local medians and the designated gauges x25/x26 sat flat).
    // Interleaving spreads a load window of any duration shorter than a
    // full pass across DIFFERENT queries in different reps, so the
    // per-query median rejects it — the same design ProbeX26's
    // interleaved-arm probe validated for attribution. Cache isolation per
    // execution is unchanged, so measurements stay independent.
    val qTimes = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.ArrayBuffer[(Double, Boolean)]]()
    qseq.foreach { case (name, _) =>
      qTimes(name) = scala.collection.mutable.ArrayBuffer.empty }

    // Flagship at the BENCH scale factor (round-12 verdict ask #4): the S9
    // mapPartitions enrichment path is the engine's core op; measure its
    // wall time and group throughput here instead of only smoke-checking it
    // at sf0.001. Groups counted once untimed (one row per group in the
    // enrich output); timed once per pass like every query, noop sink.
    // Skipped under SPARK_GRAFT_ONLY (dev single-query iteration).
    val flagshipGroups: Option[Long] = if (only.isDefined) None else
      try Some(graft.pipeline.BatchJob.flagship(spark, sfDir).count())
      catch { case e: Throwable =>
        System.err.println(s"[bench] flagship group count FAILED: $e"); None }
    val flagshipTimes = scala.collection.mutable.ArrayBuffer[(Double, Boolean)]()

    (1 to reps).foreach { pass =>
      qseq.foreach { case (name, fn) =>
        qTimes(name) += timeQuery(name,
          () => fn(spark, sfDir).write.format("noop").mode("overwrite").save())
      }
      if (flagshipGroups.isDefined)
        flagshipTimes += timeQuery("flagship",
          () => graft.pipeline.BatchJob.flagship(spark, sfDir)
            .write.format("noop").mode("overwrite").save())
      System.err.println(s"[bench] pass $pass/$reps done")
    }

    // median over SUCCESSFUL reps only: a throwing rep fast-fails in
    // near-zero time, and letting it into the vector would report an
    // intermittently-failing query as misleadingly fast while only stderr
    // recorded the failure. All-failed queries keep their raw times (the
    // query is already in `failed`, which flags the number as
    // not-a-measurement).
    def median(timed: Seq[(Double, Boolean)]): Double = {
      val okTimes = timed.collect { case (dt, true) => dt }
      val times = (if (okTimes.nonEmpty) okTimes else timed.map(_._1)).sorted
      times(times.size / 2) // median (upper on even n)
    }
    val results = qseq.map { case (name, _) => name -> median(qTimes(name).toSeq) }
    val flagship: Option[(Double, Long)] = flagshipGroups.collect {
      case n if flagshipTimes.nonEmpty => (median(flagshipTimes.toSeq), n)
    }

    // Output contract: stdout carries EXACTLY ONE bare JSON line — the
    // compact summary (build.sbt forks with StdoutOutput +
    // showSuccess=false, so sbt neither prefixes "[info] " nor appends
    // "[success] ..."). The full per-query map is ~6 KB — far past the
    // driver's 2000-char tail window — so it goes ONLY to detail files and
    // the compact line keeps the headline q* medians + totals (~1.3 KB).
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def qjson(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val (headline, extended) = results.partition(_._1.startsWith("q"))
    val flagshipJson = flagship.map { case (sec, n) =>
      s""","flagship_sec":${fmt(sec)},"flagship_groups":$n,"flagship_groups_per_sec":${fmt(n / math.max(sec, 1e-9))}"""
    }.getOrElse("")
    val fullLine = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qjson(results)},"failed":$failedJson,"reps":$reps,"rep_mode":"interleaved"$flagshipJson,"sf":"$sfDir"}"""
    // Detail artifact(s). Round-13 verdict ask #2: a single mutable
    // bench_detail.json is overwritten every driver run, destroying
    // driver-vs-driver per-query history (r12's driver x57 was
    // unrecoverable). When SPARK_GRAFT_BENCH_DETAIL is unset (the driver's
    // default mode), ALSO write a UTC-timestamped copy that accumulates in
    // the repo — the driver commits untracked files at round end, so each
    // round's driver detail survives like BENCH_r*.json does. An explicit
    // SPARK_GRAFT_BENCH_DETAIL (dev/probe runs) writes only that path.
    val explicitDetail = sys.env.get("SPARK_GRAFT_BENCH_DETAIL")
    val detailPath = explicitDetail.getOrElse("bench_detail.json")
    def writeDetail(p: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(p),
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case e: Throwable =>
        System.err.println(s"[bench] detail write to $p failed: $e") }
    writeDetail(detailPath)
    val stamped = if (explicitDetail.isEmpty) {
      val ts = java.time.format.DateTimeFormatter
        .ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.now())
      val p = s"bench_detail_$ts.json"
      writeDetail(p); Some(p)
    } else None
    if (failed.nonEmpty) System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.mkString(", ")}")
    // stop() failure must not eat the contract line (a shutdown-hook or
    // listener throw here would reproduce the parsed:null artifact failure
    // this bench exists to prevent) — the measurements above are complete
    // and valid regardless of how teardown goes.
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"[bench] spark.stop() failed (measurements unaffected): $e") }
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${qjson(headline)},"x_total":${fmt(extended.map(_._2).sum)},"n_queries":${results.size},"failed":$failedJson,"reps":$reps,"rep_mode":"interleaved"$flagshipJson,"sf":"$sfDir","detail":"${stamped.getOrElse(detailPath)}"}""")
    System.out.flush()
  }
}
