package graft

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import org.scalatest.funsuite.AnyFunSuite

/** Concurrent-session safety: the reference serves 4 jobs at once
  * (ThreadPoolExecutor(max_workers=4), app.py:19); a shared SparkSession must
  * give the same answers when queries run in parallel. The chosen queries all
  * have EAGER internals — the vocabulary probe (x02), the measured CC/skew
  * gates (x24), the CMS + top-k collect (x36), the full pipeline with its
  * checkpoint (q21) — which is where cross-query interference (shared temp
  * names, racing cache registration, driver-side mutable state) would show.
  */
class ConcurrencySpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"
  // round-7 additions: x47 (vocab checkpoint + total collect), x51 (two-pass
  // prefix scan with driver-held offsets), x52 (the whole funnel chain);
  // round-10: x122 (adaptive-count sampling + three localCheckpoints + the
  // banded/brute double run — the newest eager-internal composition)
  private val picked = Seq("x02_dedup_ngram_jaccard", "x24_dedup_clusters",
    "x36_heavy_hitters", "q21_pipeline_enrich",
    "x47_lm_quality", "x51_token_budget", "x52_corpus_funnel",
    "x122_simhash_invariants")

  test("4 eager-internal queries concurrently == serially, twice over") {
    implicit val ec: ExecutionContext = ExecutionContext.global
    def runAll(): Map[String, Seq[String]] =
      picked.map { name =>
        val df = SparkEntry.queries(name)(spark, dir)
        // canonical row fingerprints: sorted stringified rows
        name -> df.collect().map(_.toString).sorted.toSeq
      }.toMap
    val serial = runAll()
    for (round <- 1 to 2) {
      val concurrent = Await.result(
        Future.sequence(picked.map(name => Future {
          name -> SparkEntry.queries(name)(spark, dir)
            .collect().map(_.toString).sorted.toSeq
        })), 5.minutes).toMap
      picked.foreach { name =>
        assert(concurrent(name) == serial(name),
          s"round $round: $name diverged under concurrency")
      }
    }
  }
}
