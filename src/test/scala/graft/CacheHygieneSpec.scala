package graft

import org.scalatest.funsuite.AnyFunSuite

/** Cache-lifecycle invariant for every SparkEntry query: an operator may
  * persist intermediates WHILE it derives a result, but the plan it returns
  * must not pin corpus-scale blocks in the cache for the application
  * lifetime. Round 4's bench measured exactly that failure mode: four leaked
  * `persist()` calls squeezed execution memory until unrelated per-row
  * queries ran 26× slower in the same session.
  *
  * Contract enforced here, after running each query to a noop sink:
  *   - no CacheManager entries (`Dataset.persist` without matching unpersist);
  *   - every surviving RDD-level block is a `localCheckpoint` — those are
  *     eager, lineage-truncating materializations whose blocks the
  *     ContextCleaner reclaims on GC (bounded ownership), unlike CacheManager
  *     entries which are strongly referenced forever.
  */
class CacheHygieneSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  test("every query releases its persists (localCheckpoint blocks only)") {
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val leaked = spark.sparkContext.getPersistentRDDs.values
        .filterNot(org.apache.spark.rdd.GraftRddIntrospect.isLocalCheckpoint)
      assert(leaked.isEmpty,
        s"$name leaked ${leaked.size} persisted RDD(s): " +
          leaked.map(r => s"id=${r.id} ${r.name}").mkString(", "))
      // release checkpoint blocks so 70 queries don't accumulate across the
      // suite — mirrors what Bench does between timed queries
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
  }
}
