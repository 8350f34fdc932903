package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Frequent-sequence mining over keyed event streams — the DISCOVERY twin of
  * [[Funnel]]: where the funnel counts matches of one GIVEN ordered pattern,
  * this surfaces the top-k contiguous n-grams of events that actually occur
  * (with their support), the first step of every behavioral-motif /
  * next-event-model pipeline and of curriculum analysis over training-data
  * event logs.
  *
  * Mechanics: per-key ordered `lead` chains assemble each row's forward
  * n-gram (`a>b>c`; `concat` null-propagates, so windows that run off a
  * key's history vanish instead of emitting short grams), one aggregate
  * counts per-gram occurrences (`support`) and distinct keys (`n_keys`),
  * and a `minSupport` filter precedes the global top-k rank.
  *
  * Scale shape: the event scan is ONE shuffle on the key (the `lead`
  * window), the gram count is one map-combined aggregate on the gram, and
  * the only single-partition stage — the top-k rank window — runs over the
  * SUPPORT-FILTERED gram relation, bounded by contract (`minSupport` must
  * be set so surviving grams are a driver-scale relation: with enum-like
  * event vocabularies the gram space is |V|ⁿ regardless of corpus size;
  * for open vocabularies pick minSupport ≥ corpus_rows / budget). No
  * per-key collect, no corpus-scale sort.
  */
object SeqMining {

  /** Top-`k` contiguous `n`-grams by support: `gram` (items joined with
    * `>`), `support` (occurrence count), `n_keys` (distinct keys containing
    * the gram), `rank` (1-based; support desc, gram asc — deterministic).
    *
    * `item` is cast to string; rows with a NULL item never contribute (the
    * null-propagating gram assembly drops any window touching them).
    * `tieBreak` must be non-null and make (ts, tieBreak) unique per key.
    */
  def frequentSeqs(df: DataFrame, key: Column, ts: Column, tieBreak: Column,
      item: Column, n: Int, minSupport: Long, k: Int): DataFrame = {
    require(n >= 2 && n <= 8, s"n must be in [2,8], got $n")
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    require(k >= 1, s"k must be >= 1, got $k")
    val base = df.select(key.as("__key"), TimeCols.tsMicros(ts).as("__us"),
      tieBreak.as("__tb"), item.cast("string").as("__it"))
    val w = Window.partitionBy(col("__key")).orderBy(col("__us"), col("__tb"))
    val parts = (0 until n).flatMap { i =>
      val it = if (i == 0) col("__it") else lead(col("__it"), i).over(w)
      if (i == 0) Seq(it) else Seq(lit(">"), it)
    }
    val grams = base.select(col("__key"), concat(parts: _*).as("gram"))
      .filter(col("gram").isNotNull)
    val counted = grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("support"),
        countDistinct(col("__key")).as("n_keys"))
      .filter(col("support") >= minSupport)
    // r18 (VERDICT #6): `counted` is one row per distinct gram — it GROWS
    // with the corpus, so ranking it with a global single-partition window
    // was the one unbounded Window.orderBy in the engine. Top-k first via
    // orderBy+limit (plans as TakeOrderedAndProject — per-partition heaps,
    // no single-partition stage), then rank the ≤ k survivors with a window
    // that is bounded at any scale. (support desc, gram) is a total order
    // (gram is unique in `counted`), so top-k-then-rank is value-identical
    // to rank-then-filter(rank <= k).
    counted.orderBy(col("support").desc, col("gram")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("support").desc, col("gram"))))
  }

  /** First-order Markov transition matrix over the keyed event stream, plus
    * the majority-class next-event baseline every sequence model must beat:
    * one row per observed `(from_item, to_item)` with `n` (transition
    * count), `from_total`, `p_micro` (= n·10⁶ / from_total, exact integer
    * floor — no float division to wiggle a hash) and `rank` (1-based by n
    * desc, to_item asc within each from_item; rank 1 IS the majority-class
    * prediction, and its p_micro is that baseline's accuracy on this
    * corpus).
    *
    * Scale shape: one `lead` window per key (the same single key shuffle as
    * [[frequentSeqs]]), one map-combined pair aggregate, and per-`from`
    * windows over the PAIR relation — bounded by |V|² for enum-like item
    * vocabularies regardless of corpus size. NULL items and each key's
    * final event contribute no transition (null-propagating pair assembly).
    */
  def transitionMatrix(df: DataFrame, key: Column, ts: Column,
      tieBreak: Column, item: Column): DataFrame = {
    val base = df.select(key.as("__key"), TimeCols.tsMicros(ts).as("__us"),
      tieBreak.as("__tb"), item.cast("string").as("__it"))
    val w = Window.partitionBy(col("__key")).orderBy(col("__us"), col("__tb"))
    val pairs = base
      .select(col("__it").as("from_item"),
        lead(col("__it"), 1).over(w).as("to_item"))
      .filter(col("from_item").isNotNull && col("to_item").isNotNull)
    val counted = pairs.groupBy(col("from_item"), col("to_item"))
      .agg(count(lit(1)).as("n"))
    val wFrom = Window.partitionBy(col("from_item"))
    counted
      .withColumn("from_total", sum(col("n")).over(wFrom))
      .withColumn("rank", row_number().over(
        wFrom.orderBy(col("n").desc, col("to_item"))))
      // integer DIV: exact at any long n·10⁶ (no double rounding), matching
      // DuckDB's BIGINT `//`
      .withColumn("p_micro", expr("n * 1000000 DIV from_total"))
      .select("from_item", "to_item", "n", "from_total", "p_micro", "rank")
  }
}
