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
    counted
      .withColumn("rank", row_number().over(
        Window.orderBy(col("support").desc, col("gram"))))
      .filter(col("rank") <= k)
  }
}
