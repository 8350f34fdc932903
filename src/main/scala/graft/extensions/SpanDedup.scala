package graft.extensions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide exact substring deduplication over tumbling token tiles — the
  * "remove repeated spans across documents" operator (the exact-substring
  * dedup of Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better", re-expressed relationally; the C4/RefinedWeb pipelines run
  * the same idea at line granularity).
  *
  * Each document's token stream is cut into tumbling `w`-token tiles (the
  * final tile may be shorter). A tile instance survives iff it is the globally
  * FIRST occurrence of that exact token span, ordered by `(doc id, tile
  * index)`; later copies anywhere in the corpus are dropped. Documents are
  * then reassembled from their surviving tiles in order.
  *
  * Scale shape (the reason this formulation wins over a suffix-array build at
  * 100 TB): tiling is a narrow per-row explode; first-occurrence election is
  * ONE shuffle on the tile key with a map-side `min` combine (duplicate spans
  * collapse before they travel); the survivor check joins tile instances back
  * on the same key (co-partitioned with the election — no second wide
  * shuffle of content); reassembly is one shuffle on the document id. Nothing
  * is all-pairs and no stage holds more than a tile per row in flight.
  * Against skew (a boilerplate span repeated millions of times): the election
  * aggregate collapses those map-side, and the join's build side carries one
  * row per DISTINCT tile, not per instance.
  */
object SpanDedup {

  /** Tile instances: `(__id, idx, tile)` — one row per `w`-token tumbling
    * window; documents with no tokens emit a single null-tile row so they
    * survive reassembly. */
  private[extensions] def tiles(df: DataFrame, id: Column, text: Column,
      w: Int): DataFrame = {
    require(w > 0, "tile width must be positive")
    df.select(id.cast("long").as("__id"), TextAnalysis.tokens(text).as("__toks"))
      // integer ceil-div: (n + w - 1) DIV w tiles; the tail tile is short
      .withColumn("__nt", expr(s"(size(__toks) + ${w - 1}) DIV $w"))
      .select(col("__id"),
        posexplode_outer(when(col("__nt") > 0,
          transform(sequence(lit(0), col("__nt") - 1),
            i => concat_ws(" ", slice(col("__toks"), i * w + 1, lit(w)))))
        ).as(Seq("idx", "tile")))
  }

  /** Per-document result of span dedup: `(id, n_tiles, n_tiles_dropped,
    * clean_text)` where `clean_text` is the document rebuilt from its
    * surviving tiles (empty string if every span was a repeat). */
  def dedupSpans(df: DataFrame, id: Column, text: Column, w: Int = 10): DataFrame = {
    val t = tiles(df, id, text, w)
    // first-occurrence election: min (doc, idx) per distinct span — the one
    // corpus-wide shuffle, with map-side combine collapsing repeats early
    val firsts = t.filter(col("tile").isNotNull)
      .groupBy("tile")
      .agg(min(struct(col("__id"), col("idx"))).as("__first"))
    t.join(firsts, Seq("tile"), "left")
      .withColumn("__kept", col("tile").isNotNull &&
        col("__first.__id") === col("__id") && col("__first.idx") === col("idx"))
      .groupBy("__id")
      .agg(
        count(col("tile")).as("n_tiles"),
        count(when(col("tile").isNotNull && !col("__kept"), lit(1))).as("n_tiles_dropped"),
        // collect only survivors (when(...) yields null for drops and
        // collect_list skips nulls), re-order by tile index, stitch
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("__kept"),
            struct(col("idx"), col("tile"))))),
          x => x("tile"))).as("clean_text"))
      .select(col("__id").as("id"), col("n_tiles"), col("n_tiles_dropped"),
        col("clean_text"))
  }
}
