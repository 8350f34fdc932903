package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Backward as-of join: for each left row, the single latest right row with
  * `rightTime <= leftTime` on the same key — the standard alignment op for
  * time-series enrichment (attach the most recent state/quote/config to each
  * observation).
  *
  * Spark has no native as-of join, and the naive formulations both fail at
  * scale: a range-condition join explodes to (left × right-per-key) candidate
  * rows before any dedup, and a per-left-row subquery is quadratic. This is
  * the union + ordered-carry formulation: tag both sides, union, and within
  * each key carry the last seen right payload forward over the time order —
  * ONE hash shuffle on the key, linear work, no candidate explosion. The
  * `rowsBetween(unboundedPreceding, currentRow)` frame makes
  * `last(_, ignoreNulls=true)` the running "most recent right row" at every
  * left row.
  *
  * Tie rules: right rows sort BEFORE left rows at equal timestamps, so the
  * semantics are `<=` (DuckDB/pandas ASOF convention); among right rows
  * sharing (key, time), the greatest `rightOrd` wins (pass a unique column —
  * determinism needs a total order).
  */
object AsOfJoin {

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightTime >= leftTime` on the same key — the mirror carry run in
    * descending time order. Among right ties on (key, time) the SMALLEST
    * `rightOrd` wins (the "first upcoming" convention, matching DuckDB's
    * ASOF on `r.ts >= l.ts`).
    */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], rightOrd: String): DataFrame =
    run(left, right, key, leftTime, rightTime, rightPayload, rightOrd,
      descending = true, bucketMicros = None)

  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], rightOrd: String): DataFrame =
    run(left, right, key, leftTime, rightTime, rightPayload, rightOrd,
      descending = false, bucketMicros = None)

  /** Skew-hardened variants: the plain carry puts each KEY's whole timeline in
    * one task — a single pathologically hot key (one symbol carrying 90 % of a
    * feed) serializes. These partition each key's timeline into fixed
    * `bucketMicros` time buckets and run the carry as a segmented scan:
    *
    *  1. in-bucket carry — the same ordered window, but partitioned by
    *     (key, bucket), so a hot key fans out over timeline/bucketMicros tasks;
    *  2. per-(key, bucket) summary — the bucket's final carried right payload,
    *     one `max_by`/`min_by` aggregate row per bucket (no window);
    *  3. incoming carry — the last non-null summary from earlier buckets
    *     (later, for forward), a window over the TINY summary relation;
    *  4. `coalesce(in-bucket, incoming)` — a left row with no in-bucket match
    *     takes the boundary carry, which is time-correct because buckets
    *     partition the time axis.
    *
    * Same semantics as [[backward]]/[[forward]] including tie rules (asserted
    * by equivalence in AsOfJoinSpec); three key-partitioned shuffles instead
    * of one, so reserve it for skewed feeds. Numeric time columns (epoch
    * nanos/micros) bucket by value; timestamps by `unix_micros`.
    */
  def backwardBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], rightOrd: String, bucketMicros: Long): DataFrame =
    run(left, right, key, leftTime, rightTime, rightPayload, rightOrd,
      descending = false, bucketMicros = Some(bucketMicros))

  def forwardBucketed(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], rightOrd: String, bucketMicros: Long): DataFrame =
    run(left, right, key, leftTime, rightTime, rightPayload, rightOrd,
      descending = true, bucketMicros = Some(bucketMicros))

  private def run(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], rightOrd: String,
      descending: Boolean, bucketMicros: Option[Long]): DataFrame = {

    val payloadCols = (rightPayload :+ rightOrd).distinct
    val payloadType = StructType(payloadCols.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    val leftType = StructType(left.schema.fields.map(_.copy(nullable = true)))

    // SQL comparison semantics: a null right time satisfies neither <= nor >=,
    // so such rows can never match — drop them before they poison the carry
    // (a null __t would sort to an end of the partition and be carried into
    // every left row on that side)
    val taggedRight = right.filter(col(rightTime).isNotNull).select(
      col(key).as("__key"), col(rightTime).as("__t"), lit(1).as("__is_right"),
      struct(payloadCols.map(col): _*).as("__payload"),
      lit(null).cast(leftType).as("__left"))
    val taggedLeft = left.select(
      col(key).as("__key"), col(leftTime).as("__t"), lit(0).as("__is_right"),
      lit(null).cast(payloadType).as("__payload"),
      struct(left.columns.toSeq.map(col): _*).as("__left"))

    // right-before-left at equal __t (__is_right desc); among right ties on
    // (key, t) the row sorting LAST in carry order wins: backward = greater
    // rightOrd; forward (descending time) = smaller rightOrd, i.e. the first
    // upcoming right row
    val tOrder = if (descending) col("__t").desc else col("__t").asc
    val ordOrder = if (descending) col("__payload").getField(rightOrd).desc_nulls_first
      else col("__payload").getField(rightOrd).asc_nulls_first

    val union = taggedRight.unionByName(taggedLeft)

    val carried = bucketMicros match {
      case None =>
        val w = Window.partitionBy(col("__key"))
          .orderBy(tOrder, col("__is_right").desc, ordOrder)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        union.withColumn("__carried", last(col("__payload"), ignoreNulls = true).over(w))

      case Some(width) =>
        require(width > 0, s"bucketMicros must be positive, got $width")
        val tMicros = right.schema(rightTime).dataType match {
          case org.apache.spark.sql.types.TimestampType |
               org.apache.spark.sql.types.TimestampNTZType =>
            TimeCols.tsMicros(col("__t"))
          case _ => col("__t").cast("long")
        }
        val withBucket = union.withColumn("__b", floor(tMicros / width))

        // 1. segmented carry inside each (key, bucket)
        val wIn = Window.partitionBy(col("__key"), col("__b"))
          .orderBy(tOrder, col("__is_right").desc, ordOrder)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val inBucket = withBucket
          .withColumn("__in", last(col("__payload"), ignoreNulls = true).over(wIn))

        // 2. bucket summary: the payload that would be carried OUT of the
        // bucket — the right row ranking last in carry order, as one
        // max_by/min_by aggregate (left rows contribute a null ordering key
        // and are skipped)
        val ordKey = when(col("__is_right") === 1,
          struct(col("__t"), col("__payload").getField(rightOrd)))
        val summaryAgg =
          if (descending) min_by(col("__payload"), ordKey)
          else max_by(col("__payload"), ordKey)
        val summaries = withBucket.groupBy(col("__key"), col("__b"))
          .agg(summaryAgg.as("__summary"))

        // 3. incoming carry per bucket: last non-null summary of the buckets
        // before it in carry direction (a window over keys × buckets rows)
        val bOrder = if (descending) col("__b").desc else col("__b").asc
        val wAcross = Window.partitionBy(col("__key")).orderBy(bOrder)
          .rowsBetween(Window.unboundedPreceding, -1)
        // keys × buckets is far smaller than the data but not provably
        // broadcastable — shuffled HASH join (aggregate-derived side carries
        // no stats, so Spark would default to sort-merge)
        val incoming = summaries.withColumn("__incoming",
          last(col("__summary"), ignoreNulls = true).over(wAcross))
          .select(col("__key"), col("__b"), col("__incoming"))
          .hint("shuffle_hash")

        // 4. boundary fill — buckets partition the time axis, so the incoming
        // payload is always strictly on the correct side of every row in the
        // bucket
        inBucket.join(incoming, Seq("__key", "__b"), "left")
          .withColumn("__carried", coalesce(col("__in"), col("__incoming")))
    }

    // a left row with null time matches nothing: null out its carry
    carried
      .withColumn("__carried", when(col("__t").isNull, lit(null).cast(payloadType))
        .otherwise(col("__carried")))
      .filter(col("__is_right") === 0)
      .select(col("__left.*") +:
        rightPayload.map(p => col("__carried").getField(p).as(p)): _*)
  }
}
