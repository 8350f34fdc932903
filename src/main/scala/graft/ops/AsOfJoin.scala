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
      descending = true)

  def backward(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], rightOrd: String): DataFrame =
    run(left, right, key, leftTime, rightTime, rightPayload, rightOrd,
      descending = false)

  private def run(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String], rightOrd: String,
      descending: Boolean): DataFrame = {

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
    val w = Window.partitionBy(col("__key"))
      .orderBy(tOrder, col("__is_right").desc, ordOrder)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    // a left row with null time likewise matches nothing: null out its carry
    taggedRight.unionByName(taggedLeft)
      .withColumn("__carried", when(col("__t").isNull, lit(null).cast(payloadType))
        .otherwise(last(col("__payload"), ignoreNulls = true).over(w)))
      .filter(col("__is_right") === 0)
      .select(col("__left.*") +:
        rightPayload.map(p => col("__carried").getField(p).as(p)): _*)
  }
}
