package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming operators (Structured Streaming).
  *
  * The reference has no event-time semantics — its "stream" is a sequential
  * loop with a per-group progress write (/root/reference/worker.py:295-355).
  * These operators are the engine's scale-native generalizations: bounded-state
  * streaming over unbounded input, which is what the same pipeline needs when
  * files/events arrive continuously on a cluster instead of as one uploaded ZIP.
  *
  * State-boundedness is the design invariant of every op here: each one either
  * carries a watermark (windows and dedup state are dropped once the watermark
  * passes) or an explicit state-timeout (progress sessions expire), so state
  * size tracks the active window/key population — never total history.
  */
object EventTimeOps {

  /** Watermarked sliding-window aggregation over an event stream with an
    * event-time column `ts` — counts and value sums per (window × event_type).
    *
    * Late rows beyond `watermark` are dropped and their window state is freed;
    * in append mode a window emits exactly once, when the watermark passes its
    * end — the streaming analog of the reference's batch cost rollup
    * (/root/reference/worker.py:110-176) computed incrementally.
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
      windowDur: String = "5 minutes", slideDur: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        window(col("ts"), windowDur, slideDur.getOrElse(windowDur)),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 6).as("sum_value"))
      .select(col("window.start").as("window_start"), col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup (extension of the batch registry probe J1,
    * /root/reference/app.py:191-203): first occurrence of `idCols` wins; the
    * watermark bounds the dedup-state horizon so state is dropped once no
    * earlier duplicate can still arrive.
    */
  def dedupStream(events: DataFrame, watermark: String, idCols: String*): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)

  /** Stream-stream interval join: pair each left event with right events of
    * the same key whose time falls in `[left.ts, left.ts + within]`. Both
    * sides carry watermarks and the join condition is time-bounded, so Spark
    * can expire buffered state — the two requirements for an unbounded
    * stream-stream join to run with bounded memory.
    *
    * Inputs need distinct column names (e.g. `l_key, l_ts` vs `r_key, r_ts`);
    * this keeps the op schema-agnostic and the condition explicit.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, leftTs: String, rightTs: String,
      within: String, watermark: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $within"))
  }

  // ------------------------------------------------------- progress tracking --

  /** One enrichment completion event (the streaming form of the reference's
    * write-meta-after-every-group loop, /root/reference/worker.py:352-353). */
  case class GroupDone(jobId: String, groupId: String, ts: Timestamp, isError: Boolean)

  /** Running per-job progress — the `{processed, total}` contract of
    * GET /progress (/root/reference/app.py:938-948) plus failure split. */
  case class JobProgress(jobId: String, processed: Long, failed: Long, totalGroups: Long)

  /** Internal running state (public: Catalyst codegen instantiates it). */
  case class ProgressState(processed: Long, failed: Long)

  /** Custom stateful progress tracking via `flatMapGroupsWithState`: one state
    * row per in-flight job, updated per micro-batch, emitted on every change
    * (update mode). With `idleTimeout` set, `ProcessingTimeTimeout` expires
    * state for jobs that stop reporting, so abandoned jobs cannot pin executor
    * state forever — note a timeout makes the query run continuous timeout-check
    * batches, so data-driven tests leave it off.
    *
    * `totalGroups` is passed by the caller (known before the run, exactly as
    * the reference counts groups up front, /root/reference/worker.py:285-288).
    */
  def trackProgress(events: Dataset[GroupDone], totals: Map[String, Long],
      idleTimeout: Option[String] = None): Dataset[JobProgress] = {
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf = if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(_.jobId)
      .flatMapGroupsWithState[ProgressState, JobProgress](
        OutputMode.Update(), timeoutConf) {
        (jobId: String, batch: Iterator[GroupDone], state: GroupState[ProgressState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(ProgressState(0L, 0L))
            var processed = prev.processed
            var failed = prev.failed
            batch.foreach { e =>
              processed += 1
              if (e.isError) failed += 1
            }
            val total = totals.getOrElse(jobId, 0L)
            // a finished job's state is removed immediately — state size
            // tracks IN-FLIGHT jobs, not job history (the boundedness
            // invariant in the header); unknown totals fall back to the
            // idle timeout (when configured)
            if (total > 0 && processed >= total) state.remove()
            else {
              state.update(ProgressState(processed, failed))
              idleTimeout.foreach(state.setTimeoutDuration)
            }
            Iterator.single(JobProgress(jobId, processed, failed, total))
          }
      }
  }
}
