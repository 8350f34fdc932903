package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.unix_micros
import org.apache.spark.sql.types.TimestampType

/** Epoch-µs extraction that tolerates both TIMESTAMP and TIMESTAMP_NTZ
  * inputs. Parquet written with `isAdjustedToUTC=false` reads as
  * TIMESTAMP_NTZ under Spark 4's NTZ inference, and `unix_micros` rejects
  * that type outright — so every time-keyed operator funnels through this
  * cast. For TIMESTAMP the cast is a no-op; an NTZ value is interpreted in
  * the session time zone (run UTC sessions for engine parity — naive
  * parquet micros then round-trip bit-identically).
  */
object TimeCols {
  private[graft] def tsMicros(c: Column): Column =
    unix_micros(c.cast(TimestampType))
}
