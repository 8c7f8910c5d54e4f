package graft.engine

import graft.expr.{SparkCompiler, TimeFormats}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Engine-managed event-time metadata column: epoch milliseconds, appended
  * to every timestamped table
  * (ref: python/feathub/processors/spark/dataframe_builder/
  * time_utils.py:21-52). Formats: "epoch" (seconds), "epoch_millis",
  * "auto" (native TIMESTAMP/DATE column), or a strftime pattern.
  */
object EventTime {
  val Col: String = SparkCompiler.EventTimeCol

  def append(df: DataFrame, timestampField: Option[String], timestampFormat: String): DataFrame =
    timestampField match {
      case None => df
      case Some(field) =>
        require(!df.columns.contains(Col), s"DataFrame already has column $Col")
        val dt = df.schema(field).dataType
        // A numeric epoch format declared over a column the reader already
        // decoded to a NATIVE timestamp (e.g. the same logical instants
        // re-exported as parquet TIMESTAMP(MICROS) instead of int64 nanos):
        // trust the type — the physical representation changed, the
        // instants didn't. Only genuinely-numeric columns take the
        // declared-unit arithmetic.
        def isTs(d: DataType): Boolean = d == TimestampType || d == TimestampNTZType
        val c = timestampFormat match {
          case "epoch" | "epoch_millis" | "epoch_nanos" if isTs(dt) =>
            tsMillis(col(field), dt)
          case "epoch"        => col(field).cast("bigint") * lit(1000L)
          case "epoch_millis" => col(field).cast("bigint")
          // int64 nanoseconds (e.g. parquet TIMESTAMP(NANOS) read with
          // spark.sql.legacy.parquet.nanosAsLong=true); integer division —
          // a double roundtrip would lose precision above 2^53.
          case "epoch_nanos"  => expr(s"`$field` DIV 1000000")
          case "auto"         => tsMillis(col(field), dt)
          case strftime =>
            unix_millis(to_timestamp(col(field), TimeFormats.toJavaDateFormat(strftime)))
        }
        df.withColumn(Col, c)
    }

  def drop(df: DataFrame): DataFrame =
    df.drop(Col)

  private def tsMillis(c: Column, dt: DataType): Column = dt match {
    case TimestampType => unix_millis(c)
    // NTZ (and anything else) goes through a TimestampType cast; the
    // session timezone is pinned to UTC by every entrypoint, so the NTZ
    // wall-clock IS the UTC instant.
    case _ => unix_millis(c.cast(TimestampType))
  }

  /** Epoch milliseconds of `field` regardless of physical representation:
    * int64 ns (the legacy events encoding) takes exact integer division,
    * native timestamps go through unix_millis. For ad-hoc DataFrame code
    * outside the descriptor path ([[append]] covers that one).
    */
  def epochMillis(df: DataFrame, field: String): Column =
    df.schema(field).dataType match {
      case LongType => expr(s"`$field` DIV 1000000")
      case dt       => tsMillis(col(field), dt)
    }
}
