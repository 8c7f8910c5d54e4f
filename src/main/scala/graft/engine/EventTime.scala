package graft.engine

import graft.expr.{SparkCompiler, TimeFormats}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

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
        val c = timestampFormat match {
          case "epoch"        => col(field).cast("bigint") * lit(1000L)
          case "epoch_millis" => col(field).cast("bigint")
          // int64 nanoseconds (e.g. parquet TIMESTAMP(NANOS) read with
          // spark.sql.legacy.parquet.nanosAsLong=true); integer division —
          // a double roundtrip would lose precision above 2^53.
          case "epoch_nanos"  => expr(s"`$field` DIV 1000000")
          case "auto"         =>
            df.schema(field).dataType match {
              case TimestampType => unix_millis(col(field))
              case _             => unix_millis(col(field).cast(TimestampType))
            }
          case strftime =>
            unix_millis(to_timestamp(col(field), TimeFormats.toJavaDateFormat(strftime)))
        }
        df.withColumn(Col, c)
    }

  def drop(df: DataFrame): DataFrame =
    df.drop(Col)
}
