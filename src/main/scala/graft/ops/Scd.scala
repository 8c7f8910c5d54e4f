package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history — the warehouse half of
  * point-in-time correctness: the feature store's temporal join asks
  * "what was true at t", SCD2 is the table shape that can answer it
  * for dimension attributes (a customer's segment, a document's
  * license, a supplier's region) without storing every snapshot.
  */
object Scd {

  /** Collapse a change LOG into SCD2 validity intervals: per key, rows
    * ordered by (time, tie) are deduplicated to VALUE CHANGES (a row
    * equal to the key's previous value tuple is a no-op), each change
    * opening an interval `[valid_from_ms, valid_to_ms)` closed by the
    * next change (`NULL` = still current, flagged `is_current`).
    * Value comparison is null-safe on the whole tuple (struct `<=>`),
    * so NULL→value and value→NULL are real changes and NULL→NULL is
    * not. `tieCol` (a unique id) makes equal-timestamp ordering
    * deterministic; two changes at one timestamp yield a zero-width
    * interval for the earlier — the log's own ambiguity, preserved
    * rather than hidden.
    *
    * Returns `(keys..., valueCols..., valid_from_ms, valid_to_ms,
    * is_current)`.
    *
    * 100 TB shape: ONE shuffle on the key — the change-detection lag,
    * the closing lead, and the output all share the same (key, time)
    * sort, which Catalyst plans as a single Exchange + Sort feeding
    * both Window operators.
    */
  def scd2FromLog(
      df: DataFrame,
      keys: Seq[String],
      tsMsCol: String,
      valueCols: Seq[String],
      tieCol: String): DataFrame = {
    require(keys.nonEmpty && valueCols.nonEmpty, "keys and valueCols required")
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsMsCol), col(tieCol))
    val tuple = struct(valueCols.map(col): _*)
    val changes = df
      .filter(col(tsMsCol).isNotNull &&
        keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__prev", lag(tuple, 1).over(w))
      .withColumn("__tie", col(tieCol))
      .filter(!(col("__prev") <=> tuple))
    val wc = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsMsCol), col("__tie"))
    changes
      .withColumn("valid_from_ms", col(tsMsCol).cast("long"))
      .withColumn("valid_to_ms", lead(col(tsMsCol).cast("long"), 1).over(wc))
      .withColumn("is_current", col("valid_to_ms").isNull)
      .select(keys.map(col) ++ valueCols.map(col) ++
        Seq(col("valid_from_ms"), col("valid_to_ms"), col("is_current")): _*)
  }

  /** Reconstruct the dimension snapshot as of `asOfMs` from an SCD2
    * table: the row per key whose interval covers the instant
    * (`valid_from ≤ t < valid_to`, open intervals extend to ∞). Keys
    * that first appear after `asOfMs` are absent — that IS the
    * point-in-time answer.
    *
    * 100 TB shape: a pushdown-friendly filter, no shuffle — and on a
    * table partitioned by `valid_to_ms IS NULL` (current vs closed),
    * most as-of-now reads touch one partition.
    */
  def snapshotAt(scd2: DataFrame, asOfMs: Long): DataFrame =
    scd2.filter(col("valid_from_ms") <= asOfMs &&
      (col("valid_to_ms").isNull || col("valid_to_ms") > asOfMs))
}
