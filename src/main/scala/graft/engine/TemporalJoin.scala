package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) left join: for each left row at event time t, the
  * right row with the largest right time ≤ t matching the keys; no match →
  * NULL (ref semantics: python/feathub/processors/local/
  * local_processor.py:453-523; Spark recipe at processors/spark/
  * dataframe_builder/join_utils.py:72-110).
  *
  * The reference implements this as `left JOIN right ON keys AND l.t >= r.t`
  * followed by a row_number dedup — which materializes (left × right-version)
  * rows before pruning and blows up when keys have many versions. At 100 TB
  * that intermediate is the bottleneck, so we instead use the classic
  * union + running-last-value formulation: one shuffle on the keys, one sort,
  * no intermediate explosion, and it survives arbitrary version counts.
  *
  * Ties: among right rows sharing (keys, time) the reference's row_number
  * order is nondeterministic; we deterministically keep the lexicographically
  * greatest value tuple.
  */
object TemporalJoin {

  /** @param valueCols (rightColumnName, outputColumnName) pairs appended to left. */
  def pointInTime(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      valueCols: Seq[(String, String)]): DataFrame = {
    require(keys.nonEmpty, "point-in-time join requires keys")
    val t = EventTime.Col

    // Join-key equality never matches on NULL (the reference compiles to an
    // equi-join; SQL `=` is null-rejecting). The window formulation below
    // would otherwise co-partition NULL-keyed left and right rows and match
    // them, so NULL-keyed right versions are dropped up front; NULL-keyed
    // left rows pass through with NULL joined values.
    val rightNonNull = right.filter(keys.map(col(_).isNotNull).reduce(_ && _))

    // Duplicate (keys, time) right versions resolve to max(struct) — the
    // deterministic latest-version rule. This used to be a groupBy (a full
    // extra shuffle of the right side); instead __rvals now participates
    // in the window sort below, so among equal-(keys, t) right rows the
    // running `last` lands on the max struct — same semantics, one less
    // exchange (the right side is shuffled once, by the window itself).
    val packed = rightNonNull
      .select(struct(valueCols.map { case (c, _) => col(c) }: _*).as("__rvals") +:
        (keys :+ t).map(col): _*)
    val rvalsType = packed.schema("__rvals").dataType

    val leftCols = left.columns.toSeq
    val leftTagged = left
      .withColumn("__is_left", lit(1))
      .withColumn("__rvals", lit(null).cast(rvalsType))
    val rightTagged = packed
      .withColumn("__is_left", lit(0))
    // Align schemas: right side carries nulls for left-only columns.
    val allCols = (leftCols ++ Seq("__is_left", "__rvals")).distinct
    val rightAligned = allCols.foldLeft(rightTagged) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(allCols.map(col): _*)
    val unioned = leftTagged.select(allCols.map(col): _*).unionByName(rightAligned)

    // Right rows sort before left rows at equal time so a right version at
    // exactly t is visible to a left row at t (right_time <= left_time);
    // __rvals asc last so the max-struct version of duplicate (keys, t)
    // right rows is the one the running `last` retains.
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(t).asc, col("__is_left").asc, col("__rvals").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("__pit", last(col("__rvals"), ignoreNulls = true).over(w))
      .filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++ valueCols.map { case (c, out) =>
        col(s"__pit.$c").as(out)
      }: _*)
  }

  /** Join expiry: a joined value older than `validMillis` relative to the
    * left time reverts to `default`
    * (ref: python/feathub/processors/flink/table_builder/
    * join_utils.py:293-326 "valid time interval").
    */
  def withExpiry(
      joined: DataFrame,
      rightTimeCol: String,
      valueCol: String,
      validMillis: Long,
      default: org.apache.spark.sql.Column): DataFrame =
    joined.withColumn(
      valueCol,
      when(col(EventTime.Col) < col(rightTimeCol) + lit(validMillis), col(valueCol))
        .otherwise(default))

  /** Key-filter: restrict to rows whose key fields appear in `keysDf`
    * (ref: python/feathub/processors/spark/
    * spark_dataframe_builder.py:136-148). Small key sets broadcast.
    */
  def filterByKeys(df: DataFrame, keysDf: DataFrame): DataFrame = {
    val missing = keysDf.columns.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"Given key ${missing.mkString(", ")} not in the fields: " +
        df.columns.mkString(", ")) // ref: spark_dataframe_builder.py:142-148
    df.join(broadcast(keysDf.dropDuplicates()), keysDf.columns.toSeq, "left_semi")
  }
}
