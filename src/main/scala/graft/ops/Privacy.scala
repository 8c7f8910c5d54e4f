package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy QA for tables that leave the pipeline — re-identification
  * risk is a release gate, not an afterthought, and the checks are plain
  * aggregations a 100 TB table can afford.
  */
object Privacy {

  /** k-anonymity / l-diversity report per quasi-identifier equivalence
    * class: `(quasiCols..., n, n_distinct_sensitive, k_violation,
    * l_violation)` — a class violates k-anonymity when fewer than `k`
    * rows share its quasi-identifier combination (those rows are
    * re-identifiable by joining any external dataset carrying the same
    * attributes), and violates l-diversity when its sensitive values
    * collapse below `l` distinct (everyone in the class shares the
    * secret even if the class is large). NULL quasi values form their
    * own class (NULL is still an identifying signature).
    *
    * Publish-gate usage: require the violating-class row count to be 0
    * (or suppress/generalize those classes) before export.
    *
    * 100 TB shape: one groupBy on the quasi columns with an exact
    * count-distinct of the sensitive column (one expand shuffle) —
    * output is equivalence-class-sized. For a quick k-only scan pass
    * `sensitiveCol = None` and skip the distinct entirely.
    */
  def kAnonymity(
      df: DataFrame,
      quasiCols: Seq[String],
      k: Long,
      sensitiveCol: Option[String] = None,
      l: Long = 1L): DataFrame = {
    require(quasiCols.nonEmpty, "at least one quasi-identifier column")
    require(k >= 2, s"k $k must be >= 2")
    require(l >= 1, s"l $l must be >= 1")
    val base = df.groupBy(quasiCols.map(col): _*)
    val agged = sensitiveCol match {
      case Some(s) => base.agg(count(lit(1)).as("n"),
        countDistinct(col(s)).as("n_distinct_sensitive"))
      case None => base.agg(count(lit(1)).as("n"))
        .withColumn("n_distinct_sensitive", lit(null).cast("long"))
    }
    agged
      .withColumn("k_violation", col("n") < k)
      .withColumn("l_violation",
        sensitiveCol.map(_ => col("n_distinct_sensitive") < l)
          .getOrElse(lit(null).cast("boolean")))
  }
}
