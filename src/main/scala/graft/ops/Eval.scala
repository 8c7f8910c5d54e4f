package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Evaluation of binary scorers (quality classifiers, toxicity filters,
  * dedup verdicts) against labels, per slice — the gate before a
  * score-thresholded corpus filter ships: a classifier that AUCs 0.9
  * overall and 0.55 on one language is how a corpus silently loses that
  * language.
  */
object Eval {

  /** Per-group binary-classification report: confusion counts at
    * `threshold` (`score >= threshold` predicts positive) plus EXACT
    * ROC-AUC by the tie-aware rank-sum (Mann–Whitney) identity —
    * `(Σ avg-ranks of positives − n⁺(n⁺+1)/2) / (n⁺·n⁻)` with tied
    * scores taking their block's average rank, which is the textbook
    * AUC with trapezoidal tie credit, NOT an approximation.
    *
    * Returns `(groupCols..., n, n_pos, n_neg, tp, fp, fn, tn,
    * precision_micro, recall_micro, f1_micro, auc_micro)` — all ratios
    * integer-micro-floored (NULL on empty denominators, e.g. AUC of a
    * single-class group), so results hash across engines; rank sums are
    * doubled internally to stay integral under half-ranks and carried in
    * decimal(38,0), good to ~10¹⁵ rows per group.
    *
    * 100 TB shape: one map-side-combined aggregation to (group, score)
    * blocks, one window pass over the BLOCK table (distinct scores per
    * group, not rows), one final group rollup — the corpus itself is
    * touched once.
    */
  def binaryEval(
      df: DataFrame,
      groupCols: Seq[String],
      labelCol: String,
      scoreCol: String,
      threshold: Double): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    val gs: Seq[Column] = groupCols.map(col)
    val base = df.filter(col(labelCol).isNotNull && col(scoreCol).isNotNull &&
      groupCols.map(col(_).isNotNull).reduce(_ && _))
    val blocks = base
      .groupBy(gs :+ col(scoreCol).as("__s"): _*)
      .agg(count(lit(1)).as("c"),
        count(when(col(labelCol) === true, 1)).as("cp"))
    val wcum = Window.partitionBy(gs: _*).orderBy(col("__s"))
    val ranked = blocks
      .withColumn("cum", sum(col("c")).over(wcum) - col("c"))
      // block of c tied rows after cum smaller ones: avg rank = cum + (c+1)/2,
      // doubled to stay integral → positives contribute cp·(2·cum + c + 1)
      .withColumn("r2", col("cp") * (lit(2) * col("cum") + col("c") + 1))
    val thr = lit(threshold)
    val g = ranked.groupBy(gs: _*).agg(
      sum(col("c")).as("n"),
      sum(col("cp")).as("n_pos"),
      sum(when(col("__s") >= thr, col("cp"))).as("tp0"),
      sum(when(col("__s") >= thr, col("c") - col("cp"))).as("fp0"),
      sum(col("r2")).as("r2"))
    g.select(gs ++ Seq(
        col("n"), col("n_pos"), (col("n") - col("n_pos")).as("n_neg"),
        coalesce(col("tp0"), lit(0L)).as("tp"),
        coalesce(col("fp0"), lit(0L)).as("fp"),
        col("r2")): _*)
      .withColumn("fn", col("n_pos") - col("tp"))
      .withColumn("tn", col("n_neg") - col("fp"))
      .withColumn("precision_micro",
        expr("tp * 1000000L div nullif(tp + fp, 0)"))
      .withColumn("recall_micro",
        expr("tp * 1000000L div nullif(n_pos, 0)"))
      .withColumn("f1_micro",
        expr("2 * tp * 1000000L div nullif(2 * tp + fp + fn, 0)"))
      .withColumn("auc_micro",
        expr("""cast(r2 - n_pos * (n_pos + 1) as decimal(38, 0)) * 1000000
               div nullif(cast(2 as decimal(38, 0)) * n_pos * n_neg, 0)"""))
      .drop("r2")
  }
}
