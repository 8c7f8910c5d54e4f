package graft.ops

import org.apache.spark.sql.DataFrame

/** Input-parallelism guard for CPU-dense per-row pipelines (round 15;
  * guide §2.5 "input skew — one huge unsplittable file … repartition
  * immediately after the read", and the pattern
  * [[Eval.permutationTestMeansBySegment]] already uses).
  *
  * A tokenizer/hash pipeline's map stage inherits the SCAN's partition
  * count: a corpus that arrives as a handful of parquet row groups (or one
  * gzip file) runs its entire shingle/md5/signature work on that many
  * cores, no matter how wide the cluster is. When — and only when — the
  * input has fewer partitions than the cluster's parallelism, one
  * round-robin exchange of the raw rows buys a full-width map stage; at
  * production scale scans already carry ≥ parallelism splits and this is
  * an exact no-op (the plan is untouched — no exchange is inserted).
  * Row order is irrelevant to every consumer (aggregations, joins,
  * per-row signatures), so results are unchanged.
  */
private[graft] object Par {
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < par) df.repartition(par) else df
  }
}
