package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Profiling for semi-structured (JSON-string) columns — the first step
  * of promoting a raw `props`-style payload into typed feature columns:
  * discover WHICH keys exist, how often, and what they look like, before
  * declaring an extraction schema.
  */
object SemiStructured {

  /** Per-key profile of a JSON-object column: for every key that occurs
    * anywhere in the corpus, `(key, n_keys, n_present, n_int_like,
    * n_num_like, n_bool_like, n_rows, share_micro)` where `n_keys`
    * counts rows carrying the key at all (JSON `null` included),
    * `n_present` counts non-null extracted values, and the `_like`
    * columns classify the EXTRACTED TEXT (`^-?[0-9]+$` integers,
    * double-castable numerics, `true`/`false` booleans). Extraction
    * stringifies scalars, so `5` and `"5"` both count as int-like — this
    * is a promotion-planning signal, not a JSON type system; declare the
    * target type from these votes and extract with try_cast semantics.
    *
    * Rows whose payload is NULL or not a JSON object contribute to
    * `n_rows` only (`json_object_keys` yields NULL → no key rows).
    *
    * 100 TB shape: one explode over per-row key lists (bounded by
    * payload size) into ONE map-side-combined groupBy(key); the total
    * row count rides in as a one-row cross join. Output is
    * vocabulary-sized (distinct keys), never row-sized.
    */
  def jsonKeyProfile(df: DataFrame, jsonCol: String): DataFrame = {
    val total = df.agg(count(lit(1)).as("n_rows"))
    val keyed = df
      .select(col(jsonCol).as("__j"),
        explode(expr(s"json_object_keys(`$jsonCol`)")).as("key"))
      .withColumn("v", expr("get_json_object(__j, concat('$.', key))"))
    keyed
      .groupBy("key")
      .agg(
        count(lit(1)).as("n_keys"),
        count(col("v")).as("n_present"),
        count(when(col("v").rlike("^-?[0-9]+$"), 1)).as("n_int_like"),
        count(when(expr("try_cast(v as double)").isNotNull, 1)).as("n_num_like"),
        count(when(col("v").isin("true", "false"), 1)).as("n_bool_like"))
      .crossJoin(total)
      .withColumn("share_micro", expr("n_present * 1000000L div n_rows"))
  }
}
