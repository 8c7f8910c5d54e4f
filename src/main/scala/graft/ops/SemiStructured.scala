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
    // ONE parse per row: the payload projects to map<string,string> (Spark
    // renders scalar values as their literal text and nested values as
    // their raw JSON — the same strings get_json_object would return, at
    // 1/(keys+1) the parse cost; q178 measured 6.7s -> 4.0s at sf0.1,
    // cold session — the rest is payload construction, not parsing)
    // Par.spread: one from_json + rlike/try_cast battery per (row, key)
    // — spread an under-partitioned input (no-op on well-split scans)
    val keyed = graft.ops.Par.spread(df)
      .select(explode(from_json(col(jsonCol),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .as(Seq("key", "v")))
    keyed
      .groupBy("key")
      .agg(
        count(lit(1)).as("n_keys"),
        count(col("v")).as("n_present"),
        count(when(col("v").rlike("^-?[0-9]+$"), 1)).as("n_int_like"),
        count(when(expr("try_cast(v as double)").isNotNull, 1)).as("n_num_like"),
        count(when(col("v").isin("true", "false"), 1)).as("n_bool_like"))
      .crossJoin(total)
      .withColumn("share_micro", expr("cast(n_present as decimal(38,0)) * 1000000 div n_rows"))
  }

  /** Schema DRIFT between two snapshots of a JSON payload: profile each
    * side with [[jsonKeyProfile]], then diff — `added` / `removed` keys,
    * `type_changed` when the dominant inferred type flips (priority
    * bool > int > num > str on majority-of-present, the deterministic
    * ladder: every int is also num-like), `share_shifted` when a stable
    * key's presence share moves ≥ 100000 micro (10 points), else
    * `stable`. This is the alert that fires BEFORE a pipeline starts
    * silently writing NULLs because an upstream producer renamed or
    * re-typed a field. Returns `(key, status, old_type, new_type,
    * old_share_micro, new_share_micro)`.
    *
    * 100 TB shape: each profile is one explode + map-side-combined
    * groupBy(key) (vocabulary-sized output); the diff is a
    * full-outer join of two key-cardinality tables — driver-free and
    * corpus-free.
    */
  def schemaDrift(oldDf: DataFrame, newDf: DataFrame, jsonCol: String): DataFrame = {
    def dom(df: DataFrame, side: String): DataFrame =
      jsonKeyProfile(df, jsonCol)
        .withColumn(s"${side}_type",
          when(col("n_present") === 0, lit("null"))
            .when(col("n_bool_like") * 2 > col("n_present"), lit("bool"))
            .when(col("n_int_like") * 2 > col("n_present"), lit("int"))
            .when(col("n_num_like") * 2 > col("n_present"), lit("num"))
            .otherwise(lit("str")))
        .select(col("key"), col(s"${side}_type"),
          col("share_micro").as(s"${side}_share_micro"))
    dom(oldDf, "old").join(dom(newDf, "new"), Seq("key"), "full_outer")
      .withColumn("status",
        when(col("old_type").isNull, lit("added"))
          .when(col("new_type").isNull, lit("removed"))
          .when(col("old_type") =!= col("new_type"), lit("type_changed"))
          .when(abs(col("new_share_micro") - col("old_share_micro")) >= 100000,
            lit("share_shifted"))
          .otherwise(lit("stable")))
      .select("key", "status", "old_type", "new_type",
        "old_share_micro", "new_share_micro")
  }
}
