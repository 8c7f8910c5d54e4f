package graft.engine

import graft.expr.SparkCompiler
import org.apache.spark.sql.{Column, DataFrame}

/** Physical Redis key derivation from a `key_expr`
  * (ref: python/feathub/processors/flink/table_builder/redis_utils.py:
  * 37-107). The expression is a normal DSL expression over the table's key
  * fields, with three keywords substituted BEFORE parsing:
  * `__NAMESPACE__` → the namespace string literal, `__KEYS__` → the
  * comma-joined key field names (so each key field becomes a column
  * reference), `__FEATURE_NAME__` → the feature-name string literal.
  */
object RedisKeys {

  val NamespaceKeyword = "__NAMESPACE__"
  val KeysKeyword = "__KEYS__"
  val FeatureNameKeyword = "__FEATURE_NAME__"
  val KeyColumnPrefix = "__KEY__"

  /** The compiled key column for one feature (redis_utils.py:91-101). */
  def physicalKeyColumn(
      keyExpr: String,
      namespace: String,
      keys: Seq[String],
      featureName: String): Column = {
    val substituted = keyExpr
      .replace(NamespaceKeyword, s"'${namespace.replace("'", "''")}'")
      .replace(KeysKeyword, keys.map(k => s"`$k`").mkString(", "))
      .replace(FeatureNameKeyword, s"'${featureName.replace("'", "''")}'")
    SparkCompiler.compile(substituted)
  }

  /** Append one `__KEY__<feature>` column per feature
    * (redis_utils.py:80-107).
    */
  def appendPhysicalKeyColumns(
      df: DataFrame,
      keyExpr: String,
      namespace: String,
      keys: Seq[String],
      featureNames: Seq[String]): (DataFrame, Seq[String]) = {
    val out = featureNames.foldLeft(df) { (d, f) =>
      d.withColumn(
        s"$KeyColumnPrefix$f",
        physicalKeyColumn(keyExpr, namespace, keys, f))
    }
    (out, featureNames.map(f => s"$KeyColumnPrefix$f"))
  }
}
