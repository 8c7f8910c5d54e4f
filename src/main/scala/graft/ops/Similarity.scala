package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Scale design: the query set is broadcast (it is small by definition); the
  * corpus is never collected. Brute force is the exactness baseline; the
  * sign-random-projection (SRP) bucket path is the 100 TB route — candidates
  * shuffle on a derived bucket key, so cost is Σ|bucket|·|bucket queries|
  * instead of |corpus|·|queries|. An IVF variant is the same shape with
  * k-means centroids as the bucketer.
  *
  * All arithmetic is double-precision sequential fold (functions.aggregate),
  * and scores are rounded to 6 dp before ranking so results are reproducible
  * across engines.
  */
object Similarity {

  /** Dot product of two numeric arrays as a sequential double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign-random-projection bucket: `planes` bits, one per pseudo-random
    * hyperplane. Plane weights are ±1 derived from md5 hex-digit parity of
    * (plane, dim) — deterministic, engine-portable, no stored model. Bit j =
    * 1 iff Σ_i w(j,i)·v_i > 0.
    */
  def srpBucket(vec: Column, planes: Int): Column = {
    val bits = (0 until planes).map { j =>
      val weighted = zip_with(
        vec,
        sequence(lit(0), size(vec) - 1),
        (x, i) => {
          val parity =
            (instr(lit("0123456789abcdef"),
              substring(md5(concat(lit(s"p$j-"), i.cast("string"))), 1, 1)) - 1) % 2
          when(parity === 0, x.cast("double")).otherwise(-x.cast("double"))
        })
      val s = aggregate(weighted, lit(0.0), (acc, x) => acc + x)
      when(s > 0, "1").otherwise("0")
    }
    concat(bits: _*)
  }

  /** Exact top-k cosine neighbors per query row (brute force): ranks the
    * full corpus per query by (rounded score desc, corpus id asc). The query
    * side is broadcast; ranking is a window partitioned by query id, which
    * AQE splits per query key.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      k: Int): DataFrame = {
    val scored = corpus
      .select(col(corpusId).as("nbr_id"), col(corpusVec).as("cv"))
      .join(broadcast(
        queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))),
        col("nbr_id") =!= col("query_id"))
      .withColumn("score", round(cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("score"))
  }

  /** Approximate top-k: rank only within the query's SRP bucket. Recall
    * improves with fewer planes (bigger buckets) or multi-probe; exactness
    * is [[bruteForceTopK]]. One shuffle on the bucket key.
    */
  def lshTopK(
      corpus: DataFrame,
      queries: DataFrame,
      corpusId: String,
      corpusVec: String,
      queryId: String,
      queryVec: String,
      k: Int,
      planes: Int = 8): DataFrame = {
    val c = corpus.select(
      col(corpusId).as("nbr_id"), col(corpusVec).as("cv"),
      srpBucket(col(corpusVec), planes).as("bk"))
    val q = queries.select(
      col(queryId).as("query_id"), col(queryVec).as("qv"),
      srpBucket(col(queryVec), planes).as("bk"))
    val scored = c.join(broadcast(q), Seq("bk"))
      .filter(col("nbr_id") =!= col("query_id"))
      .withColumn("score", round(cosine(col("cv"), col("qv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nbr_id"), col("score"))
  }
}
