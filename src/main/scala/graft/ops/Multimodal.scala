package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns carried next to a typed
  * metadata struct; decode / feature-extraction steps run as partition-wise
  * batch functions (the Scala analogue of `mapInPandas`) so a real codec
  * library can be dropped in per-executor without changing the plan shape.
  *
  * The decode internals are STUBBED with deterministic fakes (no media codecs
  * ship in this environment); everything Spark-side — schema, batching,
  * partitioning, output shape — is real and tested. Swap `fakeDecode*` for a
  * JNI/FFI codec at deployment.
  *
  * Scale notes: payloads never pass through a shuffle unless the caller
  * repartitions; metadata-only predicates prune before any decode;
  * `spark.sql.files.maxPartitionBytes` governs scan granularity for large
  * binary files as usual.
  */
object Multimodal {

  /** Metadata struct carried with every media payload. */
  val MetaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a binary payload column with derived metadata. Width/height come
    * from the (stubbed) header sniff: two bytes of the payload's md5 —
    * deterministic, so tests and oracles can reproduce them.
    */
  def withMeta(df: DataFrame, binCol: String, mime: String): DataFrame = {
    val b = col(binCol)
    val hx: Int => Column = off =>
      (conv(substring(md5(b), off, 2), 16, 10).cast("int") % 240 + 16)
    df.withColumn("meta", struct(
      lit(mime).as("mime"),
      octet_length(b).cast("long").as("n_bytes"),
      hx(1).as("width"),
      hx(3).as("height")))
  }

  /** Deterministic fake image-embedding from raw bytes: feature `i` is
    * derived from the first 6 hex digits of md5(payload ++ "-i"), quantized
    * to the grid k/10000 with k ∈ [-10000, 10000] so every feature is
    * engine-reproducible (the md5 recipe is plain SQL for the oracle, and
    * the quantized value round-trips float→double→round(4) exactly).
    * Replace with a real model runtime.
    */
  private def fakeEmbed(payload: Array[Byte], dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      md.reset()
      md.update(payload)
      md.update(s"-$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = md.digest().take(3).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
      ((h % 20001L) - 10000L).toFloat / 10000.0f
    }.toArray
  }

  /** Partition-wise media feature extraction (the `mapInPandas` analogue):
    * for each row, decode the payload and emit a feature vector. Runs one
    * partition per task with an iterator — constant memory, no per-row JVM
    * call overhead beyond the codec itself.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      binCol: String,
      dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("features", ArrayType(FloatType))))
    val idIdx = df.schema.fieldIndex(idCol)
    val binIdx = df.schema.fieldIndex(binCol)
    df.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]](binIdx)
        Row(r.get(idIdx), if (payload == null) null else fakeEmbed(payload, dim).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling for "video" payloads: emit every `stride`-th fixed-size
    * chunk as (id, frame_idx, frame_bytes). The chunker is the stub — a real
    * demuxer plugs into the same explode shape. Pure column expressions, so
    * it stays inside whole-stage codegen.
    */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      binCol: String,
      frameBytes: Int,
      stride: Int): DataFrame = {
    val b = col(binCol)
    val nFrames = floor(octet_length(b) / frameBytes).cast("int")
    df.select(
        col(idCol).as("id"),
        posexplode(transform(
          sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
          i => b.substr((i * frameBytes + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_bytes")
  }
}
