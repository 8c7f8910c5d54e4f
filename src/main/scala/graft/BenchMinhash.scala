package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cold-JVM A/B harness for the minhash hash-family choice in
  * [[graft.ops.Dedup.minhashSignatures]]: run each variant in its OWN JVM
  * (`tools/run.sh graft.BenchMinhash window` / `... rotation`) so neither
  * run is subsidized by the other's shuffle files, codegen cache, or any
  * cached plan — the isolation lesson from the round-5 q22 swing, where a
  * leaked persist made the then-current number 13x too good.
  *
  * Both variants share everything except the signature aggregate:
  *  - window:   mh_i = min(substring(md5(shingle), i+1, 15))   (production)
  *  - rotation: mh_i = min(rotate-left-by-i of the 32-hex md5) (classic)
  * and both run the full q22 pair pipeline (bands, skew cap, bucket-local
  * self-join, distinct) to candidate-pair count, timed after an untimed
  * JVM warmup query.
  */
object BenchMinhash {
  private val NumHashes = 16
  private val Bands = 4

  private def rotationSignatures(shingles: DataFrame): DataFrame = {
    val withH = shingles.withColumn("__h", md5(col("shingle")))
    val aggs = (0 until NumHashes).map { i =>
      val rot =
        if (i == 0) col("__h")
        else concat(substring(col("__h"), i + 1, 32 - i), substring(col("__h"), 1, i))
      min(rot).as(s"mh_$i")
    }
    withH.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
  }

  def main(args: Array[String]): Unit = {
    val variant = args.headOption.getOrElse("window")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.local.dir", SparkEnv.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup, untimed
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // shared LSH tail (bands, skew cap, bucket-local self-join, distinct)
    def lshTail(sigs: DataFrame): DataFrame = {
      val bb = graft.ops.Dedup.lshBands(sigs, NumHashes, Bands).localCheckpoint(true)
      val hot = bb.groupBy(col("band"), col("bucket")).agg(count(lit(1)).as("n"))
        .filter(col("n") > 10000L).select(col("band"), col("bucket"))
      val capped = bb.join(broadcast(hot), Seq("band", "bucket"), "left_anti")
      capped.as("a").join(capped.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
            col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    }

    def pairs(): DataFrame = variant match {
      case "window" =>
        graft.ops.Dedup.minhashLshPairs(docs, "doc_id", "text",
          shingleLen = 3, numHashes = NumHashes, bands = Bands)
      case "aggsig" =>
        // the pre-round-6 production plan: exploded shingle table +
        // signature groupBy, vs "window"'s map-side per-row fold
        lshTail(graft.ops.Dedup.minhashSignatures(
          graft.ops.Dedup.wordShinglesRaw(docs, "doc_id", "text", 3), NumHashes))
      case "rotation" =>
        // raw (non-distinct) shingles, same shape as aggsig, so the A/B
        // isolates the hash family alone
        lshTail(rotationSignatures(
          graft.ops.Dedup.wordShinglesRaw(docs, "doc_id", "text", 3)))
      case other => sys.error(s"unknown variant $other (window|aggsig|rotation)")
    }

    val times = (1 to 3).map { _ =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = pairs().count()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[ab] $variant pairs=$n $dt%.2fs")
      dt
    }
    println(f"""{"variant":"$variant","min_sec":${times.min}%.3f,"runs":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
