package graft.engine

import graft.table.{DataGenSource, FileSource, HiveSource, KafkaSource, RandomField, SequenceField}
import graft.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical sources (ref: python/feathub/processors/spark/
  * dataframe_builder/source_sink_utils.py:41-71 and
  * feature_tables/sources/datagen_source.py).
  */
object Sources {

  def read(spark: SparkSession, s: FileSource): DataFrame = {
    if (!s.isBounded) return readStream(spark, s)
    val reader = spark.read.format(s.format)
    val withHeader =
      if (s.format == "csv") reader.option("header", "true") else reader
    val withSchema = s.schema match {
      case Some(sc) => withHeader.schema(sc.toSpark)
      case None =>
        if (s.format == "csv") withHeader.option("inferSchema", "true")
        else withHeader
    }
    val df = withSchema.load(s.path)
    EventTime.append(df, s.timestampField, s.timestampFormat)
  }

  /** Unbounded scan via Structured Streaming; Spark's streaming file source
    * requires an explicit schema (no inference on a moving directory).
    */
  private def readStream(spark: SparkSession, s: FileSource): DataFrame = {
    val schema = s.schema.getOrElse(throw new IllegalArgumentException(
      s"streaming FileSource ${s.name} requires an explicit schema"))
    val reader = spark.readStream.format(s.format).schema(schema.toSpark)
    val df = (if (s.format == "csv") reader.option("header", "true") else reader).load(s.path)
    EventTime.append(df, s.timestampField, s.timestampFormat)
  }

  /** Catalog table scan (ref: feature_tables/sources/hive_source.py:47-140).
    * The session catalog already speaks to the metastore, so this is a
    * plain `spark.table` — partition pruning and column pruning on the
    * underlying Hive/parquet layout come from Catalyst as usual. A declared
    * schema projects and casts to exactly those columns.
    */
  def readHive(spark: SparkSession, s: HiveSource): DataFrame = {
    val df = spark.table(s"${s.database}.${s.table}")
    val projected = s.schema match {
      case Some(sc) =>
        df.select(sc.fieldNames.zip(sc.fieldTypes).map {
          case (n, t) => col(n).cast(t.toSpark).as(n)
        }: _*)
      case None => df
    }
    EventTime.append(projected, s.timestampField, s.timestampFormat)
  }

  /** Kafka scan: JSON values decoded with the declared schema
    * (ref: python/feathub/feature_tables/sources/kafka_source.py:25-131 —
    * startup_mode ∈ earliest-offset/latest-offset/timestamp). Bounded mode
    * uses Spark's batch Kafka reader, which the reference had to hand-build
    * for Flink (BoundedKafkaDynamicSource.java).
    */
  def readKafka(spark: SparkSession, s: KafkaSource): DataFrame = {
    val opts = Map(
      "kafka.bootstrap.servers" -> s.bootstrapServer,
      "subscribe" -> s.topic) ++ (s.startupMode match {
      case "earliest-offset" => Map("startingOffsets" -> "earliest")
      case "latest-offset"   => Map("startingOffsets" -> "latest")
      case "timestamp" => Map("startingTimestamp" ->
        s.startupTimestampMillis.getOrElse(throw new IllegalArgumentException(
          "startupMode=timestamp requires startupTimestampMillis")).toString)
      case other => throw new IllegalArgumentException(s"Unknown startup mode $other")
    })
    val raw =
      if (s.isBounded) spark.read.format("kafka").options(opts).load()
      else spark.readStream.format("kafka").options(opts).load()
    decodeKafkaRecords(raw, s)
  }

  /** Decode Kafka-shaped records (binary `value` column) into the declared
    * schema per the source's `valueFormat` — split out so the decode
    * contract is testable without a broker; it is the exact inverse of
    * [[toKafkaRecords]] for each format.
    *
    * json/csv decode relationally (`from_json`/`from_csv` — codegen'd, no
    * UDF); `raw` maps the bare payload onto a single declared column;
    * `protobuf` crosses the codec boundary via mapPartitions (the
    * [[Multimodal]]-style pattern: one JVM call per row, schema-typed Row
    * output, no Python round-trip).
    */
  def decodeKafkaRecords(raw: DataFrame, s: KafkaSource): DataFrame = {
    val parsed = s.valueFormat match {
      case "json" =>
        raw.select(from_json(col("value").cast("string"), s.schema.toSpark).as("__v"))
          .select(col("__v.*"))
      case "csv" =>
        raw.select(from_csv(col("value").cast("string"), s.schema.toSpark,
            Map.empty[String, String]).as("__v"))
          .select(col("__v.*"))
      case "raw" =>
        // the reference's raw format: the whole payload is one field
        require(s.schema.fieldNames.size == 1,
          "raw format requires a single-column schema")
        val n = s.schema.fieldNames.head
        raw.select(s.schema.fieldTypes.head match {
          case graft.types.DBytes => col("value").cast("binary").as(n)
          case t => col("value").cast("string").cast(t.toSpark).as(n)
        })
      case "protobuf" =>
        import org.apache.spark.sql.{Encoders, Row}
        val types = s.schema.fieldTypes
        val nums = ProtoFormat.fieldNumbers(s.schema.fieldNames, s.valueFormatProps)
        val lenient = ProtoFormat.ignoreParseError(s.valueFormatProps)
        val outSchema = s.schema.toSpark
        val nFields = types.size
        raw.select(col("value").cast("binary").as("value"))
          .mapPartitions { it =>
            it.map { r =>
              val bytes = r.getAs[Array[Byte]](0)
              try Row.fromSeq(ProtoFormat.decode(bytes, types, nums).toSeq)
              catch {
                case e: Exception if lenient =>
                  Row.fromSeq(Seq.fill(nFields)(null)) // reference: null out bad rows
                case e: Exception =>
                  throw new IllegalArgumentException(
                    s"protobuf decode failed for ${s.name}", e)
              }
            }
          }(Encoders.row(outSchema))
      case other => throw new IllegalArgumentException(
        s"Unknown Kafka value format '$other' (json/csv/raw/protobuf)")
    }
    EventTime.append(parsed, s.timestampField, s.timestampFormat)
  }

  /** JDBC scan (ref: python/feathub/feature_tables/sources/
    * mysql_source.py:22-61 — Spark's jdbc reader replaces the reference's
    * custom connector).
    */
  def readJdbc(spark: SparkSession, s: graft.table.JdbcSource): DataFrame = {
    val df = spark.read.format("jdbc")
      .option("url", s.url)
      .option("dbtable", s.table)
      .option("user", s.user)
      .option("password", s.password)
      .load()
    EventTime.append(df, s.timestampField, s.timestampFormat)
  }

  /** Batch snapshot of an in-process online-store table — the read-back
    * path of MemoryStoreSink (ref: python/feathub/feature_tables/sources/
    * memory_store_source.py:24-40). Schema inferred from stored values.
    */
  def fromMemoryStore(spark: SparkSession, s: graft.table.MemoryStoreSource): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = graft.client.MemoryOnlineStore.snapshotRows(s.tableName)
    require(rows.nonEmpty, s"online store table ${s.tableName} is empty or unknown")
    val columns = rows.head.keys.toSeq.sorted
    def typeOf(v: Any): DataType = v match {
      case _: java.lang.Long | _: Long       => LongType
      case _: java.lang.Integer | _: Int     => IntegerType
      case _: java.lang.Double | _: Double   => DoubleType
      case _: java.lang.Float | _: Float     => FloatType
      case _: java.lang.Boolean | _: Boolean => BooleanType
      case _: java.sql.Timestamp             => TimestampType
      case _: java.time.Instant              => TimestampType
      case _                                 => StringType
    }
    val schema = StructType(columns.map { c =>
      val sample = rows.iterator.map(_.getOrElse(c, null)).find(_ != null).orNull
      StructField(c, typeOf(sample), nullable = true)
    })
    val data = rows.map(m => Row.fromSeq(columns.map(c => m.getOrElse(c, null))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toList), schema)
  }

  /** Kafka write shape: key = joined key columns, value = the row encoded
    * per `valueFormat` (json default; csv via to_csv; protobuf via the
    * proto3 wire codec, field numbers from schema order or
    * `protobuf.field_numbers`).
    */
  def toKafkaRecords(
      df: DataFrame,
      keys: Seq[String],
      valueFormat: String = "json",
      valueFormatProps: Map[String, String] = Map.empty): DataFrame = {
    val keyCol =
      if (keys.nonEmpty) concat_ws("|", keys.map(k => col(k).cast("string")): _*)
      else lit(null).cast("string")
    val allCols = df.columns.toIndexedSeq
    valueFormat match {
      case "json" =>
        df.select(keyCol.as("key"), to_json(struct(allCols.map(col): _*)).as("value"))
      case "csv" =>
        df.select(keyCol.as("key"), to_csv(struct(allCols.map(col): _*)).as("value"))
      case "raw" =>
        require(allCols.size == 1, "raw format requires a single-column frame")
        df.select(keyCol.as("key"), col(allCols.head).cast("string").as("value"))
      case "protobuf" =>
        import org.apache.spark.sql.{Encoders, Row}
        import org.apache.spark.sql.types._
        val types = df.schema.fields.toSeq.map(f => graft.types.DType.fromSpark(f.dataType))
        val nums = ProtoFormat.fieldNumbers(allCols, valueFormatProps)
        val keyIdx = allCols.size // key column appended last, see below
        val outSchema = StructType(Seq(
          StructField("key", StringType, nullable = true),
          StructField("value", BinaryType, nullable = false)))
        df.withColumn("__key", keyCol)
          .mapPartitions { it =>
            it.map { r =>
              val vals = (0 until keyIdx).map(r.get)
              Row(r.getString(keyIdx), ProtoFormat.encode(vals, types, nums))
            }
          }(Encoders.row(outSchema))
      case other => throw new IllegalArgumentException(
        s"Unknown Kafka value format '$other' (json/csv/raw/protobuf)")
    }
  }

  /** Deterministic data generator: sequence fields count from `start`;
    * random fields derive from a seeded hash of (seed, row id, field name)
    * so results are reproducible regardless of parallelism — unlike
    * `rand()`, whose output depends on partitioning
    * (ref behavior: python/feathub/processors/spark/dataframe_builder/
    * datagen_utils.py:36-169 uses deterministic per-field seeds).
    */
  def generate(spark: SparkSession, s: DataGenSource): DataFrame = {
    val base = spark.range(s.numberOfRows)
    val cols = s.fields.map {
      case SequenceField(name, dtype, start, _) =>
        (lit(start) + col("id")).cast(dtype.toSpark).as(name)
      case RandomField(name, dtype, minimum, maximum, length) =>
        // xxhash64 → uniform in [0,1) → scaled; strings from hex digest.
        val h = xxhash64(lit(s.seed), col("id"), lit(name))
        val u = (pmod(h, lit(1000000007L)).cast("double") / lit(1000000007.0))
        dtype match {
          case DString =>
            substring(md5(concat_ws("-", lit(s.seed), col("id"), lit(name))), 1, length).as(name)
          case DBool => (pmod(h, lit(2)) === 0).as(name)
          case DTimestamp =>
            timestamp_millis((lit(minimum) + u * (lit(maximum) - lit(minimum))).cast("bigint")).as(name)
          case _ =>
            (lit(minimum) + u * (lit(maximum) - lit(minimum))).cast(dtype.toSpark).as(name)
        }
    }
    val df = base.select(cols: _*)
    EventTime.append(df, s.timestampField, s.timestampFormat)
  }
}
