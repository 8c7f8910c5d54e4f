package graft.table

import graft.types._
import org.json4s._
import org.json4s.JsonDSL._
import org.json4s.jackson.JsonMethods

import scala.concurrent.duration._

/** JSON round-tripping for the descriptor IR — the registry serialization
  * contract (ref: python/feathub/table/table_descriptor.py:101 `to_json`/
  * `from_json` throughout; the reference's test registry round-trips every
  * descriptor, tests/feathub_it_test_base.py:55-95).
  *
  * [[UdfTransform]] and [[DataFrameSource]] carry live JVM objects and are
  * deliberately not serializable (the reference pickles Python callables;
  * a JVM function has no portable form) — attempting to serialize them
  * raises, matching a registry that only stores declarative descriptors.
  */
object Json {

  // ------------------------------------------------------------- write

  private def dtypeJson(t: DType): JValue = t match {
    case DVector(e)  => ("type" -> "vector") ~ ("elem" -> dtypeJson(e))
    case DMap(k, v)  => ("type" -> "map") ~ ("key" -> dtypeJson(k)) ~ ("value" -> dtypeJson(v))
    case DUnknown    => JString("unknown")
    case DBytes      => JString("bytes")
    case DString     => JString("string")
    case DBool       => JString("bool")
    case DInt32      => JString("int32")
    case DInt64      => JString("int64")
    case DFloat32    => JString("float32")
    case DFloat64    => JString("float64")
    case DTimestamp  => JString("timestamp")
  }

  private def schemaJson(s: Schema): JValue =
    JArray(s.fieldNames.zip(s.fieldTypes).map { case (n, t) =>
      ("name" -> n) ~ ("dtype" -> dtypeJson(t)): JValue
    }.toList)

  private def durJson(d: Duration): JValue = JLong(d.toMillis)

  private def transformJson(t: Transformation): JValue = t match {
    case ExpressionTransform(e) =>
      ("kind" -> "expression") ~ ("expr" -> e)
    case JoinTransform(table, expr) =>
      ("kind" -> "join") ~ ("table" -> table) ~ ("expr" -> expr)
    case OverWindowTransform(expr, agg, win, keys, filter, limit) =>
      ("kind" -> "over_window") ~ ("expr" -> expr) ~ ("agg" -> agg.name) ~
        ("window_ms" -> win.map(_.toMillis)) ~ ("keys" -> keys) ~
        ("filter" -> filter) ~ ("limit" -> limit)
    case SlidingWindowTransform(expr, agg, win, step, keys, filter, limit) =>
      ("kind" -> "sliding_window") ~ ("expr" -> expr) ~ ("agg" -> agg.name) ~
        ("window_ms" -> win.toMillis) ~ ("step_ms" -> step.toMillis) ~
        ("keys" -> keys) ~ ("filter" -> filter) ~ ("limit" -> limit)
    case _: UdfTransform =>
      throw new IllegalArgumentException(
        "UdfTransform carries a JVM function and cannot be serialized to JSON")
  }

  private def metricJson(m: Metric): JValue = m match {
    case Metric.Count(fe, w) =>
      ("type" -> "count") ~ ("filter" -> fe) ~ ("window_ms" -> durJson(w))
    case Metric.Ratio(fe, w) =>
      ("type" -> "ratio") ~ ("filter" -> fe) ~ ("window_ms" -> durJson(w))
    case Metric.Average(fe, w) =>
      ("type" -> "average") ~ ("filter" -> fe) ~ ("window_ms" -> durJson(w))
    case Metric.CountMap(fe, w) =>
      ("type" -> "count_map") ~ ("filter" -> fe) ~ ("window_ms" -> durJson(w))
  }

  private def metricFrom(j: JValue): Metric = str(j, "type") match {
    case "count"     => Metric.Count(strOpt(j, "filter"), durF(j, "window_ms"))
    case "ratio"     => Metric.Ratio(str(j, "filter"), durF(j, "window_ms"))
    case "average"   => Metric.Average(strOpt(j, "filter"), durF(j, "window_ms"))
    case "count_map" => Metric.CountMap(strOpt(j, "filter"), durF(j, "window_ms"))
    case other => throw new IllegalArgumentException(s"unknown metric type $other")
  }

  private def featureJson(f: Feature): JValue =
    ("name" -> f.name) ~ ("transform" -> transformJson(f.transform)) ~
      ("dtype" -> f.dtype.map(dtypeJson)) ~ ("keys" -> f.keys) ~
      ("metrics" -> (if (f.metrics.isEmpty) JNothing: JValue
                     else JArray(f.metrics.toList.map(metricJson))))

  def toJValue(d: TableDescriptor): JValue = d match {
    case s: FileSource =>
      ("kind" -> "file_source") ~ ("name" -> s.name) ~ ("path" -> s.path) ~
        ("format" -> s.format) ~ ("schema" -> s.schema.map(schemaJson)) ~
        ("keys" -> s.keys) ~ ("ts_field" -> s.timestampField) ~
        ("ts_format" -> s.timestampFormat) ~
        ("max_ooo_ms" -> durJson(s.maxOutOfOrderness)) ~
        ("bounded" -> s.isBounded)
    case s: DataGenSource =>
      ("kind" -> "datagen_source") ~ ("name" -> s.name) ~
        ("rows" -> s.numberOfRows) ~ ("seed" -> s.seed) ~
        ("fields" -> JArray(s.fields.map {
          case RandomField(n, t, mn, mx, len, mp) =>
            ("gen" -> "random") ~ ("name" -> n) ~ ("dtype" -> dtypeJson(t)) ~
              ("min" -> mn) ~ ("max" -> mx) ~ ("length" -> len) ~
              ("max_past_ms" -> durJson(mp)): JValue
          case SequenceField(n, t, st, en) =>
            ("gen" -> "sequence") ~ ("name" -> n) ~ ("dtype" -> dtypeJson(t)) ~
              ("start" -> st) ~ ("end" -> en): JValue
        }.toList)) ~
        ("keys" -> s.keys) ~ ("ts_field" -> s.timestampField) ~
        ("ts_format" -> s.timestampFormat) ~
        ("rows_per_second" -> s.rowsPerSecond) ~
        ("unbounded" -> s.unbounded)
    case s: KafkaSource =>
      ("kind" -> "kafka_source") ~ ("name" -> s.name) ~
        ("bootstrap" -> s.bootstrapServer) ~ ("topic" -> s.topic) ~
        ("schema" -> schemaJson(s.schema)) ~ ("keys" -> s.keys) ~
        ("ts_field" -> s.timestampField) ~ ("ts_format" -> s.timestampFormat) ~
        ("startup_mode" -> s.startupMode) ~
        ("startup_ts" -> s.startupTimestampMillis) ~
        ("max_ooo_ms" -> durJson(s.maxOutOfOrderness)) ~
        ("bounded" -> s.isBounded) ~
        ("value_format" -> s.valueFormat) ~
        ("value_format_props" -> s.valueFormatProps) ~
        ("key_format" -> s.keyFormat) ~
        ("key_format_props" -> s.keyFormatProps) ~
        ("consumer_group" -> s.consumerGroup) ~
        ("consumer_props" -> s.consumerProps) ~
        ("partition_discovery_interval_ms" -> s.partitionDiscoveryIntervalMs)
    case s: JdbcSource =>
      ("kind" -> "jdbc_source") ~ ("name" -> s.name) ~ ("url" -> s.url) ~
        ("table" -> s.table) ~ ("user" -> s.user) ~ ("password" -> s.password) ~
        ("keys" -> s.keys) ~ ("ts_field" -> s.timestampField) ~
        ("ts_format" -> s.timestampFormat)
    case s: MemoryStoreSource =>
      ("kind" -> "memory_store_source") ~ ("name" -> s.name) ~
        ("table" -> s.tableName) ~ ("keys" -> s.keys)
    case s: HiveSource =>
      ("kind" -> "hive_source") ~ ("name" -> s.name) ~
        ("database" -> s.database) ~ ("table" -> s.table) ~
        ("schema" -> s.schema.map(schemaJson)) ~ ("keys" -> s.keys) ~
        ("ts_field" -> s.timestampField) ~ ("ts_format" -> s.timestampFormat)
    case s: RedisSource =>
      ("kind" -> "redis_source") ~ ("name" -> s.name) ~
        ("schema" -> schemaJson(s.schema)) ~ ("keys" -> s.keys) ~
        ("host" -> s.host) ~ ("port" -> s.port) ~ ("mode" -> s.mode) ~
        ("username" -> s.username) ~ ("password" -> s.password) ~
        ("db_num" -> s.dbNum) ~ ("namespace" -> s.namespace) ~
        ("ts_field" -> s.timestampField) ~ ("key_expr" -> s.keyExpr)
    case v: DerivedFeatureView =>
      ("kind" -> "derived_view") ~ ("name" -> v.name) ~
        ("source" -> toJValue(v.source)) ~
        ("features" -> JArray(v.features.map(featureJson).toList)) ~
        ("keep_source_fields" -> v.keepSourceFields) ~
        ("filter" -> v.filterExpr) ~ ("keys" -> v.keys) ~
        ("keep_source_metrics" -> v.keepSourceMetrics)
    case v: SlidingFeatureView =>
      ("kind" -> "sliding_view") ~ ("name" -> v.name) ~
        ("source" -> toJValue(v.source)) ~
        ("features" -> JArray(v.features.map(featureJson).toList)) ~
        ("filter" -> v.filterExpr) ~
        ("enable_empty_window_output" -> v.enableEmptyWindowOutput) ~
        ("skip_same_window_output" -> v.skipSameWindowOutput) ~
        ("ts_field" -> v.timestampFieldName) ~
        ("ts_format" -> v.outputTimestampFormat) ~
        ("keep_source_metrics" -> v.keepSourceMetrics)
    case v: SqlFeatureView =>
      ("kind" -> "sql_view") ~ ("name" -> v.name) ~ ("sql" -> v.sqlStatement) ~
        ("dependencies" -> JArray(v.dependencies.map(toJValue).toList)) ~
        ("keys" -> v.keys) ~ ("ts_field" -> v.timestampField) ~
        ("ts_format" -> v.timestampFormat)
    case v: OnDemandFeatureView =>
      ("kind" -> "on_demand_view") ~ ("name" -> v.name) ~
        ("features" -> JArray(v.features.map(featureJson).toList)) ~
        ("request_fields" -> v.requestFields) ~
        ("keep_source_fields" -> v.keepSourceFields)
    case _: DataFrameSource =>
      throw new IllegalArgumentException(
        "DataFrameSource wraps a live DataFrame and cannot be serialized to JSON")
  }

  def toJson(d: TableDescriptor): String =
    JsonMethods.compact(JsonMethods.render(toJValue(d)))

  // -------------------------------------------------------------- read

  private def dtypeFrom(j: JValue): DType = j match {
    case JString("unknown")   => DUnknown
    case JString("bytes")     => DBytes
    case JString("string")    => DString
    case JString("bool")      => DBool
    case JString("int32")     => DInt32
    case JString("int64")     => DInt64
    case JString("float32")   => DFloat32
    case JString("float64")   => DFloat64
    case JString("timestamp") => DTimestamp
    case o: JObject =>
      str(o, "type") match {
        case "vector" => DVector(dtypeFrom(o \ "elem"))
        case "map"    => DMap(dtypeFrom(o \ "key"), dtypeFrom(o \ "value"))
        case other    => throw new IllegalArgumentException(s"bad dtype $other")
      }
    case other => throw new IllegalArgumentException(s"bad dtype json $other")
  }

  private def str(j: JValue, f: String): String =
    (j \ f) match { case JString(s) => s; case o => throw new IllegalArgumentException(s"field $f: $o") }
  private def strOpt(j: JValue, f: String): Option[String] =
    (j \ f) match { case JString(s) => Some(s); case _ => None }
  private def longOpt(j: JValue, f: String): Option[Long] =
    (j \ f) match { case JInt(n) => Some(n.toLong); case JLong(n) => Some(n); case _ => None }
  private def intOpt(j: JValue, f: String): Option[Int] = longOpt(j, f).map(_.toInt)
  private def boolF(j: JValue, f: String, dflt: Boolean): Boolean =
    (j \ f) match { case JBool(b) => b; case _ => dflt }
  private def dblF(j: JValue, f: String, dflt: Double): Double =
    (j \ f) match { case JDouble(d) => d; case JInt(n) => n.toDouble; case JLong(n) => n.toDouble; case _ => dflt }
  private def propsFrom(j: JValue): Map[String, String] =
    j match {
      case JObject(fs) => fs.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
  private def strSeq(j: JValue, f: String): Seq[String] =
    (j \ f) match { case JArray(xs) => xs.collect { case JString(s) => s }; case _ => Nil }
  private def strSeqOpt(j: JValue, f: String): Option[Seq[String]] =
    (j \ f) match { case JArray(xs) => Some(xs.collect { case JString(s) => s }); case _ => None }
  private def durF(j: JValue, f: String): Duration =
    longOpt(j, f).map(_.millis).getOrElse(Duration.Zero)

  private def schemaFrom(j: JValue): Schema = j match {
    case JArray(fields) =>
      val parsed = fields.map(fj => (str(fj, "name"), dtypeFrom(fj \ "dtype")))
      Schema(parsed.map(_._1), parsed.map(_._2))
    case other => throw new IllegalArgumentException(s"bad schema json $other")
  }

  private def transformFrom(j: JValue): Transformation = str(j, "kind") match {
    case "expression" => ExpressionTransform(str(j, "expr"))
    case "join"       => JoinTransform(str(j, "table"), str(j, "expr"))
    case "over_window" =>
      OverWindowTransform(
        str(j, "expr"), AggFunc(str(j, "agg")),
        longOpt(j, "window_ms").map(_.millis),
        strSeq(j, "keys"), strOpt(j, "filter"), intOpt(j, "limit"))
    case "sliding_window" =>
      SlidingWindowTransform(
        str(j, "expr"), AggFunc(str(j, "agg")),
        durF(j, "window_ms"), durF(j, "step_ms"),
        strSeq(j, "keys"), strOpt(j, "filter"), intOpt(j, "limit"))
    case other => throw new IllegalArgumentException(s"unknown transform kind $other")
  }

  private def featureFrom(j: JValue): Feature =
    Feature(
      str(j, "name"), transformFrom(j \ "transform"),
      (j \ "dtype") match { case JNothing | JNull => None; case d => Some(dtypeFrom(d)) },
      strSeqOpt(j, "keys"),
      (j \ "metrics") match { case JArray(xs) => xs.map(metricFrom); case _ => Nil })

  private def featuresFrom(j: JValue): Seq[Feature] =
    (j \ "features") match { case JArray(xs) => xs.map(featureFrom); case _ => Nil }

  def fromJValue(j: JValue): TableDescriptor = str(j, "kind") match {
    case "file_source" =>
      FileSource(
        str(j, "name"), str(j, "path"), str(j, "format"),
        (j \ "schema") match { case JNothing | JNull => None; case s => Some(schemaFrom(s)) },
        strSeqOpt(j, "keys"), strOpt(j, "ts_field"), str(j, "ts_format"),
        durF(j, "max_ooo_ms"), boolF(j, "bounded", dflt = true))
    case "datagen_source" =>
      val fields = (j \ "fields") match {
        case JArray(xs) => xs.map { fj =>
          str(fj, "gen") match {
            case "random" => RandomField(
              str(fj, "name"), dtypeFrom(fj \ "dtype"),
              dblF(fj, "min", 0), dblF(fj, "max", 1), intOpt(fj, "length").getOrElse(17),
              durF(fj, "max_past_ms"))
            case "sequence" => SequenceField(
              str(fj, "name"), dtypeFrom(fj \ "dtype"),
              longOpt(fj, "start").getOrElse(0L), longOpt(fj, "end").getOrElse(Long.MaxValue))
          }
        }
        case _ => Nil
      }
      DataGenSource(
        str(j, "name"), longOpt(j, "rows").getOrElse(0L), fields,
        longOpt(j, "seed").getOrElse(42L), strSeqOpt(j, "keys"),
        strOpt(j, "ts_field"), str(j, "ts_format"),
        longOpt(j, "rows_per_second").getOrElse(10000L),
        boolF(j, "unbounded", dflt = false))
    case "kafka_source" =>
      KafkaSource(
        str(j, "name"), str(j, "bootstrap"), str(j, "topic"),
        schemaFrom(j \ "schema"), strSeqOpt(j, "keys"),
        strOpt(j, "ts_field"), str(j, "ts_format"), str(j, "startup_mode"),
        longOpt(j, "startup_ts"), durF(j, "max_ooo_ms"),
        boolF(j, "bounded", dflt = false),
        strOpt(j, "value_format").getOrElse("json"),
        propsFrom(j \ "value_format_props"),
        strOpt(j, "key_format"),
        propsFrom(j \ "key_format_props"),
        strOpt(j, "consumer_group"),
        propsFrom(j \ "consumer_props"),
        longOpt(j, "partition_discovery_interval_ms"))
    case "jdbc_source" =>
      JdbcSource(
        str(j, "name"), str(j, "url"), str(j, "table"),
        str(j, "user"), str(j, "password"), strSeqOpt(j, "keys"),
        strOpt(j, "ts_field"), str(j, "ts_format"))
    case "memory_store_source" =>
      MemoryStoreSource(str(j, "name"), str(j, "table"), strSeqOpt(j, "keys"))
    case "hive_source" =>
      HiveSource(
        str(j, "name"), str(j, "database"), str(j, "table"),
        (j \ "schema") match { case JNothing | JNull => None; case s => Some(schemaFrom(s)) },
        strSeqOpt(j, "keys"), strOpt(j, "ts_field"), str(j, "ts_format"))
    case "redis_source" =>
      RedisSource(
        str(j, "name"), schemaFrom(j \ "schema"), strSeqOpt(j, "keys"),
        str(j, "host"), intOpt(j, "port").getOrElse(6379), str(j, "mode"),
        str(j, "username"), str(j, "password"),
        intOpt(j, "db_num").getOrElse(0), str(j, "namespace"),
        strOpt(j, "ts_field"), str(j, "key_expr"))
    case "derived_view" =>
      DerivedFeatureView(
        str(j, "name"), fromJValue(j \ "source"), featuresFrom(j),
        boolF(j, "keep_source_fields", dflt = false),
        strOpt(j, "filter"), strSeqOpt(j, "keys"),
        boolF(j, "keep_source_metrics", dflt = false))
    case "sliding_view" =>
      SlidingFeatureView(
        str(j, "name"), fromJValue(j \ "source"), featuresFrom(j),
        strOpt(j, "filter"),
        boolF(j, "enable_empty_window_output", dflt = true),
        boolF(j, "skip_same_window_output", dflt = true),
        strOpt(j, "ts_field").getOrElse("window_time"),
        strOpt(j, "ts_format").getOrElse("epoch_millis"),
        boolF(j, "keep_source_metrics", dflt = false))
    case "sql_view" =>
      SqlFeatureView(
        str(j, "name"), str(j, "sql"),
        (j \ "dependencies") match { case JArray(xs) => xs.map(fromJValue); case _ => Nil },
        strSeqOpt(j, "keys"), strOpt(j, "ts_field"), str(j, "ts_format"))
    case "on_demand_view" =>
      OnDemandFeatureView(
        str(j, "name"), featuresFrom(j), strSeq(j, "request_fields"),
        boolF(j, "keep_source_fields", dflt = true))
    case other => throw new IllegalArgumentException(s"unknown descriptor kind $other")
  }

  def fromJson(s: String): TableDescriptor = fromJValue(JsonMethods.parse(s))
}
