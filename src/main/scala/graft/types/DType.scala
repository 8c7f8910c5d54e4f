package graft.types

import org.apache.spark.sql.types._

/** Closed type system mirroring the reference feature store's data model
  * (ref: python/feathub/common/types.py:29-206): a fixed primitive set plus
  * homogeneous vectors and maps. Mapped onto Spark SQL types per
  * python/feathub/processors/spark/spark_types_utils.py:22-121.
  */
sealed trait DType {
  def toSpark: DataType
}

case object DUnknown extends DType { val toSpark: DataType = NullType }
case object DBytes extends DType { val toSpark: DataType = BinaryType }
case object DString extends DType { val toSpark: DataType = StringType }
case object DBool extends DType { val toSpark: DataType = BooleanType }
case object DInt32 extends DType { val toSpark: DataType = IntegerType }
case object DInt64 extends DType { val toSpark: DataType = LongType }
case object DFloat32 extends DType { val toSpark: DataType = FloatType }
case object DFloat64 extends DType { val toSpark: DataType = DoubleType }
case object DTimestamp extends DType { val toSpark: DataType = TimestampType }

final case class DVector(elem: DType) extends DType {
  def toSpark: DataType = ArrayType(elem.toSpark)
}
final case class DMap(key: DType, value: DType) extends DType {
  def toSpark: DataType = MapType(key.toSpark, value.toSpark)
}

object DType {

  /** Names accepted by CAST in the expression DSL
    * (ref: python/feathub/common/types.py:169-178).
    */
  def fromCastName(name: String): Option[DType] = name.toUpperCase match {
    case "BYTES"     => Some(DBytes)
    case "STRING"    => Some(DString)
    case "INTEGER"   => Some(DInt32)
    case "BIGINT"    => Some(DInt64)
    case "FLOAT"     => Some(DFloat32)
    case "DOUBLE"    => Some(DFloat64)
    case "BOOLEAN"   => Some(DBool)
    case "TIMESTAMP" => Some(DTimestamp)
    case _           => None
  }

  def fromSpark(dt: DataType): DType = dt match {
    case NullType         => DUnknown
    case BinaryType       => DBytes
    case StringType       => DString
    case BooleanType      => DBool
    case ByteType         => DInt32
    case ShortType        => DInt32
    case IntegerType      => DInt32
    case LongType         => DInt64
    case FloatType        => DFloat32
    case DoubleType       => DFloat64
    case TimestampType    => DTimestamp
    case DateType         => DTimestamp
    case ArrayType(e, _)  => DVector(fromSpark(e))
    case MapType(k, v, _) => DMap(fromSpark(k), fromSpark(v))
    case other => throw new IllegalArgumentException(s"Unsupported Spark type: $other")
  }

  /** Numeric widening used for arithmetic result types. */
  def widen(a: DType, b: DType): DType = (a, b) match {
    case (x, y) if x == y => x
    case (DFloat64, _) | (_, DFloat64) => DFloat64
    case (DFloat32, _) | (_, DFloat32) => DFloat32
    case (DInt64, _) | (_, DInt64)     => DInt64
    case (DInt32, _) | (_, DInt32)     => DInt32
    case _                             => DUnknown
  }

  def isNumeric(t: DType): Boolean = t match {
    case DInt32 | DInt64 | DFloat32 | DFloat64 => true
    case _                                     => false
  }
}

/** Fixed, explicit schema (never inferred from data).
  * Ref: python/feathub/table/schema.py:23-110. Column names must not
  * start or end with `__` — reserved for engine metadata columns.
  */
final case class Schema(fieldNames: Seq[String], fieldTypes: Seq[DType]) {
  require(fieldNames.length == fieldTypes.length, "names/types length mismatch")
  fieldNames.foreach { n =>
    require(
      !(n.startsWith("__") || n.endsWith("__")),
      s"Field name '$n' must not start or end with '__' (reserved)")
  }

  def toSpark: StructType =
    StructType(fieldNames.zip(fieldTypes).map { case (n, t) =>
      StructField(n, t.toSpark, nullable = true)
    })

  def dtypeOf(name: String): Option[DType] =
    fieldNames.zip(fieldTypes).collectFirst { case (n, t) if n == name => t }
}

object Schema {
  val empty: Schema = Schema(Nil, Nil)

  def fromSpark(st: StructType): Schema =
    Schema(st.fields.map(_.name).toSeq, st.fields.map(f => DType.fromSpark(f.dataType)).toSeq)

  final class Builder {
    private val names = scala.collection.mutable.ArrayBuffer.empty[String]
    private val types = scala.collection.mutable.ArrayBuffer.empty[DType]
    def field(name: String, dtype: DType): Builder = { names += name; types += dtype; this }
    def build(): Schema = Schema(names.toSeq, types.toSeq)
  }
  def builder(): Builder = new Builder
}
