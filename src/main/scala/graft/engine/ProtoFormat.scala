package graft.engine

import graft.types._
import java.io.ByteArrayOutputStream

/** Protobuf (proto3) wire-format codec for Kafka key/value payloads —
  * the reference's `protobuf` format
  * (ref: docs/content/connectors/formats/protobuf.md; value-format surface
  * at python/feathub/feature_tables/sources/kafka_source.py:25-131).
  *
  * The reference loads protoc-generated classes from a user jar; a Spark
  * library in a dependency-free environment instead derives the message
  * layout from the DECLARED [[graft.table.Schema]]: field i maps to proto
  * field number i+1 unless the format props override it
  * (`protobuf.field_numbers` = `"name:3,other:7"`), which is exactly the
  * information a .proto file adds over the schema. The codec implements
  * the stable proto3 wire format directly (varint / fixed32 / fixed64 /
  * length-delimited), so payloads interoperate with any protoc-generated
  * reader/writer of the same message shape.
  *
  * Type mapping mirrors the reference's table (protobuf.md): Bytes→bytes,
  * String→string, Int32→int32, Int64→int64, Float32→float,
  * Float64→double, Bool→bool, Vector→repeated (packed for numeric/bool,
  * per-element for string/bytes — proto3's own packing rules). NULL
  * scalars encode as proto3 defaults (0 / "" / false — the reference's
  * null table), and proto3 default values are omitted from the wire;
  * decoding therefore yields defaults, never nulls, for absent fields.
  * With `ignore_parse_error` (default true, reference semantics) a
  * malformed payload decodes to an all-null row instead of failing the
  * batch.
  */
object ProtoFormat {

  private val WireVarint = 0
  private val WireFixed64 = 1
  private val WireLen = 2
  private val WireFixed32 = 5

  /** Field name → proto field number (schema order 1..n unless overridden
    * via `protobuf.field_numbers`).
    */
  def fieldNumbers(fieldNames: Seq[String], props: Map[String, String]): Seq[Int] =
    props.get("protobuf.field_numbers") match {
      case None => fieldNames.indices.map(_ + 1)
      case Some(spec) =>
        val m = spec.split(",").map { kv =>
          kv.split(":") match {
            case Array(n, num) => n.trim -> num.trim.toInt
            case _ => throw new IllegalArgumentException(
              s"bad protobuf.field_numbers entry '$kv' (want name:number)")
          }
        }.toMap
        val nums = fieldNames.map(n => m.getOrElse(n, throw new IllegalArgumentException(
          s"protobuf.field_numbers is missing field '$n'")))
        require(nums.distinct.size == nums.size, "duplicate protobuf field numbers")
        nums
    }

  def ignoreParseError(props: Map[String, String]): Boolean =
    props.get("ignore_parse_error").forall(_.toBoolean)

  // ---------------------------------------------------------------- encode

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
    out.write((v & 0x7f).toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, num: Int, wire: Int): Unit =
    writeVarint(out, (num.toLong << 3) | wire)

  private def writeFixed32(out: ByteArrayOutputStream, bits: Int): Unit = {
    out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
    out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
  }

  private def writeFixed64(out: ByteArrayOutputStream, bits: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  private def writeLenDelim(out: ByteArrayOutputStream, num: Int, b: Array[Byte]): Unit = {
    writeTag(out, num, WireLen); writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
  }

  private def numLong(v: Any): Long = v match {
    case null => 0L
    case x: Long => x
    case x: Int => x.toLong
    case x: java.lang.Number => x.longValue()
  }

  /** Encode one row of `values` (parallel to `types` and `nums`) as a
    * proto3 message. Scalar fields equal to their proto3 default are
    * omitted (standard proto3 serialization).
    */
  def encode(values: Seq[Any], types: Seq[DType], nums: Seq[Int]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    values.lazyZip(types).lazyZip(nums).foreach { (v, t, num) =>
      t match {
        case DInt32 | DInt64 =>
          val x = numLong(v)
          if (x != 0L) { writeTag(out, num, WireVarint); writeVarint(out, x) }
        case DBool =>
          if (v == true) { writeTag(out, num, WireVarint); writeVarint(out, 1L) }
        case DFloat32 =>
          val x = if (v == null) 0f else v.asInstanceOf[Number].floatValue()
          if (java.lang.Float.floatToRawIntBits(x) != 0) {
            writeTag(out, num, WireFixed32)
            writeFixed32(out, java.lang.Float.floatToIntBits(x))
          }
        case DFloat64 =>
          val x = if (v == null) 0d else v.asInstanceOf[Number].doubleValue()
          if (java.lang.Double.doubleToRawLongBits(x) != 0L) {
            writeTag(out, num, WireFixed64)
            writeFixed64(out, java.lang.Double.doubleToLongBits(x))
          }
        case DString =>
          val s = if (v == null) "" else v.toString
          if (s.nonEmpty)
            writeLenDelim(out, num, s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        case DBytes =>
          val b = if (v == null) Array.empty[Byte] else v.asInstanceOf[Array[Byte]]
          if (b.nonEmpty) writeLenDelim(out, num, b)
        case DVector(elem) =>
          val xs: Seq[Any] = v match {
            case null => Nil
            case s: scala.collection.Seq[_] => s.toSeq
            case a: Array[_] => a.toSeq
            case other => throw new IllegalArgumentException(
              s"vector field $num got ${other.getClass.getName}")
          }
          if (xs.nonEmpty) elem match {
            case DInt32 | DInt64 | DBool =>
              // packed varints (proto3 default for numeric repeated)
              val body = new ByteArrayOutputStream()
              xs.foreach {
                case b: Boolean => writeVarint(body, if (b) 1L else 0L)
                case x => writeVarint(body, numLong(x))
              }
              writeLenDelim(out, num, body.toByteArray)
            case DFloat32 =>
              val body = new ByteArrayOutputStream()
              xs.foreach(x => writeFixed32(body,
                java.lang.Float.floatToIntBits(x.asInstanceOf[Number].floatValue())))
              writeLenDelim(out, num, body.toByteArray)
            case DFloat64 =>
              val body = new ByteArrayOutputStream()
              xs.foreach(x => writeFixed64(body,
                java.lang.Double.doubleToLongBits(x.asInstanceOf[Number].doubleValue())))
              writeLenDelim(out, num, body.toByteArray)
            case DString =>
              xs.foreach(x => writeLenDelim(out, num,
                String.valueOf(x).getBytes(java.nio.charset.StandardCharsets.UTF_8)))
            case DBytes =>
              xs.foreach(x => writeLenDelim(out, num, x.asInstanceOf[Array[Byte]]))
            case other => throw new IllegalArgumentException(
              s"unsupported repeated element type $other")
          }
        case other => throw new IllegalArgumentException(
          // the reference's mapping table has no timestamp/map rows either:
          // timestamps travel as string/epoch fields (protobuf.md example)
          s"type $other has no protobuf mapping; carry it as string or int64")
      }
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- decode

  private final class Reader(b: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while (true) {
        require(pos < end, "truncated varint")
        val x = b(pos) & 0xff; pos += 1
        acc |= (x & 0x7fL) << shift
        if ((x & 0x80) == 0) return acc
        shift += 7
        require(shift < 64, "varint too long")
      }
      acc
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      val v = (b(pos) & 0xff) | ((b(pos + 1) & 0xff) << 8) |
        ((b(pos + 2) & 0xff) << 16) | ((b(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def fixed64(): Long = {
      require(pos + 8 <= end, "truncated fixed64")
      var v = 0L; var i = 0
      while (i < 8) { v |= (b(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def lenDelim(): (Int, Int) = {
      val n = varint().toInt
      require(n >= 0 && pos + n <= end, "truncated length-delimited field")
      val r = (pos, pos + n); pos += n; r
    }
  }

  /** Decode a proto3 message into one value per schema field (parallel to
    * `types`/`nums`). Absent fields yield proto3 defaults; unknown field
    * numbers are skipped by wire type (forward compatibility).
    */
  def decode(bytes: Array[Byte], types: Seq[DType], nums: Seq[Int]): Array[Any] = {
    val byNum = nums.zipWithIndex.toMap
    val out = new Array[Any](types.size)
    val vecs = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Any]]
    val r = new Reader(bytes, 0, bytes.length)
    while (r.hasMore) {
      val tag = r.varint()
      val num = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      byNum.get(num) match {
        case None => // unknown field: skip by wire type
          wire match {
            case WireVarint  => r.varint()
            case WireFixed64 => r.fixed64()
            case WireLen     => r.lenDelim()
            case WireFixed32 => r.fixed32()
            case w => throw new IllegalArgumentException(s"unsupported wire type $w")
          }
        case Some(i) =>
          def utf8(span: (Int, Int)): String =
            new String(bytes, span._1, span._2 - span._1,
              java.nio.charset.StandardCharsets.UTF_8)
          def sliceBytes(span: (Int, Int)): Array[Byte] =
            java.util.Arrays.copyOfRange(bytes, span._1, span._2)
          def expect(w: Int): Unit = require(wire == w,
            s"field $num: declared type ${types(i)} expects wire $w, got $wire")
          types(i) match {
            case DInt32  => expect(WireVarint); out(i) = r.varint().toInt
            case DInt64  => expect(WireVarint); out(i) = r.varint()
            case DBool   => expect(WireVarint); out(i) = r.varint() != 0L
            case DFloat32 => expect(WireFixed32); out(i) = java.lang.Float.intBitsToFloat(r.fixed32())
            case DFloat64 => expect(WireFixed64); out(i) = java.lang.Double.longBitsToDouble(r.fixed64())
            case DString => expect(WireLen); out(i) = utf8(r.lenDelim())
            case DBytes  => expect(WireLen); out(i) = sliceBytes(r.lenDelim())
            case DVector(elem) =>
              val buf = vecs.getOrElseUpdate(i, scala.collection.mutable.ArrayBuffer.empty[Any])
              (elem, wire) match {
                case (DInt32, WireLen) =>
                  val (s, e) = r.lenDelim(); val rr = new Reader(bytes, s, e)
                  while (rr.hasMore) buf += rr.varint().toInt
                case (DInt64, WireLen) =>
                  val (s, e) = r.lenDelim(); val rr = new Reader(bytes, s, e)
                  while (rr.hasMore) buf += rr.varint()
                case (DBool, WireLen) =>
                  val (s, e) = r.lenDelim(); val rr = new Reader(bytes, s, e)
                  while (rr.hasMore) buf += (rr.varint() != 0L)
                case (DFloat32, WireLen) =>
                  val (s, e) = r.lenDelim(); val rr = new Reader(bytes, s, e)
                  while (rr.hasMore) buf += java.lang.Float.intBitsToFloat(rr.fixed32())
                case (DFloat64, WireLen) =>
                  val (s, e) = r.lenDelim(); val rr = new Reader(bytes, s, e)
                  while (rr.hasMore) buf += java.lang.Double.longBitsToDouble(rr.fixed64())
                case (DString, WireLen) => buf += utf8(r.lenDelim())
                case (DBytes, WireLen)  => buf += sliceBytes(r.lenDelim())
                // unpacked numeric elements (proto2 writers / explicit
                // [packed=false]) arrive one tag per element
                case (DInt32, WireVarint) => buf += r.varint().toInt
                case (DInt64, WireVarint) => buf += r.varint()
                case (DBool, WireVarint)  => buf += (r.varint() != 0L)
                case (DFloat32, WireFixed32) => buf += java.lang.Float.intBitsToFloat(r.fixed32())
                case (DFloat64, WireFixed64) => buf += java.lang.Double.longBitsToDouble(r.fixed64())
                case (e2, w) => throw new IllegalArgumentException(
                  s"repeated $e2 with wire type $w unsupported")
              }
            case other => throw new IllegalArgumentException(
              s"type $other has no protobuf mapping")
          }
      }
    }
    // proto3 absence semantics: defaults, not nulls
    types.indices.foreach { i =>
      if (out(i) == null) out(i) = types(i) match {
        case DInt32 => 0
        case DInt64 => 0L
        case DBool => false
        case DFloat32 => 0f
        case DFloat64 => 0d
        case DString => ""
        case DBytes => Array.empty[Byte]
        case DVector(_) => Seq.empty[Any]
        case other => throw new IllegalArgumentException(
          s"type $other has no protobuf mapping")
      }
    }
    vecs.foreach { case (i, buf) => out(i) = buf.toSeq }
    out
  }
}
