package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.avro.SchemaConverters
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{AvroBridge, ColumnBridge}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Column-level Avro codecs — the `from_avro`/`to_avro` surface.
  *
  * Spark's built-in SQL functions of the same name refuse to resolve
  * here (`AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE`: their expression
  * implementations live in the external spark-avro connector, absent
  * from /opt/spark/jars — verified by runtime probe). The building
  * blocks, however, ship INSIDE spark-sql: `AvroSerializer` /
  * `AvroDeserializer` (the catalyst ⇄ avro-datum converters the file
  * source uses) and `SchemaConverters`. These two expressions wrap
  * them into scalar codecs, so the wire format is REAL binary Avro —
  * the spec decodes the emitted bytes with the plain
  * `org.apache.avro` reader and round-trips them through the Avro
  * file source.
  *
  * Both are `CodegenFallback` one-call-per-row scalars at the plan's
  * edge (same tier as the external module's own codec expressions) —
  * the per-row cost is the avro encode itself, not the fallback.
  * Encoder/decoder state is per-expression-instance and reused
  * across rows within a partition.
  */
object AvroCodec {

  /** Catalyst struct/value → binary Avro, schema derived from the
    * child's Spark type (matching the built-in `to_avro`'s
    * single-argument form). */
  case class AvroEncode(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def prettyName: String = "graft_to_avro"

    @transient private lazy val avroType: Schema =
      SchemaConverters.toAvroType(child.dataType, child.nullable,
        "topLevelRecord", "")
    @transient private lazy val serialize =
      AvroBridge.serializer(child.dataType, avroType, child.nullable)
    @transient private lazy val writer =
      new GenericDatumWriter[Any](avroType)
    @transient private lazy val out = new ByteArrayOutputStream()
    @transient private var encoder: BinaryEncoder = _

    override def nullSafeEval(input: Any): Any = {
      out.reset()
      encoder = EncoderFactory.get().directBinaryEncoder(out, encoder)
      writer.write(serialize(input), encoder)
      encoder.flush()
      out.toByteArray
    }
    override protected def withNewChildInternal(newChild: Expression): AvroEncode =
      copy(child = newChild)
  }

  /** Binary Avro → Catalyst value for a JSON-literal Avro schema
    * (matching the built-in `from_avro`'s (column, schema) form).
    * Corrupt input fails the task rather than nulling silently —
    * the FAILFAST discipline of the file source. */
  case class AvroDecode(child: Expression, jsonSchema: String)
      extends UnaryExpression with CodegenFallback {
    override def prettyName: String = "graft_from_avro"
    // analysis-time type check: without it a non-binary argument
    // resolves fine and every task then dies in a bare
    // ClassCastException with no hint which argument was wrong
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_from_avro requires a BINARY input, got " +
            child.dataType.catalogString)

    @transient private lazy val avroType: Schema =
      new Schema.Parser().parse(jsonSchema)
    override lazy val dataType: DataType =
      SchemaConverters.toSqlType(
        new Schema.Parser().parse(jsonSchema)).dataType
    override def nullable: Boolean = true

    @transient private lazy val deserialize =
      AvroBridge.deserializer(avroType, dataType)
    @transient private lazy val reader =
      new GenericDatumReader[Any](avroType)
    @transient private var decoder: BinaryDecoder = _

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      decoder = DecoderFactory.get().binaryDecoder(bytes, 0, bytes.length, decoder)
      // NO datum reuse, and the materialized row is COPIED: both the
      // avro reader and the deserializer recycle internal buffers
      // (fine inside the file source's row pipeline, wrong for a
      // scalar whose results outlive the call — reuse returned rows
      // whose array fields were cleared by the next read)
      deserialize(reader.read(null, decoder)) match {
        case Some(r: org.apache.spark.sql.catalyst.InternalRow) => r.copy()
        case Some(a: org.apache.spark.sql.catalyst.util.ArrayData) => a.copy()
        // top-level map / string schemas recycle buffers the same way
        case Some(m: org.apache.spark.sql.catalyst.util.MapData) => m.copy()
        case Some(s: org.apache.spark.unsafe.types.UTF8String) => s.clone()
        case Some(x) => x
        case None => null
      }
    }
    override protected def withNewChildInternal(newChild: Expression): AvroDecode =
      copy(child = newChild)
  }

  /** Encode a column (typically a `struct(...)`) as binary Avro. */
  def to_avro(c: Column): Column =
    ColumnBridge.column(AvroEncode(ColumnBridge.expression(c)))

  /** Decode a binary-Avro column against a JSON Avro schema. */
  def from_avro(c: Column, jsonSchema: String): Column =
    ColumnBridge.column(AvroDecode(ColumnBridge.expression(c), jsonSchema))

  /** The Avro schema string [[to_avro]] derives for a Spark type —
    * what a caller feeds back into [[from_avro]] for a lossless
    * round trip. Binary Avro is NOT self-describing: pass the EXACT
    * type of the encoded column, nullability of every field
    * included — a nullable field becomes a union and shifts the wire
    * layout, so a mismatched reader schema silently misparses
    * (e.g. reads a union tag byte as an empty array count). Derive
    * it from the frame (`df.select(structCol).schema(...)`) rather
    * than writing it by hand. */
  def schemaFor(dt: DataType, nullable: Boolean = false): String =
    SchemaConverters.toAvroType(dt, nullable, "topLevelRecord", "").toString
}
