package graft

import org.apache.spark.sql.functions._

import graft.functions.AvroCodec

/** Column-level Avro codecs: lossless round trip, REAL Avro on the
  * wire (plain org.apache.avro reader decodes the bytes), and
  * deterministic output. */
class AvroCodecSpec extends SparkSpecBase {

  import org.apache.spark.sql.types._

  private def payload = {
    import spark.implicits._
    Seq(
      (1L, "alpha", 1.5, Seq(1L, 2L, 3L)),
      (2L, null.asInstanceOf[String], -0.25, Seq.empty[Long]),
      (3L, "gamma", 0.0, Seq(42L))
    ).toDF("id", "name", "score", "tags")
  }

  private def payloadStruct =
    struct(col("id"), col("name"), col("score"), col("tags"))

  /** The EXACT type of the encoded struct (nullability included) —
    * binary Avro is not self-describing, so the reader schema must
    * be derived from the frame, never written by hand (a nullability
    * mismatch shifts the union wire layout and silently misparses). */
  private def payloadType: DataType =
    payload.select(payloadStruct.as("s")).schema("s").dataType

  private def packed = payload.select(
    col("id").as("key"),
    AvroCodec.to_avro(payloadStruct).as("bin"))

  test("to_avro → from_avro round trip is lossless (nulls, empties included)") {
    val schema = AvroCodec.schemaFor(payloadType)
    val back = packed
      .select(col("key"), AvroCodec.from_avro(col("bin"), schema).as("st"))
      .select(col("st.id"), col("st.name"), col("st.score"), col("st.tags"))
      .orderBy("id")
    val got = back.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getSeq[Long](3)))
    val want = payload.orderBy("id").collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(2), r.getSeq[Long](3)))
    assert(got.toSeq == want.toSeq)
  }

  test("the bytes are real binary Avro: the plain avro reader decodes them") {
    val schema = new org.apache.avro.Schema.Parser()
      .parse(AvroCodec.schemaFor(payloadType))
    val rows = packed.orderBy("key").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
    val reader =
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord](schema)
    rows.foreach { case (key, bytes) =>
      val rec = reader.read(null,
        org.apache.avro.io.DecoderFactory.get()
          .binaryDecoder(bytes, 0, bytes.length, null))
      assert(rec.get("id") == key, s"plain-avro id mismatch for $key")
      if (key == 1L)
        assert(rec.get("name").toString == "alpha" &&
          rec.get("score") == 1.5)
      if (key == 2L) assert(rec.get("name") == null)
    }
  }

  test("encoding is deterministic: same row → identical bytes across plans") {
    def bytesByKey = packed.collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val a = bytesByKey
    val b = bytesByKey
    assert(a == b)
    // and through a repartitioned plan (partitioning must not leak
    // into the encoded value)
    val c = payload.repartition(7).select(col("id").as("key"),
        AvroCodec.to_avro(struct(col("id"), col("name"), col("score"),
          col("tags"))).as("bin"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(a == c)
  }

  test("from_avro on a non-binary column fails at analysis, not mid-task") {
    val schema = AvroCodec.schemaFor(payloadType)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      payload.select(AvroCodec.from_avro(col("id"), schema)).collect()
    }
    assert(e.getMessage.contains("BINARY"), s"unhelpful error: ${e.getMessage}")
  }

  test("top-level map and string schemas round-trip without buffer clobber") {
    // the deserializer recycles internal buffers; non-struct top-level
    // results (MapData, UTF8String) must be copied in nullSafeEval or
    // a later row's decode clobbers an earlier returned value — the
    // multi-row collect here would surface exactly that
    import spark.implicits._
    val maps = Seq(
      (1L, Map("a" -> 1L, "b" -> 2L)),
      (2L, Map("x" -> 9L)),
      (3L, Map.empty[String, Long])
    ).toDF("id", "m")
    val mapType = maps.schema("m").dataType
    // nullable = true: toDF columns are nullable, and the encoder
    // derives the union layout from child nullability — the reader
    // schema must match it exactly (see schemaFor's doc)
    val mapSchema = AvroCodec.schemaFor(mapType, nullable = true)
    val gotMaps = maps
      .select(col("id"), AvroCodec.from_avro(
        AvroCodec.to_avro(col("m")), mapSchema).as("m2"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getMap[String, Long](1).toMap))
    assert(gotMaps.toSeq == Seq(
      (1L, Map("a" -> 1L, "b" -> 2L)), (2L, Map("x" -> 9L)),
      (3L, Map.empty[String, Long])))
    val strs = Seq((1L, "first"), (2L, "second"), (3L, "third"))
      .toDF("id", "s")
    val strSchema = AvroCodec.schemaFor(strs.schema("s").dataType,
      nullable = true)
    val gotStrs = strs
      .select(col("id"), AvroCodec.from_avro(
        AvroCodec.to_avro(col("s")), strSchema).as("s2"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(gotStrs.toSeq == Seq((1L, "first"), (2L, "second"), (3L, "third")))
  }

  test("decode round-trips documents content at corpus scale") {
    val docs = graft.core.Tables(spark, Sf).documents
    val schema = AvroCodec.schemaFor(docs
      .select(struct(col("doc_id"), col("text")).as("s"))
      .schema("s").dataType)
    val roundtrip = docs
      .select(AvroCodec.to_avro(struct(col("doc_id"), col("text"))).as("b"))
      .select(AvroCodec.from_avro(col("b"), schema).as("st"))
      .select(col("st.doc_id").as("doc_id"), col("st.text").as("text"))
    val got = roundtrip.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }
}
