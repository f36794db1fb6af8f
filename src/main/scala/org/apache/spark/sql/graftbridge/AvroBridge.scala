package org.apache.spark.sql.graftbridge

import org.apache.avro.Schema
import org.apache.spark.sql.avro.{AvroDeserializer, AvroSerializer}
import org.apache.spark.sql.types.DataType

/** Access to spark-sql's `private[sql]` Avro converters (the same
  * classes its Avro FILE source runs rows through) — the catalyst ⇄
  * avro-datum halves of [[graft.functions.AvroCodec]]'s column
  * codecs. Same subpackage hop as [[ColumnBridge]]. */
object AvroBridge {

  /** Catalyst value → Avro datum for `dt` under `avro`. */
  def serializer(dt: DataType, avro: Schema,
      nullable: Boolean): Any => Any =
    new AvroSerializer(dt, avro, nullable).serialize _

  /** Avro datum → Catalyst value (None = filtered/unmatched row). */
  def deserializer(avro: Schema, dt: DataType): Any => Option[Any] = {
    val d = new AvroDeserializer(avro, dt, "CORRECTED", false, "", -1)
    (datum: Any) => d.deserialize(datum)
  }
}
