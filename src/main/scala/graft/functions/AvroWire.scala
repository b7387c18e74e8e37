package graft.functions

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

/** Row-level Avro wire codec over the PUBLIC avro-java API — the
  * Kafka-payload pattern (one Avro datum per row, shipped as BINARY).
  *
  * This distribution bundles Spark's Avro FILE format but not the
  * `from_avro`/`to_avro` wire expressions (no AvroDataToCatalyst in any
  * jar — the SQL functions raise AVRO_NOT_LOADED), so the codec is
  * re-expressed directly on avro-java. It runs as a deterministic UDF:
  * a codec boundary like the multimodal decoder (Multimodal.scala) —
  * per-row CPU at the edge of the plan, no shuffle implications, so
  * the non-codegen seam costs only the row-at-a-time call overhead.
  *
  * Thread-safety: the parsed Schema is immutable and shared; datum
  * writers/readers and encoders are created per call (cheap — the
  * expensive part is the schema parse, done once per JVM).
  *
  * Reference ground: auron ships row-codec plumbing through JNI IPC
  * (native-engine ipc_reader/writer); here the codec is the public
  * container format itself.
  */
object AvroWire extends Serializable {

  case class Payload(event_type: String, user_id: Long)

  val SchemaJson: String =
    """{"type":"record","name":"payload","fields":[
      |{"name":"event_type","type":"string"},
      |{"name":"user_id","type":"long"}]}""".stripMargin

  @transient private lazy val schema: Schema =
    new Schema.Parser().parse(SchemaJson)

  def encode(eventType: String, userId: Long): Array[Byte] = {
    val rec = new GenericData.Record(schema)
    rec.put("event_type", eventType)
    rec.put("user_id", userId)
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  def decode(bytes: Array[Byte]): Payload = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = new GenericDatumReader[GenericRecord](schema).read(null, dec)
    Payload(rec.get("event_type").toString,
      rec.get("user_id").asInstanceOf[Long])
  }
}
