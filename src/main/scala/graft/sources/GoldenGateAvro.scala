package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Dataset

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._

/** GoldenGate-style Avro wrapper codec — the SRC2/SRC3 decode path
  * (reference: source/oracle/Normalizer.java:123-140 hardcodes the same
  * generic-wrapper schema; GoldenGateKafka.java:196-237 resolves payload
  * schemas by fingerprint).
  *
  * No spark-avro in this environment, so decoding uses avro-core's
  * GenericDatumReader inside `mapPartitions` — which is also what the
  * reference does, and keeps one reader per partition rather than one
  * per record. Parsed payload schemas are memoized per executor keyed by
  * fingerprint (the reference's per-worker schema cache).
  */
object GoldenGateAvro {

  /** The generic-wrapper schema every GoldenGate message conforms to. */
  val WrapperSchemaJson: String =
    """{"type":"record","name":"generic_wrapper","namespace":"oracle.goldengate",
      |"fields":[
      | {"name":"table_name","type":"string"},
      | {"name":"schema_fingerprint","type":"long"},
      | {"name":"payload","type":"bytes"}]}""".stripMargin

  final case class Wrapper(tableName: String, fingerprint: Long, payload: Array[Byte])

  private lazy val wrapperSchema = new Schema.Parser().parse(WrapperSchemaJson)
  private val schemaCache = new ConcurrentHashMap[String, Schema]()
  private def parseSchema(json: String): Schema =
    schemaCache.computeIfAbsent(json, j => new Schema.Parser().parse(j))

  /** Decode raw Kafka-style message bytes into wrappers. */
  def decodeWrappers(raw: Dataset[Array[Byte]]): Dataset[Wrapper] = {
    import raw.sparkSession.implicits._
    raw.mapPartitions { it =>
      val reader = new GenericDatumReader[GenericRecord](wrapperSchema)
      it.map { bytes =>
        val rec = reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null))
        Wrapper(
          rec.get("table_name").toString,
          rec.get("schema_fingerprint").asInstanceOf[Long],
          rec.get("payload").asInstanceOf[ByteBuffer].array())
      }
    }
  }

  /** Decode one Avro payload with its (fingerprint-resolved) schema into
    * the stringly column map of the change envelope. */
  def decodeRecord(bytes: Array[Byte], schemaJson: String): Map[String, String] = {
    val schema = parseSchema(schemaJson)
    val reader = new GenericDatumReader[GenericRecord](schema)
    val rec = reader.read(null, DecoderFactory.get().binaryDecoder(bytes, null))
    schema.getFields.asScala.map { f =>
      f.name -> Option(rec.get(f.name)).map(_.toString).orNull
    }.toMap
  }

  // ---- test-side encoders (building fixture messages) ----

  def encodeRecord(schemaJson: String, values: Map[String, Any]): Array[Byte] = {
    val schema = parseSchema(schemaJson)
    val rec = new GenericData.Record(schema)
    values.foreach { case (k, v) => rec.put(k, v) }
    write(schema, rec)
  }

  def encodeWrapper(tableName: String, fingerprint: Long, payload: Array[Byte]): Array[Byte] = {
    val rec = new GenericData.Record(wrapperSchema)
    rec.put("table_name", tableName)
    rec.put("schema_fingerprint", fingerprint)
    rec.put("payload", ByteBuffer.wrap(payload))
    write(wrapperSchema, rec)
  }

  private def write(schema: Schema, rec: GenericRecord): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    out.toByteArray
  }
}
