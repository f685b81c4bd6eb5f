package graft.sources

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericEnumSymbol, GenericFixed, GenericRecord}
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
  private[sources] def parseSchema(json: String): Schema =
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
    * the stringly column map of the change envelope. Complex values go
    * through [[transportString]], so nested records/arrays/maps arrive as
    * lossless JSON, not `toString` garbage. */
  def decodeRecord(bytes: Array[Byte], schemaJson: String): Map[String, String] = {
    val schema = parseSchema(schemaJson)
    val rec = readRecord(bytes, schema)
    schema.getFields.asScala.map { f =>
      f.name -> transportString(rec.get(f.name))
    }.toMap
  }

  private[sources] def readRecord(bytes: Array[Byte], schema: Schema): GenericRecord =
    new GenericDatumReader[GenericRecord](schema)
      .read(null, DecoderFactory.get().binaryDecoder(bytes, null))

  // ---- complex-type transport (reference common/AvroConverter.java:51-225) ----

  /** One decoded Avro value → its envelope transport string.
    *
    * Faithful to the reference's converter surface
    * (AvroConverter.java:106-155): every simple type keeps its natural
    * string form; BYTES/FIXED go base64; ENUM is its symbol; ARRAY, MAP
    * and RECORD serialize as lossless JSON (the map<string,string>
    * envelope regime's nested form); unions resolve to their runtime
    * branch exactly as the reference's instanceof chain does
    * (AvroConverter.java:170-225) — a decoded value IS its branch, so no
    * schema threading is needed. Map keys sort so the JSON is
    * deterministic across JVM map iteration orders. */
  def transportString(v: Any): String = v match {
    case null => null
    case b: ByteBuffer => base64(b)
    case f: GenericFixed => java.util.Base64.getEncoder.encodeToString(f.bytes())
    case _: GenericRecord | _: java.util.Map[_, _] | _: java.util.Collection[_] =>
      val sb = new StringBuilder
      jsonValue(v, sb)
      sb.toString
    case other => other.toString // Utf8/String, numbers, boolean, enum symbol
  }

  private def base64(b: ByteBuffer): String = {
    val d = b.duplicate()
    val arr = new Array[Byte](d.remaining())
    d.get(arr)
    java.util.Base64.getEncoder.encodeToString(arr)
  }

  private def jsonValue(v: Any, sb: StringBuilder): Unit = v match {
    case null => sb.append("null")
    case r: GenericRecord =>
      sb.append('{')
      var first = true
      r.getSchema.getFields.asScala.foreach { f =>
        if (!first) sb.append(',')
        first = false
        jsonString(f.name, sb); sb.append(':'); jsonValue(r.get(f.name), sb)
      }
      sb.append('}')
    case m: java.util.Map[_, _] =>
      sb.append('{')
      var first = true
      m.asScala.toSeq.map { case (k, x) => (k.toString, x) }.sortBy(_._1)
        .foreach { case (k, x) =>
          if (!first) sb.append(',')
          first = false
          jsonString(k, sb); sb.append(':'); jsonValue(x, sb)
        }
      sb.append('}')
    case c: java.util.Collection[_] =>
      sb.append('[')
      var first = true
      c.asScala.foreach { x =>
        if (!first) sb.append(',')
        first = false
        jsonValue(x, sb)
      }
      sb.append(']')
    case b: ByteBuffer => jsonString(base64(b), sb)
    case f: GenericFixed =>
      jsonString(java.util.Base64.getEncoder.encodeToString(f.bytes()), sb)
    case e: GenericEnumSymbol[_] => jsonString(e.toString, sb)
    case s: CharSequence => jsonString(s.toString, sb)
    case b: java.lang.Boolean => sb.append(b.toString)
    case n: Number => sb.append(n.toString)
    case other => jsonString(other.toString, sb)
  }

  private def jsonString(s: String, sb: StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.append('"')
  }

  // ---- test-side encoders (building fixture messages) ----

  def encodeRecord(schemaJson: String, values: Map[String, Any]): Array[Byte] = {
    val schema = parseSchema(schemaJson)
    write(schema, genericRecord(schema, values))
  }

  /** Build a GenericRecord from plain Scala values, schema-directed:
    * Map → record/map, Seq → array, Array[Byte] → bytes/fixed,
    * String → string/enum, union picks null or its non-null branch. */
  def genericRecord(schema: Schema, values: Map[String, Any]): GenericRecord = {
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.foreach { f =>
      rec.put(f.name, toAvro(values.getOrElse(f.name, null), f.schema()))
    }
    rec
  }

  private def toAvro(v: Any, schema: Schema): AnyRef = schema.getType match {
    case Schema.Type.UNION =>
      if (v == null) null
      else {
        val branch = schema.getTypes.asScala
          .find(_.getType != Schema.Type.NULL)
          .getOrElse(throw new IllegalArgumentException(
            s"union $schema has no non-null branch for value $v"))
        toAvro(v, branch)
      }
    case Schema.Type.RECORD =>
      genericRecord(schema, v.asInstanceOf[Map[String, Any]])
    case Schema.Type.ARRAY =>
      val elems = v.asInstanceOf[Seq[Any]].map(toAvro(_, schema.getElementType))
      new GenericData.Array[AnyRef](schema, elems.asJava)
    case Schema.Type.MAP =>
      v.asInstanceOf[Map[String, Any]].map { case (k, x) =>
        k -> toAvro(x, schema.getValueType)
      }.asJava
    case Schema.Type.BYTES => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
    case Schema.Type.FIXED =>
      new GenericData.Fixed(schema, v.asInstanceOf[Array[Byte]])
    case Schema.Type.ENUM =>
      new GenericData.EnumSymbol(schema, v.asInstanceOf[String])
    case _ => v.asInstanceOf[AnyRef]
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
