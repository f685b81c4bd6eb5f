package graft.sources

import graft.model.{ChangeRecord, Ddl, Dml, OpType}
import graft.operators.ChangeFeed
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.GgMessage
import org.apache.avro.{Schema, SchemaNormalization}
import org.apache.avro.generic.GenericRecord
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types._

import java.nio.charset.StandardCharsets.UTF_8
import scala.jdk.CollectionConverters._

/** The GoldenGate DML path on real paired before/after payloads — the
  * reference's Oracle-side Normalizer, re-expressed over the envelope
  * (reference source/oracle/Normalizer.java:59-104 for the message
  * routing, :146-201 for merge/split, :107-121 for the DDL schema
  * normalization; GoldenGateKafka.java:196-237 for the message
  * classification this mirrors in [[classify]]).
  *
  * A GoldenGate payload is a record
  * `{table, op_type, primary_keys, before, after}` where before/after are
  * nullable row images whose record carries a `<col>_isMissing` boolean
  * beside every column. The semantics re-implemented here:
  *
  *   - INSERT → emit the after image.
  *   - DELETE → emit the before image.
  *   - UPDATE → per column, the after value unless its `_isMissing` flag
  *     is set (GoldenGate trail files omit unchanged columns), else the
  *     before value; if any primary-key value changed, split into
  *     DELETE(before) + INSERT(merged) — one input record, two outputs.
  */
object GoldenGateDml {

  /** One row image: transport-form values + the columns whose
    * `_isMissing` flag was set. */
  final case class GgImage(values: Map[String, String], missing: Set[String])

  /** One decoded DML payload. */
  final case class GgDml(table: String, opType: String, primaryKeys: Seq[String],
                         before: Option[GgImage], after: Option[GgImage])

  private def image(r: GenericRecord): GgImage = {
    val fields = r.getSchema.getFields.asScala.toSeq
    GgImage(
      values = fields.filterNot(_.name.endsWith("_isMissing"))
        .map(f => f.name -> GoldenGateAvro.transportString(r.get(f.name))).toMap,
      missing = fields.filter(_.name.endsWith("_isMissing"))
        .filter(f => r.get(f.name) == java.lang.Boolean.TRUE)
        .map(_.name.stripSuffix("_isMissing")).toSet)
  }

  /** Decode one Avro DML payload (fingerprint-resolved schema) into its
    * before/after images (reference Normalizer.java:88-104). */
  def decodeDml(bytes: Array[Byte], schemaJson: String): GgDml = {
    val rec = GoldenGateAvro.readRecord(bytes, GoldenGateAvro.parseSchema(schemaJson))
    def img(name: String) =
      Option(rec.get(name)).map(r => image(r.asInstanceOf[GenericRecord]))
    GgDml(
      table = rec.get("table").toString,
      opType = OpType.parse(rec.get("op_type").toString),
      primaryKeys = rec.get("primary_keys").asInstanceOf[java.util.Collection[_]]
        .asScala.map(_.toString).toSeq,
      before = img("before"),
      after = img("after"))
  }

  /** Spark type of one Avro column for the flatten-side row schema.
    * Simple types map natively; BYTES/FIXED and the complex family are
    * strings because that is their transport form
    * ([[GoldenGateAvro.transportString]]); a `[null, X]` union is just a
    * nullable X. */
  private[sources] def sparkTypeOf(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.NULL => NullType
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (nonNull.size == 1) sparkTypeOf(nonNull.head) else StringType
    case _ => StringType // string/enum, bytes/fixed (base64), array/map/record (JSON)
  }

  /** The non-null branch of the payload schema's `before` field — the row
    * record every image conforms to. */
  private def rowAvroSchema(payloadSchema: Schema): Schema = {
    val before = payloadSchema.getField("before").schema()
    if (before.getType == Schema.Type.UNION)
      before.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else before
  }

  /** Row schema for flatten/DDL: the image's columns minus the
    * `_isMissing` flags (reference Normalizer.java:107-121). */
  def rowStructType(payloadSchemaJson: String): StructType = {
    val row = rowAvroSchema(GoldenGateAvro.parseSchema(payloadSchemaJson))
    StructType(row.getFields.asScala.toSeq
      .filterNot(_.name.endsWith("_isMissing"))
      .map(f => StructField(f.name, sparkTypeOf(f.schema()))))
  }

  /** DDL record for a schema message: `namespace.name` of the payload
    * schema + the normalized row schema (reference Normalizer.java:73-81). */
  def ddlOf(payloadSchemaJson: String): Ddl = {
    val s = GoldenGateAvro.parseSchema(payloadSchemaJson)
    Ddl(s.getNamespace + "." + s.getName, rowStructType(payloadSchemaJson).json)
  }

  /** Merge/split one decoded DML into envelope records (reference
    * Normalizer.java:146-201). 1→1 normally; 1→2 on a primary-key-moving
    * UPDATE. */
  def normalize(d: GgDml, rowSchemaJson: String, version: Long,
                tsMicros: Long = 0L): Seq[Dml] = {
    def dml(op: String, values: Map[String, String]) =
      Dml(op, d.table, d.primaryKeys, rowSchemaJson, values,
        version.toString, tsMicros)
    def require_(img: Option[GgImage], which: String): GgImage =
      img.getOrElse(throw new IllegalStateException(
        s"${d.opType} record for ${d.table} has no $which image"))
    d.opType match {
      case OpType.Insert => Seq(dml(OpType.Insert, require_(d.after, "after").values))
      case OpType.Delete => Seq(dml(OpType.Delete, require_(d.before, "before").values))
      case OpType.Update =>
        val before = require_(d.before, "before")
        val after = require_(d.after, "after")
        // unchanged columns are missing from the trail: take them from
        // the before image (Normalizer.java:173-184)
        val merged = after.values.map { case (f, v) =>
          f -> (if (after.missing.contains(f)) before.values.getOrElse(f, null) else v)
        }
        val pkChanged = d.primaryKeys.exists(k =>
          before.values.get(k) != after.values.get(k))
        if (pkChanged)
          Seq(dml(OpType.Delete, before.values), dml(OpType.Insert, merged))
        else Seq(dml(OpType.Update, merged))
      case other => throw new IllegalArgumentException(s"unknown op type: $other")
    }
  }

  /** Classify one raw Kafka-shaped message (reference
    * GoldenGateKafka.java:208-237): the generic-wrapper schema
    * announcement is ignored; a schema JSON body registers under its
    * parsing fingerprint; anything else is a wrapped DML whose payload
    * rides base64 until its schema resolves. */
  def classify(bytes: Array[Byte], version: Long): GgMessage = {
    val body = new String(bytes, UTF_8)
    if (body.contains("generic_wrapper") && body.contains("oracle.goldengate"))
      GgMessage("ignore", 0L, "", version)
    else if (body.replaceAll("\\s", "").contains("\"type\":\"record\"")) {
      val schema = new Schema.Parser().parse(body)
      GgMessage("schema", SchemaNormalization.parsingFingerprint64(schema), body, version)
    } else {
      val w = GoldenGateAvro.readRecord(bytes, GoldenGateAvro.parseSchema(GoldenGateAvro.WrapperSchemaJson))
      val payload = w.get("payload").asInstanceOf[java.nio.ByteBuffer]
      val arr = new Array[Byte](payload.remaining())
      payload.duplicate().get(arr)
      GgMessage("data", w.get("schema_fingerprint").asInstanceOf[Long],
        java.util.Base64.getEncoder.encodeToString(arr), version)
    }
  }

  /** The composed source: classified messages → fingerprint registry →
    * payload decode → merge/split → envelope, DDL records ahead of DML.
    * Works identically on a batch Dataset and a streaming one (the
    * registry is `flatMapGroupsWithState`; in batch it scopes to the
    * dataset). A data message whose fingerprint never resolved fails the
    * task with a named error — the reference NPEs there
    * (Normalizer.java:96-97); same posture, better message. */
  /** The full Kafka-shaped assembly: `readStream` over a
    * [[GoldenGateFeedProvider]] log (with the −1/−2 initial-offset
    * resolution and single-partition enforcement of the reference
    * transport), message offset as the change version, then [[classify]]
    * → [[pipeline]]. Swapping the format string for Spark's kafka source
    * is the only production delta. */
  def fromFeed(spark: org.apache.spark.sql.SparkSession, logName: String,
               initialOffset: Long = GoldenGateFeed.LatestSentinel,
               maxBatchSize: Long = 1000L): DataFrame = {
    import spark.implicits._
    val raw = spark.readStream.format(classOf[GoldenGateFeedProvider].getName)
      .option("log", logName)
      .option("initialOffset", initialOffset.toString)
      .option("maxBatchSize", maxBatchSize.toString)
      .load()
    pipeline(raw.as[(Long, Array[Byte])]
      .map { case (offset, bytes) => classify(bytes, offset) })
  }

  /** Adapter from the standard Spark kafka source schema
    * (`key binary, value binary, topic string, partition int,
    * offset long, timestamp, timestampType`) into the same classify →
    * registry → decode → envelope pipeline — so a real topic IS the
    * one-line swap [[fromFeed]] promises:
    * {{{
    *   val raw = spark.readStream.format("kafka")
    *     .option("kafka.bootstrap.servers", brokers)
    *     .option("subscribe", topic).load()
    *   val envelope = GoldenGateDml.fromKafkaShaped(raw)
    * }}}
    * Only `value` and `offset` are read; `partition`, when present, is
    * ENFORCED single-valued per the reference's transport contract
    * (GoldenGateKafka.java:116-140 builds the consumer over exactly one
    * partition; offsets are the change versions at :142-169, which
    * totally order changes ONLY within one partition — a multi-partition
    * topic would interleave versions incoherently, so a stray partition
    * fails the task with a named error rather than mis-ordering
    * silently). Works identically on batch and streaming DataFrames.
    */
  def fromKafkaShaped(df: DataFrame, expectedPartition: Int = 0): DataFrame = {
    val cols = df.columns.toSet
    require(Set("value", "offset").subsetOf(cols),
      s"kafka-shaped input needs (value, offset), got: ${df.columns.mkString(", ")}")
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val partitionCol =
      if (cols.contains("partition")) col("partition").cast("int")
      else lit(expectedPartition)
    pipeline(df
      .select(partitionCol.as("p"), col("offset").cast("long"), col("value"))
      .as[(Int, Long, Array[Byte])]
      .map { case (p, offset, bytes) =>
        if (p != expectedPartition) throw new IllegalStateException(
          s"GoldenGate transport must be a single Kafka partition " +
            s"(expected $expectedPartition, saw $p): offsets are the change " +
            "versions and only totally order within one partition")
        classify(bytes, offset)
      })
  }

  /** [[classify]], but malformed bytes become a `deadletter` message
    * instead of failing the task. The reference kills the stream on the
    * first undecodable message (GoldenGateKafka.java:208-237 lets the
    * Avro exception propagate); at production volume one corrupt record
    * must not stop a 100 TB pipeline — route [[deadLetters]] to a
    * quarantine sink and keep consuming. The payload rides base64 with
    * its offset so the quarantined original is fully recoverable. */
  def classifySafe(bytes: Array[Byte], version: Long): GgMessage =
    try classify(bytes, version)
    catch {
      case scala.util.control.NonFatal(_) =>
        GgMessage("deadletter", 0L,
          java.util.Base64.getEncoder.encodeToString(bytes), version)
    }

  /** The quarantine side of [[classifySafe]]. */
  def deadLetters(msgs: Dataset[GgMessage]): Dataset[GgMessage] =
    msgs.filter(_.kind == "deadletter")

  def pipeline(msgs: Dataset[GgMessage]): DataFrame = {
    import msgs.sparkSession.implicits._
    val live = msgs.filter(m => m.kind != "ignore" && m.kind != "deadletter")
    val ddl: DataFrame = live.filter(_.kind == "schema")
      .map(m => ChangeRecord.ofDdl(ddlOf(m.payload))).toDF()
    val dml: DataFrame = StatefulOps.resolveSchemas(live)
      .flatMap { rd =>
        val schemaJson = rd.schemaJson.getOrElse(throw new IllegalStateException(
          s"no schema registered for fingerprint ${rd.fingerprint}"))
        val gg = decodeDml(java.util.Base64.getDecoder.decode(rd.payload), schemaJson)
        normalize(gg, rowStructType(schemaJson).json, rd.version)
          .map(ChangeRecord.ofDml)
      }.toDF()
    ChangeFeed.unionDdlFirst(ddl, dml)
  }
}
