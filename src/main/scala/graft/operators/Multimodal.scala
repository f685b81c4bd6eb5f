package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling: media payloads travel as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extraction
  * runs batch-wise per partition.
  *
  * The actual media decode is STUBBED — this container has no image/
  * audio codecs — behind [[FakeDecoder]], a deterministic byte-level
  * stand-in. Everything Spark-side is real and tested: the schema shape,
  * the binary column plumbing, the partition-iterator batch shape (the
  * Scala analogue of `mapInPandas` batches), and the downstream join of
  * extracted features back onto relational columns.
  */
object Multimodal {

  val mediaType: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = true),
      StructField("sha", StringType, nullable = true))), nullable = false)))

  /** Wrap a text column as a media payload with typed metadata (the
    * ingest path for any bytes-valued source column). */
  def attachPayload(df: DataFrame, idCol: String, bytesCol: String,
                    mime: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(bytesCol).cast("binary").as("payload"),
      struct(
        lit(mime).as("mime"),
        octet_length(col(bytesCol).cast("binary")).as("n_bytes"),
        sha2(col(bytesCol).cast("binary"), 256).as("sha")).as("meta"))

  final case class MediaRow(media_id: Long, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, features: Array[Float])

  /** The stubbed decoder: in a real deployment this is the codec call
    * (JNI/image lib); here it derives a deterministic feature vector
    * from the raw bytes so the pipeline shape is fully testable. */
  object FakeDecoder {
    def decode(payload: Array[Byte], dim: Int): Array[Float] = {
      var h = 1125899906842597L // deterministic byte-fold seed
      payload.foreach { b => h = h * 31 + (b & 0xff) }
      Array.tabulate(dim) { i =>
        val x = h * (i * 2 + 1) + i
        ((x % 1000 + 1000) % 1000) / 1000.0f
      }
    }
  }

  /** Feature extraction over partition-sized batches: one decoder init
    * per partition (the expensive part in real codecs), then a streamed
    * map over the iterator — never materializes a partition in memory. */
  def extractFeatures(media: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.select(col("media_id"), col("payload")).as[MediaRow]
      .mapPartitions { rows =>
        // per-partition decoder setup would go here
        rows.map(r => MediaFeatures(r.media_id, FakeDecoder.decode(r.payload, dim)))
      }
  }
}
