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

  /** Frame sampling — the video-processing explode shape: each payload
    * is treated as a container of `frameBytes`-sized frames (the stub
    * for a real demuxer's frame boundaries), and every `stride`-th
    * frame is emitted, at most `maxFrames` per media row, as
    * `(media_id, frame_idx, frame)` — frame a binary slice. All
    * row-local codegen'd arithmetic (no shuffle, no UDF): the frame
    * count is derived from `octet_length`, the sampled index list is a
    * bounded `sequence`, the slice is `substr` on the binary column —
    * so sampling pushes down to the scan and fan-out is capped at
    * `maxFrames` rows per media row at any corpus size. A short final
    * frame carries the remainder bytes, exactly like a demuxer's tail
    * frame. */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int,
                   maxFrames: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0 && maxFrames > 0,
      s"need positive frameBytes/stride/maxFrames, " +
        s"got $frameBytes/$stride/$maxFrames")
    val nFrames = ceil(octet_length(col("payload"))
      / lit(frameBytes.toDouble)).cast("int")
    val k = least(lit(maxFrames),
      ceil(nFrames / lit(stride.toDouble)).cast("int"))
    // sequence(0, k-1) would COUNT DOWN for k = 0 (Spark generates a
    // descending range when stop < start) — guard empty payloads out.
    val idxs = when(k >= 1,
      transform(sequence(lit(0), k - 1), i => i * stride))
      .otherwise(array().cast("array<int>"))
    media.select(col("media_id"), explode(idxs).as("frame_idx"),
        col("payload"))
      .select(col("media_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1,
          lit(frameBytes)).as("frame"))
  }

  /** Feature resize — deterministic average-pooling of a feature vector
    * to `outDim` (the resize/downsample step between decode and index):
    * out[j] = mean of the j-th group of `inDim/outDim` inputs, folded in
    * index order so the doubles are bit-stable on any engine. Row-local
    * array arithmetic; requires the input length to divide evenly (a
    * real resampler would interpolate — the stub keeps exactness). */
  def resizeFeatures(features: DataFrame, featuresCol: String,
                     outDim: Int): DataFrame = {
    require(outDim > 0, s"outDim must be positive, got $outDim")
    val in = col(featuresCol)
    val factor = (size(in) / outDim).cast("int")
    val pooled = transform(sequence(lit(0), lit(outDim - 1)), j =>
      (aggregate(
        transform(sequence(lit(1), factor), r =>
          element_at(in, j * factor + r).cast("double")),
        lit(0.0), (acc, x) => acc + x) / factor).cast("float"))
    features.withColumn(featuresCol,
      when(size(in) % outDim === 0, pooled)
        .otherwise(raise_error(concat(lit(
          s"resizeFeatures: input length "), size(in).cast("string"),
          lit(s" is not divisible by outDim $outDim")))))
  }
}
