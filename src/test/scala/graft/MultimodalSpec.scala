package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Edge behavior of the multimodal plumbing ops (the oracle gate covers
  * the happy path via ns56/ns18): frame-sampling boundaries — empty
  * payloads, remainder tail frames, the maxFrames cap — and the
  * resize pooling arithmetic + its divisibility guard. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("sampleFrames: boundaries, remainder tail, cap, empty payload") {
    // 35 bytes at frameBytes=10 → frames 0..3 (tail = 5 bytes);
    // stride 2 → frames 0, 2; maxFrames 4 not binding here
    val media = Seq(
      (1L, "a" * 35),
      (2L, ""),            // empty payload: zero frames, no explode row
      (3L, "b" * 100)      // 10 frames; stride 2 → 5; cap 4 → 0,2,4,6
    ).toDF("media_id", "payload")
      .select(col("media_id"), col("payload").cast("binary").as("payload"))
    val got = Multimodal.sampleFrames(media, frameBytes = 10, stride = 2,
        maxFrames = 4)
      .select(col("media_id"), col("frame_idx"),
        octet_length(col("frame")).as("n"))
      .as[(Long, Int, Int)].collect().toSet
    assert(got == Set(
      (1L, 0, 10), (1L, 2, 10),
      (3L, 0, 10), (3L, 2, 10), (3L, 4, 10), (3L, 6, 10)),
      s"got $got")
    // a remainder tail frame IS emitted when the stride lands on it
    val tail = Multimodal.sampleFrames(media, frameBytes = 10, stride = 3,
        maxFrames = 4)
      .filter(col("media_id") === 1L && col("frame_idx") === 3)
      .select(octet_length(col("frame"))).as[Int].collect()
    assert(tail.toSeq == Seq(5), "frame 3 of 35 bytes must carry the 5-byte tail")
  }

  test("resizeFeatures pools in index order; non-divisible input fails loudly") {
    val f = Seq((1L, Array(1.0f, 3.0f, 5.0f, 7.0f)))
      .toDF("media_id", "features")
    val got = Multimodal.resizeFeatures(f, "features", outDim = 2)
      .select(col("features")).as[Array[Float]].head()
    assert(got.toSeq == Seq(2.0f, 6.0f), s"got ${got.toSeq}")
    val bad = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("media_id", "features")
    val e = intercept[Exception] {
      Multimodal.resizeFeatures(bad, "features", outDim = 2).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("not divisible"))), s"unexpected error: $e")
  }
}
