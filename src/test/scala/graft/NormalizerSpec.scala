package graft

import graft.operators.Normalizer
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the normalizer invariants (SURVEY.md §5):
  * PK-change ⇒ exactly DELETE(before) + INSERT(after); image merge takes
  * the before value iff the isMissing flag is set.
  *
  * Uses raw ScalaCheck generators sampled under fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline dependency cache).
  */
class NormalizerSpec extends SparkSuite {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val rowsGen = Gen.listOfN(40,
    for {
      id <- Gen.choose(0L, 1000L)
      pkChanged <- Gen.oneOf(true, false)
      v <- Gen.choose(-1000000.0, 1000000.0)
    } yield (id, pkChanged, v))

  test("pkChangeSplit emits DELETE+INSERT exactly for changed PKs") {
    (1L to 5L).foreach { seed =>
      val rows = sample(rowsGen, seed)
      val df = rows.toDF("id", "pk_changed", "v")
      def img(op: String, idCol: org.apache.spark.sql.Column) = struct(
        idCol.as("id"), lit(op).as("op"), col("v").as("v"))
      val out = Normalizer.pkChangeSplit(df, col("pk_changed"),
        asDelete = img("DELETE", col("id")),
        asInsert = img("INSERT", col("id") + 5000L),
        asIs = img("UPDATE", col("id")))
        .groupBy(col("op")).count().as[(String, Long)].collect().toMap

      val nChanged = rows.count(_._2).toLong
      val nSame = rows.size - nChanged
      assert(out.getOrElse("DELETE", 0L) == nChanged, s"seed=$seed")
      assert(out.getOrElse("INSERT", 0L) == nChanged, s"seed=$seed")
      assert(out.getOrElse("UPDATE", 0L) == nSame, s"seed=$seed")
    }
  }

  test("mergeImage takes before iff missing flag set") {
    val gen = Gen.listOfN(30, for {
      b <- Gen.choose(-100, 100); a <- Gen.choose(-100, 100)
      m <- Gen.oneOf(true, false)
    } yield (b, a, m))
    (1L to 5L).foreach { seed =>
      val rows = sample(gen, seed)
      val got = rows.toDF("before", "after", "missing")
        .select(Normalizer.mergeImage(col("before"), col("after"),
          col("missing")).as("merged"))
        .as[Int].collect().toSeq
      val want = rows.map { case (b, a, m) => if (m) b else a }
      assert(got == want, s"seed=$seed")
    }
  }

  test("stripMissingFlags removes only bookkeeping fields") {
    import org.apache.spark.sql.types._
    val s = StructType(Seq(
      StructField("a", LongType), StructField("a_isMissing", BooleanType),
      StructField("b", StringType)))
    assert(Normalizer.stripMissingFlags(s).fieldNames.toSeq == Seq("a", "b"))
  }
}
