package graft

import org.apache.spark.sql.functions._

/** The variant contracts q62/q63 stand on: parse_json rejects
  * malformed input loudly while try_parse_json quarantines it as NULL
  * (the dead-letter posture for open-schema ingest); variant_get on a
  * MISSING path is NULL (absence is data, not an error) while a type
  * MISMATCH on a present path fails loudly unless the try_ form is
  * asked for. */
class VariantSpec extends SparkSuite {
  import spark.implicits._

  test("malformed JSON: parse_json raises, try_parse_json quarantines as NULL") {
    val bad = Seq("{not json").toDF("s")
    val e = intercept[Exception](bad.select(parse_json(col("s"))).collect())
    assert(e.getMessage.toLowerCase.contains("json") ||
      e.getCause != null, s"unexpected error shape: ${e.getMessage}")
    val quarantined = bad.select(try_parse_json(col("s")).as("v")).collect()
    assert(quarantined.head.isNullAt(0),
      "try_parse_json must yield NULL for malformed input")
  }

  test("missing path is NULL; present-path type mismatch is loud, try_ is NULL") {
    val df = Seq("""{"k": 5, "s": "text"}""").toDF("j")
      .select(parse_json(col("j")).as("v"))
    val got = df.select(
      variant_get(col("v"), "$.missing", "int").as("m"),
      variant_get(col("v"), "$.k", "int").as("k"),
      try_variant_get(col("v"), "$.s", "int").as("bad")).collect().head
    assert(got.isNullAt(0), "missing path must be NULL, not an error")
    assert(got.getInt(1) == 5)
    assert(got.isNullAt(2), "try_variant_get must NULL a type mismatch")
    val e = intercept[Exception](
      df.select(variant_get(col("v"), "$.s", "int")).collect())
    assert(e.getMessage.nonEmpty)
  }
}
