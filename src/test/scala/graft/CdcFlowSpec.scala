package graft

import graft.model._
import graft.operators.{CdcApply, ChangeFeed, DmlFlattener}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end golden-record flow: the reference's full I/U/D integration
  * scenario (CTSQLServerPluginIntegrationTest.java:322-390 feeding the
  * sink expectations of CDCBigTablePluginIntegrationTest.java:259-316) —
  * insert rows, update one, delete one, and assert the compacted final
  * state. */
class CdcFlowSpec extends SparkSuite {
  import spark.implicits._

  private val rowSchema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def dml(op: String, version: Long, id: Long, name: String, score: Double) =
    ChangeRecord.ofDml(Dml(op, "dbo.people", Seq("id"), rowSchema.json,
      Map("id" -> id.toString, "name" -> name, "score" -> score.toString),
      version.toString, version * 1000L))

  test("golden I/U/D sequence flattens and compacts to the expected final state") {
    val changes = Seq(
      dml(OpType.Insert, 1, 1L, "alice", 10.5),
      dml(OpType.Insert, 2, 2L, "bob", 20.0),
      dml(OpType.Insert, 3, 3L, "carol", 30.25),
      dml(OpType.Update, 4, 1L, "alice2", 11.0),
      dml(OpType.Delete, 5, 2L, "bob", 20.0))
    val env = changes.toDS().toDF()

    val flat = DmlFlattener.flatten(env, rowSchema, includeCdcColumns = true)
    assert(flat.columns.toSeq == Seq("id", "name", "score",
      DmlFlattener.OpTypeCol, DmlFlattener.VersionCol, DmlFlattener.TimestampCol))
    assert(flat.count() == 5)
    assert(flat.schema("score").dataType == DoubleType)

    val finalState = CdcApply.applyChanges(flat, Seq("id"),
      col(DmlFlattener.OpTypeCol),
      col(DmlFlattener.VersionCol).cast("long"))
      .select($"id", $"name", $"score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet

    assert(finalState == Set((1L, "alice2", 11.0), (3L, "carol", 30.25)))
  }

  test("flattenInferred derives the output schema from in-band rows_schema JSON") {
    val changes = Seq(dml(OpType.Insert, 1, 7L, "gail", 1.25)).toDS().toDF()
    val flat = DmlFlattener.flattenInferred(changes)
    assert(flat.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(flat.schema("id").dataType == LongType)
    val r = flat.collect().head
    assert((r.getLong(0), r.getString(1), r.getDouble(2)) == ((7L, "gail", 1.25)))
  }

  test("envelope holds exactly one of ddl/dml") {
    intercept[IllegalArgumentException](ChangeRecord(None, None))
    intercept[IllegalArgumentException](
      ChangeRecord(Some(Ddl("t", "{}")),
        Some(Dml("INSERT", "t", Seq(), "{}", Map(), "1", 0L))))
  }

  test("op type parsing accepts long and short forms") {
    assert(OpType.parse("i") == OpType.Insert)
    assert(OpType.parse("UPDATE") == OpType.Update)
    assert(OpType.parse("D") == OpType.Delete)
    intercept[IllegalArgumentException](OpType.parse("X"))
  }

  test("wrapDml/flatten roundtrip preserves values and DDL-first union ordering holds") {
    val rows = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    val env = ChangeFeed.wrapDml(rows, "dbo.t", Seq("id"),
      lit("INSERT"), lit(1L), lit(0L))
    val ddl = ChangeFeed.wrapDdl(spark, "dbo.t", rows.schema)
    val batch = ChangeFeed.unionDdlFirst(ddl, env).collect()
    assert(batch.head.getAs[Any]("ddl") != null)
    assert(batch.drop(1).forall(_.getAs[Any]("dml") != null))

    val back = DmlFlattener.flatten(env, rows.schema)
      .as[(Long, String)].collect().toSet
    assert(back == Set((1L, "x"), (2L, "y")))
  }

  test("scd2History keeps full versioned history; DELETE closes but emits nothing") {
    val changes = Seq(
      dml(OpType.Insert, 1, 1L, "alice", 10.5),
      dml(OpType.Update, 4, 1L, "alice2", 11.0),
      dml(OpType.Insert, 2, 2L, "bob", 20.0),
      dml(OpType.Delete, 5, 2L, "bob", 20.0),
      dml(OpType.Insert, 3, 3L, "carol", 30.25)).toDS().toDF()
    val flat = DmlFlattener.flatten(changes, rowSchema, includeCdcColumns = true)
    val hist = CdcApply.scd2History(flat, Seq("id"),
      col(DmlFlattener.OpTypeCol), col(DmlFlattener.VersionCol).cast("long"))
      .select($"id", $"name", $"valid_from", $"valid_to", $"is_current")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))
      .toSet
    assert(hist == Set(
      (1L, "alice", 1L, 4L, false),   // superseded by the v4 update
      (1L, "alice2", 4L, -1L, true),  // open + current
      (2L, "bob", 2L, 5L, false),     // window closed by the DELETE
      (3L, "carol", 3L, -1L, true)))
    // the deleted key contributes no open row
    assert(!hist.exists { case (id, _, _, to, cur) => id == 2L && (to == -1L || cur) })
  }

  test("netChanges compacts each key's history to its minimal net op") {
    val changes = Seq(
      // key 1: INSERT → UPDATE → UPDATE ⇒ net INSERT with the last image
      dml(OpType.Insert, 1, 1L, "a0", 1.0),
      dml(OpType.Update, 4, 1L, "a1", 1.5),
      dml(OpType.Update, 6, 1L, "a2", 2.0),
      // key 2: INSERT → DELETE ⇒ vanishes entirely
      dml(OpType.Insert, 2, 2L, "b0", 9.0),
      dml(OpType.Delete, 5, 2L, "b0", 9.0),
      // key 3: UPDATE → UPDATE ⇒ net UPDATE with the last image
      dml(OpType.Update, 3, 3L, "c0", 5.0),
      dml(OpType.Update, 7, 3L, "c1", 5.5),
      // key 4: UPDATE → DELETE ⇒ net DELETE
      dml(OpType.Update, 8, 4L, "d0", 7.0),
      dml(OpType.Delete, 9, 4L, "d0", 7.0),
      // key 5: lone INSERT passes through
      dml(OpType.Insert, 10, 5L, "e0", 3.0)).toDS().toDF()
    val flat = DmlFlattener.flatten(changes, rowSchema, includeCdcColumns = true)
    val net = CdcApply.netChanges(flat, Seq("id"),
      col(DmlFlattener.OpTypeCol), col(DmlFlattener.VersionCol).cast("long"))
      .select($"id", $"net_op", $"name", $"n_ops")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(net == Set(
      (1L, OpType.Insert, "a2", 3L),
      (3L, OpType.Update, "c1", 2L),
      (4L, OpType.Delete, "d0", 2L),
      (5L, OpType.Insert, "e0", 1L)))
  }

  test("netChanges is apply-equivalent: netted log converges to the raw log's state") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val logGen = Gen.listOfN(60, for {
      id <- Gen.choose(0L, 12L) // few keys → long per-key histories
      op <- Gen.oneOf(OpType.Insert, OpType.Update, OpType.Delete)
      v <- Gen.choose(-1000.0, 1000.0)
    } yield (id, op, v))
    (1L to 5L).foreach { seed =>
      val rows = sample(logGen, seed).zipWithIndex
        .map { case ((id, op, v), i) => (id, op, v, i.toLong) }
      val df = rows.toDF("id", "op", "v", "ver")
      def state(changes: org.apache.spark.sql.DataFrame, opCol: String) =
        CdcApply.applyChanges(changes, Seq("id"), col(opCol), col("ver"))
          .select($"id", $"v").as[(Long, Double)].collect().toSet
      val raw = state(df, "op")
      val net = CdcApply.netChanges(df, Seq("id"), col("op"), col("ver"))
      assert(state(net, "net_op") == raw, s"seed=$seed")
      // netting emits at most one row per key, and none for keys whose
      // history both begins with INSERT and ends with DELETE
      val perKey = net.groupBy($"id").count().as[(Long, Long)].collect()
      assert(perKey.forall(_._2 == 1L), s"seed=$seed")
    }
  }

  test("schema-evolution apply: pre-DDL epoch null-pads the added column") {
    // cdc29's semantics in miniature: an in-band DDL adds `tier` between
    // version 2 and 3. Keys whose LAST change predates the DDL surface
    // with tier NULL (exactly a freshly ALTERed nullable column); keys
    // touched after it carry the value; a post-DDL DELETE still deletes.
    val pre = Seq((1L, "INSERT", 1L, 10.0), (2L, "INSERT", 2L, 20.0),
      (3L, "INSERT", 2L, 30.0)).toDF("id", "op", "ver", "score")
    val post = Seq((2L, "UPDATE", 3L, 21.0, "gold"),
      (3L, "DELETE", 4L, 30.0, "drop"))
      .toDF("id", "op", "ver", "score", "tier")
    val merged = pre.unionByName(post, allowMissingColumns = true)
    assert(merged.schema("tier").nullable)
    val state = CdcApply.applyChanges(merged, Seq("id"), col("op"), col("ver"))
      .select($"id", $"score", $"tier").collect()
      .map(r => (r.getLong(0), r.getDouble(1), Option(r.getString(2)))).toSet
    assert(state == Set((1L, 10.0, None), (2L, 21.0, Some("gold"))))
  }
}
