package graft

import graft.operators.ChangeFeed
import graft.sinks.{KeyBloom, ParquetUpsertStore, SecondaryIndex, StoreMaintenance}
import org.apache.spark.sql.functions._

/** Model fuzz across the WHOLE sidecar-artifact surface at once:
  * random op sequences (insert/update/delete over a small key space,
  * numeric and non-numeric values) applied through the index-first
  * ordering, with COMPACTION FIRED AT RANDOM BATCH BOUNDARIES and a
  * random redelivery — after every batch, every read path (equality,
  * range, intersection, bloom-fronted point lookup) must equal its
  * snapshot-filter twin, and ghost probes must still prune. The
  * per-path specs pin each face in isolation; this pins their
  * COMPOSITION under histories none of them chose. */
class ArtifactFuzzSpec extends SparkSuite {
  import spark.implicits._

  test("random histories with random compactions keep every artifact read path exact") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get

    val opsGen = Gen.listOfN(48, for {
      k <- Gen.choose(1, 10).map(i => s"k$i")
      v <- Gen.oneOf("5", "15", "25", "35", "oddball", "")
      w <- Gen.oneOf("a", "b")
      op <- Gen.frequency(5 -> "INSERT", 3 -> "UPDATE", 2 -> "DELETE")
    } yield (k, v, w, op))
    val compactAfterGen = Gen.listOfN(4, Gen.oneOf(true, false))
    val pairName = SecondaryIndex.compositeName(Seq("val", "v2"))

    (10L to 13L).foreach { seed =>
      val root = checkpointDir(s"artifact-fuzz-$seed")
      val store = new ParquetUpsertStore(root, numBuckets = 4)
      val ops = sample(opsGen, seed).zipWithIndex
        .map { case ((k, v, w, op), i) => (k, v, w, op, (i + 1).toLong) }
      val compactAfter = sample(compactAfterGen, seed * 7 + 1)

      def liveSet(df: org.apache.spark.sql.DataFrame) =
        df.select(col("row_key"), col("version")).as[(String, Long)]
          .collect().toSet
      def checkAll(tag: String): Unit = {
        def scan = store.snapshot(spark, "t")
        Seq("5", "15", "oddball", "", "absent").foreach { v =>
          assert(liveSet(SecondaryIndex.lookupByValue(
              spark, store, root, "t", "val", v)) ==
            liveSet(scan.filter(
              try_element_at(col("values"), lit("val")) === v)),
            s"seed=$seed [$tag] equality diverges for '$v'")
        }
        Seq((0.0, 20.0), (10.0, 40.0)).foreach { case (lo, hi) =>
          assert(liveSet(SecondaryIndex.lookupByRange(
              spark, store, root, "t", "val", lo, hi)) ==
            liveSet(scan.filter(try_element_at(col("values"), lit("val"))
              .try_cast("double").between(lo, hi))),
            s"seed=$seed [$tag] range diverges for [$lo,$hi]")
        }
        assert(liveSet(SecondaryIndex.lookupByAll(spark, store, root, "t",
            equalTo = Map("val" -> "15"),
            inRange = Map("val" -> (0.0, 20.0)))) ==
          liveSet(scan
            .filter(try_element_at(col("values"), lit("val")) === "15")
            .filter(try_element_at(col("values"), lit("val"))
              .try_cast("double").between(0.0, 20.0))),
          s"seed=$seed [$tag] intersection diverges")
        // composite PAIR index under the same fuzz: the pair covers v2
        // (no single v2 index exists), candidates from pair postings,
        // members re-verified — must equal the conjunctive filter
        for (v <- Seq("15", "oddball", "absent"); w <- Seq("a", "b")) {
          assert(liveSet(SecondaryIndex.lookupByAll(spark, store, root, "t",
              equalTo = Map("val" -> v, "v2" -> w))) ==
            liveSet(scan
              .filter(try_element_at(col("values"), lit("val")) === v)
              .filter(try_element_at(col("values"), lit("v2")) === w)),
            s"seed=$seed [$tag] pair lookup diverges for ($v, $w)")
        }
        val probes = (1 to 10).map(i => s"k$i") ++
          (1 to 20).map(i => s"ghost-$i")
        assert(liveSet(KeyBloom.lookup(spark, store, root, "t", probes)) ==
          liveSet(store.lookup(spark, "t", probes)),
          s"seed=$seed [$tag] bloom-fronted lookup diverges")
      }

      var lastEnv: org.apache.spark.sql.DataFrame = null
      var lastId = -1L
      ops.grouped(12).zipWithIndex.foreach { case (g, idx) =>
        val id = idx.toLong
        val env = ChangeFeed.wrapDml(
          g.toDF("user_id", "val", "v2", "op0", "ver"),
          "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))
        SecondaryIndex.indexBatch(root, "t", "val", env, id)
        SecondaryIndex.indexBatchComposite(root, "t", Seq("val", "v2"), env, id)
        KeyBloom.addBatch(spark, root, "t", env, id)
        store.applyBatch(env, id)
        lastEnv = env; lastId = id
        if (compactAfter(idx))
          StoreMaintenance.run(spark, store, root, "t",
            Seq("val", pairName), id)
        checkAll(s"after batch $id${if (compactAfter(idx)) "+compact" else ""}")
      }
      // at-least-once redelivery of the final batch changes nothing
      SecondaryIndex.indexBatch(root, "t", "val", lastEnv, lastId)
      SecondaryIndex.indexBatchComposite(root, "t", Seq("val", "v2"),
        lastEnv, lastId)
      KeyBloom.addBatch(spark, root, "t", lastEnv, lastId)
      store.applyBatch(lastEnv, lastId)
      checkAll("after redelivery")
    }
  }

  test("random coverage gaps, maintenance, and vacuums never break a read path") {
    // The round-16 coverage machinery under fuzz: batches RANDOMLY skip
    // their indexBatch or addBatch (partial adoption / swallowed
    // failures), maintenance folds fire at random boundaries, and
    // vacuum sometimes runs DIRECTLY (not through StoreMaintenance's
    // safe ordering). Every read path must still equal its
    // snapshot-filter twin after every batch — pruned when coverage is
    // provable, loudly degraded to the unpruned scan when it is not,
    // NEVER a silently dropped row.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get

    val opsGen = Gen.listOfN(40, for {
      k <- Gen.choose(1, 10).map(i => s"k$i")
      v <- Gen.oneOf("5", "15", "25", "oddball", "")
      op <- Gen.frequency(5 -> "INSERT", 3 -> "UPDATE", 2 -> "DELETE")
    } yield (k, v, op))
    val planGen = Gen.listOfN(5, for {
      skipIndex <- Gen.frequency(3 -> false, 1 -> true)
      skipBloom <- Gen.frequency(3 -> false, 1 -> true)
      maintain <- Gen.oneOf(true, false)
      vacuum <- Gen.frequency(3 -> false, 1 -> true)
    } yield (skipIndex, skipBloom, maintain, vacuum))

    (20L to 23L).foreach { seed =>
      val root = checkpointDir(s"artifact-gapfuzz-$seed")
      val store = new ParquetUpsertStore(root, numBuckets = 4)
      val ops = sample(opsGen, seed).zipWithIndex
        .map { case ((k, v, op), i) => (k, v, op, (i + 1).toLong) }
      val plan = sample(planGen, seed * 13 + 5)

      def liveSet(df: org.apache.spark.sql.DataFrame) =
        df.select(col("row_key"), col("version")).as[(String, Long)]
          .collect().toSet
      def checkAll(tag: String): Unit = {
        def scan = store.snapshot(spark, "t")
        Seq("5", "15", "oddball", "", "absent").foreach { v =>
          assert(liveSet(SecondaryIndex.lookupByValue(
              spark, store, root, "t", "val", v)) ==
            liveSet(scan.filter(
              try_element_at(col("values"), lit("val")) === v)),
            s"seed=$seed [$tag] equality diverges for '$v'")
        }
        assert(liveSet(SecondaryIndex.lookupByRange(
            spark, store, root, "t", "val", 0.0, 20.0)) ==
          liveSet(scan.filter(try_element_at(col("values"), lit("val"))
            .try_cast("double").between(0.0, 20.0))),
          s"seed=$seed [$tag] range diverges")
        val probes = (1 to 10).map(i => s"k$i") ++
          (1 to 15).map(i => s"ghost-$i")
        assert(liveSet(KeyBloom.lookup(spark, store, root, "t", probes)) ==
          liveSet(store.lookup(spark, "t", probes)),
          s"seed=$seed [$tag] bloom-fronted lookup diverges")
      }

      // batch 0 always fully adopted, so the index directory exists
      // (a never-indexed column is a named ERROR by contract, not a
      // fallback — that face is pinned in SecondaryIndexSpec)
      ops.grouped(8).zipWithIndex.foreach { case (g, idx) =>
        val id = idx.toLong
        val (skipIndex, skipBloom, maintain, vacuum) = plan(idx)
        val env = ChangeFeed.wrapDml(g.toDF("user_id", "val", "op0", "ver"),
          "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))
        if (idx == 0 || !skipIndex)
          SecondaryIndex.indexBatch(root, "t", "val", env, id)
        if (idx == 0 || !skipBloom)
          KeyBloom.addBatch(spark, root, "t", env, id)
        store.applyBatch(env, id)
        if (maintain)
          StoreMaintenance.run(spark, store, root, "t", Seq("val"), id)
        if (vacuum) // direct vacuum — NOT the safe composite ordering
          store.vacuum(spark, "t", keepFromBatchId = id)
        checkAll(s"batch $id skipIdx=$skipIndex skipBloom=$skipBloom " +
          s"maint=$maintain vac=$vacuum")
      }
    }
  }
}
