package graft

import graft.operators.ChangeFeed
import graft.sinks.{ParquetUpsertStore, SecondaryIndex}
import org.apache.spark.sql.functions._

/** Secondary-index contract: index-first lookups equal snapshot filters
  * exactly — stale postings (value changes, deletes, within-batch
  * supersessions) are false positives the live re-verification prunes,
  * never false negatives; time travel bounds the postings by batch and
  * verifies against the historical snapshot; the over-popular guard and
  * the partition-pruned postings read are both pinned. */
class SecondaryIndexSpec extends SparkSuite {
  import spark.implicits._

  private def env(rows: Seq[(String, String, String, Long)]) =
    ChangeFeed.wrapDml(
      rows.toDF("user_id", "val", "op0", "ver"),
      "t", Seq("user_id"), col("op0"), col("ver"), lit(0L))

  private def liveSet(df: org.apache.spark.sql.DataFrame): Set[(String, Long)] =
    df.select(col("row_key"), col("version"))
      .as[(String, Long)].collect().toSet

  test("index-first lookups equal snapshot filters through change, delete, and time travel") {
    val root = checkpointDir("secidx")
    val store = new ParquetUpsertStore(root, numBuckets = 4)

    val b0 = env(Seq(
      ("k1", "a", "INSERT", 1L), ("k2", "a", "INSERT", 1L),
      ("k3", "a", "INSERT", 1L), ("k4", "b", "INSERT", 1L)))
    val b1 = env(Seq(
      ("k1", "b", "UPDATE", 2L), ("k2", "a", "DELETE", 2L),
      ("k5", "a", "INSERT", 2L)))
    Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      SecondaryIndex.indexBatch(root, "t", "val", b, id) // index-first contract
      store.applyBatch(b, id)
    }

    def byIndex(v: String, at: Option[Long] = None) = liveSet(
      SecondaryIndex.lookupByValue(spark, store, root, "t", "val", v, at))
    def byScan(v: String, at: Option[Long] = None) = liveSet(
      at.fold(store.snapshot(spark, "t"))(store.snapshotAt(spark, "t", _))
        .filter(try_element_at(col("values"), lit("val")) === v))

    Seq("a", "b", "nope").foreach { v =>
      assert(byIndex(v) == byScan(v), s"live lookup diverges for '$v'")
    }
    // The pruning actually had work to do: k1 changed value, k2 died.
    assert(byIndex("a").map(_._1) == Set("k3", "k5"))
    assert(byIndex("b").map(_._1) == Set("k1", "k4"))

    // Time travel: postings batch-bounded, verified at the old snapshot.
    Seq("a", "b").foreach { v =>
      assert(byIndex(v, Some(0L)) == byScan(v, Some(0L)),
        s"as-of lookup diverges for '$v'")
    }
    assert(byIndex("a", Some(0L)).map(_._1) ==
      Set("k1", "k2", "k3"))

    // Redelivery: re-indexing an applied batch duplicates postings and
    // changes nothing (the lookup's DISTINCT + live verification).
    SecondaryIndex.indexBatch(root, "t", "val", b1, 1L)
    assert(byIndex("a") == byScan("a"), "duplicate postings leaked through")

    // Over-popular value fails loudly instead of a data-sized collect.
    val e = intercept[IllegalArgumentException](
      SecondaryIndex.lookupByValue(spark, store, root, "t", "val", "a",
        maxKeys = 1))
    assert(e.getMessage.contains("too popular"))

    // Compaction: rebuilt from the live snapshot, answers unchanged,
    // stale postings gone (exactly one row per live indexed value), and
    // a post-compaction append still lands.
    SecondaryIndex.compact(spark, store, root, "t", "val", asBatch = 1L)
    Seq("a", "b", "nope").foreach { v =>
      assert(byIndex(v) == byScan(v), s"post-compaction lookup diverges for '$v'")
    }
    val postRows = spark.read
      .parquet(SecondaryIndex.indexDir(root, "t", "val")).count()
    assert(postRows == 4L, s"compacted postings must equal live rows, got $postRows")
    // Index-before-apply ordering (the crash-safety contract): with
    // the postings written but the store batch NOT yet applied, the
    // new key is a harmless false positive — lookups stay equal to
    // the snapshot. After the apply lands, it surfaces.
    val b2 = env(Seq(("k6", "a", "INSERT", 3L)))
    SecondaryIndex.indexBatch(root, "t", "val", b2, 2L)
    assert(byIndex("a").map(_._1) == Set("k3", "k5"),
      "postings ahead of the store must prune, not surface")
    assert(byIndex("a") == byScan("a"))
    store.applyBatch(b2, 2L)
    assert(byIndex("a").map(_._1) == Set("k3", "k5", "k6"))
    assert(byIndex("a") == byScan("a"))

    // The postings read is value-partition-pruned at the source.
    val posts = spark.read.parquet(SecondaryIndex.indexDir(root, "t", "val"))
      .filter(col("v") === "a")
    posts.collect()
    val plan = posts.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("v#"),
      s"postings scan lost its partition pruning:\n$plan")
  }

  test("index and bloom artifacts survive store layout evolution (rebucket, compact, vacuum)") {
    import graft.sinks.KeyBloom
    val root = checkpointDir("secidx-layout")
    val store = new ParquetUpsertStore(root, numBuckets = 2)
    val b0 = env(Seq(("k1", "a", "INSERT", 1L), ("k2", "b", "INSERT", 1L),
      ("k3", "a", "INSERT", 1L)))
    val b1 = env(Seq(("k2", "a", "UPDATE", 2L), ("k4", "b", "INSERT", 2L)))
    Seq((b0, 0L), (b1, 1L)).foreach { case (b, id) =>
      SecondaryIndex.indexBatch(root, "t", "val", b, id)
      KeyBloom.addBatch(spark, root, "t", b, id, expectedItems = 100L)
      store.applyBatch(b, id)
    }
    def check(tag: String): Unit = {
      Seq("a", "b").foreach { v =>
        val byIdx = liveSet(SecondaryIndex.lookupByValue(
          spark, store, root, "t", "val", v))
        val byScan = liveSet(store.snapshot(spark, "t")
          .filter(try_element_at(col("values"), lit("val")) === v))
        assert(byIdx == byScan, s"[$tag] value '$v': $byIdx vs $byScan")
      }
      assert(liveSet(KeyBloom.lookup(spark, store, root, "t",
        Seq("k1", "k4", "ghost"))) ==
        liveSet(store.lookup(spark, "t", Seq("k1", "k4", "ghost"))),
        s"[$tag] bloom-fronted lookup diverged")
    }
    check("baseline")
    // The store's physical layout evolves under the artifacts' feet:
    // rebucket changes the key→bucket map, compact rewrites snapshots,
    // vacuum deletes history — the index/bloom layouts are siblings the
    // store never touches, and the lookups recompute buckets from the
    // CURRENT manifest.
    store.rebucket(spark, "t", newNumBuckets = 5, asBatchId = 2L)
    check("after rebucket")
    store.compact(spark, "t", asBatchId = 3L)
    check("after compact")
    store.vacuum(spark, "t", keepFromBatchId = 3L)
    check("after vacuum")
    // artifacts still physically present
    assert(spark.read.parquet(SecondaryIndex.indexDir(root, "t", "val"))
      .count() > 0, "vacuum deleted the index postings")
  }

  test("model fuzz: random op sequences keep index-first equal to snapshot filters") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed)).get
    val opsGen = Gen.listOfN(60, for {
      k <- Gen.choose(1, 8).map(i => s"k$i")
      v <- Gen.oneOf("x", "y", "z")
      op <- Gen.frequency(5 -> "INSERT", 3 -> "UPDATE", 2 -> "DELETE")
    } yield (k, v, op))

    (1L to 4L).foreach { seed =>
      val root = checkpointDir(s"secidx-fuzz-$seed")
      val store = new ParquetUpsertStore(root, numBuckets = 4)
      val ops = sample(opsGen, seed).zipWithIndex
        .map { case ((k, v, op), i) => (k, v, op, (i + 1).toLong) }
      // Three batches in version order — the store's normal cadence.
      ops.grouped(20).zipWithIndex.foreach { case (g, id) =>
        val b = env(g)
        SecondaryIndex.indexBatch(root, "t", "val", b, id.toLong)
        store.applyBatch(b, id.toLong)
      }
      Seq("x", "y", "z", "absent").foreach { v =>
        val byIdx = liveSet(SecondaryIndex.lookupByValue(
          spark, store, root, "t", "val", v))
        val byScan = liveSet(store.snapshot(spark, "t")
          .filter(try_element_at(col("values"), lit("val")) === v))
        assert(byIdx == byScan, s"seed=$seed value='$v': $byIdx vs $byScan")
      }
    }
  }
}
