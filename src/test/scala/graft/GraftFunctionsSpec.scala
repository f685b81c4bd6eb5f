package graft

/** SQL-name registration of the native expressions. */
class GraftFunctionsSpec extends SparkSuite {

  test("registered SQL functions evaluate like their Column forms") {
    GraftFunctions.register(spark)
    val r = spark.sql("""
      SELECT portable_hash('hello') AS h,
             set_jaccard(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j,
             minhash_sig(array(7L, 11L), 4) AS sig,
             dot_product(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
                         array(CAST(2.0 AS FLOAT), CAST(0.5 AS FLOAT))) AS dp
    """).collect().head
    assert(r.getLong(0) == 99162322L) // == Java "hello".hashCode (no overflow)
    assert(r.getDouble(1) == 0.5)
    assert(r.getSeq[Long](2).length == 4)
    assert(r.getDouble(3) == 4.0)
  }

  test("zorderKey interleaves bits and preserves per-dimension order") {
    import graft.functions.ZOrder.zorderKey
    import spark.implicits._
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L), (255L, 255L))
      .toDF("x", "y")
      .select($"x", $"y", zorderKey($"x", $"y", 8).as("z"))
    val z = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // hand-computed Morton codes: x bits at even positions, y at odd
    assert(z((0L, 0L)) == 0L)
    assert(z((1L, 0L)) == 1L)
    assert(z((0L, 1L)) == 2L)
    assert(z((1L, 1L)) == 3L)
    assert(z((2L, 3L)) == (4L + 2L + 8L)) // x=10b -> bit2=0,bit3=1... = 0b1110
    assert(z((255L, 255L)) == 65535L)
    // monotone in each dimension with the other fixed — the locality
    // property range-partitioning by z relies on
    val line = (0L to 63L).map(v => (v, 7L)).toDF("x", "y")
      .select(zorderKey($"x", $"y", 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    assert(line == line.sorted && line.distinct.length == line.length,
      "z must be strictly increasing in x at fixed y")

    // N-dimensional form: 3 columns round-robin — bit i of col j lands
    // at i*3 + j; the 2-column form is the N=2 special case
    import graft.functions.ZOrder.zorderKeyN
    val z3 = Seq((1L, 1L, 1L), (2L, 0L, 0L), (0L, 0L, 7L))
      .toDF("a", "b", "c")
      .select(zorderKeyN(Seq($"a", $"b", $"c"), 4).as("z"))
      .as[Long].collect().toSeq
    assert(z3 == Seq(7L, 8L, 4L + 32L + 256L)) // hand-interleaved
    val same = Seq((3L, 5L)).toDF("x", "y")
      .select(zorderKey($"x", $"y", 8).as("a"),
        zorderKeyN(Seq($"x", $"y"), 8).as("b")).collect().head
    assert(same.getLong(0) == same.getLong(1))
    intercept[IllegalArgumentException] { zorderKeyN(Seq($"x"), 64) }
  }

  test("registered SQL aggregates resolve and sketch/count correctly") {
    import spark.implicits._
    GraftFunctions.register(spark)
    (1L to 5000L).map(i => i % 1000).toDF("x").createOrReplaceTempView("agg_v")
    val r = spark.sql("""
      SELECT exact_distinct(x) AS exact,
             hll_distinct(x) AS est,
             hll_distinct(x, 14) AS est_hi
      FROM agg_v""").collect().head
    assert(r.getLong(0) == 1000L)
    // p=12 → ~1.6% sigma; p=14 tighter
    assert(math.abs(r.getLong(1) - 1000L) <= 50, s"est=${r.getLong(1)}")
    assert(math.abs(r.getLong(2) - 1000L) <= 25, s"est_hi=${r.getLong(2)}")
    val kmv = spark.sql(
      "SELECT kmv_minvalues(x, 4) AS mins FROM agg_v").collect().head
    assert(kmv.getSeq[Long](0) == Seq(0L, 1L, 2L, 3L))
  }

  test("bloom-pruned semi join equals the plain semi join and filters pre-shuffle") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // spark.range (not a local Seq): ConvertToLocalRelation would fold a
    // filter over a LocalRelation at optimization time and hide it
    val fact = spark.range(1L, 2001L)
      .select($"id".as("k"), ($"id" % 17).as("v")).repartition(8)
    val dim = (1L to 2000L).filter(_ % 50 == 0).map(i => Tuple1(i)).toDF("dk")
    val pruned = graft.operators.BloomPrune.semiJoin(
      fact, $"k", dim, $"dk", expectedItems = 100L)
    val plain = fact.join(dim, $"k" === $"dk", "left_semi")
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq ==
      plain.collect().map(_.getLong(0)).sorted.toSeq)
    // the bloom test sits in the fact-side scan stage, before the join
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      s"bloom filter missing from the physical plan:\n$plan")
    // no false negatives by construction; interpreted eval agrees with codegen
    val bf = dim.stat.bloomFilter($"dk", 100L, 0.01)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val e = graft.functions.BloomMightContainExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(1050L), bos.toByteArray)
    assert(e.eval(null) == true) // 1050 = 21*50 is a dim key
    // value equality on the byte payload (not array identity): two
    // independently-built instances over the same filter must be equal,
    // or CSE/exchange-reuse could never coalesce them
    val e2 = graft.functions.BloomMightContainExpr(
      org.apache.spark.sql.catalyst.expressions.Literal(1050L),
      bos.toByteArray.clone())
    assert(e == e2 && e.hashCode == e2.hashCode)
    assert(e.semanticEquals(e2))
  }

  test("SpaceSaving heavy hitters: exact when capacity suffices, bounded when it doesn't") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // zipf-ish stream: item i appears 2^(8-i) times for i in 1..8, plus
    // 40 singleton stragglers; 16 partitions force partial merges
    val data = (1 to 8).flatMap(i => Seq.fill(1 << (8 - i))(s"hh$i")) ++
      (1 to 40).map(i => s"rare$i")
    val df = data.map(Tuple1(_)).toDF("w").repartition(16)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap

    // capacity > distincts → exact, zero error
    val exact = df.agg(graft.functions.SpaceSavingTopK
        .heavyHitters($"w", capacity = 64, k = 8).as("hh"))
      .select(explode($"hh").as("h")).select($"h.item", $"h.est", $"h.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(exact.map(x => x._1 -> x._2).toMap ==
      (1 to 8).map(i => s"hh$i" -> (1L << (8 - i))).toMap)
    assert(exact.forall(_._3 == 0L))

    // tight capacity → every estimate is an upper bound within err, and
    // every item above n/capacity is reported
    val n = data.size.toLong
    val cap = 12
    val approx = df.agg(graft.functions.SpaceSavingTopK
        .heavyHitters($"w", capacity = cap, k = cap).as("hh"))
      .select(explode($"hh").as("h")).select($"h.item", $"h.est", $"h.err")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    approx.foreach { case (item, est, err) =>
      val t = truth.getOrElse(item, 0L)
      assert(est >= t, s"$item: est $est below true $t")
      assert(est - err <= t, s"$item: lower bound ${est - err} above true $t")
    }
    val reported = approx.map(_._1).toSet
    truth.filter(_._2 > n / cap).keys.foreach(h =>
      assert(reported.contains(h), s"guaranteed heavy hitter $h missing"))
  }

  test("CountMin freq: upper bound always, exact in the wide regime, merge-deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val data = (1 to 6).flatMap(i => Seq.fill(1 << i)(s"w$i")) ++
      (1 to 30).map(i => s"noise$i")
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probes = Seq("w1", "w3", "w6", "absent")
    def run(df: org.apache.spark.sql.DataFrame, width: Int) =
      df.agg(graft.functions.CountMinFreq.freq($"w", probes, 5, width).as("f"))
        .select(explode($"f").as("p")).select($"p.item", $"p.est")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // wide regime (width >> vocab): exact counts, absent item 0
    val wide = run(data.map(Tuple1(_)).toDF("w").repartition(16), 16384)
    assert(wide == Map("w1" -> 2L, "w3" -> 8L, "w6" -> 64L, "absent" -> 0L))
    // merge order must not matter: single partition == 16 partitions
    assert(run(data.map(Tuple1(_)).toDF("w").coalesce(1), 16384) == wide)

    // narrow regime (width 4 << vocab): still an upper bound everywhere
    val narrow = run(data.map(Tuple1(_)).toDF("w").repartition(16), 4)
    probes.foreach { p =>
      assert(narrow(p) >= truth.getOrElse(p, 0L),
        s"$p: est ${narrow(p)} below true ${truth.getOrElse(p, 0L)}")
    }
  }

  test("bottom_k equals the window form across partial/merge boundaries") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    GraftFunctions.register(spark)
    // SQL name resolves, needs a literal k, and coerces INT inputs (the
    // update path casts to Long — uncoerced INT would CCE on executors)
    val viaSql = spark.sql(
      "SELECT bottom_k(x, x, 2) AS p FROM VALUES (5), (1), (3) AS t(x)")
      .select(explode($"p.h")).as[Long].collect().toSeq
    assert(viaSql == Seq(1L, 3L))
    val arityErr = intercept[Exception] { spark.sql("SELECT bottom_k(1, 2)") }
    assert(arityErr.getMessage.contains("expects 3 arguments"))
    // ties on the sort key (h = i % 7) force the payload tie-break; 16
    // input partitions force real partial buffers + serialize/merge
    val df = (1L to 500L).map(i => (s"g${i % 3}", i % 7, i))
      .toDF("g", "h", "id").repartition(16)
    val agg = df.groupBy($"g")
      .agg(graft.functions.BottomK.bottomK($"h", $"id", 4).as("p"))
      .select($"g", explode($"p").as("p"))
      .select($"g", $"p.h", $"p.id")
    val win = df.withColumn("rn",
        row_number().over(Window.partitionBy($"g").orderBy($"h", $"id")))
      .filter($"rn" <= 4).select($"g", $"h", $"id")
    val a = agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val w = win.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(a == w)
    assert(a.size == 12) // 3 groups × k=4
    // k larger than the group returns the whole group, sorted
    val small = Seq(("g", 5L, 1L), ("g", 3L, 2L)).toDF("g", "h", "id")
      .groupBy($"g").agg(graft.functions.BottomK.bottomK($"h", $"id", 10).as("p"))
      .select(explode($"p").as("p")).select($"p.h").as[Long].collect().toSeq
    assert(small == Seq(3L, 5L))
  }

  test("bottom_k skips null sort keys and payloads (documented divergence)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the window form would rank a null key FIRST (nulls-first asc);
    // bottom_k drops null-keyed and null-payload rows instead — the
    // pinned semantics from the scaladoc
    val df = Seq[(String, java.lang.Long, java.lang.Long)](
      ("g", null, 1L), ("g", 7L, null), ("g", 5L, 10L), ("g", 3L, 11L))
      .toDF("g", "h", "id")
    val out = df.groupBy($"g")
      .agg(graft.functions.BottomK.bottomK($"h", $"id", 3).as("p"))
      .select(explode($"p").as("p")).select($"p.h", $"p.id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((3L, 11L), (5L, 10L)),
      s"null-keyed/-payload rows must be skipped, got $out")
    // all-null group: empty array, not null and not a null-keyed row
    val empty = Seq[(String, java.lang.Long, java.lang.Long)](("g", null, null))
      .toDF("g", "h", "id")
      .groupBy($"g").agg(graft.functions.BottomK.bottomK($"h", $"id", 3).as("p"))
      .select(size($"p")).as[Int].collect().toSeq
    assert(empty == Seq(0))
  }
}
