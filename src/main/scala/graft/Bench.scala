package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the configured
  * scale factor and prints one JSON line. A short untimed warmup
  * (catalog/parquet-footer reads + one trivial job) keeps JVM/classload
  * cost out of the first measured query.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: touch every table's footer + run one tiny job end to end.
    // Guarded per-touch: the warmup is a JIT/classload primer, not a
    // correctness gate — one unreadable fixture must null the queries that
    // read it (the per-query try/catch below), not kill the whole run with
    // zero timings (round 11's bench died exactly that way, rc=1 at 35 s).
    def warm(label: String)(body: => Unit): Unit =
      try body catch {
        case e: Throwable =>
          System.err.println(s"BENCH WARMUP SKIPPED $label: ${e.getClass.getName}: ${e.getMessage}")
      }
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      warm(t)(spark.read.parquet(s"$sfDir/$t.parquet").schema)
    }
    warm("events")(Tables.events(spark, sfDir).limit(1).count())
    warm("lineitem-job")(
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count())

    // Median-of-3 per query: a single-shot timing is noise-prone (GC,
    // first-touch page faults, AQE replans), and one bad sample in a
    // recorded round reads as a phantom 9x regression. A query failure
    // is a bench failure — it exits 1 AND its entry in the JSON is null,
    // so no elapsed-to-exception duration can masquerade as a timing even
    // for a parser that misses the exit code. Both emitted lines carry
    // queries_min beside the medians: min ≪ median on a re-run means the
    // recording environment was contended, min ≈ median means a real
    // regression — distinguishable without a second run.
    // Contention calibration: a fixed CPU-bound workload (32 threads ×
    // a deterministic xorshift loop) whose solo wall-time on this
    // machine is stable run-to-run. If the recording environment runs
    // anything else concurrently, this number inflates proportionally —
    // so a reader can tell "the machine was busy" (calib high, all
    // queries uniformly slow) from "a query regressed" (calib normal)
    // WITHOUT a clean re-run. Recorded before and after the query loop.
    def calibrate(): Double = {
      val threads = 32
      val t0 = System.nanoTime()
      val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
      try {
        val tasks = (0 until threads).map { t =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            override def call(): Long = {
              var x = 88172645463325252L + t
              var i = 0
              while (i < 60000000) {
                x ^= x << 13; x ^= x >>> 7; x ^= x << 17
                i += 1
              }
              x
            }
          })
        }
        tasks.foreach(_.get())
      } finally pool.shutdown()
      (System.nanoTime() - t0) / 1e9
    }
    calibrate() // discarded: JIT warmup of the calibration loop itself
    val calibPre = calibrate()

    // Fixture fingerprint (untimed): rides in the emitted JSON so
    // cross-round per-query deltas are decidable as code-vs-data from
    // the artifacts alone (r12-vs-r10's ns39/ns40 confusion was fixture
    // drift, resolvable only from round-11 prose at the time).
    val fixtureJson = Fixture.json(spark, sfDir)

    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    // Local perf iteration: SPARK_GRAFT_BENCH_ONLY=ns12,ns14 restricts the
    // run to queries whose name starts with one of the given prefixes.
    // The driver never sets it, so recorded rounds always cover the full set.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = only match {
      case Some(prefixes) =>
        SparkEntry.queries.filter { case (n, _) => prefixes.exists(n.startsWith) }
      case None => SparkEntry.queries
    }
    // A filtered run must be self-identifying: if the env var ever leaked
    // into a recording environment, a partial round with no marker would
    // read as a (fast) full round. The marker rides in the JSON itself.
    val onlyMarker = only
      .map(p => s""","bench_only":"${p.mkString(",")}"""").getOrElse("")
    only.foreach(p => System.err.println(
      s"BENCH PARTIAL: SPARK_GRAFT_BENCH_ONLY=${p.mkString(",")} restricts " +
        s"this run to ${selected.size} of ${SparkEntry.queries.size} queries"))
    // Untimed ContextCleaner drain: System.gc() only ENQUEUES dead
    // RDD/broadcast/shuffle handles; the cleaner thread reclaims them
    // asynchronously — including DURING the next timed sample, which is
    // where vs12's residual 1.57 median/min spread came from in r12
    // (the per-sample gc alone didn't wait for the backlog to clear).
    // Draining = polling the cleaner's reference buffer until its size
    // stops shrinking (live references legitimately stay registered, so
    // "empty" is the wrong target). Reflection-read because the cleaner
    // is private[spark]; any failure falls back to a short fixed pause —
    // this is bench hygiene, never correctness.
    def drainCleaner(maxWaitMs: Long): Unit = {
      val fallback: Unit => Unit = _ => Thread.sleep(150)
      try {
        val sc = spark.sparkContext
        sc.getClass.getMethod("cleaner").invoke(sc) match {
          case Some(cl: AnyRef) =>
            cl.getClass.getDeclaredFields
              .find(_.getName.contains("referenceBuffer")) match {
              case Some(fld) =>
                fld.setAccessible(true)
                val buf = fld.get(cl).asInstanceOf[java.util.Set[_]]
                val deadline = System.nanoTime() + maxWaitMs * 1000000L
                var prev = Int.MaxValue
                var cur = buf.size
                while (cur < prev && System.nanoTime() < deadline) {
                  Thread.sleep(50)
                  prev = cur; cur = buf.size
                }
              case None => fallback(())
            }
          case _ => fallback(())
        }
      } catch { case scala.util.control.NonFatal(_) => fallback(()) }
    }
    var failed = List.empty[String]
    val results: Map[String, Option[(Double, Double)]] =
      selected.map { case (name, fn) =>
        def sample(): Option[Double] = {
          // Per-SAMPLE hygiene, untimed: the eager checkpoint/fixpoint
          // queries (vs12, ns12, ns14, ns44) leave a broadcast+shuffle
          // reclamation backlog that grows ACROSS samples of the same
          // query, inflating medians 2-3x over mins while calib stays
          // flat — the per-query GC below can't see it.
          System.gc()
          drainCleaner(1500)
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              failed ::= name
              System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
              None
          }
        }
        // Stop at the first failed sample: a query that dies late would
        // otherwise burn (reps + 2) full runs before being recorded null.
        def samplesOrFail(n: Int): Option[Seq[Double]] = {
          val ss = Iterator.fill(n)(sample()).takeWhile(_.isDefined).toSeq
          if (ss.length == n) Some(ss.flatten) else None
        }
        // Inter-query hygiene, OUTSIDE the timed region: Spark's
        // ContextCleaner reclaims dead shuffle files / broadcasts only
        // when the JVM GCs their handles, so 100+ queries into a run the
        // heaviest queries inherit a reclamation backlog and record
        // phantom regressions (r8 recorded ns14 at 12.2s; solo it is
        // 3.3s). One explicit GC per query keeps the backlog flat.
        System.gc()
        val stats = samplesOrFail(reps).flatMap { first =>
          // Adaptive re-sampling: when the spread is wide (scheduler jitter
          // dominates sub-second queries at local[32]), two more samples make
          // the median robust where it is actually noisy, at no cost where
          // it is not.
          val sorted = first.sorted
          val all =
            if (reps > 1 && sorted.last > sorted.head * 1.3)
              samplesOrFail(2).map(extra => (sorted ++ extra).sorted)
            else Some(sorted)
          all.map(s => (s(s.length / 2), s.head))
        }
        name -> stats
      }
    def f(v: Double): String = "%.3f".format(v)
    def qmap(sel: ((Double, Double)) => Double,
             rs: Iterable[(String, Option[(Double, Double)])]) =
      rs.map { case (k, t) =>
        "\"" + k + "\":" + t.map(v => f(sel(v))).getOrElse("null")
      }.mkString("{", ",", "}")
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val total = if (ok.nonEmpty) ok.values.map(_._1).sum else 0.0
    val calibPost = calibrate()
    // Recording-hygiene gate, made mechanical: the calibration probe's
    // clean idle floor on this box class is ~0.14 s (pinned from the
    // r13 recording; re-pin if the hardware changes). A recording taken
    // while ANYTHING else competed for the CPUs inflates it
    // proportionally — r14's official artifact shipped at 0.201/0.333
    // and manufactured fake +30-70% regressions on small queries that a
    // clean re-record disproved. Past 1.5x the floor the artifact
    // self-declares dirty so no reader mistakes contention for a
    // regression; the run still completes (timings remain useful as
    // upper bounds), but the recording should be redone idle.
    // Default pinned to THIS box class; override via env when the
    // hardware changes (a source edit should not be required to re-pin),
    // and the floor used is recorded in the JSON so a reader can judge
    // the gate itself, not just its verdict.
    val calibFloor = sys.env.get("SPARK_GRAFT_BENCH_CALIB_FLOOR") match {
      case None => 0.14
      case Some(s) => s.trim.toDoubleOption.filter(_ > 0).getOrElse {
        System.err.println(s"BENCH: ignoring malformed " +
          s"SPARK_GRAFT_BENCH_CALIB_FLOOR='$s' (expected a positive " +
          "double) — using the pinned 0.14 floor")
        0.14
      }
    }
    val dirty = math.max(calibPre, calibPost) > calibFloor * 1.5
    if (dirty) System.err.println(
      f"BENCH DIRTY: calibration $calibPre%.3f/$calibPost%.3f exceeds " +
        f"${calibFloor * 1.5}%.3f (1.5x idle floor $calibFloor%.2f) — " +
        "the box was contended during recording; re-record idle")
    def summary(rs: Iterable[(String, Option[(Double, Double)])], note: String) =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","reps":$reps,""" +
        s""""calib":[${f(calibPre)},${f(calibPost)}],"dirty":$dirty,""" +
        s""""calib_floor":${f(calibFloor)},""" +
        s""""queries":${qmap(_._1, rs)},"queries_min":${qmap(_._2, rs)},""" +
        s""""sf":"$sfDir","fixture":$fixtureJson$onlyMarker$note}"""
    // Line 1: a SHORT summary (total + the 10 slowest) for human tails.
    // FINAL line: every query's median + min — the driver stores only an
    // output tail, so the parseable full-set line must be the LAST stdout
    // line (rounds 1-17 all recorded parsed:null because the full line was
    // printed first and its head was truncated away). The same line is also
    // persisted to target/bench_full.json so the contract survives any tail
    // length. Output order only — no timing-path change.
    val line = summary(results, "")
    val top10: Iterable[(String, Option[(Double, Double)])] =
      ok.toSeq.sortBy(-_._2._1).take(10).map { case (k, v) => k -> Some(v) }
    val short = summary(top10,
      s""","note":"top10 of ${results.size}; full set on the next line"""")
    println(short)
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_full.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"BENCH FAILED queries: ${failed.distinct.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
