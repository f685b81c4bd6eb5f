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

    // warmup: touch every table's footer + run one tiny job end to end
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").schema
    }
    Tables.events(spark, sfDir).limit(1).count()
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(100).count()

    // Median-of-3 per query: a single-shot timing is noise-prone (GC,
    // first-touch page faults, AQE replans), and one bad sample in a
    // recorded round reads as a phantom 9x regression. A query failure
    // is a bench failure — no swallowed Throwable masquerading as a
    // plausible timing.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    var failed = List.empty[String]
    val results = SparkEntry.queries.map { case (name, fn) =>
      def sample(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable =>
            failed ::= name
            System.err.println(s"BENCH FAILURE $name: ${e.getClass.getName}: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      var samples = Seq.fill(reps)(sample()).sorted
      // Adaptive re-sampling: when the spread is wide (scheduler jitter
      // dominates sub-second queries at local[32]), two more samples make
      // the median robust where it is actually noisy, at no cost where
      // it is not.
      if (reps > 1 && samples.last > samples.head * 1.3)
        samples = (samples ++ Seq.fill(2)(sample())).sorted
      name -> (samples(samples.length / 2), samples.head)
    }
    def f(v: Double): String = "%.3f".format(v)
    def qmap(sel: ((Double, Double)) => Double, rs: Iterable[(String, (Double, Double))]) =
      rs.map { case (k, t) => "\"" + k + "\":" + f(sel(t)) }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.map(_._1).sum else 0.0
    // Line 1: every query's median. Line 2: a SHORT summary (total + the
    // 10 slowest) that stays intact even when a log capture keeps only
    // the output tail and truncates line 1's head — the driver's recorded
    // bench for round 5 had parsed:null for exactly that reason.
    val line =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","reps":$reps,"queries":${qmap(_._1, results)},"sf":"$sfDir"}"""
    val top10 = results.toSeq.sortBy(-_._2._1).take(10)
    val short =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","reps":$reps,"queries":${qmap(_._1, top10)},"sf":"$sfDir","note":"top10 of ${results.size}; full set on the previous line"}"""
    println(line)
    println(short)
    // complete data (median + min per query) for local archaeology
    val full =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","reps":$reps,"queries":${qmap(_._1, results)},"queries_min":${qmap(_._2, results)},"sf":"$sfDir"}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("target/bench_full.json"),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"BENCH FAILED queries: ${failed.distinct.sorted.mkString(", ")}")
      sys.exit(1)
    }
  }
}
