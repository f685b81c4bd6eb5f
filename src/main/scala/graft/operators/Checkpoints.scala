package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Reliable (cluster-visible) plan materialization for iterative
  * algorithms.
  *
  * `df.localCheckpoint(eager = true)` truncates lineage into
  * EXECUTOR-LOCAL block storage: cheap, but on a real cluster the loss
  * of any executor holding a block kills every plan that was built on
  * the truncated lineage — there is nothing left to recompute from.
  * That is an acceptable posture only for small driver-adjacent
  * artifacts (vs13's k×queries greedy steps). For a corpus-scale
  * dataset that several downstream jobs re-read (an edge set feeding an
  * iterative rank loop), the durable form is the same one
  * [[Dedup.componentLabels]] uses between label rounds: write the rows
  * to parquet under the session checkpoint directory — shared storage
  * on a cluster — and hand back an unpersisted plan that re-reads them.
  *
  * Retention is TWO generations per tag, mirroring the label-history
  * rule in [[Dedup.componentLabels]]: parquet plans resolve their files
  * at ACTION time, so the handle a caller still holds from the
  * immediately preceding call must stay readable, while a long session
  * or bench loop stays bounded at two copies on disk.
  */
object Checkpoints {
  private val seq = new java.util.concurrent.atomic.AtomicLong(0)
  private val history =
    scala.collection.mutable.Map.empty[String, List[String]]

  /** Resolve (or, in local mode only, auto-create) the session
    * checkpoint root. On a cluster a driver-local `file:` path is not
    * shared storage — executors could not read the materialized rows
    * back — so there the caller must have placed the dir explicitly via
    * `spark.sparkContext.setCheckpointDir(<shared storage path>)`.
    */
  def checkpointRoot(spark: SparkSession): String = {
    val sc = spark.sparkContext
    sc.getCheckpointDir.getOrElse {
      require(sc.isLocal,
        "reliable checkpoints need a cluster-visible checkpoint dir: call " +
          "spark.sparkContext.setCheckpointDir(<shared storage path>)")
      val d = java.nio.file.Files.createTempDirectory("graft-ckpt")
      // We created this root, so we own its lifetime: without this hook a
      // long local session (bench loops, sbt test) leaks one tree per JVM
      // under /tmp. An explicitly-set checkpoint dir is never touched.
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        graft.Fs.deleteRecursively(d.toFile)))
      sc.setCheckpointDir(d.toString)
      sc.getCheckpointDir.get
    }
  }

  /** Materialize `df` to parquet under the session checkpoint dir and
    * return an unpersisted plan reading it back (lineage truncated to a
    * durable scan). `tag` namespaces the two-generation retention so
    * independent call sites don't evict each other's live handles.
    */
  def reliable(df: DataFrame, tag: String): DataFrame = {
    val spark = df.sparkSession
    val root = checkpointRoot(spark)
    val dir = s"$root/graft-$tag-${seq.incrementAndGet()}"
    df.write.parquet(dir)
    val out = spark.read.parquet(dir)
    val key = s"$root/$tag"
    val evicted = history.synchronized {
      val hist = dir :: history.getOrElse(key, Nil).filterNot(_ == dir)
      val (keep, drop) = hist.splitAt(2)
      history(key) = keep
      drop
    }
    evicted.foreach { d =>
      try {
        val p = new org.apache.hadoop.fs.Path(d)
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    out
  }
}
