package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // Optional extra args: query names — restrict the dump for fast local
    // iteration (the driver always passes exactly two args → full run).
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Full runs reconcile the dump dir: a query renamed since a prior
    // run would otherwise leave its old parquet behind, and the compare
    // step would report it as a phantom rows-only entry forever.
    if (only.isEmpty) {
      val live = SparkEntry.queries.keySet
      // Scope the reconciliation to directories that are demonstrably OUR
      // stale dumps — a user file or unrelated directory sitting in outDir
      // must never be deleted. "Ours" = completed (Spark's _SUCCESS
      // marker) OR a crashed half-write: empty, or containing only
      // Spark-output-shaped entries (part files, markers, crc sidecars).
      // Without the half-write arm, a dump killed mid-write and then
      // renamed would survive forever as a phantom rows-only entry.
      def sparkOutputShaped(f: java.io.File): Boolean = {
        val children = Option(f.listFiles()).getOrElse(Array.empty)
        // An EMPTY directory is NOT claimed: a user's scratch dir (or one
        // holding only dotfiles) must never be deleted. The only empty
        // dump a crash can leave is mkdir-then-die, which lingers
        // harmlessly (the compare iterates oracle names, not dirs).
        new java.io.File(f, "_SUCCESS").exists() ||
          (children.exists(_.getName.startsWith("part-")) &&
            children.forall { c =>
              val n = c.getName
              n.startsWith("part-") || n.startsWith("_") || n.startsWith(".")
            })
      }
      Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && !live.contains(f.getName) &&
          sparkOutputShaped(f))
        .foreach { stale =>
          System.err.println(s"[verify] removing stale dump ${stale.getName}")
          Fs.deleteRecursively(stale)
        }
    }
    // Failures are recorded EXPLICITLY (errors.json below): a query that
    // throws must show up as an err entry in the driver's correctness
    // report, not silently vanish from it — round 11 lost 38 entries to a
    // fixture regression precisely because missing looked like absent.
    var errors = List.empty[(String, String)]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errors ::= name -> s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}".take(2000)
        // A half-written dump from the failed attempt would read as a
        // phantom (possibly truncated) result — remove it.
        Fs.deleteRecursively(new java.io.File(s"$outDir/$name"))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.isEmpty || only(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Always written (empty object on a clean run) so its absence means
    // "old Verify", never "no failures".
    val errJson = errors.reverse
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/errors.json"), errJson)
    // Fixture fingerprint (row counts + loader-visible schema hashes):
    // makes the dump self-describing about what data it verified, so a
    // cross-round result change on unchanged code is decidable as
    // code-vs-fixture from the artifacts alone.
    Files.writeString(Paths.get(s"$outDir/fixture.json"),
      Fixture.json(spark, sfDir))
    if (errors.nonEmpty)
      System.err.println(s"[verify] ${errors.size} queries FAILED: " +
        errors.reverse.map(_._1).mkString(", "))
    spark.stop()
  }
}
