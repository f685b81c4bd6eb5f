package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite. */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def sf0001 = "/root/testdata/sf0.001"

  def checkpointDir(name: String): String = {
    val p = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get("target"), s"ckpt-$name-")
    // Forked test JVMs clean their own scratch on exit (the Q.freshDir
    // discipline) — accumulated checkpoint trees otherwise slow later
    // runs' filesystem ops and bloat target/.
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      try {
        if (Files.exists(p))
          Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
            .forEach(q => Files.deleteIfExists(q))
      } catch { case _: Exception => () }
    }))
    p.toAbsolutePath.toString
  }
}
