package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared helpers for the verified query inventory.
  *
  * Oracle-parity rule: any aggregation over double columns is computed in
  * exact decimal arithmetic (cast-before-sum) and only cast back to double
  * at the end, in BOTH the Spark plan and the DuckDB oracle SQL. Double
  * summation is order-dependent; two engines summing in different orders
  * drift in the last bits and fail the driver's hash compare. Decimal
  * sums are exact, so the final decimal→double conversion is identical on
  * both sides. Comparisons/sorts on raw doubles are safe (no arithmetic).
  *
  * Eager-at-construction queries — do not "fix": the stateful/iterative
  * shapes (cdc13/cdc16/cdc17 durable-store batches, ns12's
  * label-propagation fixpoint) necessarily execute work when the query
  * function is CALLED, not when the returned DataFrame is acted on — a
  * store merge or a convergence loop cannot be a lazy plan. The driver's
  * per-query timing therefore includes that setup by design; moving it
  * out would benchmark a plan that re-reads state nothing wrote.
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  /** DuckDB SQL for the portable polynomial hash of string expression
    * `x` — lockstep with [[graft.functions.TextFunctions.portableHash]].
    * The accumulator seed must be BIGINT — list_prepend(0, ...) would
    * make the whole reduce INT32 and overflow at acc*31. */
  def hashSql(x: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($x) + 1),
       |  i -> CAST(unicode(substr($x, CAST(i AS INT), 1)) AS BIGINT))),
       |  (acc, c) -> (acc * 31 + c) % 2147483647)""".stripMargin

  /** Exact-sum of a 2-decimal-valued double column, result as double. */
  def sumd2(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact-sum of a product of 2-decimal doubles, result as double. */
  def dec4(c: Column): Column = c.cast("decimal(18,4)")

  /** Scratch directory for queries that exercise a file source/sink
    * (driver-local, under the build's target/ so nothing outside the repo
    * is touched). Self-cleaning: each dir is deleted on ITS OWN JVM's
    * exit (run/Test are forked, so every Verify/Bench invocation cleans
    * exactly what it created — concurrent runs never touch each other's
    * scratch). Without this, thousands of accumulated artifact trees
    * measurably slow the artifact-lifecycle queries' filesystem ops. */
  def freshDir(tag: String): String = {
    val base = java.nio.file.Paths.get("target", "tmp")
    java.nio.file.Files.createDirectories(base)
    val dir = java.nio.file.Files.createTempDirectory(base, tag + "-")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try {
        if (Files.exists(dir))
          Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
            .forEach(p => Files.deleteIfExists(p))
      } catch { case _: Exception => () } // best-effort; never block exit
    }))
    dir.toString
  }
}
