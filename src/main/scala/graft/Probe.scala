package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { q =>
      if (args(0).startsWith("-explain")) {
        // -explain (sf0.001) or -explain=<sfDir>; executes first so the
        // printed plan is the AQE-final one, not the static estimate.
        val dir = args(0).split("=", 2) match {
          case Array(_, d) => d
          case _ => "/root/testdata/sf0.001"
        }
        println(s"===== $q =====")
        val df = SparkEntry.queries(q)(spark, dir)
        df.collect()
        println(df.queryExecution.executedPlan.toString)
        // the formatted form too (operator list + per-node details) —
        // plans/rNN evidence carries both views of the same final plan
        println("===== formatted =====")
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } else {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, args(0)).count()
        println(f"PROBE $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    spark.stop()
  }
}
