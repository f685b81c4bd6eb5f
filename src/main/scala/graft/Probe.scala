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
      if (args(0) == "-explain") {
        println(s"===== $q =====")
        SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").explain("formatted")
      } else {
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(q)(spark, args(0)).count()
        println(f"PROBE $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
      }
    }
    spark.stop()
  }
}
