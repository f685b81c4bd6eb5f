package graft
import org.apache.spark.sql.SparkSession
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, args(0)).count()
      println(f"PROBE $q rows=$n t=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    spark.stop()
  }
}
