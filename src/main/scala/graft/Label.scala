package graft

import org.apache.spark.sql.SparkSession

/** Guide §1.5 — label your jobs: every store/index/bloom phase sets a job
  * description so per-phase time is attributable in the UI and in
  * [[JobProfile]] without guessing from callsites (Spark SQL actions all
  * surface as the same thread-pool frame). Thread-local set/restore; no
  * data-path cost.
  */
object Label {
  def job[T](spark: SparkSession, desc: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(desc)
    try body finally sc.setJobDescription(prev)
  }
}
