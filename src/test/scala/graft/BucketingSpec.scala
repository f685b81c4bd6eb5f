package graft

/** Bucketed-table co-located join: both sides bucketed+sorted on the join
  * key join with NO shuffle exchange — the pre-partitioning lever for
  * repeated large-fact joins at 100 TB (shuffle paid once at write time,
  * never per query). */
class BucketingSpec extends SparkSuite {
  import spark.implicits._

  test("bucketed+sorted tables sort-merge join without exchange") {
    val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bcBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760b")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    // force the shuffle-join path: at test scale both sides would
    // broadcast, which bypasses bucketing entirely
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // clear metastore entries AND orphan warehouse dirs from any
      // previously aborted run (DROP alone misses unregistered dirs)
      Seq("li_bucketed", "o_bucketed").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val dir = new java.io.File(s"spark-warehouse/$t")
        if (dir.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(dir)
        }
      }
      val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
        .select($"l_orderkey", $"l_quantity")
      val o = spark.read.parquet(s"$sf0001/orders.parquet")
        .select($"o_orderkey".as("l_orderkey"), $"o_totalprice")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("li_bucketed")
      o.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("o_bucketed")

      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(600)}")

      val expected = li.join(o, "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcBefore)
    }
  }
}
