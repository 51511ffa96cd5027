package graft

/** Cold/warm per-query timing dump for BASELINE.md (not part of the driver
  * contract — `graft.Bench` is). Cold = first action on a fresh plan in this
  * session; warm = immediate second action (page cache + codegen cache hot),
  * mirroring `QueryOrchestration.cs:425-439`.
  */
object BenchDetail {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate()
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warmup

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      val n  = fn(spark, sfDir).collect().length
      val cold = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      fn(spark, sfDir).collect()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"$name%-24s rows=$n%-6d cold=$cold%7.3f warm=$warm%7.3f")
    }
    spark.stop()
  }
}
