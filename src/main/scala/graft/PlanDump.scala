package graft

/** Writes `.explain("formatted")` for the named queries to files —
  * the plan evidence the optimization rounds commit under plans/rNN/.
  *
  * `runMain graft.PlanDump <outDir> <query> [query ...]` (env contract
  * as Bench). For each query the FINAL AQE plan is captured: the query
  * is executed once (collect()) so `explain` shows the executed plan
  * with final join strategies and coalesced exchanges, not the
  * pre-execution estimate.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"), txt)
      println(s"[plandump] wrote $outDir/$name.txt (${txt.length} chars)")
    }
    CacheRegistry.clear(spark)
    spark.stop()
  }
}
