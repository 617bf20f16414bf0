package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality audit: run every SparkEntry query and report the
  * physical-plan properties that matter at 100 TB — shuffle count,
  * broadcast joins, codegen stages, sort-merge joins, nested-loop
  * joins (the red flag), and rows produced.
  *
  * Run: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = GraftSession.build("local[8]", 8)

    println(f"${"query"}%-26s ${"rows"}%8s ${"shuf"}%5s ${"bcast"}%6s ${"smj"}%4s ${"bnlj"}%5s ${"cg"}%3s")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // collect() executes df's OWN QueryExecution (count() builds a
        // new one), so the printed plan is AQE's final executed plan
        val rows = df.collect().length
        val plan = df.queryExecution.executedPlan.toString
        def n(pat: String) = plan.linesIterator.count(_.contains(pat))
        println(f"$name%-26s $rows%8d ${n("Exchange hashpartitioning") + n("Exchange rangepartitioning")}%5d " +
          f"${n("BroadcastHashJoin") + n("BroadcastNestedLoopJoin")}%6d ${n("SortMergeJoin")}%4d " +
          f"${n("BroadcastNestedLoopJoin") + n("CartesianProduct")}%5d ${n("*(")}%3d")
      } catch {
        case e: Throwable => println(f"$name%-26s FAILED ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
