package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Plan-quality audit: run every SparkEntry query and report the
  * physical-plan properties that matter at 100 TB — shuffle count,
  * broadcast joins, codegen stages, sort-merge joins, nested-loop
  * joins (the red flag), and rows produced.
  *
  * Counts walk the EXECUTED PLAN TREE, not the plan string: the
  * string form prints AQE's initial plan alongside the final one and
  * repeats a persisted relation's full lineage under every
  * InMemoryRelation reference, so text grep double- (or 40×-) counts
  * exactly the queries that reuse work (q138's cached base made the
  * old text audit report 84 nested-loop joins for a plan that
  * executes two one-row broadcast crosses). Tree traversal expands
  * AQE and query-stage wrappers, counts a reused exchange once, and
  * never descends into a cached relation's stored lineage.
  *
  * Run: sbt "runMain graft.PlanAudit [sfDir]"
  */
object PlanAudit {

  /** All operator nodes actually executed: unwrap AQE/stage shells,
    * stop at reused exchanges (the original is counted where it
    * runs), don't enter InMemoryTableScan's cached plan (it executes
    * once at persist time, not per consumer). */
  private[graft] def nodes(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _: ReusedExchangeExec => Seq.empty
      case other => other.children
    }
    p +: kids.flatMap(nodes)
  }

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
        // class names, not nodeName: ShuffleExchangeExec's nodeName is
        // just "Exchange", indistinguishable from BroadcastExchange
        val ns = nodes(df.queryExecution.executedPlan)
          .map(_.getClass.getSimpleName)
        def n(pat: String) = ns.count(_.contains(pat))
        println(f"$name%-26s $rows%8d ${n("ShuffleExchange")}%5d " +
          f"${n("BroadcastHashJoin") + n("BroadcastNestedLoopJoin")}%6d ${n("SortMergeJoin")}%4d " +
          f"${n("BroadcastNestedLoopJoin") + n("CartesianProduct")}%5d ${n("WholeStageCodegen")}%3d")
      } catch {
        case e: Throwable => println(f"$name%-26s FAILED ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}
