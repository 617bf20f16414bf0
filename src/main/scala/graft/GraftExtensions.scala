package graft

import graft.functions.FloatVecDot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions, registered via `SparkSession.builder()
  * .withExtensions(new GraftExtensions)` (see [[GraftSession]]) or
  * `spark.sql.extensions=graft.GraftExtensions` on a cluster.
  *
  * Injects:
  *  - the native vector functions into the SQL surface, so
  *    `spark.sql("SELECT vec_dot(a, b) ...")` plans the codegen'd
  *    [[FloatVecDot]] directly;
  *  - the [[graft.plans.EditDistancePrefilter]] optimizer rule, which
  *    places the length-difference lower bound in front of
  *    `levenshtein(a,b) <= d` predicates.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
    e.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "vec_dot takes exactly 2 arguments")
        FloatVecDot(children.head, children(1))
      }))
  }
}
