package graft.examples

import graft.GraftSession
import graft.scale.ScaleOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Example: bucketed co-located joins and skew salting.
  * Run: sbt "runMain graft.examples.ScaleDemo /root/testdata/sf0.1"
  */
object ScaleDemo {
  /** Body shared by `main` and ExamplesSpec: runs against the caller's
    * session and returns the result line. Restores the broadcast
    * threshold it disables for the plain-join comparison. */
  def run(spark: SparkSession, dir: String): String = {
    // bucketed join: pay the shuffle once at write, never again
    val orders = graft.Tables(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val lineitem = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    ScaleOps.writeBucketed(orders, "demo_orders", "o_orderkey", 16)
    ScaleOps.writeBucketed(lineitem, "demo_lineitem", "l_orderkey", 16)
    val joined = spark.table("demo_lineitem")
      .join(spark.table("demo_orders"), col("l_orderkey") === col("o_orderkey"))
    val bucketedShuffles = ScaleOps.countShuffles(joined)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val (plainShuffles, plainCount) =
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        val plain = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        (ScaleOps.countShuffles(plain), plain.count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // skew probe: one key carries 30% of a synthetic fact table
    val skewed = spark.range(1000000)
      .withColumn("user_id", when(col("id") % 10 < 3, lit(7L))
        .otherwise(pmod(col("id"), lit(1000))))
      .withColumn("v", col("id") % 100)
    val dim = spark.range(1000).select(col("id").as("user_id"),
      concat(lit("seg"), col("id") % 5).as("segment"))
    val plainSkew = skewed.join(dim, Seq("user_id")).count()
    val saltedSkew = ScaleOps.saltedJoin(skewed, dim, "user_id", 8).count()

    s"SCALE_RESULT bucketed_shuffles=$bucketedShuffles " +
      s"plain_shuffles=$plainShuffles rows_equal=${joined.count() == plainCount} " +
      s"skew_plain=$plainSkew skew_salted=$saltedSkew"
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = GraftSession.build("local[8]", 8)
    println(run(spark, dir))
    spark.stop()
  }
}
