package graft

import org.apache.spark.sql.functions._

/** Scratch profiling main for the dedup shingle chain (round-2 perf
  * work): times each stage of the q28/q29 build independently.
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = Tables(spark, sfDir, "documents")
    time("docs scan")(docs.count())
    val toks = docs.select(col("doc_id"),
      posexplode(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))
        .as(Seq("pos", "w")))
    time("tokenize+posexplode")(toks.count())
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val sh0 = toks
      .withColumn("w2", lead(col("w"), 1).over(w))
      .withColumn("w3", lead(col("w"), 2).over(w))
      .filter(col("w3").isNotNull)
      .select(col("doc_id"), concat_ws(" ", col("w"), col("w2"), col("w3")).as("shingle"))
    time("+window shingles")(sh0.count())
    val dist = sh0.distinct()
    time("+distinct")(dist.count())
    val keep = dist.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 100).select(col("shingle"))
    time("df-cap keep")(keep.count())
    val sh = dist.join(keep, "shingle").select(col("doc_id"), col("shingle"))
    time("sh join keep")(sh.count())
    // candidate alternative: array-transform shingling, no window
    val alt = docs.select(col("doc_id"),
      expr("regexp_extract_all(lower(text), '\\\\S+', 0)").as("ws"))
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, greatest(size(ws)-2, 0)), i -> concat_ws(' ', ws[i-1], ws[i], ws[i+1]))")).as("shingle"))
    time("alt transform shingles")(alt.count())
    time("alt distinct")(alt.distinct().count())
    spark.stop()
  }
}
