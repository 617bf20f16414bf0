package graft

import org.apache.spark.sql.SparkSession

import graft.operators.TextDedup

/** Per-stage wall-clock breakdown of the MinHash-LSH dedup chain at
  * ×reps corpus volume (r8 verdict #4: the ×100 ScaleEvidence run
  * measured 465.7 s with balance 1.04 — volume, not skew — but gave
  * no attribution). Stages are timed cumulatively in pipeline order,
  * exploiting the chain's own CacheRegistry persists so each
  * measurement isolates the NEW work of its stage:
  *
  *   A  shingle explode + distinct            (nothing cached yet)
  *   B  + df-cap window                       (re-runs A's chain; B−A = window cost)
  *   C  16-hash signature agg + band explode  (reads B's persisted relation)
  *   D  band self-join + pair distinct        (reads C's persisted relation)
  *
  * `runMain graft.MinhashProfile` — volumes via SCALE_DOC_REPS
  * (default 100), data via SPARK_GRAFT_SF_DIR.
  */
object MinhashProfile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.get("SCALE_DOC_REPS").map(_.toLong).getOrElse(100L)
    // JIT/codegen warm pass at ×1 (the bench methodology): stage
    // deltas at ×reps must measure data volume, not first-run codegen
    TextDedup.minhashPairsOf(spark,
      ScaleEvidence.saltedCorpus(spark, sfDir, 1), "profwarm").count()
    CacheRegistry.clear(spark)

    val scaled = ScaleEvidence.saltedCorpus(spark, sfDir, reps)
    val key = s"prof$reps"
    def time(label: String)(a: => Long): Double = {
      val t0 = System.nanoTime()
      val n = a
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[minhash-profile] $label%-40s $secs%8.1f s  (rows=$n)")
      secs
    }
    val tA = time("A shingles explode+distinct")(
      TextDedup.shinglesOf(scaled).count())
    val tB = time("B filtered shingles (A + df window)")(
      TextDedup.filteredShinglesOf(spark, scaled, key).count())
    val tC = time("C signature agg + band explode")(
      TextDedup.minhashBandsOf(spark, scaled, key).count())
    val tD = time("D band self-join + pair distinct")(
      TextDedup.minhashPairsOf(spark, scaled, key).count())
    println(f"[minhash-profile] stage shares: A=$tA%.1f  window=${tB - tA}%.1f " +
      f"sig+bands=$tC%.1f  join=$tD%.1f  (sum=${tA + tB + tC + tD}%.1f)")
    spark.stop()
  }
}
