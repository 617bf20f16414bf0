package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property test for the EditDistancePrefilter optimizer rule: on
  * randomly generated string pairs, the optimized plan (with the
  * injected length-bound guard) returns exactly the pairs a plain
  * Scala Levenshtein reference admits — the guard must never drop a
  * true match (the metric bound guarantees it, the test enforces it).
  */
class EditDistancePrefilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("guarded filter equals the reference for generated pairs (seeded)") {
    import spark.implicits._
    val genPair = for {
      a <- Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
      b <- Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))
    } yield (a, b)
    val pairs = Gen.listOfN(400, genPair)(Gen.Parameters.default, Seed(7L))
      .getOrElse(fail("generator exhausted"))
    for (threshold <- Seq(0, 1, 3)) {
      // write through parquet so constant folding cannot bypass the rule
      val dir = java.nio.file.Files.createTempDirectory("graft-lev").toString
      pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
        .toDF("id", "x", "y").write.mode("overwrite").parquet(dir)
      val df = spark.read.parquet(dir)
        .filter(org.apache.spark.sql.functions.levenshtein(col("x"), col("y")) <= threshold)
      assert(df.queryExecution.optimizedPlan.toString.contains("abs("),
        "rule must fire on a parquet-backed filter")
      val got = df.select("id").collect().map(_.getLong(0)).toSet
      val want = pairs.zipWithIndex.collect {
        case ((a, b), i) if levenshtein(a, b) <= threshold => i.toLong
      }.toSet
      assert(got == want, s"threshold $threshold: got ${got.size}, want ${want.size}")
    }
  }

  /** Fixture where x/y lengths differ by > 2 for some rows, so a wrongly
    * conjoined length guard would visibly drop rows.
    */
  private def nestedFixture(): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lev-nested").toString
    Seq(
      (0L, "abc", "abc"),        // lev = 0
      (1L, "abc", "abd"),        // lev = 1
      (2L, "abc", "abcdefgh"),   // lev = 5, len diff 5
      (3L, "x", "xxxxxxxx"),     // lev = 7, len diff 7
      (4L, "hello", "helso")     // lev = 1
    ).toDF("id", "x", "y").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("comparison under NOT is not guarded (rows with large length diff survive)") {
    val df = nestedFixture().filter(!(org.apache.spark.sql.functions.levenshtein(col("x"), col("y")) <= lit(2)))
    assert(!df.queryExecution.optimizedPlan.toString.contains("abs("),
      "rule must NOT fire on a negated comparison")
    val got = df.select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L), s"NOT case corrupted: got $got")
  }

  test("comparison under OR is not guarded (disjunct rows survive)") {
    val df = nestedFixture()
      .filter(col("id") === lit(3L) || org.apache.spark.sql.functions.levenshtein(col("x"), col("y")) <= lit(1))
    assert(!df.queryExecution.optimizedPlan.toString.contains("abs("),
      "rule must NOT fire on a disjunct comparison")
    val got = df.select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 3L, 4L), s"OR case corrupted: got $got")
  }

  test("top-level conjunct alongside other predicates is still guarded") {
    val df = nestedFixture()
      .filter(col("id") >= lit(0L) && org.apache.spark.sql.functions.levenshtein(col("x"), col("y")) <= lit(1))
    assert(df.queryExecution.optimizedPlan.toString.contains("abs("),
      "rule must fire when the comparison is a top-level conjunct")
    val got = df.select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 1L, 4L), s"conjunct case wrong: got $got")
  }
}
