package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-engineering utilities: the partitioning patterns that keep
  * the engine's plans healthy at 100 TB, packaged so pipelines apply
  * them declaratively.
  *
  *  - '''Bucketing''': pre-shuffle fact tables once at write time;
  *    repeated joins/aggregations on the bucket key then run with no
  *    exchange at all (verified by [[graft.scale.ScaleOpsSpec]] on
  *    the physical plan).
  *  - '''Salting''': a skewed join key (one customer with 10⁹ rows)
  *    turns one task into a straggler. `saltedJoin` splits each hot
  *    key into `salts` sub-keys deterministically, replicating the
  *    small side, so the hot partition fans out `salts`-ways. AQE's
  *    skew-join splitting (on in [[graft.GraftSession]]) handles
  *    moderate skew automatically; salting is the explicit tool for
  *    pathological keys.
  */
object ScaleOps {

  /** Write `df` as a bucketed, sorted table. Reading it back and
    * joining/aggregating on `bucketCol` needs no shuffle when both
    * sides share the bucketing.
    */
  def writeBucketed(df: DataFrame, name: String, bucketCol: String,
      nBuckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    // with an in-memory catalog a previous JVM can leave an orphaned
    // warehouse directory the catalog no longer knows about — clear it
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(name)
  }

  /** Join `large` with `small` on an equi-key whose distribution is
    * skewed. Each `large` row keeps its key but gains a deterministic
    * salt in [0, salts); `small` is replicated `salts` times. The
    * join key becomes (key, salt) — hot keys spread over `salts`
    * tasks. Result equals the plain equi-join exactly.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts > 0)
    // deterministic spread: hash of the whole large row modulo salts
    // (monotonically_increasing_id would break replay determinism)
    val largeSalted = large.withColumn("_salt",
      pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val smallExploded = small.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    largeSalted.join(smallExploded, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase aggregation for high-cardinality skewed grouping:
    * partial agg on (key, salt), final agg on key. For algebraic
    * aggregates Spark's partial aggregation already does this
    * map-side; this explicit form is for aggregates that need the
    * intermediate shuffle spread (e.g. collect-like or exact
    * distinct counts over a hot key).
    */
  def saltedDistinctCount(df: DataFrame, key: String, distinctCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(distinctCol)), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(countDistinct(col(distinctCol)).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).cast("long").as("n_distinct"))
  }

  /** Bloom-filter build over a key column, as a Column aggregate —
    * the catalyst `BloomFilterAggregate` Catalyst uses for its own
    * runtime join pruning, surfaced for explicit pipelines (it is
    * not in the public function registry). Combine with
    * [[bloomMightContain]] as a pre-join semi-filter: the bloom
    * passes every true key (no false negatives), the exact join
    * removes the false positives, so the final result is EXACT while
    * the probe side's shuffle carries only rows that might match —
    * at 100 TB, the difference between shuffling the fact table and
    * shuffling the ~selectivity fraction of it.
    */
  def bloomAgg(key: Column, estimatedItems: Long): Column = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
        Bridge.expression(key), Literal(estimatedItems), Literal(estimatedItems * 8))
        .toAggregateExpression())
  }

  /** Membership probe against a [[bloomAgg]]-built filter. */
  def bloomMightContain(bloom: Column, key: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        Bridge.expression(bloom), Bridge.expression(key)))
  }

  /** Compact a parquet directory written by a streaming sink (or any
    * producer of many small files) into files of roughly
    * `targetFileBytes`, preserving every row and the schema.
    *
    * Streaming ingest at one-file-per-trigger-per-writer produces
    * thousands of KB-scale files per day; at read time each costs a
    * listing entry, a footer fetch, and a task, so scan parallelism
    * degenerates into scheduler overhead (the classic small-file
    * problem). Compaction is the standing maintenance job every
    * large-scale table needs.
    *
    * The output file count is sized from the directory's actual bytes
    * (compression-ratio-free: parquet in → parquet out), written to a
    * fresh directory and atomically visible by directory swap at the
    * caller's convenience — never rewrites in place, so readers of the
    * old directory are undisturbed (the same temp-then-commit
    * discipline as the reference's sink, KPW:409-417). Uses
    * `coalesce`, not `repartition`: compaction must not pay a
    * shuffle — it only merges read splits.
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      targetFileBytes: Long = 128L << 20): Long = {
    val inPath = new org.apache.hadoop.fs.Path(inDir)
    val fs = inPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(inPath).toSeq
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = dataFiles.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inDir).coalesce(nOut)
      .write.mode("overwrite").parquet(outDir)
    nOut.toLong
  }

  /** Morton (Z-order) interleave of two 16-bit non-negative
    * dimensions into one 32-bit curve position, as a pure codegen'd
    * Column (mask-and-shift spreading; shifts are multiplications —
    * exact for non-negative longs — so the same expression is
    * portable integer arithmetic in any engine).
    *
    * Z-ordering is the standard multi-dimensional clustering layout
    * for data lakes: sorting a table by `morton16(a, b)` makes every
    * contiguous file cover an approximately square (a, b) box, so a
    * predicate box on EITHER dimension touches O(√files) files
    * instead of all of them — the file-skipping property that
    * single-column sorting only provides for its leading column.
    * Inputs are masked to 16 bits; callers bucket wider domains down
    * first (quantile or fixed-width bucketing both work — the curve
    * only needs rank locality, not exact values).
    */
  def morton16(a: Column, b: Column): Column = {
    def spread(x0: Column): Column = {
      val x = x0.bitwiseAND(lit(0xFFFFL))
      val s1 = x.bitwiseOR(x * lit(256L)).bitwiseAND(lit(0x00FF00FFL))
      val s2 = s1.bitwiseOR(s1 * lit(16L)).bitwiseAND(lit(0x0F0F0F0FL))
      val s3 = s2.bitwiseOR(s2 * lit(4L)).bitwiseAND(lit(0x33333333L))
      s3.bitwiseOR(s3 * lit(2L)).bitwiseAND(lit(0x55555555L))
    }
    spread(a.cast("long")).bitwiseOR(spread(b.cast("long")) * lit(2L))
  }

  /** Rewrite a table Z-order-clustered on two numeric dimensions:
    * each dimension is first mapped to an equal-frequency 8-bit rank
    * code (approx-quantile boundaries — the same sampling-based
    * normalization Delta's OPTIMIZE ZORDER uses via its range
    * partitioner), the codes are Morton-interleaved, and the table is
    * range-partitioned + sorted on the curve position (one shuffle —
    * the price of any re-layout) into `nFiles` parquet files.
    *
    * The rank coding is what makes the curve's guarantee hold on real
    * data: interleaving RAW values degenerates whenever the two
    * domains have unequal bit widths or skew (the wider dimension's
    * high bits monopolize the curve — measured on the events table:
    * raw interleave produced WORSE boxes than a 1-D sort). With both
    * dimensions rank-coded to 0..255 the space is square and uniform
    * by construction, so each of N files covers ~1/N of the area and
    * a predicate box on either dimension touches O(√N) files — file
    * pruning for any stats-aware reader, row-group pruning for plain
    * parquet. Maintenance companion to [[compactParquet]]: run once
    * on cold data, every subsequent scan benefits.
    */
  def zOrderWrite(df: DataFrame, colA: String, colB: String,
      outDir: String, nFiles: Int): Unit = {
    val probes = (1 until 256).map(_ / 256.0).toArray
    // one sampling pass per dimension (driver gets 255 boundaries —
    // a layout job's planning action, independent of table size)
    def bounds(c: String): Column = lit(
      df.select(col(c).cast("double").as(c)).stat
        .approxQuantile(c, probes, 0.001))
    def code(c: String, bs: Column): Column =
      size(filter(bs, b => b <= col(c).cast("double")))
    df.withColumn("_z",
        morton16(code(colA, bounds(colA)), code(colB, bounds(colB))))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** Build a per-file min/max statistics manifest for `statsCols` of
    * a parquet directory, written as one small parquet under
    * `dir/_graft_manifest` (underscore-prefixed: Spark's file index
    * ignores it on normal reads). One distributed scan grouped by
    * `input_file_name` — the write-once planning artifact that gives
    * vanilla Spark the file-level skipping a table format keeps in
    * its transaction log. Pairs with [[zOrderWrite]]: after a
    * Z-order rewrite the per-file boxes are tight, so manifest
    * pruning approaches the curve's O(√N)-files bound.
    */
  def writeManifest(spark: SparkSession, dir: String,
      statsCols: Seq[String]): Unit = {
    val aggs = statsCols.flatMap(c => Seq(
      min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_graft_manifest")
  }

  /** Incremental [[writeManifest]]: scan ONLY files not yet present
    * in the manifest (the append-only case — a streaming sink or
    * compaction added files since the last build) and union their
    * stats with the existing entries. Cost is O(new data), not
    * O(table) — the property that makes stats maintenance viable on
    * a table that only ever grows. Files that disappeared (compaction
    * replaced them) are dropped from the manifest by existence check,
    * an O(files) listing.
    */
  def updateManifest(spark: SparkSession, dir: String,
      statsCols: Seq[String]): Unit = {
    val manifestPath = s"$dir/_graft_manifest"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(manifestPath)))
      return writeManifest(spark, dir, statsCols)
    val old = spark.read.parquet(manifestPath)
    val known = old.select("file").collect().map(_.getString(0)).toSet
    val live = spark.read.parquet(dir).inputFiles.toSet
    val fresh = (live -- known).toSeq.sorted
    val kept = old.filter(col("file").isin(live.toSeq: _*))
    val merged =
      if (fresh.isEmpty) kept
      else {
        val aggs = statsCols.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
        kept.unionByName(
          spark.read.schema(spark.read.parquet(dir).schema)
            .parquet(fresh: _*)
            .groupBy(input_file_name().as("file"))
            .agg(aggs.head, aggs.tail: _*))
      }
    // write-then-swap: never read and overwrite the same files in one
    // job (the read is lazy — overwrite mode would clobber its input)
    val tmp = s"$dir/_graft_manifest_tmp"
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    fs.delete(new org.apache.hadoop.fs.Path(manifestPath), true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp),
      new org.apache.hadoop.fs.Path(manifestPath))
  }

  /** Read `dir` with an inclusive range predicate on `statsCol`,
    * opening ONLY the files whose manifest [min, max] interval
    * overlaps [lo, hi]. The predicate is re-applied exactly on the
    * surviving files, so the result equals the naive
    * read-everything-and-filter plan — the manifest only prunes, it
    * never decides membership. The manifest itself is a 1-file read
    * whose size is O(files), not O(rows); at 100 TB that's the
    * difference between a driver listing of every footer and a
    * kilobyte-scale planning lookup.
    */
  def prunedRead(spark: SparkSession, dir: String, statsCol: String,
      lo: Any, hi: Any): DataFrame = {
    val files = spark.read.parquet(s"$dir/_graft_manifest")
      .filter(col(s"max_$statsCol") >= lit(lo) && col(s"min_$statsCol") <= lit(hi))
      .select(col("file"))
      .collect().map(_.getString(0)) // O(files) planning metadata, not data
    val base =
      if (files.isEmpty) // preserve schema on an empty match
        spark.read.parquet(dir).limit(0)
      else spark.read
        .schema(spark.read.parquet(dir).schema) // stable column order
        .parquet(files.toIndexedSeq: _*)
    base.filter(col(statsCol) >= lit(lo) && col(statsCol) <= lit(hi))
  }

  /** Count Exchange (shuffle) operators in a query's final physical
    * plan — the metric every scale review here starts from.
    */
  def countShuffles(df: DataFrame): Int = {
    df.count() // materialize AQE's final plan
    df.queryExecution.executedPlan.toString
      .linesIterator.count(l =>
        l.contains("Exchange hashpartitioning") ||
          l.contains("Exchange rangepartitioning"))
  }
}
