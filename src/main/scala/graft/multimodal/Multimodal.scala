package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multimodal column support (north-star addition): image/audio/video
  * as opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * The decode step is STUBBED — the container has no image/audio
  * libraries — behind [[MediaDecoder]], with [[FakeDecoder]] as a
  * deterministic stand-in. Everything Spark-side is real and tested:
  * the schema (binary payload + metadata struct), the per-partition
  * batch shape (decoder initialized once per partition and reused,
  * the JVM analog of a batched pandas UDF), and the feature-extract /
  * resize / frame-sample plumbing.
  *
  * At 100 TB the same plan holds: `mapPartitions` is
  * embarrassingly parallel, no shuffle is introduced before the
  * (optional) aggregation, and the decoder cost amortizes over each
  * partition batch.
  */
object Multimodal {

  /** One media item: opaque payload + typed envelope. */
  case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      payload: Array[Byte],
      n_bytes: Long,
      source: String)

  /** Decoded features. For images w/h are pixel dims, for audio
    * w=samples h=channels, for video w/h of first frame. */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      checksum: Long,
      brightness: Double)

  /** The pluggable decode seam. A production implementation wraps
    * javax.imageio / ffmpeg bindings; initialization may be
    * expensive, hence once-per-partition reuse in [[extractFeatures]].
    */
  trait MediaDecoder extends Serializable {
    def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Double)
  }

  /** STUB decoder — deterministic fake in place of a real image/audio
    * library (not available offline). Derives pseudo-dimensions and a
    * pseudo-brightness from payload bytes so tests are exact.
    */
  object FakeDecoder extends MediaDecoder {
    override def decode(mediaType: String, payload: Array[Byte]): (Int, Int, Double) = {
      val n = payload.length
      val w = 16 + (n % 113)
      val h = 16 + (n % 97)
      // mean unsigned byte value as stand-in luminance
      var s = 0L
      var i = 0
      while (i < n) { s += payload(i) & 0xff; i += 1 }
      (w, h, if (n == 0) 0.0 else s.toDouble / n)
    }
  }

  /** Derive a media table from `documents` (the driver test data has
    * no binary fixture): payload = UTF-8 bytes of the text, treated
    * as opaque from here on; media_type assigned round-robin. Columns
    * and partitioning mirror what a real ingest would produce.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes"),
        col("source"))
      .as[MediaRecord]
  }

  /** Batch feature extraction: decoder constructed once per partition
    * and reused across the partition's records — the cost profile of
    * `mapInPandas` without the Python boundary.
    */
  def extractFeatures(media: Dataset[MediaRecord],
      decoder: MediaDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val dec = decoder // per-partition init point for heavyweight decoders
      it.map { m =>
        val (w, h, b) = dec.decode(m.media_type, m.payload)
        val crc = new java.util.zip.CRC32()
        crc.update(m.payload)
        MediaFeatures(m.media_id, m.media_type, w, h, m.n_bytes, crc.getValue, b)
      }
    }
  }

  /** Resize stub: produces a down-scaled payload (here: deterministic
    * byte subsampling standing in for pixel resampling). Real impl
    * would decode → resample → re-encode inside the same partition
    * batch.
    */
  def resize(media: Dataset[MediaRecord], factor: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    require(factor > 0)
    media.mapPartitions { it =>
      it.map { m =>
        // primitive stride copy — no per-byte boxing on large payloads
        val n = m.payload.length
        val sub = new Array[Byte]((n + factor - 1) / factor)
        var i = 0
        while (i < sub.length) { sub(i) = m.payload(i * factor); i += 1 }
        m.copy(payload = sub, n_bytes = sub.length.toLong)
      }
    }
  }

  /** Frame sampling stub for video payloads: split the payload into
    * `nFrames` contiguous chunks ("frames"), emitted as one row per
    * frame — the generator shape (`flatMap`) a real frame sampler has.
    */
  case class Frame(media_id: Long, frame_no: Int, frame_bytes: Array[Byte])

  def sampleFrames(media: Dataset[MediaRecord], nFrames: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    require(nFrames > 0)
    media.filter(_.media_type == "video").flatMap { m =>
      val size = math.max(1, m.payload.length / nFrames)
      (0 until nFrames).iterator.map { f =>
        val from = f * size
        val until = math.min(m.payload.length, from + size)
        Frame(m.media_id, f,
          if (from >= m.payload.length) Array.empty[Byte]
          else m.payload.slice(from, until))
      }
    }
  }

  /** Fixed-size chunking for audio payloads: 256-byte windows, no
    * overlap, last window ragged — the segmentation shape feeding a
    * feature extractor (spectrogram frames, ASR windows). Unlike
    * [[sampleFrames]]' fixed count, the chunk COUNT varies per record
    * with payload length.
    */
  case class AudioChunk(media_id: Long, chunk_no: Int, chunk_bytes: Array[Byte])

  def chunkAudio(media: Dataset[MediaRecord], window: Int): Dataset[AudioChunk] = {
    import media.sparkSession.implicits._
    require(window > 0)
    media.filter(_.media_type == "audio").flatMap { m =>
      val n = m.payload.length
      val nChunks = math.max(1, (n + window - 1) / window)
      (0 until nChunks).iterator.map { c =>
        AudioChunk(m.media_id, c,
          m.payload.slice(c * window, math.min(n, (c + 1) * window)))
      }
    }
  }

  /** Perceptual-fingerprint signature over an opaque payload — the
    * content-sketch construction media-dedup pipelines use (color
    * histograms for images, spectral-peak sketches for audio), on the
    * engine's honest stand-in payloads: hash each consecutive byte
    * pair into one of 64 buckets, one bit per bucket (bucket count
    * above the mean bucket count), packed into 4 × 16-bit bands for
    * LSH-style candidate blocking. A local feature histogram is
    * alignment-robust — insertions shift byte POSITIONS but barely
    * move the bigram distribution — which positional block hashes are
    * not (measured: positional 64-block byte means put the corpus's
    * nearest pairs at Hamming 10+, the bigram sketch at 0-3).
    *
    * The mean comparison is cross-multiplied integers
    * (`count * 64 > total`) so every bit is exact — no float mean to
    * disagree with the oracle. Payloads under 64 bytes are skipped
    * (too few features for a stable 64-bit sketch).
    */
  case class MediaSignature(media_id: Long, b0: Int, b1: Int, b2: Int, b3: Int)

  def fingerprintSignatures(media: Dataset[MediaRecord]): Dataset[MediaSignature] = {
    import media.sparkSession.implicits._
    media.filter(_.payload.length >= 64).mapPartitions { it =>
      it.map { m =>
        val p = m.payload
        val n = p.length
        val cnts = new Array[Long](64)
        var i = 0
        while (i < n - 1) {
          cnts(((p(i) & 0xff) * 31 + (p(i + 1) & 0xff)) % 64) += 1
          i += 1
        }
        val tot = (n - 1).toLong
        val bands = new Array[Int](4)
        var bkt = 0
        while (bkt < 64) {
          if (cnts(bkt) * 64L > tot) bands(bkt >> 4) |= 1 << (bkt & 15)
          bkt += 1
        }
        MediaSignature(m.media_id, bands(0), bands(1), bands(2), bands(3))
      }
    }
  }

  /** Max members of a (band, value) bucket that still participate in
    * candidate generation. MEASURED need, not hypothetical: at sf0.1
    * the top band value already holds 696 of 4,876 media (these
    * bigram-histogram sketch bands are far more biased than a uniform
    * hash — common background texture shares band values), producing
    * 1.1M candidate rows for 4,876 inputs; at ×100 corpus that ONE
    * bucket would contribute ~2.4G join rows. The cap is loss-bounded
    * by pigeonhole: hamming ≤ 3 over 4 bands means ≥1 band is EXACTLY
    * equal, and ≥2 differing-band splits leave another equal band to
    * rediscover the pair, so only pairs whose sole equal band is an
    * over-dense value are dropped — precisely the low-information
    * "generic texture" matches. Chosen above the gate-scale maximum
    * (696) so gate outputs are unchanged; ScaleEvidence path 7
    * exercises the binding case at ×100 with a planted-clone recall
    * invariant.
    */
  private val MaxFpBandOccupancy = 1000

  /** Near-dup pairs from [[fingerprintSignatures]]. Candidates come
    * from a band equi-join (any of the 4 16-bit bands equal), NEVER
    * all-pairs; both full signatures ride along on the exploded band
    * rows, so the Hamming distance is computed inline on the join
    * output and the only other exchange is the final pair distinct.
    * Matching in k bands yields k identical rows → distinct. At
    * 100 TB: shuffle keyed on (band, value), per-bucket fan-out
    * bounded by [[MaxFpBandOccupancy]]² (one window count over the
    * join key — the same single-exchange guard as the MinHash df cap
    * and the q223 occupancy cap, and it leaves the relation
    * partitioned exactly as the self-join consumes it).
    */
  /** [[fingerprintPairs]] persisted through [[graft.CacheRegistry]]:
    * q147 (the pair listing) and q148 (the purge manifest, which
    * iterates label propagation over these pairs) share ONE
    * materialization per session+dir instead of re-running the
    * signature scan + band join per query — and per propagation
    * round, before [[graft.operators.Components.minLabel]] learned to
    * persist its edge list. */
  def cachedFingerprintPairs(s: SparkSession, d: String): DataFrame =
    graft.CacheRegistry.getOrPersist(s, s"multimodal.fppairs:$d") {
      fingerprintPairs(s, d)
    }

  def fingerprintPairs(s: SparkSession, d: String): DataFrame =
    fingerprintPairsOf(mediaTable(s, d))

  /** Same pipeline over an arbitrary media relation — the
    * scale-evidence harness drives the SHIPPED chain at ×100 volume
    * instead of a reimplementation. */
  private[graft] def fingerprintPairsOf(media: Dataset[MediaRecord]): DataFrame = {
    val sigs = fingerprintSignatures(media).toDF()
    val bands = sigs.select(col("media_id"), col("b0"), col("b1"),
      col("b2"), col("b3"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3")))
        .as(Seq("band", "bv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("band"), col("bv"))
    val kept = bands.withColumn("occ", count(lit(1)).over(w))
      .filter(col("occ") <= MaxFpBandOccupancy)
      .drop("occ")
    kept.as("a")
      .join(kept.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        expr("bit_count(a.b0 ^ b.b0) + bit_count(a.b1 ^ b.b1) + " +
          "bit_count(a.b2 ^ b.b2) + bit_count(a.b3 ^ b.b3)")
          .cast("long").as("hamming"))
      .filter(col("hamming") <= 3)
      .distinct()
  }

  // ---------------------------------------------------------------
  // Oracle-checked query: the binary-column plumbing (payload sizes,
  // fingerprints, media-type demographics). Decode itself is not
  // SQL-expressible — covered by MultimodalSpec instead.
  // ---------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q64: the frame-sampling generator (typed Dataset flatMap)
    // surfaced in the oracle gate — per video, 4 contiguous payload
    // chunks with per-frame length + md5. Proves the typed-API path
    // (case classes + mapPartitions/flatMap) produces byte-exact,
    // SQL-verifiable output, not just the DataFrame path. (Payloads
    // are ASCII here, so the oracle's char-based substr arithmetic
    // equals byte offsets; a binary fixture would use blob slicing.)
    "q64_frame_sample" -> ((s, d) => {
      sampleFrames(mediaTable(s, d), nFrames = 4).toDF()
        .select(col("media_id"), col("frame_no"),
          octet_length(col("frame_bytes")).cast("long").as("frame_len"),
          md5(col("frame_bytes")).as("frame_fp"))
    }),

    // q100: audio chunking under the gate — variable chunk count per
    // record (vs q64's fixed frame count), verified per-chunk by
    // length + fingerprint and per-media by reassembly arithmetic
    // (sum of chunk lengths = payload length, ragged tail exact).
    "q100_audio_chunks" -> ((s, d) => {
      chunkAudio(mediaTable(s, d), window = 256).toDF()
        .groupBy(col("media_id"))
        .agg(count(lit(1)).cast("long").as("n_chunks"),
          sum(octet_length(col("chunk_bytes"))).cast("long").as("total_bytes"),
          max(octet_length(col("chunk_bytes"))).cast("long").as("max_chunk"),
          min(octet_length(col("chunk_bytes"))).cast("long").as("min_chunk"),
          md5(concat_ws("", expr(
            "transform(array_sort(collect_list(struct(chunk_no AS cn, " +
              "md5(chunk_bytes) AS fp))), x -> x.fp)")).cast("binary"))
            .as("chunks_fp"))
    }),

    // q190: SCENE-CUT detection over the frame stream — the temporal
    // step after q64's spatial sampling: per video, 8 frames, each
    // reduced to an exact integer luminance proxy (byte sum), then a
    // lag window per video flags a cut wherever the mean-luminance
    // jump between consecutive frames exceeds 2.0 byte-units. The
    // jump is cross-multiplied integers — |s·n_prev − s_prev·n| ·
    // 1000 div (n · n_prev) — so the threshold never sits on a
    // float (the q147 mean-comparison lesson applied temporally).
    // Plan: typed flatMap (zero exchange) → one window shuffle keyed
    // by media_id with per-video row count fixed at ≤ 8 — the shape
    // survives any corpus size because state per key is bounded by
    // the frame count, not the payload.
    "q190_scene_cuts" -> ((s, d) => {
      import s.implicits._
      val frames = sampleFrames(mediaTable(s, d), nFrames = 8)
        .map(f => (f.media_id, f.frame_no,
          f.frame_bytes.length.toLong,
          f.frame_bytes.foldLeft(0L)((a, b) => a + (b & 0xff))))
        .toDF("media_id", "frame_no", "n", "s")
        .filter(col("n") > 0)
      val w = Window.partitionBy(col("media_id")).orderBy(col("frame_no"))
      frames
        .withColumn("pn", lag(col("n"), 1).over(w))
        .withColumn("ps", lag(col("s"), 1).over(w))
        .withColumn("jump",
          expr("abs(s * pn - ps * n) * 1000L div (n * pn)"))
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("jump") > 2000L, 1L).otherwise(0L)).as("n_cuts"),
          coalesce(max(col("jump")), lit(0L)).as("max_jump_milli"))
    }),

    // q79: the resize stub under the gate — per media type, record
    // counts and byte totals after factor-4 subsampling. The typed
    // mapPartitions path produces ceil(len/4) bytes per record,
    // which the oracle reproduces with integer arithmetic; md5 of
    // the subsampled payload is spec-checked (MultimodalSpec), not
    // SQL-expressible.
    "q79_resize_stats" -> ((s, d) => {
      resize(mediaTable(s, d), factor = 4).toDF()
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("resized_bytes"))
    }),

    // q147: media near-dup via perceptual-fingerprint signatures — the
    // image/audio-dedup shape (content sketch + multi-index Hamming
    // search) on the binary column. See [[fingerprintPairs]] for the
    // plan shape.
    "q147_media_fingerprint_dedup" -> ((s, d) => cachedFingerprintPairs(s, d)),

    // q148: from pairs to an actionable PURGE MANIFEST — the step a
    // real curation pipeline executes: transitively close the near-dup
    // pairs into clusters ([[graft.operators.Components.minLabel]],
    // the same propagation q68 uses), pick one survivor per cluster
    // (largest payload, ties to the lowest id — "keep the best copy"),
    // and account the reclaimable bytes. Only the pair graph — orders
    // of magnitude below the corpus — enters the iterative loop; the
    // single corpus-sized op is one equi-join to fetch payload sizes.
    "q148_dedup_purge_manifest" -> ((s, d) => {
      val labels = graft.operators.Components.minLabel(
        cachedFingerprintPairs(s, d), "id_a", "id_b")
      val sizes = mediaTable(s, d).toDF()
        .select(col("media_id").as("node"), col("n_bytes"))
      labels.join(sizes, "node")
        .groupBy(col("lab"))
        .agg(count(lit(1)).as("cluster_size"),
          max(struct(col("n_bytes").as("sz"), (-col("node")).as("negid")))
            .as("win"),
          sum(col("n_bytes")).as("tot"))
        .select(col("lab").as("cluster"),
          col("cluster_size"),
          (col("cluster_size") - 1).as("n_removed"),
          (-col("win.negid")).as("survivor_id"),
          (col("tot") - col("win.sz")).as("bytes_reclaimed"))
    }),

    "q38_media_stats" -> ((s, d) => {
      mediaTable(s, d).toDF()
        .withColumn("fp", md5(col("payload")))
        .groupBy(col("media_type"))
        .agg(
          count(lit(1)).as("n_media"),
          sum(col("n_bytes")).as("total_bytes"),
          countDistinct(col("fp")).as("n_distinct_payloads"),
          min(col("n_bytes")).as("min_bytes"),
          max(col("n_bytes")).as("max_bytes"))
    }))

  /** Shared oracle CTE chain ending in `pairs(id_a, id_b, hamming)` —
    * the DuckDB twin of [[fingerprintPairs]] (q147 selects it
    * directly; q148 closes it transitively).
    */
  private val fingerprintPairsCte: String =
    s"""docs AS MATERIALIZED (
      |  SELECT doc_id AS media_id, text, length(text) AS len
      |  FROM documents WHERE length(text) >= 64),
      |grams AS (
      |  SELECT media_id,
      |   (ascii(substr(text, p, 1)) * 31 + ascii(substr(text, p + 1, 1))) % 64
      |     AS bkt
      |  FROM (SELECT media_id, text, len,
      |          unnest(generate_series(1, len - 1)) AS p FROM docs)),
      |buckets AS (
      |  SELECT media_id, bkt, count(*) AS c FROM grams GROUP BY 1, 2),
      |tot AS (SELECT media_id, sum(c) AS tc FROM buckets GROUP BY 1),
      |bandbits AS (
      |  SELECT b.media_id, divide(bkt, 16) AS band,
      |         CAST(sum(CASE WHEN b.c * 64 > t.tc
      |                       THEN 1 << CAST(bkt % 16 AS INT) ELSE 0 END)
      |              AS INT) AS bv
      |  FROM buckets b JOIN tot t USING (media_id)
      |  GROUP BY 1, 2),
      |-- densify: Spark emits all 4 bands per media (an all-zero band
      |-- is a real band value that can match other all-zero bands);
      |-- mirror that even when no bigram hashes into a band's range
      |bands AS MATERIALIZED (
      |  SELECT t.media_id, g.band, coalesce(bb.bv, 0) AS bv
      |  FROM tot t
      |  CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS band) g
      |  LEFT JOIN bandbits bb
      |    ON bb.media_id = t.media_id AND bb.band = g.band),
      |sigs AS MATERIALIZED (
      |  SELECT media_id,
      |         coalesce(max(CASE WHEN band = 0 THEN bv END), 0) AS b0,
      |         coalesce(max(CASE WHEN band = 1 THEN bv END), 0) AS b1,
      |         coalesce(max(CASE WHEN band = 2 THEN bv END), 0) AS b2,
      |         coalesce(max(CASE WHEN band = 3 THEN bv END), 0) AS b3
      |  FROM bands GROUP BY 1),
      |-- occupancy cap (mirror of MaxFpBandOccupancy): over-dense band
      |-- values are excluded from candidate generation on BOTH sides;
      |-- never binds at gate scale (max occupancy 696 at sf0.1)
      |keep AS (SELECT band, bv FROM bands GROUP BY band, bv
      |  HAVING count(*) <= $MaxFpBandOccupancy),
      |kb AS (SELECT b.media_id, b.band, b.bv FROM bands b
      |  JOIN keep USING (band, bv)),
      |cand AS (
      |  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
      |  FROM kb a JOIN kb b
      |    ON a.band = b.band AND a.bv = b.bv AND a.media_id < b.media_id),
      |pairs AS MATERIALIZED (
      |  SELECT * FROM (
      |    SELECT c.id_a, c.id_b,
      |      CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1))
      |         + bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3))
      |        AS BIGINT) AS hamming
      |    FROM cand c
      |    JOIN sigs sa ON sa.media_id = c.id_a
      |    JOIN sigs sb ON sb.media_id = c.id_b)
      |  WHERE hamming <= 3)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q64_frame_sample" ->
      """WITH vids AS (
        |  SELECT doc_id AS media_id, text, length(text) AS len
        |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
        |frames AS (
        |  SELECT media_id, f AS frame_no,
        |   CASE WHEN f * greatest(1, divide(len, 4)) >= len THEN ''
        |    ELSE substr(text, f * greatest(1, divide(len, 4)) + 1, greatest(1, divide(len, 4)))
        |   END AS fb
        |  FROM vids, (SELECT unnest(generate_series(0, 3)) AS f))
        |SELECT media_id, CAST(frame_no AS INT) AS frame_no,
        | CAST(length(fb) AS BIGINT) AS frame_len, md5(fb) AS frame_fp
        |FROM frames""".stripMargin,

    "q100_audio_chunks" ->
      """WITH aud AS (
        |  SELECT doc_id AS media_id, text, length(text) AS len
        |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 1),
        |chunks AS (
        |  SELECT media_id, c AS chunk_no,
        |   substr(text, c * 256 + 1, least(256, len - c * 256)) AS cb
        |  FROM aud, (SELECT unnest(generate_series(0, 200)) AS c)
        |  WHERE c = 0 OR c * 256 < len)
        |SELECT media_id,
        | count(*) AS n_chunks,
        | CAST(sum(length(cb)) AS BIGINT) AS total_bytes,
        | CAST(max(length(cb)) AS BIGINT) AS max_chunk,
        | CAST(min(length(cb)) AS BIGINT) AS min_chunk,
        | md5(string_agg(md5(cb), '' ORDER BY chunk_no)) AS chunks_fp
        |FROM chunks GROUP BY media_id""".stripMargin,

    // Same 8-frame slicing as q64's 4-frame CTE; per-frame luminance
    // sum via the q147 per-char idiom (ascii(substr) over a position
    // series — ASCII payloads: char = byte). MATERIALIZED so the
    // per-char expansion runs once.
    "q190_scene_cuts" ->
      """WITH vids AS (
        |  SELECT doc_id AS media_id, text, length(text) AS len
        |  FROM documents WHERE CAST(doc_id % 3 AS INT) = 2),
        |frames AS MATERIALIZED (
        |  SELECT media_id, f AS frame_no,
        |   CASE WHEN f * greatest(1, divide(len, 8)) >= len THEN ''
        |    ELSE substr(text, f * greatest(1, divide(len, 8)) + 1, greatest(1, divide(len, 8)))
        |   END AS fb
        |  FROM vids, (SELECT unnest(generate_series(0, 7)) AS f)),
        |fsum AS MATERIALIZED (
        |  SELECT media_id, frame_no, CAST(max(ln) AS BIGINT) AS n,
        |   CAST(sum(ascii(substr(fb, p, 1))) AS BIGINT) AS s
        |  FROM (SELECT media_id, frame_no, fb, length(fb) AS ln,
        |         unnest(generate_series(1, length(fb))) AS p
        |        FROM frames WHERE length(fb) > 0)
        |  GROUP BY 1, 2),
        |j AS (
        |  SELECT media_id, n, s,
        |   lag(n) OVER w AS pn, lag(s) OVER w AS ps
        |  FROM fsum WINDOW w AS (PARTITION BY media_id ORDER BY frame_no)),
        |jm AS (
        |  SELECT media_id,
        |   CASE WHEN pn IS NULL THEN NULL
        |    ELSE CAST(divide(abs(s * pn - ps * n) * 1000, (n * pn)) AS BIGINT)
        |   END AS jump
        |  FROM j)
        |SELECT media_id, count(*) AS n_frames,
        | CAST(coalesce(sum(CASE WHEN jump > 2000 THEN 1 ELSE 0 END), 0)
        |   AS BIGINT) AS n_cuts,
        | CAST(coalesce(max(jump), 0) AS BIGINT) AS max_jump_milli
        |FROM jm GROUP BY media_id""".stripMargin,

    "q79_resize_stats" ->
      """SELECT media_type, count(*) AS n_media,
        | CAST(sum(divide((octet_length(encode(text)) + 3), 4)) AS BIGINT) AS resized_bytes
        |FROM (SELECT
        |   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |     WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |   text FROM documents)
        |GROUP BY media_type""".stripMargin,

    // Mirrors the Spark construction bit-for-bit: per-char bigram
    // buckets (payloads are ASCII, so char positions/codes ARE byte
    // positions/values), cross-multiplied integer mean comparison,
    // band candidate join, inline Hamming. Reused CTEs are MATERIALIZED
    // so DuckDB doesn't re-inline the per-char expansion per reference.
    "q147_media_fingerprint_dedup" ->
      s"""WITH $fingerprintPairsCte
        |SELECT id_a, id_b, hamming FROM pairs""".stripMargin,

    // Same pair CTEs + the q68-style recursive transitive closure,
    // then survivor selection by (size DESC, id ASC) via row_number.
    "q148_dedup_purge_manifest" ->
      s"""WITH RECURSIVE $fingerprintPairsCte,
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION ALL SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT node, node AS lab FROM (SELECT DISTINCT src AS node FROM edges)
        |  UNION
        |  SELECT e.dst AS node, r.lab FROM reach r JOIN edges e ON e.src = r.node),
        |lab AS (SELECT node, min(lab) AS lab FROM reach GROUP BY node),
        |sized AS (
        |  SELECT l.node, l.lab,
        |         CAST(octet_length(encode(d.text)) AS BIGINT) AS sz
        |  FROM lab l JOIN documents d ON d.doc_id = l.node),
        |rn AS (
        |  SELECT node, lab, sz,
        |         row_number() OVER (PARTITION BY lab
        |                            ORDER BY sz DESC, node ASC) AS rk
        |  FROM sized)
        |SELECT lab AS cluster,
        |  CAST(count(*) AS BIGINT) AS cluster_size,
        |  CAST(count(*) - 1 AS BIGINT) AS n_removed,
        |  CAST(max(CASE WHEN rk = 1 THEN node END) AS BIGINT) AS survivor_id,
        |  CAST(sum(sz) - max(sz) AS BIGINT) AS bytes_reclaimed
        |FROM rn GROUP BY lab""".stripMargin,

    "q38_media_stats" ->
      """SELECT media_type, count(*) AS n_media,
        | CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
        | CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct_payloads,
        | min(n_bytes) AS min_bytes, max(n_bytes) AS max_bytes
        |FROM (SELECT
        |   CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |     WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        |   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |   md5(text) AS fp
        |  FROM documents)
        |GROUP BY media_type""".stripMargin)
}
