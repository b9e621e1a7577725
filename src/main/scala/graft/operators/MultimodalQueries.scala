package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction / frame-sampling stages.
  *
  * The harness tables carry no real image/audio bytes and this container
  * has no media codecs, so the DECODE STEP IS A STUB — `byteHistogram`
  * below is a deterministic fake (byte-histogram of the payload standing
  * in for a real pixel/sample decoder). Everything around the stub is the
  * real Spark shape a production pipeline needs:
  *
  *   - payloads travel as a `BinaryType` column next to a typed metadata
  *     struct (kind/width/height/n_frames) — never parsed by Catalyst,
  *     never part of a shuffle key;
  *   - per-row decode runs inside `mapPartitions` on a typed Dataset
  *     (the JVM twin of an Arrow-batched pandas UDF: one iterator per
  *     partition, so decoder init cost amortizes across the partition,
  *     and memory stays one batch at a time);
  *   - frame sampling is relational (`explode(sequence(...))`) so Catalyst
  *     owns the row explosion, and the decoder only sees sampled frames;
  *   - feature vectors come back as `Array[Float]`, ready for the
  *     `EmbeddingQueries` similarity operators.
  *
  * At 100 TB: binary payloads dominate bytes, so the plan keeps them in
  * the map stage only — every shuffle in this module moves doc_id +
  * small features, never payload bytes.
  *
  * Catalog outputs are EXACT integer byte-histogram counts (the float
  * normalization lives only on the typed Dataset API): integer counts are
  * bit-identical across engines, so both catalog queries carry full
  * DuckDB oracles (the oracle recovers payload bytes via
  * `hex(encode(text))` nibble arithmetic).
  */
object MultimodalQueries {

  val FeatureDim = 8

  /** One media row: payload + metadata. Metadata is derived
    * deterministically from the documents table (this is the harness
    * stand-in for a real object-store manifest).
    */
  final case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte],
                            width: Int, height: Int, n_frames: Int)

  final case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
                                 features: Array[Float])

  final case class FrameFeatures(doc_id: Long, frame_idx: Int,
                                 features: Array[Float])

  /** Exact per-media histogram row for the verified catalog surface. */
  final case class MediaHistogram(doc_id: Long, kind: String, n_bytes: Long,
                                  c0: Long, c7: Long)

  /** Exact per-frame histogram row for the verified catalog surface. */
  final case class FrameHistogram(doc_id: Long, frame_idx: Int,
                                  n_frame_bytes: Long,
                                  c0: Long, c1: Long, c2: Long, c3: Long,
                                  c4: Long, c5: Long, c6: Long, c7: Long)

  /** Media "manifest" from `documents`: payload = UTF-8 bytes of the text
    * column (the opaque-bytes stand-in), kind cycles image/audio/video,
    * dimensions derive from n_chars. Deterministic, so tests can golden it.
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("n_chars") % 64 + 16).cast("int").as("width"),
        (col("n_chars") % 48 + 16).cast("int").as("height"),
        (col("n_chars") % 10 + 1).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** STUB DECODER core — stands in for a real image/audio decode + model
    * feature extractor (not available in this environment). Deterministic
    * and exact: bucket-(b mod 8) byte counts of the payload. Replace with
    * a real codec + encoder on a cluster with media libs.
    */
  def byteHistogram(payload: Array[Byte]): Array[Long] = {
    val c = new Array[Long](FeatureDim)
    var i = 0
    while (i < payload.length) {
      c((payload(i) & 0xff) % FeatureDim) += 1L
      i += 1
    }
    c
  }

  /** Float feature view of the stub decoder (histogram normalized by
    * payload length) — the ML-facing shape; exactness not required here.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val c = byteHistogram(payload)
    val f = new Array[Float](FeatureDim)
    if (payload.isEmpty) return f
    var j = 0
    while (j < FeatureDim) { f(j) = c(j).toFloat / payload.length; j += 1 }
    f
  }

  /** Decode + featurize every media row. `mapPartitions` so a real
    * decoder would init once per partition, not once per row.
    */
  def mediaFeatures(s: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import s.implicits._
    mediaTable(s, dir).mapPartitions { rows =>
      // real pipeline: decoder/model handle created HERE, once per partition
      rows.map { m =>
        MediaFeatures(m.doc_id, m.kind, m.payload.length.toLong,
          stubDecode(m.payload))
      }
    }
  }

  /** Frame index + byte-span plan for video rows: every 2nd frame index,
    * expanded relationally so Catalyst owns the row explosion; the span
    * arithmetic mirrors a fixed-size-frame container format.
    */
  private def videoFrames(s: SparkSession, dir: String)
      : Dataset[(Long, Array[Byte], Int, Int)] = {
    import s.implicits._
    mediaTable(s, dir)
      .filter(col("kind") === "video")
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(2)))
          .as("frame_idx"))
      .as[(Long, Array[Byte], Int, Int)]
  }

  private def frameSpan(payloadLen: Int, nFrames: Int, idx: Int): (Int, Int) = {
    val span = math.max(1, payloadLen / math.max(1, nFrames))
    val lo = math.min(payloadLen, idx * span)
    val hi = math.min(payloadLen, lo + span)
    (lo, hi)
  }

  /** Frame sampling for video rows: only the sampled frames are "decoded"
    * (the stub slices the payload per frame to stand in for per-frame
    * bytes). Float-feature ML-facing shape.
    */
  def frameSample(s: SparkSession, dir: String): Dataset[FrameFeatures] = {
    import s.implicits._
    videoFrames(s, dir).mapPartitions { rows =>
      rows.map { case (docId, payload, nFrames, idx) =>
        val (lo, hi) = frameSpan(payload.length, nFrames, idx)
        FrameFeatures(docId, idx, stubDecode(payload.slice(lo, hi)))
      }
    }
  }

  /** Catalog entry: per-kind rollup of the extracted byte-histogram
    * features — proves the full decode→featurize→aggregate path end to
    * end. All counts are exact integers; the two rate columns are single
    * IEEE divisions of exact integers (bit-identical across engines).
    */
  def multimodalFeatureStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).mapPartitions { rows =>
      rows.map { m =>
        val c = byteHistogram(m.payload)
        MediaHistogram(m.doc_id, m.kind, m.payload.length.toLong, c(0), c(7))
      }
    }.toDF()
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
           sum(col("n_bytes")).as("total_bytes"),
           sum(col("c0")).as("c0"),
           sum(col("c7")).as("c7"),
           (sum(col("c0")).cast("double") /
             sum(col("n_bytes")).cast("double")).as("f0_rate"),
           (sum(col("c7")).cast("double") /
             sum(col("n_bytes")).cast("double")).as("f7_rate"))
  }

  /** Catalog entry: per-sampled-frame exact byte histograms — the frame-
    * sampling plumbing with a fully verifiable integer output (no array
    * columns: the driver's compare sorts rows with pandas, which cannot
    * order arrays).
    */
  def multimodalFrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    videoFrames(s, dir).mapPartitions { rows =>
      rows.map { case (docId, payload, nFrames, idx) =>
        val (lo, hi) = frameSpan(payload.length, nFrames, idx)
        val c = byteHistogram(java.util.Arrays.copyOfRange(payload, lo, hi))
        FrameHistogram(docId, idx, (hi - lo).toLong,
          c(0), c(1), c(2), c(3), c(4), c(5), c(6), c(7))
      }
    }.toDF()
  }

  /** Exact per-image resize summary row for the verified catalog. */
  final case class ResizeRow(doc_id: Long, out_w: Int, out_h: Int,
                             n_sampled: Long, sum_sampled: Long)

  /** Catalog entry: STUB RESIZE — nearest-neighbor 2× downsample of the
    * payload treated as a row-major width×height byte grid (the stand-in
    * for a real image resize; the grid walk, bounds handling, and
    * map-stage placement are the real pipeline shape). Output is the
    * sampled-pixel count and exact byte sum per image, so the oracle can
    * recompute it from hex(encode(text)) byte arithmetic.
    */
  def multimodalResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaTable(s, dir).filter(col("kind") === "image")
      .mapPartitions { rows =>
        rows.map { m =>
          val (outW, outH) = (m.width / 2, m.height / 2)
          var n = 0L
          var sum = 0L
          var j = 0
          while (j < outH) {
            var i = 0
            while (i < outW) {
              val idx = 2 * j * m.width + 2 * i
              if (idx < m.payload.length) {
                n += 1
                sum += (m.payload(idx) & 0xff)
              }
              i += 1
            }
            j += 1
          }
          ResizeRow(m.doc_id, outW, outH, n, sum)
        }
      }.toDF()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_feature_stats" -> multimodalFeatureStats _,
    "multimodal_frame_sample"  -> multimodalFrameSample _,
    "multimodal_resize"        -> multimodalResize _)

  /** Byte b (1-based position p in payload) mod 8, recovered from the low
    * hex nibble of `hex(encode(text))` — byte = hi·16 + lo, so b mod 8 =
    * lo mod 8.
    */
  private def sqlByteMod8(hexCol: String, pos: String): String =
    s"""(CASE WHEN substr($hexCol, 2*($pos), 1) BETWEEN '0' AND '9'
       |      THEN ascii(substr($hexCol, 2*($pos), 1)) - 48
       |      ELSE ascii(substr($hexCol, 2*($pos), 1)) - 55 END) % 8"""
      .stripMargin.replaceAll("\n", " ")

  /** Value of one hex digit at 1-based position `p` of `hexCol`. */
  private def sqlHexDigit(hexCol: String, p: String): String =
    s"""(CASE WHEN substr($hexCol, $p, 1) BETWEEN '0' AND '9'
       |      THEN ascii(substr($hexCol, $p, 1)) - 48
       |      ELSE ascii(substr($hexCol, $p, 1)) - 55 END)"""
      .stripMargin.replaceAll("\n", " ")

  /** Full byte value at 0-based byte index `idx` (hex digits 2·idx+1,
    * 2·idx+2).
    */
  private def sqlByteVal(hexCol: String, idx: String): String =
    s"${sqlHexDigit(hexCol, s"2*($idx)+1")} * 16 + " +
      sqlHexDigit(hexCol, s"2*($idx)+2")

  val oracles: Map[String, String] = Map(
    "multimodal_feature_stats" ->
      s"""WITH media AS (
         |  SELECT doc_id,
         |    list_extract(['image', 'audio', 'video'],
         |                 CAST(doc_id % 3 + 1 AS INT)) AS kind,
         |    hex(encode(text)) AS h,
         |    octet_length(encode(text)) AS n_bytes
         |  FROM documents),
         |counts AS (
         |  SELECT doc_id,
         |    COUNT(*) FILTER (${sqlByteMod8("h", "i")} = 0) AS c0,
         |    COUNT(*) FILTER (${sqlByteMod8("h", "i")} = 7) AS c7
         |  FROM media, unnest(generate_series(1, n_bytes)) AS u(i)
         |  GROUP BY doc_id)
         |SELECT kind, COUNT(*) AS n_media,
         |  CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
         |  CAST(SUM(COALESCE(c0, 0)) AS BIGINT) AS c0,
         |  CAST(SUM(COALESCE(c7, 0)) AS BIGINT) AS c7,
         |  CAST(SUM(COALESCE(c0, 0)) AS DOUBLE) /
         |    CAST(SUM(n_bytes) AS DOUBLE) AS f0_rate,
         |  CAST(SUM(COALESCE(c7, 0)) AS DOUBLE) /
         |    CAST(SUM(n_bytes) AS DOUBLE) AS f7_rate
         |FROM media LEFT JOIN counts USING (doc_id)
         |GROUP BY kind""".stripMargin,
    "multimodal_resize" ->
      s"""WITH img AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |    octet_length(encode(text)) AS n,
         |    CAST(n_chars % 64 + 16 AS BIGINT) AS w,
         |    CAST(n_chars % 48 + 16 AS BIGINT) AS ht
         |  FROM documents WHERE doc_id % 3 = 0),
         |px AS (
         |  SELECT doc_id, w // 2 AS out_w, ht // 2 AS out_h, n, h,
         |    2 * j * w + 2 * i AS idx
         |  FROM img,
         |       unnest(generate_series(0, ht // 2 - 1)) AS jj(j),
         |       unnest(generate_series(0, w // 2 - 1)) AS ii(i))
         |SELECT doc_id, CAST(out_w AS INT) AS out_w,
         |  CAST(out_h AS INT) AS out_h,
         |  COUNT(*) FILTER (idx < n) AS n_sampled,
         |  CAST(COALESCE(SUM(CASE WHEN idx < n
         |    THEN ${sqlByteVal("h", "idx")} END), 0) AS BIGINT) AS sum_sampled
         |FROM px GROUP BY doc_id, out_w, out_h""".stripMargin,
    "multimodal_frame_sample" ->
      s"""WITH video AS (
         |  SELECT doc_id, hex(encode(text)) AS h,
         |    octet_length(encode(text)) AS n,
         |    CAST(n_chars % 10 + 1 AS BIGINT) AS nf
         |  FROM documents WHERE doc_id % 3 = 2),
         |frames AS (
         |  SELECT doc_id, h, n, i AS frame_idx,
         |    least(n, i * greatest(1, n // nf)) AS lo,
         |    least(n, least(n, i * greatest(1, n // nf))
         |             + greatest(1, n // nf)) AS hi
         |  FROM video, unnest(generate_series(0, nf - 1, 2)) AS u(i)),
         |counts AS (
         |  SELECT doc_id, frame_idx,
         |    ${(0 until FeatureDim).map(j =>
               s"COUNT(*) FILTER (${sqlByteMod8("h", "p")} = $j) AS c$j")
               .mkString(",\n    ")}
         |  FROM frames, unnest(generate_series(lo + 1, hi)) AS u(p)
         |  GROUP BY doc_id, frame_idx)
         |SELECT f.doc_id, CAST(f.frame_idx AS INT) AS frame_idx,
         |  CAST(f.hi - f.lo AS BIGINT) AS n_frame_bytes,
         |  ${(0 until FeatureDim).map(j =>
             s"CAST(COALESCE(c$j, 0) AS BIGINT) AS c$j").mkString(",\n  ")}
         |FROM frames f LEFT JOIN counts c
         |  ON f.doc_id = c.doc_id AND f.frame_idx = c.frame_idx""".stripMargin)
}
