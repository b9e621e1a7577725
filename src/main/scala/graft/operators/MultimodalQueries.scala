package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with decode / feature-extraction / frame-sampling stages.
  *
  * The harness tables carry no real image/audio bytes and this container
  * has no media codecs, so the DECODE STEP IS A STUB — `stubDecode` below
  * is a deterministic fake (byte-histogram moments standing in for a real
  * pixel/sample decoder). Everything around the stub is the real Spark
  * shape a production pipeline needs:
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

  /** STUB DECODER — stands in for a real image/audio decode + model
    * feature extractor (not available in this environment). Deterministic:
    * 8 byte-histogram moments of the payload, normalized by length.
    * Replace with a real codec + encoder on a cluster with media libs.
    */
  def stubDecode(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](FeatureDim)
    if (payload.isEmpty) return f
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      f(b % FeatureDim) += 1.0f
      i += 1
    }
    var j = 0
    while (j < FeatureDim) { f(j) /= payload.length.toFloat; j += 1 }
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

  /** Frame sampling for video rows: every 2nd frame index is expanded
    * relationally, then only the sampled frames are "decoded" (the stub
    * slices the payload per frame to stand in for per-frame bytes).
    */
  def frameSample(s: SparkSession, dir: String): Dataset[FrameFeatures] = {
    import s.implicits._
    val frames = mediaTable(s, dir)
      .filter(col("kind") === "video")
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(2)))
          .as("frame_idx"))
      .as[(Long, Array[Byte], Int, Int)]
    frames.mapPartitions { rows =>
      rows.map { case (docId, payload, nFrames, idx) =>
        val span = math.max(1, payload.length / math.max(1, nFrames))
        val lo = math.min(payload.length, idx * span)
        val hi = math.min(payload.length, lo + span)
        FrameFeatures(docId, idx, stubDecode(payload.slice(lo, hi)))
      }
    }
  }

  /** Catalog entry: per-kind rollup of the extracted features — proves
    * the full decode→featurize→aggregate path end to end. The feature
    * means are exact-decimal-summed per graft.functions rule 1 so the
    * output is deterministic across partitionings (features themselves
    * are floats from the stub, rounded to the 1e-6 grid first).
    */
  def multimodalFeatureStats(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.davg
    mediaFeatures(s, dir).toDF()
      .select(col("kind"), col("n_bytes"),
        round(element_at(col("features"), 1).cast("double"), 6).as("f0"),
        round(element_at(col("features"), FeatureDim).cast("double"), 6)
          .as("f7"))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_media"),
           sum(col("n_bytes")).as("total_bytes"),
           davg(col("f0")).as("avg_f0"),
           davg(col("f7")).as("avg_f7"))
  }

  /** Rows-only catalog entries (the stub decoder is not SQL-expressible
    * in DuckDB, so the driver records the weaker rows>0 check; the exact
    * semantics are covered by MultimodalSpec goldens instead).
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_feature_stats" -> multimodalFeatureStats _,
    "multimodal_frame_sample"  -> ((s: SparkSession, d: String) =>
      frameSample(s, d).toDF()))

  val oracles: Map[String, String] = Map.empty
}
