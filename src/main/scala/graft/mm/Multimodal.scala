package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata; decode / feature-extract / frame-sample run as
  * batched per-partition functions (the Scala analog of `mapInPandas` —
  * same batch shape: an iterator of rows in, an iterator of typed rows out).
  *
  * The sandbox has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decoder: it derives plausible
  * (width, height, frames) from the bytes. The Spark-side plumbing —
  * schema, binary handling, partition-batched UDF signature, explode of
  * per-frame rows — is real and oracle-tested.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      header: String)

  /** STUB — stands in for a real codec (e.g. javax.imageio / ffmpeg).
    * Deterministic so the DuckDB oracle can mirror it; swap the body for the
    * real decode when codecs are available. Inputs/outputs keep the real
    * shape: raw bytes in, dimensions + header out.
    */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    MediaMeta(
      doc_id = docId,
      n_bytes = bytes.length,
      width = 16 + (bytes.length % 64),
      height = 16 + (docId % 48).toInt,
      n_frames = 1 + (docId % 5).toInt,
      header = hex.substring(0, 8))
  }

  /** Batched decode over a (doc_id, payload: binary) DataFrame. Partition-
    * batched like mapInPandas: one iterator per partition, codecs initialized
    * once per partition (the MessageDigest here models that lifecycle).
    */
  def extractMeta(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => decodeStub(id, b) })
      .toDF()
  }

  /** Frame sampling: one row per sampled frame (stride 1 here; a real
    * pipeline strides by fps). Downstream per-frame featurizers join on
    * (doc_id, frame_idx).
    */
  def sampleFrames(meta: DataFrame): DataFrame =
    meta.select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1)).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"))
}
