package graft.queries

import org.apache.spark.sql.functions._
import graft.mm.Multimodal

/** Multimodal plumbing queries: the documents' text bytes stand in for media
  * payloads (no codecs in the sandbox); the decode is a deterministic stub
  * the oracle mirrors, the binary-column plumbing is real.
  */
object MultimodalQueries {

  val qMediaMeta = Q(
    "q60_multimodal_meta",
    (s, dir) => {
      val payloads = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.extractMeta(payloads)
    },
    Some("""SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  CAST(16 + octet_length(encode(text)) % 64 AS INT) AS width,
        |  CAST(16 + doc_id % 48 AS INT) AS height,
        |  CAST(1 + doc_id % 5 AS INT) AS n_frames,
        |  substring(md5(text), 1, 8) AS header
        |FROM documents""".stripMargin))

  val qFrameSample = Q(
    "q61_frame_sample",
    (s, dir) => {
      val payloads = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      Multimodal.sampleFrames(Multimodal.extractMeta(payloads))
    },
    Some("""SELECT doc_id, CAST(f AS INT) AS frame_idx
        |FROM (SELECT doc_id, 1 + doc_id % 5 AS nf FROM documents) d,
        |  unnest(range(0, nf)) u(f)""".stripMargin))

  val all: Seq[Q] = Seq(qMediaMeta, qFrameSample)
}
