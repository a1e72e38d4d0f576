package graft.sinks

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import java.nio.file.{Files, Paths, StandardOpenOption}

/** One planned WARC record (executor-side serialization input). */
final case class WarcOutRow(
    url: String, ts: String, digest: String, warc_type: String,
    refers_to_url: String, refers_to_ts: String, payload: Array[Byte])

/** Partitioned WARC member writer — the archive side of a web-scale crawl
  * (what Common Crawl publishes as `*.warc.gz` members; ISO 28500 +
  * WARC/1.1 §6.7 revisit records). The reference exports JSON/CSV records
  * (export/json.go, export/csv.go); a 100 TB crawl's bulk artifact is WARC,
  * so the engine carries a real distributed writer next to those sinks.
  *
  * Two stages, both Spark-native:
  *  - [[plan]] — a DataFrame transform that decides each capture's record
  *    type. `dedup=false`: every capture is a full `response`. `dedup=true`:
  *    the FIRST capture of each content digest (ordered by (ts, url) — a
  *    total order, so the plan is deterministic) stays a `response`; every
  *    later identical-payload capture becomes a payload-free `revisit`
  *    record pointing at the original via WARC-Refers-To-Target-URI/-Date.
  *    Cost: ONE digest-keyed shuffle (`row_number` + both `first_value`s
  *    share a single window Exchange); payload bytes written shrink from
  *    sum(captures) to sum(distinct digests).
  *  - [[write]] — serializes each partition's records with the byte-exact
  *    envelope writer ([[graft.warc.Warc.write]]) and streams ONE member
  *    file per non-empty partition (`part-NNNNN.warc`) straight from the
  *    executor: no driver collect, no per-record small files. `dir` is a
  *    shared-filesystem path (the same contract as a Hadoop output
  *    directory); members are independent, so a 1000-executor run writes
  *    1000-way parallel.
  */
object WarcSink {

  val RevisitProfile =
    "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"

  /** Decide record types. Input needs (url: string, ts: string,
    * payload: binary); output adds (digest, warc_type, refers_to_url,
    * refers_to_ts) and blanks revisit payloads.
    */
  def plan(df: DataFrame, dedup: Boolean): DataFrame = {
    val d = df.withColumn("digest", md5(col("payload")))
    if (!dedup)
      d.select(col("url"), col("ts"), col("digest"),
        lit("response").as("warc_type"),
        lit(null).cast("string").as("refers_to_url"),
        lit(null).cast("string").as("refers_to_ts"),
        col("payload"))
    else {
      val w = Window.partitionBy(col("digest"))
        .orderBy(col("ts").asc, col("url").asc)
      d.withColumn("rn", row_number().over(w))
        .withColumn("orig_url", first(col("url")).over(w))
        .withColumn("orig_ts", first(col("ts")).over(w))
        .select(col("url"), col("ts"), col("digest"),
          when(col("rn") === 1, lit("response")).otherwise(lit("revisit"))
            .as("warc_type"),
          when(col("rn") === 1, lit(null).cast("string"))
            .otherwise(col("orig_url")).as("refers_to_url"),
          when(col("rn") === 1, lit(null).cast("string"))
            .otherwise(col("orig_ts")).as("refers_to_ts"),
          when(col("rn") === 1, col("payload"))
            .otherwise(lit(Array.emptyByteArray)).as("payload"))
    }
  }

  /** Serialize one planned row into its envelope bytes. */
  def serialize(r: WarcOutRow): Array[Byte] = {
    val extra =
      if (r.warc_type == "revisit")
        Seq(
          "WARC-Refers-To-Target-URI" -> r.refers_to_url,
          "WARC-Refers-To-Date" -> r.refers_to_ts,
          "WARC-Profile" -> RevisitProfile,
          "WARC-Payload-Digest" -> s"md5:${r.digest}")
      else Seq("WARC-Payload-Digest" -> s"md5:${r.digest}")
    graft.warc.Warc.write(r.warc_type, r.url, r.ts, r.payload, extra)
  }

  /** Gzip one record as its own gzip MEMBER — the Common-Crawl `.warc.gz`
    * layout (one member per record, so a reader can seek to any record's
    * byte offset and decompress it alone; WARC Annex D). Concatenated
    * members form a valid multi-member gzip stream.
    */
  def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(record.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(record); gz.finish(); gz.close()
    bos.toByteArray
  }

  /** Serialize a member-leading `warcinfo` record (ISO 28500 §6.2): the
    * self-description every Common-Crawl member opens with. Payload is
    * `application/warc-fields` (key: value CRLF lines); no
    * WARC-Target-URI.
    */
  def serializeInfo(date: String, fields: Seq[(String, String)]): Array[Byte] = {
    val payload = fields.map { case (k, v) => s"$k: $v\r\n" }
      .mkString.getBytes("UTF-8")
    graft.warc.Warc.write("warcinfo", null, date, payload,
      Seq("Content-Type" -> "application/warc-fields"))
  }

  /** Plan + write: one `part-NNNNN.warc[.gz]` member file per non-empty
    * partition; `compress=true` gzips each RECORD as its own member
    * (Common Crawl's random-access layout). `info = Some((date, fields))`
    * opens every member with a `warcinfo` self-description record, like
    * the Common-Crawl members themselves (date comes from the crawl's
    * deterministic wave clock, so output is reproducible).
    */
  def write(
      df: DataFrame, dir: String, dedup: Boolean = false,
      compress: Boolean = false,
      info: Option[(String, Seq[(String, String)])] = None): Unit = {
    Files.createDirectories(Paths.get(dir))
    val spark = df.sparkSession
    import spark.implicits._
    val infoBytes = info.map { case (date, fields) =>
      serializeInfo(date, fields)
    }
    plan(df, dedup).as[WarcOutRow].foreachPartition {
      (it: Iterator[WarcOutRow]) =>
        if (it.hasNext) {
          val pid = TaskContext.getPartitionId()
          val recs = infoBytes.iterator ++ it.map(serialize)
          val body = graft.warc.Warc.concat(
            (if (compress) recs.map(gzipMember) else recs).toSeq)
          val ext = if (compress) ".warc.gz" else ".warc"
          Files.write(
            Paths.get(f"$dir%s/part-$pid%05d$ext%s"), body,
            StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
          ()
        }
    }
  }
}
