package graft.state

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned Parquet state tables with an atomic snapshot manifest —
  * the sandbox realization of the Iceberg state tables in BASELINE.json
  * (no Iceberg jars offline; SURVEY.md §7). Semantics preserved: exact
  * resume, readers only ever see fully-committed snapshots, swappable to
  * real Iceberg later.
  *
  * Two table families (Iceberg-style snapshot semantics):
  *  - SNAPSHOT tables (frontier, robot_rules, cookies): current-state
  *    tables rewritten whole per wave at `{dir}/wave={N}/{table}` — they
  *    are bounded by the live frontier / host count, not crawl history.
  *  - DELTA tables (records, audit, crawl_order, seen): append-only
  *    accumulators. Each wave commits ONLY its own increment under
  *    `{dir}/delta/{table}/wave={N}`; a reader unions the committed
  *    increments. Rewriting the full accumulation per wave would be
  *    O(total × waves) write amplification — a scale-killer for long
  *    checkpointed crawls.
  *
  * Atomicity: the commit marker `{dir}/_COMMIT_{N}` is written only after
  * every snapshot table and delta increment of wave N is durably on disk.
  * A reader taking max committed N can never observe a torn snapshot, and
  * `readDeltas` unions increments only up to that N — a half-written
  * increment from a crashed wave N+1 is invisible and simply overwritten
  * when the resumed run re-executes the wave.
  */
object StateStore {

  def commitWave(
      dir: String,
      wave: Int,
      snapshots: Map[String, DataFrame],
      deltas: Map[String, DataFrame] = Map.empty): Unit = {
    snapshots.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/wave=$wave/$name")
    }
    deltas.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/delta/$name/wave=$wave")
    }
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(s"$dir/_COMMIT_$wave"), Array.emptyByteArray)
  }

  def latestCommitted(dir: String): Option[Int] = {
    val d = new java.io.File(dir)
    if (!d.exists()) return None
    val waves = d.listFiles().toSeq
      .map(_.getName).filter(_.startsWith("_COMMIT_"))
      .map(_.stripPrefix("_COMMIT_").toInt)
    if (waves.isEmpty) None else Some(waves.max)
  }

  def read(spark: SparkSession, dir: String, wave: Int, name: String): DataFrame =
    spark.read.parquet(s"$dir/wave=$wave/$name")

  /** Union of a delta table's committed increments for waves ≤ `upToWave`.
    * None when no increment exists (caller supplies its empty frame — the
    * store doesn't know schemas).
    */
  def readDeltas(spark: SparkSession, dir: String, name: String,
      upToWave: Int): Option[DataFrame] = {
    val base = new java.io.File(s"$dir/delta/$name")
    if (!base.exists()) return None
    val waves = base.listFiles().toSeq
      .map(_.getName).filter(_.startsWith("wave="))
      .map(_.stripPrefix("wave=").toInt)
      .filter(_ <= upToWave).sorted
    if (waves.isEmpty) None
    // one multi-path scan, not an N-deep union: a long checkpointed crawl
    // has thousands of committed increments, and a union plan that deep is
    // itself a driver-side scale problem (plan size/optimization cost grows
    // with wave count; a single FileScan over N directories does not)
    else Some(spark.read.parquet(
      waves.map(w => s"$dir/delta/$name/wave=$w"): _*))
  }

  /** Time travel (Iceberg-snapshot semantics): a table exactly as wave
    * `wave` committed it — snapshot tables read back verbatim, delta
    * tables as the union of increments ≤ wave. Later waves never disturb
    * an earlier committed view.
    */
  def asOf(spark: SparkSession, dir: String, wave: Int, name: String,
      delta: Boolean): Option[DataFrame] = {
    val committed = latestCommitted(dir).exists(_ >= wave) &&
      new java.io.File(s"$dir/_COMMIT_$wave").exists()
    if (!committed) None
    else if (delta) readDeltas(spark, dir, name, wave)
    else if (hasTable(dir, wave, name)) Some(read(spark, dir, wave, name))
    else None
  }

  def hasTable(dir: String, wave: Int, name: String): Boolean =
    new java.io.File(s"$dir/wave=$wave/$name").exists()
}
