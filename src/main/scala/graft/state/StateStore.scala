package graft.state

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned Parquet state tables with an atomic snapshot manifest —
  * the sandbox realization of the Iceberg state tables in BASELINE.json
  * (no Iceberg jars offline; SURVEY.md §7). Semantics preserved: exact
  * resume, readers only ever see fully-committed snapshots, swappable to
  * real Iceberg later.
  *
  * Layout: `{dir}/wave={N}/{table}/part-*.parquet` plus a commit marker
  * `{dir}/_COMMIT_{N}` written only after every table of the snapshot is
  * durably on disk — a reader taking max committed N can never observe a
  * torn snapshot (the reference analog is the Dummy cache policy's
  * "cached response is the truth, never re-fetch", cache/cache.go:136-173).
  */
object StateStore {

  def commitWave(dir: String, wave: Int, tables: Map[String, DataFrame]): Unit = {
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$dir/wave=$wave/$name")
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

  def hasTable(dir: String, wave: Int, name: String): Boolean =
    new java.io.File(s"$dir/wave=$wave/$name").exists()
}
