package graft

import org.apache.spark.sql.SparkSession

/** Single scaling measurement in a fresh JVM (spawned by Bench, optionally
  * under `taskset`): args = <master> <benchN>. Prints one line
  * `URLS_PER_SEC <value>`.
  *
  * Why a subprocess: the fair N-vs-4N-executor comparison gives the
  * 1-executor baseline 1/4 of the MACHINE (8 pinned CPUs and their share of
  * bandwidth), exactly what one node of a 4-node cluster owns — an unpinned
  * 8-thread run borrows the whole socket's cache/bandwidth/turbo and
  * understates scale-out efficiency. CPU affinity is inherited by the
  * local-cluster executor JVMs this process spawns.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val master = args(0)
    val n = args(1).toLong
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-bench-one")
      .config("spark.executor.memory", "18g")
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.waveThroughput(spark, n) // warm-up, untimed (smaller input inside)
    val best = (1 to 2).map(_ => n / Bench.waveSeconds(spark, n)).max
    println(f"URLS_PER_SEC $best%.0f")
    spark.stop()
  }
}
