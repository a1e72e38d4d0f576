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
  *
  * The parent merges and drains this process's stderr (round-1 lesson: an
  * undrained pipe deadlocks the child once Spark's startup logging fills it).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val master = args(0)
    val n = args(1).toLong
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft-bench-one")
      .config("spark.executor.memory",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_MEM", "9g"))
      .config("spark.executor.extraClassPath",
        "/root/repo/target/scala-2.13/classes")
      // pre-touched initial heap: allocation faults land at executor START
      // (before the untimed warm-up) instead of inside timed windows — this
      // microVM pays heavy host-side fault costs under load
      .config("spark.executor.extraJavaOptions",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_GC",
          "-XX:+UseParallelGC -Xms8g -XX:+AlwaysPreTouch"))
      // keep shuffle lz4 (uncompressed loopback fetch measured SLOWER at
      // 4 executors: 4-5x more bytes through TCP); bigger in-flight windows
      // + file buffers cut reducer fetch-wait (profiled ~30% of reduce time)
      .config("spark.reducer.maxSizeInFlight", "128m")
      .config("spark.shuffle.file.buffer", "1m")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      // tmpfs shuffle scratch when it has headroom (ext4 scratch costs heavy
      // kernel time on this microVM — round-1 lesson re-learned in round 2:
      // a /tmp scratch dir halved 4-executor throughput)
      .config("spark.local.dir", {
        val shm = new java.io.File("/dev/shm")
        if (shm.exists() && shm.getUsableSpace > 24L * (1L << 30))
          "/dev/shm/graft-spark-one"
        else "/tmp/graft-spark-one"
      })
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.waveThroughput(spark, n) // warm-up, untimed (smaller input inside)
    val best = (1 to 2).map(_ => n / Bench.waveSeconds(spark, n)).max
    println(f"URLS_PER_SEC $best%.0f")
    System.out.flush()
    spark.stop()
  }
}
