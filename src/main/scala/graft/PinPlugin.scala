package graft

import java.util.{Map => JMap}
import org.apache.spark.api.plugin.{
  DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}

/** Pins each executor JVM to its own CPU quarter at startup (taskset on
  * self, all threads), so the 4-executor bench layout mirrors the pinned
  * 1-executor baseline: every executor owns a fixed 8-core slice and host
  * fault pressure hits both scaling configs symmetrically, instead of the
  * OS migrating 4 unpinned JVMs across each other's caches.
  *
  * Enabled via `spark.plugins=graft.PinPlugin` with quarters in the env
  * `SPARK_GRAFT_PIN_QUARTERS` (e.g. "0-7,8-15,16-23,24-31"); executor i
  * takes quarter i mod count. A no-op when the env is unset or taskset is
  * unavailable — pinning is a bench-layout concern, never a correctness one.
  */
class PinPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = null

  override def executorPlugin(): ExecutorPlugin = new ExecutorPlugin {
    override def init(
        ctx: PluginContext, extraConf: JMap[String, String]): Unit = {
      val quarters = sys.env.getOrElse("SPARK_GRAFT_PIN_QUARTERS", "")
      if (quarters.nonEmpty) {
        val qs = quarters.split(",").map(_.trim).filter(_.nonEmpty)
        val id = scala.util.Try(ctx.executorID.toInt)
          .getOrElse(math.abs(ctx.executorID.hashCode))
        val cores = qs(math.floorMod(id, qs.length))
        val pid = ProcessHandle.current().pid()
        try {
          val p = new ProcessBuilder(
            "taskset", "-a", "-cp", cores, pid.toString).start()
          p.waitFor(5, java.util.concurrent.TimeUnit.SECONDS)
        } catch { case _: Exception => () } // taskset missing → unpinned
      }
    }
  }
}
