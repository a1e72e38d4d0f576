package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.metrics.MetricsServer

class MetricsServerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def get(u: String): String = {
    val is = new java.net.URL(u).openConnection().getInputStream
    try scala.io.Source.fromInputStream(is, "UTF-8").mkString
    finally is.close()
  }

  test("discard starts nothing; busy fixed port falls back to ephemeral") {
    import spark.implicits._
    val metrics = Seq((0, "crawled", 3L)).toDF("wave", "metric", "value")
    assert(MetricsServer.start("discard", () => metrics).isEmpty)
    val a = MetricsServer.start("prometheus", () => metrics, port = 23113).get
    try {
      // same fixed port busy → ephemeral fallback, crawl never dies
      val b = MetricsServer.start("expvar", () => metrics, port = 23113).get
      try {
        assert(b.port != 23113)
        assert(get(a.url("/metrics"))
          .contains("geziyorspark_crawled_total"))
        assert(get(b.url("/debug/vars")).contains("\"crawled\":3"))
      } finally b.stop()
    } finally a.stop()
  }
}
