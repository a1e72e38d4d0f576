package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.HostRank

/** Pins HostRank's integer fixed-point recurrence against an independent
  * Map-based model, plus the structural properties the scheduler relies on.
  */
class HostRankSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  // (src, dst, w): b has no out-edges (dangling), d has no in-edges.
  private val edges = Seq(
    ("a", "b", 3L), ("a", "c", 1L), ("c", "a", 2L), ("c", "b", 2L),
    ("d", "a", 5L))
  private val SCALE = 1000000L

  /** Independent model: same recurrence, Map arithmetic. */
  private def model(iters: Int): Map[String, Long] = {
    val hosts = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = hosts.map(_ -> SCALE).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => (85L * r(s) * w) / (100L * out(s)) }.sum
      }
      r = hosts.map(h => h -> (150000L + in.getOrElse(h, 0L))).toMap
    }
    r
  }

  private def ranksMap(iters: Int): Map[String, Long] =
    HostRank.ranks(edges.toDF("src_host", "dst_host", "w"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("3-iteration ranks equal the independent integer model exactly") {
    assert(ranksMap(3) == model(3))
  }

  test("1 iteration: no-in-edge host holds exactly the teleport term; " +
    "dangling host receives rank") {
    val r = ranksMap(1)
    assert(r("d") == 150000L)
    // b's in-mass at iter 1: from a (85*1M*3 div 100*4) + c (85*1M*2 div 100*4)
    assert(r("b") == 150000L + (85L * SCALE * 3) / 400 + (85L * SCALE * 2) / 400)
  }

  test("every host appears exactly once, all ranks >= teleport") {
    val df = HostRank.ranks(edges.toDF("src_host", "dst_host", "w"), 2)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).sorted.toSeq == Seq("a", "b", "c", "d"))
    assert(rows.forall(_.getLong(1) >= 150000L))
  }
}
