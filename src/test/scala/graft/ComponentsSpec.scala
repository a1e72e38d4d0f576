package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Components

class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Brute-force union-find oracle (driver-side, test-only). */
  private def ufComponents(
      n: Seq[Long], e: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(n.map(x => x -> x): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    e.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    n.map(x => x -> find(x)).toMap
  }

  private def run(n: Seq[Long], e: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = n.toDF("id")
    val edges =
      if (e.isEmpty)
        spark.emptyDataFrame
          .select(lit(0L).as("u"), lit(0L).as("v")).limit(0)
      else e.toDF("u", "v")
    Components.connected(edges, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("long path collapses to the minimum (multi-hop transitivity)") {
    val n = (0L to 40L)
    val e = (0L until 40L).map(i => (i, i + 1))
    val got = run(n, e)
    assert(got.size == 41)
    assert(got.values.forall(_ == 0L))
  }

  test("empty edge set: every node is its own singleton component") {
    val got = run(Seq(5L, 9L, 12L), Seq.empty)
    assert(got == Map(5L -> 5L, 9L -> 9L, 12L -> 12L))
  }

  test("random graphs match a union-find oracle") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val nNodes = 60 + rnd.nextInt(60)
      val nodes = (0 until nNodes).map(_ => rnd.nextLong().abs % 100000).distinct
      val nEdges = rnd.nextInt(nodes.size * 2)
      val edges = (0 until nEdges).map { _ =>
        (nodes(rnd.nextInt(nodes.size)), nodes(rnd.nextInt(nodes.size)))
      }
      val want = ufComponents(nodes.map(x => x: Long), edges)
      val got = run(nodes, edges)
      assert(got == want, s"trial $trial: nNodes=$nNodes nEdges=$nEdges")
    }
  }

  test("star input is already converged; dense clique collapses") {
    // star: children 1..20 -> 0
    val star = run(0L to 20L, (1L to 20L).map(i => (i, 0L)))
    assert(star.values.forall(_ == 0L))
    // clique on {100..109} plus isolated 7
    val clique = for (a <- 100L to 109L; b <- 100L to 109L if a < b) yield (a, b)
    val got = run(Seq(7L) ++ (100L to 109L), clique)
    assert(got(7L) == 7L)
    (100L to 109L).foreach(i => assert(got(i) == 100L))
  }

  test("plan audit: star rounds are key-partitioned joins — no cartesian, " +
      "no broadcast-nested-loop") {
    // the physical shape that must survive a 10^9-edge dedup graph: every
    // round is groupBy(node)+equi-join on the node key; a cartesian or BNLJ
    // anywhere means an O(n^2) round snuck in
    val e = (0L until 200L).map(i => (i, (i + 7) % 200L)).toDF("u", "v")
    for (df <- Seq(graft.dedup.Components.largeStar(e),
        graft.dedup.Components.smallStar(e))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(800))
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    }
  }

  test("a 256-node path converges well inside the round bound (log-round " +
      "behavior, not linear label propagation)") {
    // naive min-label propagation needs ~n rounds on a path; the star
    // algorithm must land in O(log n). maxRounds=24 would abort a linear
    // algorithm on this graph (which needs ~256).
    val n = (0L until 256L)
    val e = (0L until 255L).map(i => (i, i + 1))
    val got = Components.connected(e.toDF("u", "v"), n.toDF("id"),
      maxRounds = 24)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 256 && got.values.forall(_ == 0L))
  }

  test("20k-node stress: one mega-component + thousands of islands " +
      "(the skewed dedup-graph shape) matches union-find") {
    // shape of a real dedup graph: one giant template-boilerplate cluster
    // (here 10k nodes chained + random chords into it) plus many tiny
    // components and singletons; large-star must shard the hot center
    val rnd = new scala.util.Random(7)
    val mega = (0L until 10000L).map(i => (i, i + 1)) ++            // chain
      (0 until 2000).map(_ => (rnd.nextInt(10000).toLong,
        rnd.nextInt(10000).toLong))                                  // chords
    val pairs = (0 until 3000).map { i =>
      val b = 20000L + i * 3
      (b, b + 1)                                                     // islands
    }
    val nodes = (0L to 10000L) ++ (20000L until 29000L)
    val edges = mega ++ pairs
    val want = ufComponents(nodes.map(x => x: Long), edges)
    val got = run(nodes, edges)
    assert(got.size == want.size)
    assert(got == want)
    assert((0L to 10000L).forall(i => got(i) == 0L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = run(Seq(1L, 2L, 3L),
      Seq((1L, 1L), (2L, 1L), (1L, 2L), (2L, 1L), (3L, 3L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }
}
