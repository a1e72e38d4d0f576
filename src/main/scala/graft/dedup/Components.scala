package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the step that turns
  * near-duplicate PAIRS (MinHash-LSH candidates verified by exact Jaccard)
  * into duplicate CLUSTERS, so a corpus can keep exactly one canonical
  * document per group of transitively-similar documents. Pairs alone are not
  * enough: if A~B and B~C but A!~C, pairwise keep-min retains both A and C's
  * copies of the shared content.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce and
  * Beyond", SoCC 2014). Each round is two shuffle-on-node-id passes; the
  * paper proves O(log²ⁿ) rounds (O(log n) observed) to convergence, at which
  * point the edge set is a forest of stars: every node points at its
  * component's minimum node id.
  *
  * Scale notes (10^9-node dedup graphs):
  *  - Each operator is `groupBy(node) → min` + an equi-join back on the same
  *    key: one hash partitioning per pass, reused between the agg and the
  *    join by Catalyst (no second Exchange).
  *  - Skew is the algorithm's own concern and the reason large-star exists:
  *    a mega-cluster's center never accumulates its whole component in one
  *    task — large-star hangs big-id neighbors directly off the current
  *    minimum, splitting hot stars every round.
  *  - The driver does O(log n) `isEmpty` convergence probes and per-round
  *    `localCheckpoint` lineage cuts; no edge data ever reaches the driver.
  */
object Components {

  /** One large-star round: every node u connects its LARGER neighbors to
    * m(u) = min(N(u) ∪ {u}). Keeps components intact (m is in u's
    * component) while flattening tall chains from the big side.
    */
  private[graft] def largeStar(e: DataFrame): DataFrame = {
    val und = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val mins = und.groupBy(col("u")).agg(min(col("v")).as("mv"))
      .select(col("u"), least(col("u"), col("mv")).as("m"))
    und.join(mins, "u")
      .where(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: every node u connects its SMALLER-or-equal
    * neighbors (and itself) to m(u) = min of that set. Edges are first
    * oriented big→small so each undirected edge is processed once.
    */
  private[graft] def smallStar(e: DataFrame): DataFrame = {
    val ed = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
    val mins = ed.groupBy(col("u")).agg(min(col("v")).as("m"))
    ed.join(mins, "u")
      .select(col("v").as("u"), col("m").as("v"))
      .unionAll(mins.select(col("u"), col("m").as("v")))
      .where(col("u") =!= col("v"))
      .distinct()
  }

  /** Connected components of the undirected graph `edges` (columns u, v —
    * any integral type) over the node universe `nodes` (single column id).
    * Returns (node, component) where component = the minimum node id in the
    * node's component; isolated nodes are their own singleton component.
    * `maxRounds` is a safety bound far above the O(log n) expectation — a
    * non-converged result throws rather than returning wrong clusters.
    */
  def connected(edges: DataFrame, nodes: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    // per-round convergence probe: one aggregate job computing an
    // order-independent signature (count, bit_xor of a 64-bit row hash —
    // XOR never overflows ANSI arithmetic and the edge set is distinct, so
    // no self-cancelling duplicates); only a signature MATCH pays for the
    // exact two-way except confirmation, so the steady-state cost is one
    // action per round, and the final round's equality is still verified
    // exactly (a hash collision can defer but never fake convergence)
    def sig(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).first()
      (r.getLong(0), r.getLong(1))
    }
    var cur = edges.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var curSig = sig(cur)
    var rounds = 0
    var done = curSig._1 == 0L
    while (!done && rounds < maxRounds) {
      val nxt = smallStar(largeStar(cur)).localCheckpoint()
      val nxtSig = sig(nxt)
      // one-sided except suffices: both sets are distinct() and the matched
      // signature already guarantees equal cardinality, so nxt ⊆ cur with
      // |nxt| = |cur| means nxt = cur
      done = nxtSig == curSig && nxt.exceptAll(cur).isEmpty
      cur = nxt
      curSig = nxtSig
      rounds += 1
    }
    if (!done && rounds >= maxRounds)
      throw new IllegalStateException(
        s"Components.connected did not converge in $maxRounds rounds")
    val id = nodes.columns.head
    nodes.select(col(id).as("node"))
      .join(cur.select(col("u").as("node"), col("v").as("root")),
        Seq("node"), "left")
      .groupBy(col("node"))
      .agg(min(coalesce(col("root"), col("node"))).as("component"))
  }
}
