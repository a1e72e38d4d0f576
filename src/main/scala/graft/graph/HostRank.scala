package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Host-authority ranking over the crawl's link graph — the scale-grade
  * priority signal behind the north star's "partitioned priority frontier".
  *
  * q54 scores frontier urls by raw in-degree; this module computes the
  * PageRank-style fixed point over the HOST graph (hosts ≪ urls — the rank
  * table is bounded by the number of registrable hosts, ~10^8 even on a
  * 10^10-url frontier), which a scheduler joins back onto the frontier as a
  * per-host priority key. Real crawlers rank hosts, not urls, for exactly
  * this reason: the authority table stays broadcastable.
  *
  * All arithmetic is INTEGER fixed-point (rank scaled by `scale`, damping as
  * the exact rational dampNum/dampDen, every division an integer floor-div of
  * non-negative operands) so the result is engine-bit-identical — the same
  * recipe that makes q44/q49/q53's cosine math oracle-checkable. Floating
  * PageRank would drift between Spark and any second engine at iteration 2.
  *
  * Scale shape: each iteration is one hash-join of the edge list against the
  * (small) rank table plus one map-side-combined groupBy(dst_host) — the
  * canonical Pregel-free DataFrame PageRank. The edge list partitions on
  * src_host once and is reused every iteration (persist upstream if iterating
  * deep); the rank table qualifies for broadcast when hosts fit (#hosts ≤
  * autoBroadcastJoinThreshold), making iterations shuffle-free on the big
  * side. Iteration count is small and fixed (priority signal, not eigenvector
  * convergence), so plan depth stays bounded without checkpoints.
  */
object HostRank {

  /** Fixed-point damped rank over `edges(src_host, dst_host, w)`.
    *
    * r_0(v) = scale for every host (src or dst);
    * r_{t+1}(v) = ((dampDen-dampNum)*scale) div dampDen
    *              + Σ_{u→v} (dampNum * r_t(u) * w(u,v)) div (dampDen * out(u))
    * where out(u) = Σ_v w(u,v). Hosts with no out-edges receive rank but
    * contribute none (the standard dangling-node simplification); hosts with
    * no in-edges hold exactly the teleport term.
    *
    * Overflow headroom: dampNum * r * w must fit in a Long — with the default
    * scale 10^6, rank mass ≤ #hosts·scale, so w up to ~10^9 per host pair is
    * safe; callers at extreme edge multiplicities pre-bucket w.
    */
  def ranks(edges: DataFrame, iters: Int = 3, scale: Long = 1000000L,
            dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val out = edges.groupBy("src_host").agg(sum("w").as("outw"))
    val hosts = edges.select(col("src_host").as("host"))
      .union(edges.select(col("dst_host").as("host")))
      .distinct()
    val teleport = (dampDen - dampNum) * scale / dampDen
    var r = hosts.select(col("host"), lit(scale).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(out, "src_host")
        .join(r.withColumnRenamed("host", "src_host"), "src_host")
        .select(col("dst_host").as("host"),
          expr(s"($dampNum * pr * w) div ($dampDen * outw)").as("c"))
      val sums = contrib.groupBy("host").agg(sum("c").as("s"))
      r = hosts.join(sums, Seq("host"), "left")
        .select(col("host"),
          (coalesce(col("s"), lit(0L)) + lit(teleport)).as("pr"))
    }
    r
  }
}
