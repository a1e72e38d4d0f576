package graft.state

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** URL-seen dedup at 10^10-URL scale (SURVEY.md §2.2 — the engine's
  * centerpiece; reference: middleware/duplicate_requests.go:16-26).
  *
  * Two layers, preserving the exact-set invariant:
  *  1. an approximate Bloom filter over the seen table, built distributed
  *     (per-partition filters merged associatively — Spark's
  *     `stat.bloomFilter` runs a treeAggregate under the hood) and broadcast
  *     to executors;
  *  2. the exact anti-join against the seen state table.
  *
  * The Bloom can only say "definitely NOT seen" (no false negatives by
  * construction) — those rows skip the anti-join shuffle entirely. "Maybe
  * seen" rows (true positives + fp-rate false positives) take the exact
  * anti-join, so a false positive can never drop a genuinely-new URL.
  * At steady crawl state most candidates are dupes of the seen set, so the
  * shuffle shrinks to ~(new + fpp·new) rows instead of all candidates.
  */
object SeenSet {

  final case class Layered(bloom: BloomFilter, seen: DataFrame)

  /** Build the broadcastable Bloom from the seen table. `expected` sizes the
    * bit array — callers pass the running seen count (cheap: maintained
    * incrementally); fpp 3% keeps a 10^10-key filter ~7 GB, sharded per
    * host-range in a real deployment (one filter per frontier partition
    * group) — at sandbox scale one filter suffices.
    */
  def build(seen: DataFrame, expected: Long, fpp: Double = 0.03): Layered =
    Layered(seen.stat.bloomFilter("url", math.max(expected, 1L), fpp), seen)

  /** Candidates NOT in the seen set — exact, Bloom-accelerated. */
  def filterNew(cand: DataFrame, layered: Layered): DataFrame = {
    val bloomBc = cand.sparkSession.sparkContext.broadcast(layered.bloom)
    val mightContain = udf((u: String) => bloomBc.value.mightContain(u))
    val definitelyNew = cand.filter(!mightContain(col("url")))
    val maybeSeen = cand.filter(mightContain(col("url")))
    definitelyNew.union(maybeSeen.join(layered.seen, Seq("url"), "left_anti"))
  }
}
