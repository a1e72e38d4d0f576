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

  // ---- cuckoo variant (north rule: "bloom/cuckoo URL-seen") --------------
  // Why both: the cuckoo filter supports DELETION (URLRevisitEnabled
  // withdrawing a seen mark; RFC2616 cache eviction), which a Bloom cannot.
  // Cuckoo tables don't merge associatively the way Bloom bit-ors do, so
  // the distributed build SHARDS the keyspace: one filter per url-hash
  // shard, each built exactly from its shard's keys (groupByKey →
  // mapGroups). At sandbox scale the shard map broadcasts like the Bloom;
  // at 10^10 keys each frontier partition consults only its co-located
  // shard (the same layout as the per-range Bloom plan in PERF.md).

  final case class CuckooShards(
      shards: Map[Int, CuckooFilter], nShards: Int, seen: DataFrame) {
    def mightContain(u: String): Boolean =
      shards.get(SeenSet.shardOf(u, nShards)).exists(_.mightContain(u))
  }

  private[graft] def shardOf(u: String, n: Int): Int =
    math.floorMod(scala.util.hashing.MurmurHash3.stringHash(u, 0x51ed270b), n)

  def buildCuckoo(seen: DataFrame, expected: Long,
      nShards: Int = 32): CuckooShards = {
    import org.apache.spark.sql.{Encoder, Encoders}
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val pairEnc: Encoder[(Int, CuckooFilter)] =
      Encoders.tuple(Encoders.scalaInt, Encoders.javaSerialization[CuckooFilter])
    val perShard = math.max(64L, (expected / math.max(1, nShards)) * 13 / 10)
    val built = seen.select(col("url")).as[String](strEnc)
      .groupByKey(u => shardOf(u, nShards))(Encoders.scalaInt)
      .mapGroups { (shard, urls) =>
        val f = CuckooFilter.create(perShard)
        urls.foreach(f.insert)
        (shard, f)
      }(pairEnc)
      .collect().toMap
    CuckooShards(built, nShards, seen)
  }

  /** Candidates NOT in the seen set — exact, cuckoo-accelerated (no false
    * negatives for inserted members, so definitely-new routing is safe).
    */
  def filterNewCuckoo(cand: DataFrame, layered: CuckooShards): DataFrame = {
    // broadcast only the filter shards (never the DataFrame handle)
    val bc = cand.sparkSession.sparkContext
      .broadcast((layered.shards, layered.nShards))
    val mightContain = udf((u: String) =>
      bc.value._1.get(shardOf(u, bc.value._2)).exists(_.mightContain(u)))
    val definitelyNew = cand.filter(!mightContain(col("url")))
    val maybeSeen = cand.filter(mightContain(col("url")))
    definitelyNew.union(maybeSeen.join(layered.seen, Seq("url"), "left_anti"))
  }
}
