package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.SimQueries

/** Exercises the ANN bucket-salting recipe (PERF.md; SimQueries
  * .saltedBandPairs) on an ADVERSARIAL embedding distribution: a
  * near-duplicate cluster whose members share every sign bit, so all of
  * them land in ONE (table, bucket) key of every LSH table — the
  * pathological shape where the per-bucket self-join is quadratic in a
  * single join group. The salted plan must (a) return EXACTLY the unsalted
  * candidate set and (b) bound every build-side join group at
  * ~|mega bucket| / S rows.
  */
class AnnSaltSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val ClusterN = 500
  private val DiverseN = 100
  private val Salt = 8

  /** 500 same-sign-pattern vectors (all dims positive) + 100 diverse. */
  private def adversarialEmbeddings = {
    import spark.implicits._
    val rows = (0 until ClusterN + DiverseN).map { id =>
      val e = (0 until 64).map { d =>
        if (id < ClusterN) 0.05f + 0.001f * ((id * 31 + d) % 7)
        else if ((id * 17 + d * 13) % 3 == 0) -0.1f
        else 0.1f
      }.toArray
      (id.toLong, e)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("salted banded candidate join: exact pair parity on a mega-bucket cluster") {
    val keyed = SimQueries.bandKeyed(adversarialEmbeddings).cache()
    val plain = SimQueries.bandPairs(keyed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val salted = SimQueries.saltedBandPairs(keyed, Salt)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the cluster really is adversarial: all 500 share one bucket per table
    assert(plain.size >= ClusterN * (ClusterN - 1))
    // exactness: salting changes the plan, never the answer
    assert(salted == plain)
    keyed.unpersist()
  }

  test("salting bounds the build side of every join group") {
    val keyed = SimQueries.bandKeyed(adversarialEmbeddings)
    // unsalted: the mega bucket holds the whole cluster on the build side
    val megaBucket = keyed.groupBy(col("tbl"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(megaBucket >= ClusterN)
    // salted build side: every (tbl, bucket, salt) group is ~mega/S
    val buildMax = keyed
      .withColumn("salt", pmod(hash(col("vec_id")), lit(Salt)))
      .groupBy(col("tbl"), col("bucket"), col("salt"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).collect()(0).getLong(0)
    assert(buildMax <= megaBucket / Salt + megaBucket / 4,
      s"build group $buildMax not bounded vs mega bucket $megaBucket")
  }
}
