package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.HashExpressions

/** Queries exercising the custom Catalyst expressions (native codegen'd
  * scalar functions — graft.functions.HashExpressions). The DuckDB oracles
  * recompute the same polynomial folds with list_reduce, proving the
  * generated code's arithmetic bit-for-bit.
  */
object FunctionQueries {

  /** Whole-document polynomial fingerprint via the codegen'd PolyHash
    * expression (h = fold (h·31 + codepoint) mod 1e9+7).
    */
  val qPolyFingerprint = Q(
    "q31_poly_fingerprint",
    (s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          HashExpressions.poly_hash(col("text")).as("fp")),
    Some("""SELECT doc_id,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |    (a, b) -> (a * 31 + b) % 1000000007) AS fp
        |FROM documents""".stripMargin))

  /** Min 8-gram rolling fingerprint (winnowing-lite) via the codegen'd
    * Karp-Rabin expression; the oracle recomputes every window naively.
    */
  val qRollingMinHash = Q(
    "q32_rolling_min_hash",
    (s, dir) =>
      s.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          HashExpressions.rolling_min_hash(col("text"), 8).as("rmh")),
    Some("""WITH codes AS (
        |  SELECT doc_id,
        |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)) AS cs
        |  FROM documents WHERE doc_id < 200
        |)
        |SELECT doc_id,
        |  CASE WHEN len(cs) < 8 THEN
        |    list_reduce(list_prepend(CAST(0 AS BIGINT), cs),
        |      (a, b) -> (a * 31 + b) % 1000000007)
        |  ELSE (
        |    SELECT MIN(list_reduce(list_prepend(CAST(0 AS BIGINT), cs[i:i+7]),
        |      (a, b) -> (a * 31 + b) % 1000000007))
        |    FROM unnest(range(1, len(cs) - 6)) u(i)
        |  ) END AS rmh
        |FROM codes""".stripMargin))

  val all: Seq[Q] = Seq(qPolyFingerprint, qRollingMinHash)
}
