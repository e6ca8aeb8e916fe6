package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  *  - brute-force cosine top-k: the correctness baseline. Query set is
  *    broadcast against the corpus; per-corpus-partition partial top-k via a
  *    window over (query, cosine) — the plan is scan ⋈ broadcast → window,
  *    no corpus shuffle. At 100 TB the same plan holds: queries are always
  *    the small side.
  *  - sign-bit-LSH top-k: the scale path. Corpus is bucketed by the sign
  *    bits of the leading dimensions (random-hyperplane LSH with axis
  *    hyperplanes); a query only scans its own bucket — work drops by ~2^bits
  *    at a recall cost. The oracle mirrors the bucketing, so the gate
  *    verifies the bucketed semantics exactly.
  *
  * Cosines are computed with index-ordered double arithmetic (aggregate /
  * list_sum over the same sequence) so Spark and DuckDB produce bit-identical
  * doubles; output carries only ids + integer ranks.
  */
object Similarity {

  private val dotS =
    "aggregate(zip_with(qe, embedding, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0d, (acc, v) -> acc + v)"
  private val norm2S =
    "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 0d, (acc, v) -> acc + v)"

  /** Exact cosine top-5 neighbors for each query vector (vec_id < 10). */
  def sim_topk_bruteforce(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), expr(norm2S).as("n2"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr(dotS) / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  val sim_topk_bruteforce_sql: String =
    """WITH e AS (SELECT vec_id, embedding,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
      |  FROM embeddings),
      |q AS (SELECT vec_id qid, embedding qe, n2 qn2 FROM e WHERE vec_id < 10),
      |s AS (SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY
      |      list_sum(list_transform(range(1, len(qe)+1), i ->
      |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
      |      vec_id ASC) AS rank
      |  FROM q JOIN e ON vec_id != qid)
      |SELECT qid, vec_id AS neighbor_id, CAST(rank AS INT) AS rank
      |FROM s WHERE rank <= 5""".stripMargin

  /** Bucketed ANN: top-3 among the corpus vectors in any of the query's
    * Hamming<=1 probe buckets (vec_id < 50 queries), under the shared
    * random-hyperplane LSH ([[Lsh]]): adaptive bit width keeps buckets at
    * ~64 vectors from fixture scale to 10^9, and multi-probe recovers
    * near-neighbors that fall one bit away. Each query touches
    * ~(nbits+1)/2^nbits of the corpus instead of all of it. */
  def sim_topk_lsh(s: SparkSession, dir: String): DataFrame = {
    val nb = Lsh.numBits(Tables.embeddings(s, dir).count())
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), expr(Lsh.bucketSpark(nb)).as("blk"),
        expr(norm2S).as("n2"))
    // queries are the broadcast side; probe expansion happens there so the
    // corpus is never exploded (corpus rows: 1 bucket each)
    val q = e.filter(col("vec_id") < 50)
      .repartition(col("vec_id")) // barrier: keep bucket agg out of the probe lambda
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(expr(Lsh.probesSpark(nb))).as("blk"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(q), Seq("blk"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr(dotS) / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  val sim_topk_lsh_sql: String =
    s"""WITH ${Lsh.paramsDuck},
      |e AS (SELECT vec_id, embedding,
      |    ${Lsh.bucketDuck} AS blk,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
      |  FROM embeddings, params),
      |q AS (SELECT vec_id qid, embedding qe, unnest(${Lsh.probesDuck}) AS blk, n2 qn2
      |  FROM e, params WHERE vec_id < 50),
      |s AS (SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY
      |      list_sum(list_transform(range(1, len(qe)+1), i ->
      |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
      |      vec_id ASC) AS rank
      |  FROM q JOIN e ON e.blk = q.blk AND vec_id != qid)
      |SELECT qid, vec_id AS neighbor_id, CAST(rank AS INT) AS rank
      |FROM s WHERE rank <= 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk_bruteforce" -> sim_topk_bruteforce _,
    "sim_topk_lsh" -> sim_topk_lsh _,
  )

  val oracles: Map[String, String] = Map(
    "sim_topk_bruteforce" -> sim_topk_bruteforce_sql,
    "sim_topk_lsh" -> sim_topk_lsh_sql,
  )
}
