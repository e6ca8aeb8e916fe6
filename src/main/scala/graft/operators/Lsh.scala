package graft.operators

/** Random-hyperplane LSH shared by the embedding operators.
  *
  * Up to [[MaxBits]] hyperplanes with deterministic ±1 coefficients over the
  * 64-dim embedding space, embedded as identical literals in the Spark plan
  * and the DuckDB oracle. The bit count adapts to corpus size —
  * `clamp(4, 20, floor(log2(N/64)))` — targeting ~64 vectors per bucket, so
  * the same operator is meaningful at 500 fixture vectors and at 10^9
  * (where the previous fixed 8 axis-aligned sign bits left ~4M vectors per
  * bucket and a quadratic within-bucket join — the VERDICT's scale-killer).
  * Probing expands each lookup to all buckets at Hamming distance <= 1
  * (nbits+1 probes) for recall.
  *
  * Axis-aligned sign bits are also correlated with the data distribution;
  * random hyperplanes are not.
  */
object Lsh {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions.{lit, typedLit, when}
  import graft.functions.VecDot

  val Dim = 64
  /** Bucket-count ceiling: 2^MaxBits buckets. With TargetBucket=64 the
    * adaptive bit count saturates at ~6.7e7 vectors; past that, buckets
    * regrow linearly in N (work per bucket-join grows with them). For 10^8+
    * corpora raise MaxBits — the only cost is the weights table
    * (MaxBits x Dim ints) and one more sign test per extra bit. */
  val MaxBits = 20
  val TargetBucket = 64

  /** ±1 hyperplane coefficients, MaxBits x Dim, fixed seed. */
  val weights: Array[Array[Int]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(MaxBits, Dim)(if (rnd.nextBoolean()) 1 else -1)
  }

  /** clamp(4, 20, floor(log2(n / TargetBucket))) — the Scala twin of the
    * oracle's `GREATEST(4, LEAST(20, length(bin(n // 64)) - 1))`. */
  def numBits(n: Long): Int = {
    val m = n / TargetBucket
    val fl = if (m >= 1) 63 - java.lang.Long.numberOfLeadingZeros(m) else 0
    math.max(4, math.min(MaxBits, fl))
  }

  /** DuckDB literal: list of lists. */
  val weightsDuck: String =
    weights.map(_.map(w => s"${w}.0").mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  /** Bucket id of `emb` under the first `nb` hyperplanes: nb codegen'd
    * [[VecDot]] sign tests against literal weight rows (the interpreted
    * aggregate-over-zip_with formulation was the bench's dominant cost). */
  def bucketCol(nb: Int, emb: Column): Column =
    (0 until nb).map { k =>
      when(VecDot.dot(emb, typedLit(weights(k).map(_.toDouble))) >= 0.0d,
        lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Spark: the Hamming<=1 probe set of a `blk` column (nb+1 buckets). */
  def probesSpark(nb: Int): String =
    s"array_union(array(blk), transform(sequence(0, ${nb - 1}), k -> blk ^ shiftleft(CAST(1 AS BIGINT), k)))"

  /** DuckDB CTE computing `nb` from the corpus size (same clamp formula). */
  val paramsDuck: String =
    s"params AS (SELECT GREATEST(4, LEAST($MaxBits, length(bin(CAST(count(*) // $TargetBucket AS BIGINT))) - 1)) AS nb FROM embeddings)"

  /** DuckDB: bucket id (requires `params` in scope via cross join). */
  val bucketDuck: String =
    s"""list_sum(list_transform(range(0, nb), k ->
       |      CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}), i ->
       |          ($weightsDuck)[k+1][i] * CAST(embedding[i] AS DOUBLE))) >= 0.0
       |        THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END))""".stripMargin

  /** DuckDB: probe set of column `blk`. */
  val probesDuck: String =
    "list_distinct(list_prepend(blk, list_transform(range(0, nb), k -> xor(blk, CAST(1 AS BIGINT) << k))))"
}
