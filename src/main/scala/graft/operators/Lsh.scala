package graft.operators

/** Random-hyperplane LSH shared by the embedding operators.
  *
  * Deterministic ±1 hyperplane coefficients over the 64-dim embedding space,
  * embedded as identical literals in the Spark plan and the DuckDB oracle.
  * The bit count adapts to corpus size — `clamp(4, maxBits,
  * floor(log2(N/64)))` — targeting ~64 vectors per bucket, so the same
  * operator is meaningful at 500 fixture vectors and at 10^9 (where a fixed
  * 8-bit code left ~4M vectors per bucket and a quadratic within-bucket
  * join). Probing expands each lookup to all buckets at Hamming distance
  * <= 1 (nbits+1 probes) for recall.
  *
  * The bucket-count CEILING is a config choice, not a constant: with the
  * default `maxBits = 20` (2^20 buckets) the adaptive width saturates at
  * ~6.7e7 vectors and buckets regrow linearly in N past it; for 10^8+
  * corpora raise `spark.graft.lsh.maxBits` — the weight rows are generated
  * on demand from the fixed seed and are PREFIX-STABLE (row k is identical
  * at every ceiling >= k+1), so raising the ceiling never changes the
  * buckets an existing width computed, only allows wider codes. The only
  * cost is maxBits x Dim literal ints in the plan and one more sign test
  * per extra bit. The static DuckDB oracles mirror the default ceiling;
  * the suite covers non-default widths.
  *
  * Axis-aligned sign bits would also be correlated with the data
  * distribution; random hyperplanes are not.
  */
object Lsh {
  import org.apache.spark.sql.{Column, SparkSession}
  import graft.functions.LshBits

  val Dim = 64
  val DefaultMaxBits = 20
  val TargetBucket = 64

  /** Config key for the bucket-count ceiling (2^maxBits buckets). */
  val MaxBitsConf = "spark.graft.lsh.maxBits"

  def maxBits(s: SparkSession): Int = {
    val mb = s.conf.get(MaxBitsConf, DefaultMaxBits.toString).toInt
    require(mb >= 4 && mb <= 62, s"$MaxBitsConf must be in [4, 62], got $mb")
    mb
  }

  /** ±1 hyperplane coefficients, `width` x Dim, fixed seed. Row-major fill
    * from a single seeded stream makes row k the same at every width > k —
    * widening the ceiling never rehashes existing buckets. Cached at the
    * widest width requested so far (a few KB even at width 62). */
  @volatile private var cached: Array[Array[Int]] = generate(DefaultMaxBits)

  private def generate(width: Int): Array[Array[Int]] = {
    val rnd = new scala.util.Random(7)
    Array.fill(width, Dim)(if (rnd.nextBoolean()) 1 else -1)
  }

  def weightsFor(width: Int): Array[Array[Int]] = {
    val c = cached
    if (c.length >= width) c
    else synchronized {
      if (cached.length < width) cached = generate(width)
      cached
    }
  }

  /** Default-ceiling weights (the rows the static oracles embed). */
  def weights: Array[Array[Int]] = weightsFor(DefaultMaxBits)

  /** clamp(4, maxBits, floor(log2(n / TargetBucket))) — the Scala twin of
    * the oracle's `GREATEST(4, LEAST(maxBits, length(bin(n // 64)) - 1))`. */
  def numBits(n: Long, maxBits: Int = DefaultMaxBits): Int = {
    val m = n / TargetBucket
    val fl = if (m >= 1) 63 - java.lang.Long.numberOfLeadingZeros(m) else 0
    math.max(4, math.min(maxBits, fl))
  }

  /** DuckDB literal: list of INT lists (default ceiling, as the oracles
    * use). Integer weights, not `1.0` doubles — the sign test is an exact
    * BIGINT sum on both engines (see [[bucketDuck]]). */
  val weightsDuck: String =
    weightsFor(DefaultMaxBits).take(DefaultMaxBits)
      .map(_.mkString("[", ",", "]"))
      .mkString("[", ",", "]")

  /** Quantization scale for the integer-exact sign test: components become
    * `floor(x * 2^20)` BIGINTs, so every hyperplane dot product is an exact
    * ±1-weighted integer sum. A double-summed dot product's SIGN near zero
    * depends on summation order/SIMD — i.e. on the oracle engine's build —
    * which hash-failed `sim_bucket_sample` in round 10 (the one gate query
    * exposing every bucket id directly). `floor`, not `round`: no
    * tie-breaking semantics to drift between engines. */
  val QuantScale = 1048576L // 2^20

  /** Bucket id of `emb` under the first `nb` hyperplanes: one codegen'd
    * [[LshBits]] pass — quantize each component once, then nb exact integer
    * sign tests (the interpreted aggregate-over-zip_with formulation was
    * the bench's dominant cost; per-bit VecDot re-decoded the array nb
    * times and its double sums were sign-fragile near zero). */
  def bucketCol(nb: Int, emb: Column): Column =
    LshBits(emb, weightsFor(nb), nb)

  /** Spark: the Hamming<=1 probe set of a `blk` column (nb+1 buckets). */
  def probesSpark(nb: Int): String =
    s"array_union(array(blk), transform(sequence(0, ${nb - 1}), k -> blk ^ shiftleft(CAST(1 AS BIGINT), k)))"

  /** DuckDB CTE computing `nb` from the corpus size (same clamp formula,
    * default ceiling) plus the weight matrix as a single-row column `w`.
    * MATERIALIZED + hoisting `w` out of [[bucketDuck]] matters enormously:
    * with the 20x64 literal inlined inside the per-dimension lambda, DuckDB
    * re-constructed the 1280-element nested list for every (row, bit, dim)
    * evaluation — the whole embedding-oracle tier ran 70–150 s each at a
    * mere 500 fixture vectors and starved the driver's sequential gate
    * (rounds 7–9). As a cross-joined column it is built once. */
  val paramsDuck: String =
    s"params AS MATERIALIZED (SELECT GREATEST(4, LEAST($DefaultMaxBits, length(bin(CAST(count(*) // $TargetBucket AS BIGINT))) - 1)) AS nb, $weightsDuck AS w FROM embeddings)"

  /** DuckDB: bucket id (requires `params` in scope via cross join; reads
    * the weight rows from the `w` column, never a re-built literal).
    * Mirrors [[bucketCol]]'s integer-exact test: `floor(double(x) * 2^20)`
    * is one IEEE-exact multiply + an exact floor in any engine, and the
    * ±1-weighted BIGINT sum has a single possible sign.
    *
    * The outer CAST matters: DuckDB's `list_sum` over BIGINTs returns
    * HUGEINT (INT128), and the driver's result hash is TYPE-sensitive —
    * a value-identical HUGEINT column hash-mismatches Spark's BIGINT
    * wherever `blk` reaches a top-level output (sim_bucket_sample,
    * rounds 10–11 red). Every gate oracle output must land in the
    * BIGINT/INT/DOUBLE/VARCHAR/BOOL/DATE/TS families. */
  val bucketDuck: String =
    s"""CAST(list_sum(list_transform(range(0, nb), k ->
       |      CASE WHEN list_sum(list_transform(range(1, ${Dim + 1}), i ->
       |          CAST(w[k+1][i] AS BIGINT) * CAST(floor(CAST(embedding[i] AS DOUBLE) * $QuantScale) AS BIGINT))) >= 0
       |        THEN (CAST(1 AS BIGINT) << k) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)""".stripMargin

  /** DuckDB: probe set of column `blk`. */
  val probesDuck: String =
    "list_distinct(list_prepend(blk, list_transform(range(0, nb), k -> xor(blk, CAST(1 AS BIGINT) << k))))"
}
