package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * All operators take the scale-factor directory as a parameter so the same
  * plan runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1 (bench) — and, at
  * production scale, against a partitioned table root. Column pruning and
  * filter pushdown are left to Catalyst: loaders never cache or materialize.
  */
object Tables {
  def region(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/region.parquet")
  def nation(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/nation.parquet")
  def customer(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/customer.parquet")
  def supplier(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/supplier.parquet")
  def part(s: SparkSession, dir: String): DataFrame     = s.read.parquet(s"$dir/part.parquet")
  def orders(s: SparkSession, dir: String): DataFrame   = s.read.parquet(s"$dir/orders.parquet")
  def lineitem(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/lineitem.parquet")
  /** `events.ts` may arrive as parquet TIMESTAMP(MICROS) — read natively as
    * a timestamp — or TIMESTAMP(NANOS), which Spark 4 only reads with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (see [[nanosConf]]; the
    * entry points `graft.Verify` / `graft.Bench` set it at session build, as
    * loaders must not mutate session config as a side effect), surfacing as
    * a LongType column of epoch-nanos. The loader branches on the LOADED
    * dtype so the same call works against either physical layout: timestamps
    * pass through untouched; a long column gets the ns→µs floor-division
    * conversion (matching DuckDB for pre-epoch nanosecond timestamps, where
    * truncation toward zero would round the wrong way).
    */
  val nanosConf: (String, String) = "spark.sql.legacy.parquet.nanosAsLong" -> "true"

  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df = s.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case TimestampType => df
      case TimestampNTZType =>
        // Sessions run UTC, so NTZ wall-clock == the UTC instant the old
        // nanos path produced via timestamp_micros; normalizing to TIMESTAMP
        // keeps every downstream expression (unix_micros, watermarks, window
        // functions) on the type the whole engine was built and verified
        // against.
        df.withColumn("ts",
          org.apache.spark.sql.functions.col("ts").cast(TimestampType))
      case LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr(
            "CASE WHEN ts >= 0 THEN ts div 1000 ELSE (ts - 999) div 1000 END")))
      case other => throw new IllegalStateException(
        s"events.ts has unsupported type $other (expected TIMESTAMP, TIMESTAMP_NTZ, " +
          s"or INT64 epoch-nanos via ${nanosConf._1}=${nanosConf._2})")
    }
  }
  def documents(s: SparkSession, dir: String): DataFrame  = s.read.parquet(s"$dir/documents.parquet")
  def embeddings(s: SparkSession, dir: String): DataFrame = s.read.parquet(s"$dir/embeddings.parquet")

  /** Cached corpus row count (parquet metadata count, one job per path).
    * LSH bit-sizing reads this instead of re-counting per query — the
    * fixtures are immutable, and at a partitioned 100 TB table root this is
    * the difference between one statistics lookup and a fresh listing job
    * for every operator that needs the cardinality. */
  private val countCache = scala.collection.concurrent.TrieMap.empty[String, Long]
  def embeddingsCount(s: SparkSession, dir: String): Long =
    countCache.getOrElseUpdate(s"$dir/embeddings.parquet", embeddings(s, dir).count())

  /** Cached embedding dimensionality (one single-row job per path) — PQ
    * subspace boundaries are derived from it in both engines, so it must be
    * read from the data, never assumed. */
  private val dimCache = scala.collection.concurrent.TrieMap.empty[String, Int]
  def embeddingsDim(s: SparkSession, dir: String): Int =
    dimCache.getOrElseUpdate(s"$dir/embeddings.parquet:dim",
      embeddings(s, dir)
        .select(org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("embedding")))
        .head().getInt(0))
}
