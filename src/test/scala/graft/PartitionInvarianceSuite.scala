package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Results must not depend on HOW the data is partitioned — the property
  * that separates "works on local[32]" from "works on 1000 executors",
  * where partition counts, input splits, and reduction order all differ
  * from the dev box. Any order-dependent float reduction, partition-local
  * tie-break, or accidental reliance on row order breaks it.
  *
  * One representative per cost family runs under two cloned sessions with
  * coprime shuffle widths (3 vs 7) and different max split sizes, and the
  * collected result MULTISETS must be identical. (The DuckDB gate already
  * pins Spark-vs-oracle; this pins Spark-vs-itself across cluster shapes.)
  */
class PartitionInvarianceSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-partition-invariance")
      .config("spark.ui.enabled", "false")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private val representatives = Seq(
    "q1_pricing_summary",     // decimal aggregation
    "q15_window_funcs",       // analytic windows
    "q32_percentile",         // exact percentile interpolation
    "dedup_minhash_lsh",      // banded LSH + verification joins
    "dedup_clusters",         // iterative connected components
    "sim_topk_bruteforce",    // float cosine ranking
    "sim_topk_ivf_trained",   // k-means training loop
    "text_tfidf_top",         // reused-exchange two-phase aggregate
    "pipe_token_budget",      // sharded distributed prefix sum
    "pipe_curriculum",        // sharded exact ntile
    "pipe_split",             // hash-boundary assignment
    "q33_range_join",         // bucketed band join
    "q36_cohort_retention",   // two-level week cohorts
    "text_novelty",           // first-seen attribution via min-aggregate
    "mm_phash_dedup",         // binary codec + Hamming band join
    "q39_lateral_topk",       // LATERAL top-N: float-equal ties must break
                              // on the key, not partition arrival order
    "stream_chained_agg",     // chained stateful ops: watermark propagation
                              // through two agg levels must not depend on
                              // state-store partition count
    "sim_topk_hnsw",          // two-layer beam search: routing-layer graph,
                              // down-projection and refinement beams must
                              // be trajectory-identical at any shuffle width
    "dedup_semantic",         // k-means cells + within-cluster dominated
                              // pairs: cluster assignment and keep-marks
                              // must survive any reduction order
    "pipe_dsir",              // hashed-feature ppm stats + broadcast join:
                              // scalar totals and per-doc floors must not
                              // depend on combine order
    "text_lm_score",          // corpus bigram MLE: three stacked aggregates
                              // and a type-table join, all integer
    "text_kmv_distinct",      // KMV sketch: k smallest distinct hashes are
                              // order statistics — identical under any
                              // combine order, and the estimator is one
                              // IEEE division, never a float sum
    "sim_rrf_fusion",         // hybrid fusion: two independently-ranked lists
                              // full-outer joined — rank assignment and RRF
                              // tie-breaks must survive any shuffle width
    "dedup_exact_substr",     // stride-1 window hashes + per-doc span merge:
                              // duplicate counts and span boundaries must not
                              // depend on combine order or split placement
    "stream_join_inner_wm",   // stream-stream join: state-store partitioning
                              // (cluster-shape invariance for the streaming
                              // family — state keying, watermark eviction and
                              // append emission must not depend on how many
                              // state-store partitions the cluster runs)
    "sim_triangles",          // wedge-close self-joins + per-node counts:
                              // triangle multiplicity must not depend on
                              // join task placement or combine order
    "text_pmi_bigrams",       // checkpointed count table + three marginal
                              // aggregates + one IEEE ratio division — the
                              // ratio must be bit-identical at any width
    "sim_label_separability", // exact-integer label statistics + pair join:
                              // VecSumLong merge order must not matter
    "dedup_source_overlap",   // distinct presence sets + capped pair join:
                              // containment counts must survive any shuffle
    "pipe_snapshot_diff",     // full-outer fingerprint reconciliation:
                              // added/removed/changed classification must
                              // not depend on join task placement
    "pipe_drift_report",      // two token-count aggregates + top-K vocab +
                              // broadcast totals: ppm floors must survive
                              // any combine order
    "text_bpe_persist")       // persisted-merge encode: the broadcast-array
                              // fold must give identical symbol counts at
                              // any split placement (trainer memoized once)

  private def runWith(parts: Int, splitMb: Int, name: String): Seq[String] = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s.conf.set("spark.sql.files.maxPartitionBytes", (splitMb * 1024L * 1024L).toString)
    SparkEntry.queries(name)(s, sfDir)
      .collect().map(_.toString).sorted.toSeq
  }

  representatives.foreach { name =>
    test(s"$name is invariant to shuffle width and split size") {
      val narrow = runWith(parts = 3, splitMb = 1, name)
      val wide = runWith(parts = 7, splitMb = 128, name)
      assert(narrow.nonEmpty, s"$name returned no rows at sf0.001")
      assert(narrow === wide,
        s"$name result depends on partitioning: ${narrow.size} vs ${wide.size} rows; " +
          s"first diff: ${narrow.zip(wide).find(p => p._1 != p._2)}")
    }
  }
}
