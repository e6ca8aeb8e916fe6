package graft.operators

import graft.{Memo, Tables}
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
  *  - hyperplane-LSH top-k: a scale path. Corpus is bucketed by random
  *    hyperplane signs with Hamming<=1 multi-probe ([[Lsh]]); a query only
  *    scans its probe buckets. The oracle mirrors the bucketing, so the
  *    gate verifies the bucketed semantics exactly.
  *  - IVF top-k: the other standard scale path. A coarse quantizer (K fixed
  *    centroid vectors) partitions the corpus into inverted cells; a query
  *    probes its P nearest cells only. Work per query drops from N to
  *    ~N*P/K; the one-off assignment pass is the classic IVF build cost and
  *    is a linear scan + broadcast join (no corpus shuffle).
  *
  * Cosines are computed with index-ordered double arithmetic (aggregate /
  * list_sum over the same sequence) so Spark and DuckDB produce bit-identical
  * doubles; output carries only ids + integer ranks.
  */
object Similarity {
  import graft.functions.VecDot

  private def dotC = VecDot.dot(col("qe"), col("embedding"))
  private def norm2C = VecDot.norm2(col("embedding"))

  /** Exact cosine top-5 neighbors for each query vector (vec_id < 10). */
  def sim_topk_bruteforce(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
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

  /** Filtered (predicate-constrained) exact top-k: each query (vec_id < 10)
    * retrieves its 5 nearest neighbors among corpus vectors of a DIFFERENT
    * label — the "filtered vector search" shape (metadata predicate ANDed
    * into retrieval, e.g. dedup against other sources only, or
    * cross-language mining). Catalyst folds the predicate into the join
    * CONDITION, so it is evaluated per candidate pair BEFORE the cosine —
    * non-qualifying candidates are never scored or ranked — rather than
    * post-filtering a fixed-k list (which under-fills k and forces
    * re-retrieval); a static predicate (one label, a source, a date range)
    * would additionally push to the corpus scan and prune partitions. The
    * reason filtered search is a first-class operator, not a wrapper. */
  def sim_topk_filtered(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"), norm2C.as("n2"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qe"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("label").as("neighbor_label"),
        col("rank"))
  }

  val sim_topk_filtered_sql: String =
    """WITH e AS (SELECT vec_id, label, embedding,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
      |  FROM embeddings),
      |q AS (SELECT vec_id qid, label qlabel, embedding qe, n2 qn2 FROM e WHERE vec_id < 10),
      |s AS (SELECT qid, vec_id, label,
      |    row_number() OVER (PARTITION BY qid ORDER BY
      |      list_sum(list_transform(range(1, len(qe)+1), i ->
      |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
      |      vec_id ASC) AS rank
      |  FROM q JOIN e ON label != qlabel)
      |SELECT qid, vec_id AS neighbor_id, label AS neighbor_label, CAST(rank AS INT) AS rank
      |FROM s WHERE rank <= 5""".stripMargin

  /** HYBRID retrieval with Reciprocal-Rank Fusion (Cormack et al., SIGIR
    * 2009 — the fusion rule behind every production hybrid-search stack):
    * for each query item (id < 10), a LEXICAL top-10 (3-shingle common
    * count over the documents table, integer-exact, df-capped inverted
    * index restricted to the query side) and a VECTOR top-10 (exact cosine
    * over the row-aligned embeddings table — fixture item i carries both
    * `documents.doc_id = i` text and `embeddings.vec_id = i`) are fused as
    * `score = Σ 10^6 div (60 + rank)` over the lists containing the item
    * (the standard k=60, in integer micro-units so every rank maps to a
    * distinct addend and both engines agree exactly), and the fused top-5
    * is emitted with provenance flags. Retrieval-quality intuition: items
    * found by BOTH modalities dominate, then better-ranked single-modality
    * items — surface match and semantic match fused without score
    * calibration, which is why RRF beats weighted-sum fusion on
    * uncalibrated signals.
    *
    * Scale: the vector branch is the broadcast-query brute-force plan (at
    * 10^9 vectors: swap in the IVF/LSH branch — same (qid, id, rank)
    * contract); the lexical branch joins 10 query docs' postings against
    * the df-capped index (work Σ df_q·df, cap-bounded); fusion itself is a
    * full outer join of two k-bounded rank lists — 10×10 rows per side
    * here, always (queries × k), never corpus-sized. */
  private val RrfK = 60
  private val RrfTopN = 10
  private val RrfMaxDf = 1000

  def sim_rrf_fusion(s: SparkSession, dir: String): DataFrame = {
    // vector branch: exact cosine top-10 per query (brute-force contract)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"))
    val wv = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    val vec = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
      .withColumn("rv", row_number().over(wv))
      .filter(col("rv") <= RrfTopN)
      .select(col("qid"), col("vec_id").as("id"), col("rv"))
    // lexical branch: common-3-shingle count top-10 per query doc
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), graft.functions.WordShingles.of(col("text"), 3).as("sh"))
    // Materialize the postings ONCE: they feed the df-cap aggregate AND both
    // sides of the lexical join, and the qid<10 filter pushes into its own
    // corpus scan — without the barrier the shingle explode ran up to 4×
    // (plan: 12 documents scans, 0 reuse, plans/r16/sim_rrf_fusion_before
    // .txt). Postings are (doc_id, 60-bit hash) rows — shingle-count-sized
    // but 16 bytes/row, far lighter than re-running the explode kernel.
    val postings = docs.select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), expr(Dedup.h60S("s0", "")).as("s"))
      .localCheckpoint(true)
    val keep = postings.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= RrfMaxDf).select(col("s"))
    val capped = postings.join(keep, "s").localCheckpoint(true)
    val qp = capped.filter(col("doc_id") < 10)
      .select(col("doc_id").as("qid"), col("s"))
    val wl = Window.partitionBy(col("qid")).orderBy(col("common").desc, col("id").asc)
    val lex = qp.join(capped.select(col("doc_id").as("id"), col("s")), "s")
      .filter(col("qid") =!= col("id"))
      .groupBy(col("qid"), col("id")).agg(count(lit(1)).as("common"))
      .withColumn("rl", row_number().over(wl))
      .filter(col("rl") <= RrfTopN)
      .select(col("qid"), col("id"), col("rl"))
    // reciprocal-rank fusion in integer micro-units
    val wf = Window.partitionBy(col("qid")).orderBy(col("rrf_micro").desc, col("id").asc)
    vec.join(lex, Seq("qid", "id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(expr(s"1000000 div ($RrfK + rv)"), lit(0L)) +
          coalesce(expr(s"1000000 div ($RrfK + rl)"), lit(0L)))
      .withColumn("rank", row_number().over(wf))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("id").as("item_id"), col("rrf_micro"),
        col("rank"), col("rv").isNotNull.as("in_vector"), col("rl").isNotNull.as("in_lexical"))
  }

  val sim_rrf_fusion_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
       |  FROM embeddings),
       |q AS (SELECT vec_id qid, embedding qe, n2 qn2 FROM e WHERE vec_id < 10),
       |vr AS (SELECT qid, id, rv FROM (
       |  SELECT qid, vec_id AS id,
       |    row_number() OVER (PARTITION BY qid ORDER BY
       |      list_sum(list_transform(range(1, len(qe)+1), i ->
       |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
       |      vec_id ASC) AS rv
       |  FROM q JOIN e ON vec_id != qid) WHERE rv <= $RrfTopN),
       |tok AS (SELECT doc_id, trim(text) tx, string_split_regex(trim(text), '\\s+') toks FROM documents),
       |sh AS (SELECT doc_id, ${Dedup.shinglesD} AS sh FROM tok),
       |post0 AS (SELECT doc_id, CAST(('0x' || substr(md5(s0), 1, 15)) AS BIGINT) AS s
       |          FROM (SELECT doc_id, unnest(sh) AS s0 FROM sh)),
       |keep AS (SELECT s FROM post0 GROUP BY s HAVING count(*) <= $RrfMaxDf),
       |post AS MATERIALIZED (SELECT doc_id, post0.s FROM post0 JOIN keep ON post0.s = keep.s),
       |lex AS (SELECT qid, id, rl FROM (
       |  SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY common DESC, id ASC) AS rl
       |  FROM (SELECT a.doc_id qid, b.doc_id id, count(*) common
       |        FROM post a JOIN post b ON a.s = b.s AND a.doc_id < 10 AND a.doc_id != b.doc_id
       |        GROUP BY 1, 2)) WHERE rl <= $RrfTopN),
       |f AS (SELECT coalesce(v.qid, l.qid) AS qid, coalesce(v.id, l.id) AS id, v.rv, l.rl
       |      FROM vr v FULL JOIN lex l ON v.qid = l.qid AND v.id = l.id),
       |sc AS (SELECT qid, id,
       |    coalesce(1000000 // ($RrfK + rv), 0) + coalesce(1000000 // ($RrfK + rl), 0) AS rrf_micro,
       |    rv IS NOT NULL AS in_vector, rl IS NOT NULL AS in_lexical
       |  FROM f)
       |SELECT qid, id AS item_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY rrf_micro DESC, id ASC) AS INT) AS rank,
       |  in_vector, in_lexical
       |FROM sc QUALIFY rank <= 5""".stripMargin

  /** Bucketed ANN: top-3 among the corpus vectors in any of the query's
    * Hamming<=1 probe buckets (vec_id < 50 queries), under the shared
    * random-hyperplane LSH ([[Lsh]]): adaptive bit width keeps buckets at
    * ~64 vectors from fixture scale to 10^9, and multi-probe recovers
    * near-neighbors that fall one bit away. Each query touches
    * ~(nbits+1)/2^nbits of the corpus instead of all of it. */
  def sim_topk_lsh(s: SparkSession, dir: String): DataFrame = {
    val nb = Lsh.numBits(Tables.embeddingsCount(s, dir), Lsh.maxBits(s))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), Lsh.bucketCol(nb, col("embedding")).as("blk"),
        norm2C.as("n2"))
    // queries are the broadcast side; probe expansion happens there so the
    // corpus is never exploded (corpus rows: 1 bucket each)
    val q = e.filter(col("vec_id") < 50)
      .repartition(col("vec_id")) // barrier: keep bucket agg out of the probe lambda
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        explode(expr(Lsh.probesSpark(nb))).as("blk"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    e.join(broadcast(q), Seq("blk"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
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

  /** k-NN GRAPH over the whole corpus — every node's top-[[KnnGraphK]]
    * neighbors among its LSH probe-bucket candidates. The building block of
    * semantic dedup clustering, diversity sampling, and graph-based ANN
    * index construction (NN-descent seeds, HNSW layer 0).
    *
    * The plan is deliberately DIFFERENT from [[sim_topk_lsh]]: there the
    * query set is known-small and broadcast is FORCED; here every corpus
    * vector is a query, so no side is forced — Catalyst picks. At fixture
    * scale it broadcasts the corpus side (it fits); past the broadcast
    * threshold the same plan degrades gracefully to a shuffled hash join
    * on the bucket id, where the probe-exploded query side (N×(nb+1) rows)
    * co-locates with the corpus side (N rows, one bucket each). The window
    * that ranks candidates partitions on the source vector id — a
    * maximal-cardinality key whose per-partition size is bounded by the
    * probe candidate count (~(nb+1)·TargetBucket ≈ a few hundred rows), so
    * there is no skew surface and no task ever holds more than one node's
    * candidate list (Spark further caps it with WindowGroupLimit: only the
    * running top-k is kept before the final rank). Work is
    * candidate-proportional (N·(nb+1)·bucket), never N². */
  private val KnnGraphK = 3

  def sim_knn_graph(s: SparkSession, dir: String): DataFrame = {
    val nb = Lsh.numBits(Tables.embeddingsCount(s, dir), Lsh.maxBits(s))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), Lsh.bucketCol(nb, col("embedding")).as("blk"),
        norm2C.as("n2"))
    val q = e
      .repartition(col("vec_id")) // barrier: keep bucket agg out of the probe lambda
      .select(col("vec_id").as("src"), col("embedding").as("qe"),
        explode(expr(Lsh.probesSpark(nb))).as("blk"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("vec_id").asc)
    e.join(q, Seq("blk")) // shuffle join on bucket — neither side broadcasts
      .filter(col("vec_id") =!= col("src"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= KnnGraphK)
      .select(col("src"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  val sim_knn_graph_sql: String =
    s"""WITH ${Lsh.paramsDuck},
       |e AS MATERIALIZED (SELECT vec_id, embedding,
       |    ${Lsh.bucketDuck} AS blk,
       |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
       |  FROM embeddings, params),
       |q AS (SELECT vec_id src, embedding qe, unnest(${Lsh.probesDuck}) AS blk, n2 qn2
       |  FROM e, params),
       |s AS (SELECT src, vec_id,
       |    row_number() OVER (PARTITION BY src ORDER BY
       |      list_sum(list_transform(range(1, len(qe)+1), i ->
       |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
       |      vec_id ASC) AS rank
       |  FROM q JOIN e ON e.blk = q.blk AND vec_id != src)
       |SELECT src, vec_id AS neighbor_id, CAST(rank AS INT) AS rank
       |FROM s WHERE rank <= $KnnGraphK""".stripMargin

  /** MUTUAL k-NN edges: the undirected subgraph of [[sim_knn_graph]] where
    * each endpoint ranks the other in its own top-k — the standard
    * robustification for density/cluster work (a hub node's one-way edges
    * into sparse regions disappear; only mutually-close pairs survive).
    * One self-join of the directed graph on the reversed pair; the graph is
    * k·N rows of three integers, so the join is trivially shuffle-sized at
    * any corpus scale, and emitting `vec_id_a < vec_id_b` keeps each
    * undirected edge exactly once. Reads the once-per-dir staged graph
    * (the materialized asset), so this gate measures the mutual join —
    * [[sim_knn_graph]] is the gate that measures construction. */
  def sim_mutual_knn(s: SparkSession, dir: String): DataFrame = {
    val g = knnGraphStaged(s, dir)
    val rev = g.select(col("src").as("neighbor_id"), col("neighbor_id").as("src"),
      col("rank").as("rank_back"))
    g.join(rev, Seq("src", "neighbor_id"))
      .filter(col("src") < col("neighbor_id"))
      .select(col("src").as("vec_id_a"), col("neighbor_id").as("vec_id_b"),
        col("rank").as("rank_ab"), col("rank_back").as("rank_ba"))
  }

  val sim_mutual_knn_sql: String =
    s"""WITH g AS MATERIALIZED ($sim_knn_graph_sql)
       |SELECT a.src AS vec_id_a, a.neighbor_id AS vec_id_b,
       |       a.rank AS rank_ab, b.rank AS rank_ba
       |FROM g a JOIN g b
       |  ON a.src = b.neighbor_id AND a.neighbor_id = b.src
       |WHERE a.src < a.neighbor_id""".stripMargin

  /** RECALL@k evaluation of the LSH ANN path against the exact scan — the
    * measurement every production ANN deployment runs before trusting an
    * approximate index. For each query (vec_id < 50): how many of the exact
    * top-3 does [[sim_topk_lsh]] return? Emitted as integer per-mille so the
    * gate hashes it exactly.
    *
    * The exact side is the [[sim_topk_bruteforce]] plan over the SAME query
    * set (broadcast queries, one corpus pass, per-partition top-k); the
    * approx side is the production plan under test. At 10^9+ vectors this is
    * exactly how recall is measured there too: a sampled query set, one
    * linear scan for ground truth, set-intersect per query — the eval cost
    * is one brute-force pass over a sample, never N². */
  /** Exact cosine top-3 for the standard eval query set (vec_id < 50):
    * the ground-truth side shared by [[sim_recall_eval]] (LSH) and
    * [[sim_ivf_recall]] (trained IVF). Broadcast queries, one corpus
    * pass, per-partition top-k. */
  private def exactTop3(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("vec_id").as("neighbor_id"))
  }

  /** recall@3 of an approximate search against [[exactTop3]], per query,
    * in exact integer per-mille. */
  private def recallAgainstExact(exact: DataFrame, approx: DataFrame): DataFrame =
    exact.join(approx.select(col("qid"), col("neighbor_id"), lit(1).as("hit")),
        Seq("qid", "neighbor_id"), "left")
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).as("n_hits"))
      .withColumn("recall_per_mille", expr("n_hits * 1000 div n_exact"))

  def sim_recall_eval(s: SparkSession, dir: String): DataFrame =
    recallAgainstExact(exactTop3(s, dir), sim_topk_lsh(s, dir))

  val sim_recall_eval_sql: String =
    s"""WITH approx AS ($sim_topk_lsh_sql),
       |e2 AS MATERIALIZED (SELECT vec_id, embedding,
       |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
       |  FROM embeddings),
       |q2 AS (SELECT vec_id qid, embedding qe, n2 qn2 FROM e2 WHERE vec_id < 50),
       |exact AS (SELECT qid, vec_id AS neighbor_id FROM (
       |    SELECT qid, vec_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY
       |        list_sum(list_transform(range(1, len(qe)+1), i ->
       |          CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
       |        vec_id ASC) AS rank
       |    FROM q2 JOIN e2 ON vec_id != qid)
       |  WHERE rank <= 3)
       |SELECT x.qid, count(*) AS n_exact,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |  (CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
       |    // count(*) AS recall_per_mille
       |FROM exact x LEFT JOIN approx a
       |  ON x.qid = a.qid AND x.neighbor_id = a.neighbor_id
       |GROUP BY x.qid""".stripMargin

  /** IVF counterpart of [[sim_recall_eval]]: recall@3 of the TRAINED IVF
    * probe search ([[sim_topk_ivf_trained]] — Lloyd-trained cells,
    * multi-probe) against the exact scan, per query, in integer per-mille.
    * Together with [[sim_ivf_balance]] this is the deploy gate for an IVF
    * index: balance says probes stay cheap, recall says they stay good —
    * a quantizer can fail either audit independently (collapsed cells pass
    * recall while probes go linear; over-split cells pass balance while
    * recall craters).
    *
    * Scale: identical to [[sim_recall_eval]] — ground truth is one
    * brute-force pass over a SAMPLED query set (never N²), the approx side
    * is the production plan under test, and the trainer runs once (shared
    * [[trainedCells]] staging). */
  def sim_ivf_recall(s: SparkSession, dir: String): DataFrame =
    recallAgainstExact(exactTop3(s, dir), sim_topk_ivf_trained(s, dir))

  // lazy: interpolates sim_topk_ivf_trained_sql, which is declared later
  // in the file — an eager val here would capture null at init order
  lazy val sim_ivf_recall_sql: String =
    s"""WITH approx AS ($sim_topk_ivf_trained_sql),
       |e2 AS MATERIALIZED (SELECT vec_id, embedding,
       |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
       |  FROM embeddings),
       |q2 AS (SELECT vec_id qid, embedding qe, n2 qn2 FROM e2 WHERE vec_id < 50),
       |exact AS (SELECT qid, vec_id AS neighbor_id FROM (
       |    SELECT qid, vec_id,
       |      row_number() OVER (PARTITION BY qid ORDER BY
       |        list_sum(list_transform(range(1, len(qe)+1), i ->
       |          CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
       |        vec_id ASC) AS rank
       |    FROM q2 JOIN e2 ON vec_id != qid)
       |  WHERE rank <= 3)
       |SELECT x.qid, count(*) AS n_exact,
       |  CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
       |  (CAST(sum(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) * 1000)
       |    // count(*) AS recall_per_mille
       |FROM exact x LEFT JOIN approx a
       |  ON x.qid = a.qid AND x.neighbor_id = a.neighbor_id
       |GROUP BY x.qid""".stripMargin

  /** TWO-STAGE retrieval with a dimension-reduced prefilter — the
    * Matryoshka-embedding pattern: stage 1 scores every candidate on only
    * the first [[PrefixDims]] dimensions (a prefix of a Matryoshka-trained
    * embedding carries most of the signal) and keeps [[CoarseK]] per query;
    * stage 2 re-scores just those with the FULL vector and keeps
    * [[RerankK]]. Per-row stage-1 cost drops by dims/PrefixDims — at
    * production dimensionality (1024+ → 32-dim prefix) that is a 30×
    * cheaper scan, with exactness restored at the top only where it
    * matters. Both stages are the same broadcast + WindowGroupLimit shape
    * as [[sim_topk_bruteforce]]; the oracle unrolls both stages, so the
    * gate pins the exact two-stage trajectory including prefilter misses. */
  private val PrefixDims = 8
  private val CoarseK = 20
  private val RerankK = 5

  def sim_topk_rerank(s: SparkSession, dir: String): DataFrame = {
    val peC = slice(col("embedding"), 1, PrefixDims)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"),
        VecDot.norm2(peC).as("pn2"), peC.as("pe"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"),
        col("pn2").as("qpn2"), col("pe").as("qpe"))
    val wPre = Window.partitionBy(col("qid")).orderBy(col("cos_pre").desc, col("vec_id").asc)
    val coarse = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos_pre",
        VecDot.dot(col("qpe"), col("pe")) / sqrt(col("pn2") * col("qpn2")))
      .withColumn("crank", row_number().over(wPre))
      .filter(col("crank") <= CoarseK)
    val wFull = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    coarse
      .withColumn("cos", VecDot.dot(col("qe"), col("embedding")) / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(wFull))
      .filter(col("rank") <= RerankK)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  val sim_topk_rerank_sql: String =
    s"""WITH e AS (SELECT vec_id, embedding, embedding[1:$PrefixDims] AS pe,
       |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2,
       |    list_sum(list_transform(embedding[1:$PrefixDims], x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS pn2
       |  FROM embeddings),
       |q AS (SELECT vec_id qid, embedding qe, pe qpe, n2 qn2, pn2 qpn2 FROM e WHERE vec_id < 10),
       |coarse AS (SELECT qid, vec_id, embedding, qe, n2, qn2,
       |    row_number() OVER (PARTITION BY qid ORDER BY
       |      list_sum(list_transform(range(1, $PrefixDims + 1), i ->
       |        CAST(qpe[i] AS DOUBLE) * CAST(pe[i] AS DOUBLE))) / sqrt(pn2 * qpn2) DESC,
       |      vec_id ASC) AS crank
       |  FROM q JOIN e ON vec_id != qid),
       |rer AS (SELECT qid, vec_id,
       |    row_number() OVER (PARTITION BY qid ORDER BY
       |      list_sum(list_transform(range(1, len(qe)+1), i ->
       |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
       |      vec_id ASC) AS rank
       |  FROM coarse WHERE crank <= $CoarseK)
       |SELECT qid, vec_id AS neighbor_id, CAST(rank AS INT) AS rank
       |FROM rer WHERE rank <= $RerankK""".stripMargin

  /** GRAPH-ANN beam search — the query path of HNSW/NSG-style indexes,
    * run over the [[sim_knn_graph]] edge table: start every query at a
    * deterministic entry point (the minimum corpus id), then for
    * [[BeamHops]] hops expand the beam with its graph neighbors, score
    * all candidates against the query, and keep the [[BeamWidth]] best
    * (cosine DESC, vec_id tiebreak). The final beam's top-[[BeamK]]
    * (query itself excluded) is the answer. Deterministic end-to-end —
    * the oracle unrolls the identical three hops as CTEs, so the gate
    * verifies the exact beam TRAJECTORY, not a recall proxy.
    *
    * Scale: the graph is built once ([[sim_knn_graph]] is
    * candidate-proportional) and materialized; each hop is one join of
    * (queries × beam) against the k-out-degree edge table — per-query
    * work is O(beam·k) rows a hop, independent of corpus size, which is
    * exactly why graph ANN wins at 10^9+ vectors. Beam lineage is
    * truncated per hop (the Pregel pattern). */
  private val BeamWidth = 8
  private val BeamHops = 3
  private val BeamK = 3

  /** Once-per-dir staged copy of the [[sim_knn_graph]] edge table. In
    * production graph ANN the graph is a materialized asset built once and
    * amortized over every consumer; rebuilding it per run (as the
    * pre-round-10 gates did) both misstates the benchmark — the graph
    * consumers measured graph CONSTRUCTION, not their own work — and is
    * not how the operators would be deployed. Staged through the managed
    * [[graft.Staging]] root, like the streaming event chunks, and shared
    * by every downstream graph operator ([[sim_topk_graph]],
    * [[sim_mutual_knn]], [[sim_pagerank]]); [[sim_knn_graph]] itself
    * remains the un-staged gate that measures construction. */
  private val stagedGraph = new Memo[String]

  private def knnGraphStaged(s: SparkSession, dir: String): DataFrame = {
    val graphDir = stagedGraph.getOrStage(dir) {
      val t = graft.Staging.tempDir("graft-knn-graph-").toString
      sim_knn_graph(s, dir).write.mode("overwrite").parquet(t)
      t
    }
    s.read.parquet(graphDir)
  }

  def sim_topk_graph(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    val graph = knnGraphStaged(s, dir)
      .select(col("src"), col("neighbor_id").as("dst"))
      .localCheckpoint(true)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"))
    val entry = e.agg(min(col("vec_id")).as("vid"))
    def scoreRank(cand: DataFrame, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
      cand.join(e, col("vid") === col("vec_id"))
        .join(broadcast(q), "qid")
        .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= keep)
    }
    var beam = q.select(col("qid")).crossJoin(broadcast(entry))
      .localCheckpoint(true)
    for (_ <- 1 to BeamHops) {
      val prev = beam
      val expanded = prev.unionByName(
          prev.join(graph, prev("vid") === graph("src"))
            .select(prev("qid"), graph("dst").as("vid")))
        .distinct()
      beam = scoreRank(expanded, BeamWidth)
        .select(col("qid"), col("vid"))
        .localCheckpoint(true)
      CheckpointBridge.unpersistLocalCheckpoint(prev)
    }
    scoreRank(beam.filter(col("vid") =!= col("qid")), BeamK)
      .select(col("qid"), col("vid").as("neighbor_id"), col("r").as("rank"))
  }

  val sim_topk_graph_sql: String = {
    val cos = """list_sum(list_transform(range(1, len(qe)+1), i ->
                |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2)""".stripMargin
    def hop(i: Int): String =
      s"""x$i AS (SELECT qid, vid FROM b${i - 1}
         |  UNION SELECT qid, g.dst AS vid FROM b${i - 1} b JOIN g ON g.src = b.vid),
         |s$i AS (SELECT qid, vid,
         |    row_number() OVER (PARTITION BY qid ORDER BY $cos DESC, vid ASC) AS r
         |  FROM x$i JOIN e2 ON vec_id = vid JOIN q2 USING (qid)),
         |b$i AS (SELECT qid, vid FROM s$i WHERE r <= $BeamWidth)""".stripMargin
    s"""WITH gk AS MATERIALIZED ($sim_knn_graph_sql),
       |g AS (SELECT src, neighbor_id AS dst FROM gk),
       |e2 AS MATERIALIZED (SELECT vec_id, embedding,
       |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
       |  FROM embeddings),
       |q2 AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn2 FROM e2 WHERE vec_id < 50),
       |entry AS (SELECT min(vec_id) AS vid FROM e2),
       |b0 AS (SELECT qid, vid FROM q2, entry),
       |${hop(1)},
       |${hop(2)},
       |${hop(3)}
       |SELECT qid, vid AS neighbor_id, CAST(r AS INT) AS rank FROM (
       |  SELECT qid, vid,
       |    row_number() OVER (PARTITION BY qid ORDER BY $cos DESC, vid ASC) AS r
       |  FROM b3 JOIN e2 ON vec_id = vid JOIN q2 USING (qid)
       |  WHERE vid != qid)
       |WHERE r <= $BeamK""".stripMargin
  }

  /** HIERARCHICAL graph ANN — the HNSW layer structure (Malkov & Yashunin,
    * 2016, arXiv:1603.09320) determinized: a sparse ROUTING layer (the
    * `vec_id % `[[HnswStride]]` = 0` stratum — the deterministic analogue
    * of HNSW's geometric level assignment) carries its own kNN graph; a
    * query first beam-searches the routing layer from the global entry
    * point, then drops its best [[HnswL1Keep]] routing nodes into the full
    * layer-0 graph ([[sim_knn_graph]], staged) and refines there. The
    * point of the hierarchy: layer-1 routing replaces [[sim_topk_graph]]'s
    * long walk from a fixed arbitrary entry — the upper layer crosses the
    * space in coarse strides, so total hops stay logarithmic-ish as the
    * corpus grows instead of the flat graph's diameter. Both beams, both
    * graphs, and all tie-breaks (cosine DESC, vec_id ASC) are
    * deterministic; the oracle unrolls the identical two-layer trajectory,
    * so the gate verifies the exact search path. (On the near-random
    * fixture embeddings — where graph navigation is intrinsically hard and
    * these gates deliberately check trajectory, not recall — the routing
    * layer still nearly doubles overlap with the exact top-3 vs the flat
    * [[sim_topk_graph]] walk at sf0.01: 11 vs 6 of 150.)
    *
    * Scale: the routing layer is N/[[HnswStride]] nodes with the same
    * LSH-bucketed candidate-proportional construction as layer 0 (built
    * here per run — the un-staged construction gate for the upper layer;
    * production materializes both layers); per query, each hop is
    * O(beam·k) integer rows on either layer, independent of corpus size.
    * The down-projection is a rank over the final routing beam — no scan
    * anywhere after graph build. */
  private val HnswStride = 8
  private val HnswL1Width = 4
  private val HnswL1Hops = 2
  private val HnswL1Keep = 2
  private val HnswL0Hops = 2

  def sim_topk_hnsw(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"))
    val q = e.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"))

    def scoreRank(cand: DataFrame, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vid").asc)
      cand.join(e, col("vid") === col("vec_id"))
        .join(broadcast(q), "qid")
        .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= keep)
    }
    def beam(graph: DataFrame, start: DataFrame, hops: Int, width: Int): DataFrame = {
      var b = start.localCheckpoint(true)
      for (_ <- 1 to hops) {
        val prev = b
        val expanded = prev.unionByName(
            prev.join(graph, prev("vid") === graph("src"))
              .select(prev("qid"), graph("dst").as("vid")))
          .distinct()
        b = scoreRank(expanded, width).select(col("qid"), col("vid")).localCheckpoint(true)
        CheckpointBridge.unpersistLocalCheckpoint(prev)
      }
      b
    }

    // routing layer: kNN graph within the stratum, same blocked construction
    val nb = Lsh.numBits(Tables.embeddingsCount(s, dir), Lsh.maxBits(s))
    val es = Tables.embeddings(s, dir)
      .filter(col("vec_id") % HnswStride === 0)
      .select(col("vec_id"), col("embedding"), Lsh.bucketCol(nb, col("embedding")).as("blk"),
        norm2C.as("n2"))
    val qs = es.repartition(col("vec_id"))
      .select(col("vec_id").as("src"), col("embedding").as("qe"),
        explode(expr(Lsh.probesSpark(nb))).as("blk"), col("n2").as("qn2"))
    val w1 = Window.partitionBy(col("src")).orderBy(col("cos").desc, col("vec_id").asc)
    val g1 = es.join(qs, Seq("blk"))
      .filter(col("vec_id") =!= col("src"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w1))
      .filter(col("rank") <= KnnGraphK)
      .select(col("src"), col("vec_id").as("dst"))
      .localCheckpoint(true)

    val entry = es.agg(min(col("vec_id")).as("vid"))
    val routed = beam(g1, q.select(col("qid")).crossJoin(broadcast(entry)),
      HnswL1Hops, HnswL1Width)
    val down = scoreRank(routed, HnswL1Keep).select(col("qid"), col("vid"))

    val g0 = knnGraphStaged(s, dir)
      .select(col("src"), col("neighbor_id").as("dst"))
      .localCheckpoint(true)
    val b0 = beam(g0, down, HnswL0Hops, BeamWidth)
    scoreRank(b0.filter(col("vid") =!= col("qid")), BeamK)
      .select(col("qid"), col("vid").as("neighbor_id"), col("r").as("rank"))
  }

  val sim_topk_hnsw_sql: String = {
    val cos = """list_sum(list_transform(range(1, len(qe)+1), i ->
                |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2)""".stripMargin
    // one beam hop over graph `g` at beam width `width`: expand, score, cut
    def hop(prefix: String, g: String, i: Int, width: Int): String =
      s"""${prefix}x$i AS (SELECT qid, vid FROM $prefix${i - 1}
         |  UNION SELECT qid, $g.dst AS vid FROM $prefix${i - 1} b JOIN $g ON $g.src = b.vid),
         |${prefix}s$i AS (SELECT qid, vid,
         |    row_number() OVER (PARTITION BY qid ORDER BY $cos DESC, vid ASC) AS r
         |  FROM ${prefix}x$i JOIN e2 ON vec_id = vid JOIN q2 USING (qid)),
         |$prefix$i AS (SELECT qid, vid FROM ${prefix}s$i WHERE r <= $width)""".stripMargin
    s"""WITH ${Lsh.paramsDuck},
       |eb AS MATERIALIZED (SELECT vec_id, embedding,
       |    ${Lsh.bucketDuck} AS blk,
       |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
       |  FROM embeddings, params),
       |es AS MATERIALIZED (SELECT * FROM eb WHERE vec_id % $HnswStride = 0),
       |qs AS (SELECT vec_id src, embedding qe, unnest(${Lsh.probesDuck}) AS blk, n2 qn2
       |  FROM es, params),
       |g1s AS (SELECT src, vec_id,
       |    row_number() OVER (PARTITION BY src ORDER BY
       |      list_sum(list_transform(range(1, len(qe)+1), i ->
       |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
       |      vec_id ASC) AS rank
       |  FROM qs JOIN es ON es.blk = qs.blk AND vec_id != src),
       |g1 AS (SELECT src, vec_id AS dst FROM g1s WHERE rank <= $KnnGraphK),
       |qb AS (SELECT vec_id src, embedding qe, unnest(${Lsh.probesDuck}) AS blk, n2 qn2
       |  FROM eb, params),
       |g0s AS (SELECT src, vec_id,
       |    row_number() OVER (PARTITION BY src ORDER BY
       |      list_sum(list_transform(range(1, len(qe)+1), i ->
       |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
       |      vec_id ASC) AS rank
       |  FROM qb JOIN eb ON eb.blk = qb.blk AND vec_id != src),
       |g0 AS MATERIALIZED (SELECT src, vec_id AS dst FROM g0s WHERE rank <= $KnnGraphK),
       |e2 AS MATERIALIZED (SELECT vec_id, embedding, n2 FROM eb),
       |q2 AS (SELECT vec_id AS qid, embedding AS qe, n2 AS qn2 FROM e2 WHERE vec_id < 50),
       |entry AS (SELECT min(vec_id) AS vid FROM es),
       |a0 AS (SELECT qid, vid FROM q2, entry),
       |${hop("a", "g1", 1, HnswL1Width)},
       |${hop("a", "g1", 2, HnswL1Width)},
       |d0 AS (SELECT qid, vid FROM (
       |  SELECT qid, vid,
       |    row_number() OVER (PARTITION BY qid ORDER BY $cos DESC, vid ASC) AS r
       |  FROM a2 JOIN e2 ON vec_id = vid JOIN q2 USING (qid)) WHERE r <= $HnswL1Keep),
       |${hop("d", "g0", 1, BeamWidth)},
       |${hop("d", "g0", 2, BeamWidth)}
       |SELECT qid, vid AS neighbor_id, CAST(r AS INT) AS rank FROM (
       |  SELECT qid, vid,
       |    row_number() OVER (PARTITION BY qid ORDER BY $cos DESC, vid ASC) AS r
       |  FROM d2 JOIN e2 ON vec_id = vid JOIN q2 USING (qid)
       |  WHERE vid != qid)
       |WHERE r <= $BeamK""".stripMargin
  }

  /** Greedy k-center DIVERSITY selection (Gonzalez, 1985 — the 2-approx
    * farthest-first traversal used for coreset/facility-location selection
    * in data curation): seed with the minimum vec_id, then [[KCenters]]-1
    * times add the point FARTHEST from the chosen set — the set distance
    * is the distance to the NEAREST center, i.e. the point minimizing its
    * MAXIMUM cosine over chosen centers (ties to low vec_id;
    * already-chosen points self-score cosine ~1 and are never re-picked) —
    * finally assign every point to its max-cosine center. [[sim_bucket_sample]] is the cheap
    * one-pass stand-in; this is the real algorithm, determinized. Every
    * comparison is over bit-identical doubles (index-ordered dots, min/max
    * are exact), so the oracle unrolls the same rounds and the gate checks
    * the exact center sequence and assignment.
    *
    * Scale: each round is one broadcast of the ≤k chosen centers against
    * the corpus (a narrow map + map-side-combined min), then a bounded
    * global top-1 (TakeOrdered, never a full sort); k rounds total — the
    * textbook distributed greedy k-center cost. Assignment is one more
    * broadcast pass. Nothing quadratic, nothing driver-side but the
    * center-count-bounded loop structure. */
  private val KCenters = 8

  def sim_kcenter(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"))
    def centers(chosen: DataFrame): DataFrame = {
      val ec = e.select(col("vec_id").as("cid"), col("embedding").as("ce"), col("n2").as("cn2"))
      chosen.join(ec, col("vid") === col("cid")).select(col("cid"), col("ce"), col("cn2"))
    }
    def scored(chosen: DataFrame): DataFrame = e
      .crossJoin(broadcast(centers(chosen)))
      .withColumn("cos", VecDot.dot(col("ce"), col("embedding")) / sqrt(col("n2") * col("cn2")))

    var chosen = e.agg(min(col("vec_id")).as("vid"))
    for (_ <- 1 until KCenters) {
      chosen = chosen.unionByName(
          scored(chosen)
            .groupBy(col("vec_id")).agg(max(col("cos")).as("mc"))
            .orderBy(col("mc").asc, col("vec_id").asc).limit(1)
            .select(col("vec_id").as("vid")))
        .localCheckpoint(true)
    }
    scored(chosen)
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("cos"), -col("cid"))).as("center_id"))
      .join(chosen.withColumn("isc", lit(true)),
        col("vec_id") === col("vid"), "left")
      .select(col("vec_id"), col("center_id"),
        coalesce(col("isc"), lit(false)).as("is_center"))
  }

  val sim_kcenter_sql: String = {
    val cosPC = """list_sum(list_transform(range(1, len(ce)+1), i ->
                  |      CAST(ce[i] AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE)))
                  |      / sqrt(p.n2 * cn2)""".stripMargin
    def round(i: Int): String =
      s"""mc$i AS (SELECT p.vec_id, max($cosPC) AS mc
         |  FROM ke p CROSS JOIN (
         |    SELECT ke.vec_id cid, embedding ce, n2 cn2
         |    FROM ke JOIN c${i - 1} ON ke.vec_id = c${i - 1}.vid) c
         |  GROUP BY 1),
         |pk$i AS (SELECT vec_id AS vid FROM (
         |  SELECT vec_id, row_number() OVER (ORDER BY mc ASC, vec_id ASC) AS r
         |  FROM mc$i) WHERE r = 1),
         |c$i AS (SELECT vid FROM c${i - 1} UNION ALL SELECT vid FROM pk$i)""".stripMargin
    s"""WITH ke AS MATERIALIZED (SELECT vec_id, embedding,
       |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
       |  FROM embeddings),
       |c0 AS (SELECT min(vec_id) AS vid FROM ke),
       |${(1 until KCenters).map(round).mkString(",\n")},
       |asn AS (SELECT p.vec_id, cid,
       |    row_number() OVER (PARTITION BY p.vec_id ORDER BY $cosPC DESC, cid ASC) AS r
       |  FROM ke p CROSS JOIN (
       |    SELECT ke.vec_id cid, embedding ce, n2 cn2
       |    FROM ke JOIN c${KCenters - 1} ON ke.vec_id = c${KCenters - 1}.vid) c)
       |SELECT a.vec_id, a.cid AS center_id, (ch.vid IS NOT NULL) AS is_center
       |FROM asn a LEFT JOIN c${KCenters - 1} ch ON a.vec_id = ch.vid
       |WHERE a.r = 1""".stripMargin
  }

  /** LSH-stratified DIVERSITY sample: one representative (min vec_id) per
    * hyperplane bucket, with the bucket's population. Where uniform
    * sampling over-draws dense regions, one-per-bucket covers the
    * embedding space — the cheap deterministic stand-in for k-center /
    * facility-location selection in data-curation pipelines. One pass +
    * one aggregation on the bucket id; bucket count adapts to corpus
    * cardinality (the shared [[Lsh]] sizing), so the sample grows as
    * ~2^bits and the aggregate stays map-side-combinable at any scale. */
  def sim_bucket_sample(s: SparkSession, dir: String): DataFrame = {
    val nb = Lsh.numBits(Tables.embeddingsCount(s, dir), Lsh.maxBits(s))
    Tables.embeddings(s, dir)
      .select(col("vec_id"), Lsh.bucketCol(nb, col("embedding")).as("blk"))
      .groupBy(col("blk"))
      .agg(min(col("vec_id")).as("sample_vec_id"), count(lit(1)).as("bucket_size"))
  }

  val sim_bucket_sample_sql: String =
    s"""WITH ${Lsh.paramsDuck},
       |e AS (SELECT vec_id, ${Lsh.bucketDuck} AS blk FROM embeddings, params)
       |SELECT blk, min(vec_id) AS sample_vec_id, count(*) AS bucket_size
       |FROM e GROUP BY blk""".stripMargin

  /** PageRank over the mutual-kNN graph — embedding-space centrality, the
    * signal behind representativeness sampling and hub detection in
    * semantic dedup. [[PrIters]] power iterations with INTEGER rank mass
    * (start 1000 per node; next = 150 + 850·Σ(r div deg) div 1000 — the
    * 0.15 damping in per-mille arithmetic): floor divisions are
    * deterministic in any engine, so the oracle unrolls the identical
    * three rounds as CTEs and the gate hashes exact integers. The mutual
    * graph is symmetric, so every node has in-edges and no dangling-mass
    * correction exists.
    *
    * Scale: the edge table (k·N rows of integers) is materialized ONCE
    * with `localCheckpoint` (at production scale: a persisted table) and
    * each round is one join + one aggregation shuffled on the node id —
    * cost is O(|E|) per round, rounds fixed at 3. Rank lineage is
    * truncated per round (the Pregel pattern shared with
    * [[graft.operators.Dedup.dedup_clusters]]). */
  private val PrIters = 3

  def sim_pagerank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftbridge.CheckpointBridge
    // checkpoint BEFORE the union: both orientations and the degree
    // aggregate read the materialized undirected edge list, so the kNN
    // build (the expensive part) runs exactly once
    val g = sim_mutual_knn(s, dir).select(col("vec_id_a"), col("vec_id_b"))
      .localCheckpoint(true)
    val edges = g.select(col("vec_id_a").as("src"), col("vec_id_b").as("dst"))
      .unionByName(g.select(col("vec_id_b").as("src"), col("vec_id_a").as("dst")))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val e2 = edges.join(deg, "src").localCheckpoint(true)
    var ranks = deg.select(col("src").as("vec_id"), lit(1000L).as("r"))
      .localCheckpoint(true)
    // both consumers of g (e2 and the seed ranks) are materialized now
    CheckpointBridge.unpersistLocalCheckpoint(g)
    for (_ <- 1 to PrIters) {
      val prev = ranks
      ranks = e2.join(prev.withColumnRenamed("vec_id", "src"), "src")
        .select(col("dst"), expr("r div deg").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("m"))
        .select(col("dst").as("vec_id"), expr("150 + (850 * m) div 1000").as("r"))
        .localCheckpoint(true)
      CheckpointBridge.unpersistLocalCheckpoint(prev)
    }
    e2.select(col("src").as("vec_id"), col("deg")).distinct()
      .join(ranks, "vec_id")
      .select(col("vec_id"), col("deg"), col("r").as("rank_milli"))
  }

  val sim_pagerank_sql: String =
    s"""WITH g AS MATERIALIZED ($sim_mutual_knn_sql),
       |e AS (SELECT vec_id_a AS src, vec_id_b AS dst FROM g
       |      UNION ALL SELECT vec_id_b AS src, vec_id_a AS dst FROM g),
       |deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
       |r0 AS (SELECT src AS vec_id, CAST(1000 AS BIGINT) AS r FROM deg),
       |r1 AS (SELECT e.dst AS vec_id,
       |         CAST(150 + (850 * sum(r0.r // deg.deg)) // 1000 AS BIGINT) AS r
       |       FROM e JOIN deg USING (src) JOIN r0 ON r0.vec_id = e.src GROUP BY e.dst),
       |r2 AS (SELECT e.dst AS vec_id,
       |         CAST(150 + (850 * sum(r1.r // deg.deg)) // 1000 AS BIGINT) AS r
       |       FROM e JOIN deg USING (src) JOIN r1 ON r1.vec_id = e.src GROUP BY e.dst),
       |r3 AS (SELECT e.dst AS vec_id,
       |         CAST(150 + (850 * sum(r2.r // deg.deg)) // 1000 AS BIGINT) AS r
       |       FROM e JOIN deg USING (src) JOIN r2 ON r2.vec_id = e.src GROUP BY e.dst)
       |SELECT d.src AS vec_id, CAST(d.deg AS BIGINT) AS deg, r3.r AS rank_milli
       |FROM deg d JOIN r3 ON r3.vec_id = d.src""".stripMargin

  /** Coarse-quantizer size K ≈ √N (clamped), so cells hold ~√N vectors at
    * any corpus size — at 10^9 vectors, K = 4096 cells of ~250k rather than
    * a fixed literal leaving N/16 per cell. Both engines derive K from the
    * corpus count with the same integer floor(sqrt) formula. */
  private val MinCells = 4
  private val MaxCells = 4096
  private[operators] def numCells(n: Long): Int = {
    val r = math.sqrt(n.toDouble).toLong // floor, exact for perfect squares
    math.max(MinCells.toLong, math.min(MaxCells.toLong, r)).toInt
  }
  private val cellsDuck: String =
    s"ncells AS (SELECT GREATEST($MinCells, LEAST($MaxCells, CAST(floor(sqrt(count(*))) AS BIGINT))) AS k FROM embeddings)"
  private val NumProbes = 4 // cells probed per query

  /** IVF top-3: the corpus is assigned to its max-cosine centroid cell (the
    * coarse quantizer = the K lowest-vec_id vectors, a deterministic
    * training-free quantizer both engines derive identically from the data);
    * each query (vec_id < 50) probes its P nearest cells and ranks only the
    * vectors filed there.
    *
    * Cell assignment is a `max_by` hash aggregate, not a window: the K
    * scores per vector combine map-side so the shuffle carries one row per
    * corpus vector and nothing is sorted — a window here would sort-shuffle
    * the K×-exploded corpus, the plan's single avoidable cost at 100 TB.
    * Ties break on lowest cid via the (cscore, -cid) ordering struct,
    * matching the oracle's `ORDER BY cscore DESC, cid ASC`. */
  def sim_topk_ivf(s: SparkSession, dir: String): DataFrame = {
    val k = numCells(Tables.embeddingsCount(s, dir))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"))
    val cent = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("qe"), col("n2").as("cn2"))

    // score of a vector against every centroid; cosine ties break on cid
    def cellScores(side: DataFrame): DataFrame = side
      .crossJoin(broadcast(cent))
      .withColumn("cscore", dotC / sqrt(col("n2") * col("cn2")))

    val cells = cellScores(e)
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("embedding"), col("n2"), col("cid")),
        struct(col("cscore"), -col("cid"))).as("m"))
      .select(col("vec_id"), col("m.embedding"), col("m.n2"), col("m.cid"))

    // queries are few by construction: top-P cells via an in-group sort of
    // the K scores (bounded K), then re-join the query row itself
    val q = e.filter(col("vec_id") < 50)
    val probeCids = cellScores(q)
      .groupBy(col("vec_id"))
      .agg(slice(array_sort(collect_list(struct((-col("cscore")).as("neg"), col("cid").as("cid")))),
        1, NumProbes).as("top"))
      .select(col("vec_id"), explode(col("top.cid")).as("cid"))
    val probes = q.join(probeCids, "vec_id")
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"), col("cid"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    cells.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  val sim_topk_ivf_sql: String =
    s"""WITH $cellsDuck,
      |e AS (SELECT vec_id, embedding,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
      |  FROM embeddings),
      |cent AS (SELECT vec_id cid, embedding ce, n2 cn2 FROM e, ncells WHERE vec_id < k),
      |scored AS (SELECT e.vec_id, e.embedding, e.n2, cent.cid,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_sum(list_transform(range(1, len(ce)+1), i ->
      |        CAST(ce[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) / sqrt(e.n2 * cn2) DESC,
      |      cid ASC) AS crank
      |  FROM e CROSS JOIN cent),
      |cells AS (SELECT vec_id, embedding, n2, cid FROM scored WHERE crank = 1),
      |probes AS (SELECT vec_id qid, embedding qe, n2 qn2, cid
      |  FROM scored WHERE vec_id < 50 AND crank <= $NumProbes),
      |s AS (SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY
      |      list_sum(list_transform(range(1, len(qe)+1), i ->
      |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
      |      vec_id ASC) AS rank
      |  FROM probes JOIN cells USING (cid) WHERE vec_id != qid)
      |SELECT qid, vec_id AS neighbor_id, CAST(rank AS INT) AS rank
      |FROM s WHERE rank <= 3""".stripMargin

  /** PREDICATE-FILTERED IVF search — the filtered-vector-search shape a
    * production index actually serves ([[sim_topk_filtered]] is the exact
    * brute-force anchor; this is the same predicate on the INDEX path):
    * probe the top [[NumProbes]] cells, then apply the metadata predicate
    * (here `label != qlabel`) to the probed candidates BEFORE ranking —
    * post-filtering, the strategy single-index deployments use (the
    * alternative, one index per predicate value, is a layout decision this
    * engine expresses as `partitionBy`). The structural consequence a
    * deployment must monitor — a selective predicate thins the probed
    * cells and can return fewer than k hits where brute force would fill
    * the list — is part of the gate's output: `rank` carries per-query
    * result cardinality, so the oracle pins the exact filtered-recall
    * behavior, not an idealized one.
    *
    * Scale: identical to [[sim_topk_ivf]] (the filter is one more
    * predicate on the probed-candidate join, evaluated before the cosine)
    * — candidate work per query stays probed-cells-sized; the label rides
    * the index rows (5 small ints per vector in the persisted layout). */
  def sim_topk_ivf_filtered(s: SparkSession, dir: String): DataFrame = {
    val k = numCells(Tables.embeddingsCount(s, dir))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"), norm2C.as("n2"))
    val cent = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("qe"), col("n2").as("cn2"))
    def cellScores(side: DataFrame): DataFrame = side
      .crossJoin(broadcast(cent))
      .withColumn("cscore", dotC / sqrt(col("n2") * col("cn2")))
    val cells = cellScores(e)
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("label"), col("embedding"), col("n2"), col("cid")),
        struct(col("cscore"), -col("cid"))).as("m"))
      .select(col("vec_id"), col("m.label"), col("m.embedding"), col("m.n2"), col("m.cid"))
    val q = e.filter(col("vec_id") < 10)
    val probeCids = cellScores(q)
      .groupBy(col("vec_id"))
      .agg(slice(array_sort(collect_list(struct((-col("cscore")).as("neg"), col("cid").as("cid")))),
        1, NumProbes).as("top"))
      .select(col("vec_id"), explode(col("top.cid")).as("cid"))
    val probes = q.join(probeCids, "vec_id")
      .select(col("vec_id").as("qid"), col("label").as("qlabel"),
        col("embedding").as("qe"), col("n2").as("qn2"), col("cid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    cells.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid") && col("label") =!= col("qlabel"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("vec_id").as("neighbor_id"),
        col("label").as("neighbor_label"), col("rank"))
  }

  val sim_topk_ivf_filtered_sql: String =
    s"""WITH $cellsDuck,
      |e AS (SELECT vec_id, label, embedding,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
      |  FROM embeddings),
      |cent AS (SELECT vec_id cid, embedding ce, n2 cn2 FROM e, ncells WHERE vec_id < k),
      |scored AS (SELECT e.vec_id, e.label, e.embedding, e.n2, cent.cid,
      |    row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |      list_sum(list_transform(range(1, len(ce)+1), i ->
      |        CAST(ce[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) / sqrt(e.n2 * cn2) DESC,
      |      cid ASC) AS crank
      |  FROM e CROSS JOIN cent),
      |cells AS (SELECT vec_id, label, embedding, n2, cid FROM scored WHERE crank = 1),
      |probes AS (SELECT vec_id qid, label qlabel, embedding qe, n2 qn2, cid
      |  FROM scored WHERE vec_id < 10 AND crank <= $NumProbes),
      |s AS (SELECT qid, vec_id, label,
      |    row_number() OVER (PARTITION BY qid ORDER BY
      |      list_sum(list_transform(range(1, len(qe)+1), i ->
      |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
      |      vec_id ASC) AS rank
      |  FROM probes JOIN cells USING (cid) WHERE vec_id != qid AND label != qlabel)
      |SELECT qid, vec_id AS neighbor_id, label AS neighbor_label, CAST(rank AS INT) AS rank
      |FROM s WHERE rank <= 5""".stripMargin

  /** EMBEDDING-SPACE drift between two corpus snapshots — the vector twin
    * of the token drift monitor ([[graft.operators.Pipeline]]
    * `pipe_drift_report`; same old/new fixture discipline, `vec_id` keyed):
    * per label, the cosine between the snapshots' exact integer centroid
    * SUM vectors, in floored micro-units. Counts cancel in cosine, so the
    * [[graft.functions.VecSumLong]] sum over 2^20-quantized components IS
    * the centroid for cosine purposes — integer-exact accumulation under
    * any partitioning (the [[sim_topk_ivf_trained]] discipline), with the
    * final cosine one fixed-order double expression both engines evaluate
    * identically. This is the drift a re-embedded or re-crawled corpus
    * shows first: a label whose centroid swings while the token mix holds
    * means the ENCODER or the within-class content moved — the signal that
    * invalidates a trained ANN index and SemDeDup thresholds.
    *
    * Scale: two map-side-combined per-label aggregates over one quantized
    * projection each (the shuffle carries one dim-length BIGINT vector per
    * label per partition), then a label-count-sized join — nothing
    * corpus-scale past the scans.
    *
    * Zero-side behavior (pinned): a label with NO vectors in one snapshot
    * has no drift to report — the inner join drops it here, and the oracle
    * filters `n_old > 0 AND n_new > 0` to state the same rule (a FILTERed
    * aggregate would otherwise keep it with an all-zero centroid and a
    * divide-by-zero cosine). */
  def sim_drift_embedding(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select(col("vec_id"), col("label"),
      expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))")
        .as("qe"))
    def side(pred: String, tag: String): DataFrame = e.filter(expr(pred))
      .groupBy(col("label"))
      .agg(count(lit(1)).as(s"n_$tag"),
        graft.functions.VecSumLong.of(col("qe")).as(s"c_$tag"))
    side("vec_id % 19 != 0", "old").join(side("vec_id % 23 != 5", "new"), "label")
      .withColumn("cos", VecDot.dot(col("c_old"), col("c_new")) /
        sqrt(VecDot.norm2(col("c_old")) * VecDot.norm2(col("c_new"))))
      .select(col("label"), col("n_old"), col("n_new"),
        expr("CAST(floor(cos * 1000000) AS BIGINT)").as("cos_micro"))
  }

  /** Single-pass oracle: both snapshots' per-(label, component) sums come
    * out of ONE FILTER aggregate — one corpus pass instead of two.
    * lazy: QScale is declared further down the object; an eager val here
    * would interpolate its pre-initialization 0 into the SQL. */
  lazy val sim_drift_embedding_sql: String =
    s"""WITH dims AS (SELECT max(len(embedding)) AS d FROM embeddings),
      |idx AS (SELECT unnest(range(1, d + 1)) AS i FROM dims),
      |e AS (SELECT vec_id, label,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT)) AS qe
      |  FROM embeddings),
      |sums AS MATERIALIZED (SELECT label, idx.i,
      |    sum(qe[idx.i]) FILTER (WHERE vec_id % 19 <> 0) AS so,
      |    sum(qe[idx.i]) FILTER (WHERE vec_id % 23 <> 5) AS sn
      |  FROM e CROSS JOIN idx WHERE idx.i <= len(qe) GROUP BY label, idx.i),
      |c AS (SELECT label,
      |    list(CAST(coalesce(so, 0) AS BIGINT) ORDER BY i) AS c_old,
      |    list(CAST(coalesce(sn, 0) AS BIGINT) ORDER BY i) AS c_new
      |  FROM sums GROUP BY label),
      |n AS (SELECT label,
      |    count(*) FILTER (WHERE vec_id % 19 <> 0) AS n_old,
      |    count(*) FILTER (WHERE vec_id % 23 <> 5) AS n_new
      |  FROM e GROUP BY label)
      |SELECT label, n_old, n_new,
      |  CAST(floor(1000000 *
      |    list_sum(list_transform(range(1, len(c_old)+1), i ->
      |      CAST(c_old[i] AS DOUBLE) * CAST(c_new[i] AS DOUBLE)))
      |    / sqrt(list_sum(list_transform(c_old, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) *
      |           list_sum(list_transform(c_new, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |  ) AS BIGINT) AS cos_micro
      |FROM c JOIN n USING (label)
      |WHERE n_old > 0 AND n_new > 0""".stripMargin

  /** IVF with a TRAINED coarse quantizer: [[sim_topk_ivf]]'s training-free
    * quantizer (the K lowest-vec_id vectors) is the baseline; this entry runs
    * k-means-style Lloyd iterations so cells adapt to the data distribution —
    * the quality step real IVF indexes (FAISS-style) take.
    *
    * Determinism is the design problem: a float centroid MEAN depends on
    * summation order, which no distributed engine guarantees. The trick:
    * cosine is scale-invariant, so the centroid never needs dividing — each
    * component is quantized to an integer (`floor(x * 2^20)` as BIGINT) and
    * the cell centroid is the element-wise INTEGER SUM of its members'
    * quantized vectors. Long addition is exact and associative, so training
    * is bit-reproducible under any partitioning, and the DuckDB oracle
    * reruns the identical iterations (same init, same tie-breaks) to the
    * same bits.
    *
    * Scale shape per Lloyd iteration: centroids (≤ 4096 × dim longs, ~2 MB)
    * broadcast; assignment is the same `max_by` hash agg as the untrained
    * entry (no sort, one row per vector through the shuffle); the centroid
    * update is [[graft.functions.VecSumLong]] — map-side combined, so the
    * update shuffle carries one dim-length array per (cell × partition), NOT
    * N×dim exploded rows. Empty cells drop out (deterministically in both
    * engines). Total: `TrainIters + 1` linear passes, each the classic IVF
    * build cost. */
  private val QScale = 1048576L // 2^20: quantization keeps 20 fractional bits
  private val TrainIters = 2

  /** Shared k-means machinery: `(e, scored)` where `e` is the quantized
    * corpus (vec_id, embedding, n2, qv) and `scored` is every vector scored
    * against every TRAINED centroid (columns + cid, cscore) — the common
    * prefix of [[sim_topk_ivf_trained]] and [[Dedup.dedup_semantic]]. */
  private[operators] def trainedScored(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val k = numCells(Tables.embeddingsCount(s, dir))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"),
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))")
          .as("qv"))

    // score every vector against every centroid (cv: quantized-sum space)
    def assign(cent: DataFrame): DataFrame = e
      .crossJoin(broadcast(cent.withColumn("cn2", VecDot.norm2(col("cv")))))
      .withColumn("cscore", VecDot.dot(col("cv"), col("embedding")) / sqrt(col("n2") * col("cn2")))

    var cent = e.filter(col("vec_id") < k).select(col("vec_id").as("cid"), col("qv").as("cv"))
    for (_ <- 1 to TrainIters) {
      cent = assign(cent)
        .groupBy(col("vec_id"))
        .agg(max_by(struct(col("qv"), col("cid")), struct(col("cscore"), -col("cid"))).as("m"))
        .groupBy(col("m.cid").as("cid"))
        .agg(graft.functions.VecSumLong.of(col("m.qv")).as("cv"))
    }
    (e, assign(cent))
  }

  /** Trained-cell assignment (vec_id, embedding, n2, cid): each corpus
    * vector filed to its max-cosine trained centroid, ties to low cid. */
  private[operators] def trainedCells(s: SparkSession, dir: String): DataFrame =
    trainedScored(s, dir)._2
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("embedding"), col("n2"), col("cid")),
        struct(col("cscore"), -col("cid"))).as("m"))
      .select(col("vec_id"), col("m.embedding"), col("m.n2"), col("m.cid"))

  def sim_topk_ivf_trained(s: SparkSession, dir: String): DataFrame = {
    val (e, scored) = trainedScored(s, dir)
    val cells = scored
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("embedding"), col("n2"), col("cid")),
        struct(col("cscore"), -col("cid"))).as("m"))
      .select(col("vec_id"), col("m.embedding"), col("m.n2"), col("m.cid"))
    val probeCids = scored.filter(col("vec_id") < 50)
      .groupBy(col("vec_id"))
      .agg(slice(array_sort(collect_list(struct((-col("cscore")).as("neg"), col("cid").as("cid")))),
        1, NumProbes).as("top"))
      .select(col("vec_id"), explode(col("top.cid")).as("cid"))
    val probes = e.filter(col("vec_id") < 50).join(probeCids, "vec_id")
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("n2").as("qn2"), col("cid"))

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    cells.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  // One Lloyd iteration in DuckDB: assign (argmax cosine, ties to low cid)
  // then integer-sum centroid update. `idx` enumerates vector positions so
  // the element-wise sum is a plain (cid, i) GROUP BY; sum(BIGINT) widens to
  // HUGEINT in DuckDB, cast back (values are far under 2^63).
  private def lloydDuck(prev: String, next: String, aTbl: String): String =
    s"""s_$aTbl AS (SELECT e.vec_id, e.qv, cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
      |    / sqrt(e.n2 * list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) DESC,
      |    cid ASC) AS r
      |  FROM e CROSS JOIN $prev),
      |$next AS (SELECT cid, list(CAST(s AS BIGINT) ORDER BY i) AS cv FROM (
      |    SELECT cid, idx.i, sum(qv[idx.i]) AS s
      |    FROM s_$aTbl CROSS JOIN idx WHERE r = 1
      |    GROUP BY cid, idx.i) GROUP BY cid)""".stripMargin

  /** DuckDB twin of [[trainedScored]]/[[trainedCells]]: the CTE chain from
    * the cell-count constant through `sf` (every vector × trained centroid,
    * rank r by cosine) and `cells` (r = 1). Shared by the trained-IVF and
    * semantic-dedup oracles; spliced after a `WITH`. */
  private[operators] val trainedCellsDuck: String =
    s"""$cellsDuck,
      |dim AS (SELECT max(len(embedding)) AS d FROM embeddings),
      |idx AS (SELECT unnest(range(1, d + 1)) AS i FROM dim),
      |e AS (SELECT vec_id, embedding,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT)) AS qv,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
      |  FROM embeddings),
      |c0 AS (SELECT vec_id cid, qv cv FROM e, ncells WHERE vec_id < k),
      |${lloydDuck("c0", "c1", "i1")},
      |${lloydDuck("c1", "c2", "i2")},
      |sf AS (SELECT e.vec_id, e.embedding, e.n2, cid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
      |    / sqrt(e.n2 * list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) DESC,
      |    cid ASC) AS r
      |  FROM e CROSS JOIN c2),
      |cells AS (SELECT vec_id, embedding, n2, cid FROM sf WHERE r = 1)""".stripMargin

  val sim_topk_ivf_trained_sql: String =
    s"""WITH $trainedCellsDuck,
      |probes AS (SELECT vec_id qid, embedding qe, n2 qn2, cid
      |  FROM sf WHERE vec_id < 50 AND r <= $NumProbes),
      |s AS (SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY
      |      list_sum(list_transform(range(1, len(qe)+1), i ->
      |        CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE))) / sqrt(n2 * qn2) DESC,
      |      vec_id ASC) AS rank
      |  FROM probes JOIN cells USING (cid) WHERE vec_id != qid)
      |SELECT qid, vec_id AS neighbor_id, CAST(rank AS INT) AS rank
      |FROM s WHERE rank <= 3""".stripMargin

  /** IVF CELL-BALANCE audit — per trained cell: vector count, share of the
    * corpus, and multiple-of-uniform load, in integer micro-units (the
    * [[graft.operators.Relational]] q44 skew diagnosis applied to the ANN
    * index). Probe latency in IVF is governed by the FATTEST probed cells,
    * not the average: a quantizer that collapsed (one cell swallowing the
    * corpus) makes every probe a near-linear scan while recall numbers
    * still look fine — this is the audit that catches it before deploy.
    *
    * Scale: reuses the trained assignment ([[trainedCells]] — Lloyd rounds
    * with broadcast centroids + VecSumLong updates); the audit itself
    * aggregates to ≤K cell rows (checkpointed so the global total never
    * re-runs the trainer), then one broadcast single-row join.
    *
    * Overflow headroom: K bounds `n_cells`, so `10^6·n_vecs·n_cells` wraps
    * only past ~9.2·10^12/K vectors in one cell — but a collapsed quantizer
    * (the very pathology this audit exists to catch) concentrates `n_vecs`,
    * so the product runs in DECIMAL(38,0) like the q44 pattern and only
    * the integral-divide result (≤ 10^6·K) returns to BIGINT. */
  def sim_ivf_balance(s: SparkSession, dir: String): DataFrame = {
    val counts = trainedCells(s, dir)
      .groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
      .localCheckpoint(true) // ≤ K rows; one trainer run feeds both consumers
    val glob = counts.agg(sum(col("n_vecs")).as("total"), count(lit(1)).as("n_cells"))
    counts.crossJoin(broadcast(glob))
      .select(col("cid"), col("n_vecs"),
        expr("(1000000 * n_vecs) div total").as("share_micro"),
        expr("CAST(1000000 AS DECIMAL(38,0)) * n_vecs * n_cells div total")
          .as("xuniform_micro"))
  }

  val sim_ivf_balance_sql: String =
    s"""WITH $trainedCellsDuck,
       |c AS (SELECT cid, count(*) AS n_vecs FROM cells GROUP BY 1),
       |g AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS total, count(*) AS n_cells FROM c)
       |SELECT cid, n_vecs,
       |  (1000000 * n_vecs) // total AS share_micro,
       |  CAST((CAST(1000000 AS HUGEINT) * n_vecs * n_cells) // total AS BIGINT) AS xuniform_micro
       |FROM c CROSS JOIN g""".stripMargin

  /** Radius (range) similarity self-join: every pair of corpus vectors with
    * cosine above the threshold, blocked by the shared LSH bucketing —
    * candidates are pairs filing in the SAME bucket (no probe expansion:
    * a self-join explodes both sides, so the probe factor would multiply the
    * whole corpus), verified by exact cosine. The oracle mirrors the
    * blocking, so the gate checks the declared bucketed semantics exactly.
    *
    * Scale shape: a single shuffle of the corpus on bucket id, then
    * within-bucket pairing — work is Σ bucket² with bucket ≈ 64 held by the
    * adaptive bit count, i.e. linear in N with a constant pair factor, the
    * standard LSH near-dup-join layout. No broadcast, no global sort. */
  private val RangeTauPm = 300L // cosine threshold, per-mille (fixture cosines top out ~0.51)

  def sim_range(s: SparkSession, dir: String): DataFrame = {
    val nb = Lsh.numBits(Tables.embeddingsCount(s, dir), Lsh.maxBits(s))
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), Lsh.bucketCol(nb, col("embedding")).as("blk"),
        norm2C.as("n2"))
    val a = e.select(col("blk"), col("vec_id").as("qid"), col("embedding").as("qe"),
      col("n2").as("qn2"))
    e.join(a, Seq("blk"))
      .filter(col("qid") < col("vec_id"))
      .withColumn("cos", dotC / sqrt(col("n2") * col("qn2")))
      .filter(col("cos") * 1000 >= RangeTauPm)
      .select(col("qid").as("id_a"), col("vec_id").as("id_b"),
        floor(col("cos") * 1000).cast("long").as("cos_per_mille"))
  }

  val sim_range_sql: String =
    s"""WITH ${Lsh.paramsDuck},
      |e AS (SELECT vec_id, embedding,
      |    ${Lsh.bucketDuck} AS blk,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
      |  FROM embeddings, params),
      |p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |    list_sum(list_transform(range(1, len(a.embedding)+1), i ->
      |      CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))) / sqrt(b.n2 * a.n2) AS cos
      |  FROM e a JOIN e b ON a.blk = b.blk AND a.vec_id < b.vec_id)
      |SELECT id_a, id_b, CAST(floor(cos * 1000) AS BIGINT) AS cos_per_mille
      |FROM p WHERE cos * 1000 >= $RangeTauPm""".stripMargin

  /** Embedding-quality outlier detection — the CLIP-score-style filter step
    * of a training-data pipeline: for each label group, the K vectors least
    * aligned with the group's centroid (lowest cosine) are flagged. The
    * centroid is EXACT under any partitioning: cosine's scale invariance
    * means it never needs the float mean — it is the element-wise BIGINT sum
    * of the group's quantized (`floor(x·2^20)`) vectors via the map-side-
    * combined [[graft.functions.VecSumLong]] aggregate (the
    * [[sim_topk_ivf_trained]] trick), and the oracle rebuilds it to the bit.
    *
    * 100 TB posture: one linear pass builds ≤ #labels centroids (broadcast
    * back, ~dim longs each); scoring is a narrow map. The bottom-K rank is
    * TWO-PHASE so no task ever sorts a whole label group (labels are few and
    * huge — the exact skew `pipe_pack`/`q18` shard away): per (label,
    * vec_id-range shard) bottom-K first, then bottom-K of the ≤ K-per-shard
    * survivors. Results are identical to the single-window formulation,
    * which is what the oracle states. */
  private val OutlierK = 3
  private val OutlierShardSpan = 128L

  def sim_centroid_outlier(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding"), norm2C.as("n2"),
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))")
          .as("qv"))
    val cents = e.groupBy(col("label"))
      .agg(graft.functions.VecSumLong.of(col("qv")).as("cv"))
      .withColumn("cn2", VecDot.norm2(col("cv")))
    val scored = e.join(broadcast(cents), "label")
      .withColumn("cos", VecDot.dot(col("cv"), col("embedding")) / sqrt(col("n2") * col("cn2")))
      .withColumn("shard", expr(s"vec_id DIV $OutlierShardSpan"))
    val wLocal = Window.partitionBy(col("label"), col("shard"))
      .orderBy(col("cos").asc, col("vec_id").asc)
    val wGlobal = Window.partitionBy(col("label"))
      .orderBy(col("cos").asc, col("vec_id").asc)
    scored
      .withColumn("lr", row_number().over(wLocal)).filter(col("lr") <= OutlierK)
      .withColumn("orank", row_number().over(wGlobal)).filter(col("orank") <= OutlierK)
      .select(col("label"), col("vec_id"), col("orank"))
  }

  val sim_centroid_outlier_sql: String =
    s"""WITH dim AS (SELECT max(len(embedding)) AS d FROM embeddings),
      |idx AS (SELECT unnest(range(1, d + 1)) AS i FROM dim),
      |e AS (SELECT vec_id, label, embedding,
      |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT)) AS qv,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
      |  FROM embeddings),
      |cent AS (SELECT label, list(CAST(s AS BIGINT) ORDER BY i) AS cv FROM (
      |    SELECT label, idx.i, sum(qv[idx.i]) AS s
      |    FROM e CROSS JOIN idx GROUP BY label, idx.i) GROUP BY label),
      |scored AS (SELECT e.label, e.vec_id, row_number() OVER (PARTITION BY e.label ORDER BY
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))
      |    / sqrt(e.n2 * list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) ASC,
      |    e.vec_id ASC) AS orank
      |  FROM e JOIN cent USING (label))
      |SELECT label, vec_id, CAST(orank AS INT) AS orank FROM scored WHERE orank <= $OutlierK""".stripMargin

  /** INT8 embedding quantization — the memory lever that makes
    * billion-vector ANN fit an executor fleet: per-vector linear
    * quantization to 256 levels cuts a float32 corpus 4× (plus the two
    * float params per vector), and IVF/LSH probe phases scan the int8
    * codes. Pure narrow map — no shuffle, no state, scale-invariant.
    *
    * The gate outputs integer-exact summaries (code sum / min / max per
    * vector) rather than the raw codes, and the quantization uses
    * `floor(x + 0.5)` instead of `round` so both engines compute the
    * identical IEEE-double expression left-to-right — the same
    * integer-determinism discipline as the hash/rank gates. q_min/q_max
    * also pin the invariant that the vector's own extremes map to 0 and
    * 255 exactly. */
  def sim_quantize_int8(s: SparkSession, dir: String): DataFrame = {
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        expr("array_min(transform(embedding, x -> CAST(x AS DOUBLE)))").as("mn"),
        expr("array_max(transform(embedding, x -> CAST(x AS DOUBLE)))").as("mx"),
        col("embedding"))
      .select(col("vec_id"), expr(
        """transform(embedding, x -> CASE WHEN mx = mn THEN 0
          |  ELSE CAST(floor((CAST(x AS DOUBLE) - mn) * 255.0D / (mx - mn) + 0.5D) AS INT) END)
          |""".stripMargin).as("q"))
      .select(col("vec_id"),
        expr("aggregate(q, 0L, (a, x) -> a + x)").as("q_sum"),
        expr("array_min(q)").as("q_min"),
        expr("array_max(q)").as("q_max"))
  }

  val sim_quantize_int8_sql: String =
    """WITH b AS (SELECT vec_id, embedding,
      |    list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mn,
      |    list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS mx
      |  FROM embeddings),
      |q AS (SELECT vec_id, list_transform(embedding, x -> CASE WHEN mx = mn THEN 0
      |    ELSE CAST(floor((CAST(x AS DOUBLE) - mn) * 255.0 / (mx - mn) + 0.5) AS INT) END) AS ql
      |  FROM b)
      |SELECT vec_id, CAST(list_sum(ql) AS BIGINT) AS q_sum,
      |  list_min(ql) AS q_min, list_max(ql) AS q_max
      |FROM q""".stripMargin

  /** Product-quantization ANN (the FAISS `PQx4` shape): the embedding space
    * splits into [[PqM]] subspaces; each subspace learns [[PqK]] codewords by
    * the same integer-exact Lloyd machinery as [[sim_topk_ivf_trained]]
    * (cosine assignment is scale-invariant, so a codeword is the element-wise
    * BIGINT SUM of its members' 2^20-quantized subvectors — bit-reproducible
    * under any partitioning, and the DuckDB oracle re-trains to the same
    * bits). A vector's code is its [[PqM]] codeword ids — the 4-byte-per-
    * vector compression that makes 10^10-vector indexes executor-resident.
    *
    * Queries (vec_id < 50) score by ADC (asymmetric distance computation):
    * one lookup table of (query × subspace × codeword) partial cosines —
    * 50 × 4 × 16 rows, built once and broadcast — then a vector's score is
    * the FIXED-ORDER sum of its codes' four table entries (per-subspace
    * conditional sums added left-to-right, so the doubles are bit-identical
    * in both engines; a plain SUM over the m rows would be
    * summation-order-dependent).
    *
    * Scale shape: codes are one narrow row per (vector × subspace) through
    * two hash aggs per Lloyd pass (max_by assignment, VecSumLong update) —
    * no sort, no explosion; the ADC scan is linear in N like the code layout
    * itself (production composes PQ codes with IVF lists — `sim_topk_ivf` —
    * so a query scans ~N·probes/K codes, each M bytes). */
  private val PqM = 4
  private val PqK = 16
  private val PqIters = 2

  /** PQ DISTORTION audit — per (vector, subspace): the assigned codeword
    * and the cosine between the subvector and that codeword, i.e. the
    * fidelity the ADC scorer actually works with. The eval every PQ
    * deployment runs before trusting the code table (the PQ twin of
    * [[sim_recall_eval]] for the LSH path): a subspace whose fidelity
    * collapses needs more codewords or a different split. Per-row cosines
    * are each ONE mirrored expression over exact integer codewords
    * (`sqrt` is IEEE-correctly-rounded, so bit-identical across engines —
    * unlike `ln`/`exp`); no float is ever summed across rows.
    *
    * Scale: reuses the [[sim_topk_pq]] training plan (two Lloyd rounds,
    * broadcast codebooks, VecSumLong map-side update); the audit itself is
    * the final broadcast-join + per-row expression — one corpus pass. */
  def sim_pq_distortion(s: SparkSession, dir: String): DataFrame = {
    val (subs, code) = pqTrained(s, dir)
    pqAssign(subs, code)
      .groupBy(col("vec_id"), col("m"))
      .agg(max_by(struct(col("cid"), col("cscore")), struct(col("cscore"), -col("cid"))).as("a"))
      .select(col("vec_id"), col("m"), col("a.cid").as("cid"),
        col("a.cscore").as("fidelity"))
  }

  val sim_pq_distortion_sql: String =
    s"""WITH dims AS (SELECT max(len(embedding)) AS d,
      |    CAST(max(len(embedding)) // $PqM AS BIGINT) AS sd FROM embeddings),
      |idx AS (SELECT unnest(range(1, d + 1)) AS i FROM dims),
      |ms AS (SELECT unnest(range(0, $PqM)) AS m),
      |sq AS (SELECT vec_id, m,
      |    embedding[(m*sd+1):(CASE WHEN m = $PqM - 1 THEN d ELSE (m+1)*sd END)] AS sv,
      |    list_transform(embedding[(m*sd+1):(CASE WHEN m = $PqM - 1 THEN d ELSE (m+1)*sd END)],
      |      x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT)) AS qsv,
      |    list_sum(list_transform(embedding[(m*sd+1):(CASE WHEN m = $PqM - 1 THEN d ELSE (m+1)*sd END)],
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sn2
      |  FROM embeddings CROSS JOIN ms CROSS JOIN dims),
      |c0 AS (SELECT m, vec_id AS cid, qsv AS cv FROM sq WHERE vec_id < $PqK),
      |${pqLloydDuck("c0", "c1", "i1")},
      |${pqLloydDuck("c1", "c2", "i2")},
      |s_f AS (SELECT sq.vec_id, sq.m, cid,
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(sq.sv[i] AS DOUBLE)))
      |    / sqrt(sq.sn2 * list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS cscore,
      |    row_number() OVER (PARTITION BY sq.vec_id, sq.m ORDER BY
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(sq.sv[i] AS DOUBLE)))
      |    / sqrt(sq.sn2 * list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) DESC,
      |    cid ASC) AS r
      |  FROM sq JOIN c2 USING (m))
      |SELECT vec_id, CAST(m AS INT) AS m, cid, cscore AS fidelity
      |FROM s_f WHERE r = 1""".stripMargin

  /** Per-subspace cosine of every (subvector, codeword) pair — the scoring
    * join shared by the Lloyd update, the final assignment, and the
    * distortion audit. */
  private def pqAssign(subs: DataFrame, codebook: DataFrame): DataFrame = subs
    .join(broadcast(codebook.withColumn("cn2", VecDot.norm2(col("cv")))), Seq("m"))
    .withColumn("cscore", VecDot.dot(col("cv"), col("sv")) / sqrt(col("sn2") * col("cn2")))

  /** The PQ training pipeline shared by [[sim_topk_pq]] and
    * [[sim_pq_distortion]]: subvector table + the codebook after
    * [[PqIters]] Lloyd rounds. */
  private def pqTrained(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val dim = Tables.embeddingsDim(s, dir)
    val sd = dim / PqM
    // subspace m covers [m*sd+1, ...]; the last takes any remainder
    def sliceLen(m: Int): Int = if (m == PqM - 1) dim - (PqM - 1) * sd else sd
    val slices = (0 until PqM)
      .map(m => s"slice(embedding, ${m * sd + 1}, ${sliceLen(m)})")
      .mkString("array(", ", ", ")")
    val subs = Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(expr(slices)).as(Seq("m", "sv")))
      .withColumn("qsv",
        expr(s"transform(sv, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))"))
      .withColumn("sn2", VecDot.norm2(col("sv")))
    var code = subs.filter(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").as("cid"), col("qsv").as("cv"))
    for (_ <- 1 to PqIters) {
      code = pqAssign(subs, code)
        .groupBy(col("vec_id"), col("m"))
        .agg(max_by(struct(col("qsv"), col("cid")), struct(col("cscore"), -col("cid"))).as("a"))
        .groupBy(col("m"), col("a.cid").as("cid"))
        .agg(graft.functions.VecSumLong.of(col("a.qsv")).as("cv"))
    }
    (subs, code)
  }

  def sim_topk_pq(s: SparkSession, dir: String): DataFrame = {
    val (subs, code) = pqTrained(s, dir)

    val assigned = pqAssign(subs, code)
      .groupBy(col("vec_id"), col("m"))
      .agg(max_by(col("cid"), struct(col("cscore"), -col("cid"))).as("cid"))
    // ADC lookup table: partial cosine of each query subvector against each
    // UNIT-NORMALIZED codeword (codewords are unnormalized integer sums, so
    // cross-subspace weights need the per-codeword length divided out)
    val tbl = subs.filter(col("vec_id") < 50)
      .join(broadcast(code.withColumn("cl", sqrt(VecDot.norm2(col("cv"))))), Seq("m"))
      .select(col("vec_id").as("qid"), col("m"), col("cid"),
        (VecDot.dot(col("cv"), col("sv")) / col("cl")).as("t"))

    def tm(m: Int) = sum(when(col("m") === m, col("t"))).as(s"t$m")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)
    assigned.join(broadcast(tbl), Seq("m", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(tm(0), tm(1), tm(2), tm(3))
      .withColumn("score", col("t0") + col("t1") + col("t2") + col("t3"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  // One per-subspace Lloyd iteration in DuckDB (the [[lloydDuck]] pattern
  // with an extra `m` grouping column); `idx` is guarded by the subvector
  // length so a non-uniform last subspace sums only its own positions.
  private def pqLloydDuck(prev: String, next: String, aTbl: String): String =
    s"""s_$aTbl AS (SELECT sq.vec_id, sq.m, sq.qsv, cid, row_number() OVER (PARTITION BY sq.vec_id, sq.m ORDER BY
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(sq.sv[i] AS DOUBLE)))
      |    / sqrt(sq.sn2 * list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) DESC,
      |    cid ASC) AS r
      |  FROM sq JOIN $prev USING (m)),
      |$next AS (SELECT m, cid, list(CAST(s AS BIGINT) ORDER BY i) AS cv FROM (
      |    SELECT m, cid, idx.i, sum(qsv[idx.i]) AS s
      |    FROM s_$aTbl CROSS JOIN idx WHERE r = 1 AND idx.i <= len(qsv)
      |    GROUP BY m, cid, idx.i) GROUP BY m, cid)""".stripMargin

  val sim_topk_pq_sql: String =
    s"""WITH dims AS (SELECT max(len(embedding)) AS d,
      |    CAST(max(len(embedding)) // $PqM AS BIGINT) AS sd FROM embeddings),
      |idx AS (SELECT unnest(range(1, d + 1)) AS i FROM dims),
      |ms AS (SELECT unnest(range(0, $PqM)) AS m),
      |sq AS (SELECT vec_id, m,
      |    embedding[(m*sd+1):(CASE WHEN m = $PqM - 1 THEN d ELSE (m+1)*sd END)] AS sv,
      |    list_transform(embedding[(m*sd+1):(CASE WHEN m = $PqM - 1 THEN d ELSE (m+1)*sd END)],
      |      x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT)) AS qsv,
      |    list_sum(list_transform(embedding[(m*sd+1):(CASE WHEN m = $PqM - 1 THEN d ELSE (m+1)*sd END)],
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sn2
      |  FROM embeddings CROSS JOIN ms CROSS JOIN dims),
      |c0 AS (SELECT m, vec_id AS cid, qsv AS cv FROM sq WHERE vec_id < $PqK),
      |${pqLloydDuck("c0", "c1", "i1")},
      |${pqLloydDuck("c1", "c2", "i2")},
      |s_f AS (SELECT sq.vec_id, sq.m, cid, row_number() OVER (PARTITION BY sq.vec_id, sq.m ORDER BY
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(sq.sv[i] AS DOUBLE)))
      |    / sqrt(sq.sn2 * list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) DESC,
      |    cid ASC) AS r
      |  FROM sq JOIN c2 USING (m)),
      |assigned AS (SELECT vec_id, m, cid FROM s_f WHERE r = 1),
      |tbl AS (SELECT sq.vec_id AS qid, c2.m AS m, c2.cid AS cid,
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(sq.sv[i] AS DOUBLE)))
      |    / sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS t
      |  FROM sq JOIN c2 ON sq.m = c2.m WHERE sq.vec_id < 50),
      |p AS (SELECT qid, a.vec_id,
      |    sum(CASE WHEN a.m = 0 THEN t END) AS t0, sum(CASE WHEN a.m = 1 THEN t END) AS t1,
      |    sum(CASE WHEN a.m = 2 THEN t END) AS t2, sum(CASE WHEN a.m = 3 THEN t END) AS t3
      |  FROM assigned a JOIN tbl ON a.m = tbl.m AND a.cid = tbl.cid
      |  WHERE a.vec_id != qid
      |  GROUP BY qid, a.vec_id),
      |s AS (SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY (((t0 + t1) + t2) + t3) DESC, vec_id ASC) AS rank
      |  FROM p)
      |SELECT qid, vec_id AS neighbor_id, CAST(rank AS INT) AS rank
      |FROM s WHERE rank <= 3""".stripMargin

  /** IVF×PQ — the production composition SCALE.md describes: the coarse
    * quantizer ([[sim_topk_ivf]]'s training-free K-cell version) prunes the
    * corpus to a query's probed cells, and PQ codes ([[sim_topk_pq]]'s
    * per-subspace integer-exact codebooks) score ONLY those candidates by
    * ADC lookup. Per query the scan drops from N code rows to
    * ~N·probes/K, each M bytes — the FAISS `IVFx,PQy` index shape.
    *
    * Plan shape: cell assignment and PQ coding are the siblings' linear
    * passes (hash aggs, no sorts); the candidate set is
    * cells ⋈ broadcast(probes) — one row per candidate through the scoring
    * agg, never the whole corpus per query. */
  /** Query-side subvector table: the per-subspace slices of a given
    * (vec_id, embedding) query set — shared by the in-session,
    * loaded-index, and streaming-serve IVF×PQ searches. */
  private[graft] def subvectorsOf(q: DataFrame, dim: Int): DataFrame = {
    val sd = dim / PqM
    def sliceLen(m: Int): Int = if (m == PqM - 1) dim - (PqM - 1) * sd else sd
    val slices = (0 until PqM)
      .map(m => s"slice(embedding, ${m * sd + 1}, ${sliceLen(m)})")
      .mkString("array(", ", ", ")")
    q.select(col("vec_id"), posexplode(expr(slices)).as(Seq("m", "sv")))
  }

  /** The IVF×PQ index BUILD — the trainer stages, shared by
    * [[sim_topk_ivfpq]] (in-session index) and [[sim_index_persist]]
    * (index written to parquet once and searched loaded):
    * `(cent, cellOf, code, assigned)` = coarse quantizer (training-free
    * K-cell, as [[sim_topk_ivf]]), per-vector coarse assignment, trained
    * per-subspace PQ codebooks ([[PqIters]] integer-exact Lloyd rounds, as
    * [[sim_topk_pq]]), and per-vector PQ codes. Everything downstream of
    * these four tables is pure search. */
  private def ivfpqIndex(s: SparkSession, dir: String):
      (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val k = numCells(Tables.embeddingsCount(s, dir))
    val dim = Tables.embeddingsDim(s, dir)
    val sd = dim / PqM
    def sliceLen(m: Int): Int = if (m == PqM - 1) dim - (PqM - 1) * sd else sd
    val slices = (0 until PqM)
      .map(m => s"slice(embedding, ${m * sd + 1}, ${sliceLen(m)})")
      .mkString("array(", ", ", ")")
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"), norm2C.as("n2"))

    // ---- coarse cells (training-free quantizer, as sim_topk_ivf)
    val cent = e.filter(col("vec_id") < k)
      .select(col("vec_id").as("ccid"), col("embedding").as("qe"), col("n2").as("cn2"))
    val cellOf = e.crossJoin(broadcast(cent))
      .withColumn("cscore", dotC / sqrt(col("n2") * col("cn2")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("ccid"), struct(col("cscore"), -col("ccid"))).as("cell"))

    // ---- PQ codebooks + codes (as sim_topk_pq)
    val subs = Tables.embeddings(s, dir)
      .select(col("vec_id"), posexplode(expr(slices)).as(Seq("m", "sv")))
      .withColumn("qsv",
        expr(s"transform(sv, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))"))
      .withColumn("sn2", VecDot.norm2(col("sv")))
    def assign(codebook: DataFrame): DataFrame = subs
      .join(broadcast(codebook.withColumn("cn2", VecDot.norm2(col("cv")))), Seq("m"))
      .withColumn("cscore", VecDot.dot(col("cv"), col("sv")) / sqrt(col("sn2") * col("cn2")))
    var code = subs.filter(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").as("cid"), col("qsv").as("cv"))
    for (_ <- 1 to PqIters) {
      code = assign(code)
        .groupBy(col("vec_id"), col("m"))
        .agg(max_by(struct(col("qsv"), col("cid")), struct(col("cscore"), -col("cid"))).as("a"))
        .groupBy(col("m"), col("a.cid").as("cid"))
        .agg(graft.functions.VecSumLong.of(col("a.qsv")).as("cv"))
    }
    val assigned = assign(code)
      .groupBy(col("vec_id"), col("m"))
      .agg(max_by(col("cid"), struct(col("cscore"), -col("cid"))).as("cid"))
    (cent, cellOf, code, assigned)
  }

  /** The IVF×PQ SEARCH over an index given as four tables (in-session
    * DataFrames or parquet-loaded — same plan either way): probe the top
    * [[NumProbes]] coarse cells per query, ADC-score only the vectors filed
    * there. */
  private def ivfpqSearch(s: SparkSession, dir: String, cent: DataFrame,
      cellOf: DataFrame, code: DataFrame, assigned: DataFrame): DataFrame =
    ivfpqSearchFor(Tables.embeddings(s, dir).filter(col("vec_id") < 50),
      Tables.embeddingsDim(s, dir), cent, cellOf, code, assigned)

  /** The same search for an ARBITRARY query set (vec_id, embedding) —
    * the entry the streaming serve path calls per micro-batch. Per-query
    * results are independent, so any partition of the query set unions to
    * the whole answer (the incremental ≡ batch property the serve gate
    * leans on). */
  private[graft] def ivfpqSearchFor(queries: DataFrame, dim: Int, cent: DataFrame,
      cellOf: DataFrame, code: DataFrame, assigned: DataFrame): DataFrame = {
    val q = queries.select(col("vec_id"), col("embedding"), norm2C.as("n2"))
    val probeCells = q.crossJoin(broadcast(cent))
      .withColumn("cscore", dotC / sqrt(col("n2") * col("cn2")))
      .groupBy(col("vec_id"))
      .agg(slice(array_sort(collect_list(struct((-col("cscore")).as("neg"), col("ccid").as("ccid")))),
        1, NumProbes).as("top"))
      .select(col("vec_id").as("qid"), explode(col("top.ccid")).as("cell"))
    val tbl = subvectorsOf(queries, dim)
      .join(broadcast(code.withColumn("cl", sqrt(VecDot.norm2(col("cv"))))), Seq("m"))
      .select(col("vec_id").as("qid"), col("m"), col("cid"),
        (VecDot.dot(col("cv"), col("sv")) / col("cl")).as("t"))

    // ---- candidates = vectors filed in a probed cell; ADC-score them only
    val cand = cellOf.join(broadcast(probeCells), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"))
    def tm(m: Int) = sum(when(col("m") === m, col("t"))).as(s"t$m")
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("vec_id").asc)
    cand.join(assigned, Seq("vec_id"))
      .join(broadcast(tbl), Seq("qid", "m", "cid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(tm(0), tm(1), tm(2), tm(3))
      .withColumn("score", col("t0") + col("t1") + col("t2") + col("t3"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  def sim_topk_ivfpq(s: SparkSession, dir: String): DataFrame = {
    val (cent, cellOf, code, assigned) = ivfpqIndex(s, dir)
    ivfpqSearch(s, dir, cent, cellOf, code, assigned)
  }

  /** FILE new vectors into an existing IVF×PQ index — the INSERT path of
    * the index lifecycle (train once → persist → serve → ingest): each
    * vector is coarse-assigned to its nearest loaded centroid and PQ-coded
    * against the loaded codebooks, with the EXACT tie-break discipline of
    * the trainer's own final assignment pass, so rows filed incrementally
    * are bit-identical to rows the one-shot build would produce. No
    * retraining anywhere — centroids and codebooks are read-only inputs.
    * Per-vector work is independent of every other vector (one broadcast
    * of k centroids + PqM·PqK codewords), so any partition of the arrival
    * stream unions to the batch answer — the incremental≡batch property
    * the streaming gate pins. Output: the index rows to append, one
    * (cell, code) per (vector, subspace). */
  private[graft] def ivfpqFileFor(vectors: DataFrame, dim: Int,
      cent: DataFrame, code: DataFrame): DataFrame = {
    val e = vectors.select(col("vec_id"), col("embedding"), norm2C.as("n2"))
    val cellOf = e.crossJoin(broadcast(cent))
      .withColumn("cscore", dotC / sqrt(col("n2") * col("cn2")))
      .groupBy(col("vec_id"))
      .agg(max_by(col("ccid"), struct(col("cscore"), -col("ccid"))).as("cell"))
    val subs = subvectorsOf(vectors, dim)
      .withColumn("sn2", VecDot.norm2(col("sv")))
    val filed = subs
      .join(broadcast(code.withColumn("cn2", VecDot.norm2(col("cv")))), Seq("m"))
      .withColumn("cscore",
        VecDot.dot(col("cv"), col("sv")) / sqrt(col("sn2") * col("cn2")))
      .groupBy(col("vec_id"), col("m"))
      .agg(max_by(col("cid"), struct(col("cscore"), -col("cid"))).as("cid"))
    cellOf.join(filed, Seq("vec_id"))
      .select(col("vec_id"), col("cell"), col("m"), col("cid"))
  }

  /** PERSISTED-INDEX search — the production deployment shape a 100 TB ANN
    * corpus actually runs: the IVF×PQ index is trained ONCE, written as
    * DATA (four parquet tables: `centroids` = the coarse quantizer,
    * `cells` = per-vector coarse assignment, `codebook` = the PQ codewords,
    * `codes` = per-vector PQ codes — the FAISS `IVFx,PQy` artifact
    * re-expressed as a lake layout), and every search session REOPENS the
    * layout and runs [[ivfpqSearch]] against the loaded tables with ZERO
    * trainer stages in its plan (pinned in `PlanShapeSuite`: no
    * `vec_sum_long` Lloyd update anywhere in the executed search plan, and
    * the only corpus scans are the `vec_id < 50` query rows, filter pushed
    * to parquet). Training is integer-exact and deterministic
    * ([[sim_topk_ivf_trained]]'s discipline), so the written index — and
    * therefore the loaded search — equals the in-session [[sim_topk_ivfpq]]
    * bit-for-bit: the oracle is the same SQL.
    *
    * Scale: the index build is the documented train-once cost; the layout
    * is O(N) rows of (id, cell) + (id, m, code) — 5 small ints per vector
    * against 256 floats of raw embedding (the 50× compression PQ exists
    * for) — and search I/O is the probed cells' code rows only. The lake
    * path is `spark.graft.index.root` (a durable URI: the layout lands
    * under `<root>/ivfpq-<corpus>` and is REUSED if already present —
    * train once per corpus, across sessions and JVMs); unset, a
    * session-lifetime staging dir stands in. A config change, not a plan
    * change. */
  private val ivfpqIndexDirMemo = new graft.Memo[String]

  /** Session conf naming the durable root for persisted index/vocabulary
    * layouts ([[persistedIvfpqIndex]], `TextAnalysis.persistedBpeMerges`). */
  val IndexRootConf = "spark.graft.index.root"

  /** Stable per-corpus layout name under a durable root. The readable
    * sanitized path gets a short digest suffix so distinct dirs that
    * sanitize identically ("/data/a/b" vs "/data/a_b") can never collide
    * onto one layout and silently serve the wrong trained index. */
  private[graft] def corpusSlug(dir: String): String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_").dropWhile(_ == '_')
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"$safe-$md"
  }

  /** Atomic publish for a multi-table layout under a shared durable root:
    * build into a sibling temp dir, then `rename` into place — on a real
    * FS rename is atomic, so a reader either sees no layout (and builds
    * its own) or a COMPLETE one, never a half-overwritten mix. If the
    * destination already exists (a racer won, or a crashed non-atomic
    * publish left a partial), the temp build is discarded and the existing
    * layout is either used (marker present) or rejected loudly (marker
    * absent) — never silently merged into.
    *
    * Hadoop `FileSystem.rename(src, dest)` with an EXISTING dest directory
    * moves src INSIDE dest and returns true (HDFS and RawLocalFileSystem
    * alike), so the return value alone cannot detect a lost race: we check
    * dest up front, and after a "successful" rename we still verify the
    * done marker and sweep any nested tmp junk before trusting the layout. */
  private[graft] def publishLayout(
      s: SparkSession, p: String, doneMarker: String)(build: String => Unit): String = {
    val dest = new org.apache.hadoop.fs.Path(p)
    val fs = dest.getFileSystem(s.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(s"$p/$doneMarker")
    def requireComplete(): Unit =
      require(fs.exists(marker),
        s"persisted layout $p exists but is incomplete (no $doneMarker) — " +
          "remove it and retrain")
    if (!fs.exists(marker)) {
      // A NON-empty marker-less dest can never become the publish target
      // (rename into an existing dir nests, not replaces) — decide the
      // stale-partial refusal BEFORE paying the build, which at corpus
      // scale is hours. requireComplete re-checks the marker, so a racer
      // finishing between the two exists() calls passes instead of
      // throwing; the post-rename sweep below still covers the true
      // mid-build race.
      // a listStatus failure means the dir vanished between the two calls
      // (concurrent cleanup) — that is the EMPTY case, not the stale-
      // partial case; defaulting to "non-empty" would refuse a build over
      // a directory that no longer exists
      if (fs.exists(dest) &&
        !scala.util.Try(fs.listStatus(dest).isEmpty).getOrElse(true)) {
        requireComplete()
        return p
      }
      val tmp = new org.apache.hadoop.fs.Path(
        p + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      build(tmp.toString)
      // staging callers hand us a freshly-created EMPTY dir as dest
      // (Staging.tempDir pre-creates it); replacing it is lossless, so
      // clear it out of the rename's way. A NON-empty marker-less dest
      // stays put — that's the loud-failure case below, never a merge
      // target (Hadoop rename into an existing dir would nest, not
      // replace).
      if (fs.exists(dest) &&
        scala.util.Try(fs.listStatus(dest).isEmpty).getOrElse(false)) {
        fs.delete(dest, true)
      }
      if (fs.exists(dest) || !fs.rename(tmp, dest)) {
        // dest pre-existed (racer or stale partial) or the rename failed:
        // discard our build, then insist the surviving layout is complete
        fs.delete(tmp, true)
        requireComplete()
      } else {
        // rename returned true — but if a racer created dest between the
        // exists check and the rename, our tmp landed NESTED inside it.
        // Sweep the junk, then judge dest by its own marker.
        val nested = new org.apache.hadoop.fs.Path(dest, tmp.getName)
        if (fs.exists(nested)) fs.delete(nested, true)
        requireComplete()
      }
    }
    p
  }

  /** Build the four index tables at `p` unless a complete layout is
    * already there (`codes/_SUCCESS` — codes is written last, so its
    * marker implies the other three): the cross-JVM train-once path,
    * published atomically via [[publishLayout]]. */
  private[graft] def ensureIvfpqLayout(s: SparkSession, dir: String, p: String): String =
    publishLayout(s, p, "codes/_SUCCESS") { tmp =>
      val (cent, cellOf, code, assigned) = ivfpqIndex(s, dir)
      cent.write.mode("overwrite").parquet(s"$tmp/centroids")
      cellOf.write.mode("overwrite").parquet(s"$tmp/cells")
      code.write.mode("overwrite").parquet(s"$tmp/codebook")
      assigned.write.mode("overwrite").parquet(s"$tmp/codes")
    }

  /** Train-once, ship-as-data: the persisted IVF×PQ index layout's root
    * path (built on first call per (root, fixture dir), reused after —
    * and across JVMs when [[IndexRootConf]] points at a durable root) —
    * shared by the batch loaded-index search and the streaming serve
    * path. */
  private[graft] def persistedIvfpqIndex(s: SparkSession, dir: String): String = {
    val root = s.conf.getOption(IndexRootConf).map(_.trim).filter(_.nonEmpty)
    ivfpqIndexDirMemo.getOrStage(root.getOrElse("<staging>") + "|" + dir) {
      val p = root match {
        case Some(r) => s"$r/ivfpq-${corpusSlug(dir)}"
        case None => graft.Staging.tempDir("graft-ivfpq-index-").toString
      }
      ensureIvfpqLayout(s, dir, p)
    }
  }

  def sim_index_persist(s: SparkSession, dir: String): DataFrame = {
    val idx = persistedIvfpqIndex(s, dir)
    ivfpqSearch(s, dir,
      s.read.parquet(s"$idx/centroids"),
      s.read.parquet(s"$idx/cells"),
      s.read.parquet(s"$idx/codebook"),
      s.read.parquet(s"$idx/codes"))
  }

  /** Same result as the in-session build by construction (deterministic
    * integer-exact training) — the oracle is shared. */
  lazy val sim_index_persist_sql: String = sim_topk_ivfpq_sql

  /** The IVF×PQ index BUILD as DuckDB CTEs — everything up to the filed
    * index tables `cellof` (coarse assignment) and `assigned` (PQ codes),
    * with `cscored`/`c2` exposed for the search suffix. Shared by the
    * in-session search oracle, the persisted-index oracle, and the
    * streaming index-update oracle. */
  private[graft] lazy val ivfpqIndexCtesDuck: String =
    s"""$cellsDuck,
      |dims AS (SELECT max(len(embedding)) AS d,
      |    CAST(max(len(embedding)) // $PqM AS BIGINT) AS sd FROM embeddings),
      |idx AS (SELECT unnest(range(1, d + 1)) AS i FROM dims),
      |ms AS (SELECT unnest(range(0, $PqM)) AS m),
      |e AS (SELECT vec_id, embedding,
      |    list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS n2
      |  FROM embeddings),
      |cent AS (SELECT vec_id ccid, embedding ce, n2 cn2 FROM e, ncells WHERE vec_id < k),
      |cscored AS (SELECT e.vec_id, ccid, row_number() OVER (PARTITION BY e.vec_id ORDER BY
      |    list_sum(list_transform(range(1, len(ce)+1), i ->
      |      CAST(ce[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))) / sqrt(e.n2 * cn2) DESC,
      |    ccid ASC) AS crank
      |  FROM e CROSS JOIN cent),
      |cellof AS (SELECT vec_id, ccid AS cell FROM cscored WHERE crank = 1),
      |sq AS (SELECT vec_id, m,
      |    embedding[(m*sd+1):(CASE WHEN m = $PqM - 1 THEN d ELSE (m+1)*sd END)] AS sv,
      |    list_transform(embedding[(m*sd+1):(CASE WHEN m = $PqM - 1 THEN d ELSE (m+1)*sd END)],
      |      x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT)) AS qsv,
      |    list_sum(list_transform(embedding[(m*sd+1):(CASE WHEN m = $PqM - 1 THEN d ELSE (m+1)*sd END)],
      |      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sn2
      |  FROM embeddings CROSS JOIN ms CROSS JOIN dims),
      |c0 AS (SELECT m, vec_id AS cid, qsv AS cv FROM sq WHERE vec_id < $PqK),
      |${pqLloydDuck("c0", "c1", "i1")},
      |${pqLloydDuck("c1", "c2", "i2")},
      |s_f AS (SELECT sq.vec_id, sq.m, cid, row_number() OVER (PARTITION BY sq.vec_id, sq.m ORDER BY
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(sq.sv[i] AS DOUBLE)))
      |    / sqrt(sq.sn2 * list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) DESC,
      |    cid ASC) AS r
      |  FROM sq JOIN c2 USING (m)),
      |assigned AS (SELECT vec_id, m, cid FROM s_f WHERE r = 1)""".stripMargin

  /** The IVF×PQ search as SQL with an optional extra CANDIDATE filter —
    * "" is the plain search; the delete-path gates pass the tombstone
    * predicate (candidates removed, query set untouched). */
  private def ivfpqSearchSqlWhere(candFilter: String): String =
    ivfpqSearchSqlFor("vec_id < 50", candFilter)

  /** [[ivfpqSearchSqlWhere]] generalized to an arbitrary query-set
    * predicate — the DuckDB mirror of [[ivfpqSearchFor]]. */
  private def ivfpqSearchSqlFor(queryPred: String, candFilter: String): String =
    s"""WITH $ivfpqIndexCtesDuck,
      |probes AS (SELECT vec_id AS qid, ccid AS cell FROM cscored
      |  WHERE ($queryPred) AND crank <= $NumProbes),
      |tbl AS (SELECT sq.vec_id AS qid, c2.m AS m, c2.cid AS cid,
      |    list_sum(list_transform(range(1, len(cv)+1), i ->
      |      CAST(cv[i] AS DOUBLE) * CAST(sq.sv[i] AS DOUBLE)))
      |    / sqrt(list_sum(list_transform(cv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS t
      |  FROM sq JOIN c2 ON sq.m = c2.m WHERE ($queryPred)),
      |cand AS (SELECT probes.qid, cellof.vec_id
      |  FROM cellof JOIN probes ON cellof.cell = probes.cell
      |  WHERE cellof.vec_id != probes.qid$candFilter),
      |p AS (SELECT cand.qid, cand.vec_id,
      |    sum(CASE WHEN a.m = 0 THEN t END) AS t0, sum(CASE WHEN a.m = 1 THEN t END) AS t1,
      |    sum(CASE WHEN a.m = 2 THEN t END) AS t2, sum(CASE WHEN a.m = 3 THEN t END) AS t3
      |  FROM cand JOIN assigned a ON cand.vec_id = a.vec_id
      |  JOIN tbl ON tbl.qid = cand.qid AND tbl.m = a.m AND tbl.cid = a.cid
      |  GROUP BY cand.qid, cand.vec_id),
      |s AS (SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY (((t0 + t1) + t2) + t3) DESC, vec_id ASC) AS rank
      |  FROM p)
      |SELECT qid, vec_id AS neighbor_id, CAST(rank AS INT) AS rank
      |FROM s WHERE rank <= 3""".stripMargin

  lazy val sim_topk_ivfpq_sql: String = ivfpqSearchSqlWhere("")

  /** The tombstone rule both delete-path gates share: deterministic,
    * SF-proportional, and guaranteed to hit probed cells. */
  private[graft] val TombstonePred = "vec_id % 17 = 3"

  /** DELETE + COMPACT on the persisted index — the third verb of the
    * lifecycle (train once → serve ([[sim_index_persist]]) → insert
    * (`stream_index_update`) → DELETE): vectors matching the tombstone
    * rule are removed by REWRITING the two per-vector tables (`cells`,
    * `codes`) without them — centroids and codebooks are untouched (no
    * retraining; a quantizer does not depend on membership) — and the
    * search then runs against the compacted layout. The oracle is the
    * plain IVF×PQ search with the tombstone predicate applied to the
    * candidate set: compaction must remove EXACTLY the tombstoned
    * vectors' index rows and nothing else, or ranks shift and the hash
    * fails.
    *
    * Scale: compaction cost is a filtered rewrite of O(N) small-int rows
    * (5 ints/vector — the 50×-compressed representation, NOT the raw
    * embeddings), embarrassingly parallel, zero shuffles; the FAISS
    * `remove_ids` + repack operation as a lake-table rewrite. */
  def sim_index_compact(s: SparkSession, dir: String): DataFrame = {
    val idx = persistedIvfpqIndex(s, dir)
    val keep = expr(s"NOT ($TombstonePred)")
    val p = graft.Staging.tempDir("graft-ivfpq-compact-").toString
    s.read.parquet(s"$idx/cells").filter(keep).write.parquet(s"$p/cells")
    s.read.parquet(s"$idx/codes").filter(keep).write.parquet(s"$p/codes")
    ivfpqSearchFor(Tables.embeddings(s, dir).filter(col("vec_id") < 50),
      Tables.embeddingsDim(s, dir),
      s.read.parquet(s"$idx/centroids"),
      s.read.parquet(s"$p/cells"),
      s.read.parquet(s"$idx/codebook"),
      s.read.parquet(s"$p/codes"))
  }

  lazy val sim_index_compact_sql: String =
    ivfpqSearchSqlWhere(s" AND NOT (cellof.$TombstonePred)")

  private val mergedIndexDirMemo = new graft.Memo[String]

  /** MERGE two independently built index shards into one served layout —
    * how a 100 TB ANN index is actually constructed: no single job files
    * the whole corpus; the quantizer (coarse centroids + PQ codebooks) is
    * trained ONCE on a sample and SHARED, each shard files only its own
    * vectors against the read-only artifacts ([[ivfpqFileFor]], the exact
    * tie-break discipline of the trainer's final assignment pass), and the
    * merge is pure table concatenation: the per-vector `cells`/`codes`
    * tables are disjoint-keyed unions, the shared `centroids`/`codebook`
    * carry over verbatim. Because filing is bit-identical to the one-shot
    * build's own assignment (the insert path's proven property,
    * `stream_index_update`), the merged layout EQUALS the one-shot layout
    * on the union row-for-row — the oracle is the same SQL.
    *
    * Scale: each shard build touches only its partition of the corpus
    * (embarrassingly parallel across build jobs — here two halves by
    * `vec_id % 2`, standing in for per-datacenter or per-day builds), and
    * the merge shuffles nothing: union + write, no re-assignment, no
    * trainer stage anywhere after the shared sample training. All three
    * layouts publish atomically under the index root ([[publishLayout]]),
    * so concurrent builders/readers see complete layouts or none. */
  private[graft] def mergedIvfpqIndex(s: SparkSession, dir: String): String = {
    val base = persistedIvfpqIndex(s, dir) // the SHARED trained artifacts
    val root = s.conf.getOption(IndexRootConf).map(_.trim).filter(_.nonEmpty)
    mergedIndexDirMemo.getOrStage(root.getOrElse("<staging>") + "|" + dir) {
      val dim = Tables.embeddingsDim(s, dir)
      def layoutPath(suffix: String): String = root match {
        case Some(r) => s"$r/ivfpq-${corpusSlug(dir)}-$suffix"
        case None => graft.Staging.tempDir(s"graft-ivfpq-$suffix-").toString
      }
      val shards = (0 until 2).map { h =>
        publishLayout(s, layoutPath(s"shard$h"), "codes/_SUCCESS") { tmp =>
          val filed = ivfpqFileFor(
            Tables.embeddings(s, dir).filter(pmod(col("vec_id"), lit(2)) === h),
            dim,
            s.read.parquet(s"$base/centroids"),
            s.read.parquet(s"$base/codebook"))
          filed.select(col("vec_id"), col("cell")).distinct()
            .write.parquet(s"$tmp/cells")
          filed.select(col("vec_id"), col("m"), col("cid"))
            .write.parquet(s"$tmp/codes")
        }
      }
      mergeShardLayouts(s, base, shards, layoutPath("merged"))
    }
  }

  /** A shard merge was asked to combine layouts whose vector-id sets
    * OVERLAP — a re-filed vector. Blind concatenation would silently
    * duplicate that vector's index rows (it would appear twice in every
    * candidate list it reaches), so the merge refuses loudly; re-shard or
    * compact the duplicate out first. */
  final class OverlappingShardsException(sample: Seq[Long], shards: Seq[String])
    extends IllegalStateException(
      s"shard merge refused: vec_ids with more than one index row " +
        s"(sample: ${sample.mkString(", ")}) across ${shards.mkString(", ")} — " +
        "filed by two shards, or duplicated within one; a blind union " +
        "would serve them twice; re-shard on a disjoint key or compact " +
        "the duplicates out first")

  /** Concatenate shard layouts (per-vector `cells`/`codes` tables) under
    * the SHARED quantizer at `base` into one served layout at `dest` —
    * pure unions, zero shuffle, zero trainer stages. Refuses with
    * [[OverlappingShardsException]] when the shards' vector-id sets
    * intersect (the re-filed-vector case): disjointness is the merge's
    * correctness precondition, and the check is one id-column aggregate —
    * 8 bytes a row — against a rewrite that would otherwise serve
    * duplicates silently. */
  private[graft] def mergeShardLayouts(
      s: SparkSession, base: String, shards: Seq[String], dest: String): String = {
    // an already-published merge short-circuits before the disjointness
    // scan: the serve side's cold-start path stays metadata-only
    val marker = new org.apache.hadoop.fs.Path(s"$dest/codes/_SUCCESS")
    if (marker.getFileSystem(s.sparkContext.hadoopConfiguration).exists(marker))
      return dest
    // count ROWS, not distinct shards: a vec_id duplicated WITHIN one
    // shard's cells table (fsck's duplicate-row damage class) is the same
    // served-twice corruption as one filed by two shards
    val dup = shards
      .map(sp => s.read.parquet(s"$sp/cells").select(col("vec_id")))
      .reduce(_ unionByName _)
      .groupBy(col("vec_id")).agg(count(lit(1)).as("nr"))
      .filter(col("nr") > 1)
      .select(col("vec_id")).orderBy(col("vec_id")).limit(5)
      .collect().map(_.getLong(0)).toSeq
    if (dup.nonEmpty) throw new OverlappingShardsException(dup, shards)
    publishLayout(s, dest, "codes/_SUCCESS") { tmp =>
      s.read.parquet(s"$base/centroids").write.parquet(s"$tmp/centroids")
      s.read.parquet(s"$base/codebook").write.parquet(s"$tmp/codebook")
      shards.map(sp => s.read.parquet(s"$sp/cells")).reduce(_ unionByName _)
        .write.parquet(s"$tmp/cells")
      shards.map(sp => s.read.parquet(s"$sp/codes")).reduce(_ unionByName _)
        .write.parquet(s"$tmp/codes")
    }
  }

  def sim_index_merge(s: SparkSession, dir: String): DataFrame = {
    val idx = mergedIvfpqIndex(s, dir)
    ivfpqSearch(s, dir,
      s.read.parquet(s"$idx/centroids"),
      s.read.parquet(s"$idx/cells"),
      s.read.parquet(s"$idx/codebook"),
      s.read.parquet(s"$idx/codes"))
  }

  /** The merged layout equals the one-shot build on the union by
    * construction, so the oracle is shared with [[sim_topk_ivfpq]]. */
  lazy val sim_index_merge_sql: String = sim_topk_ivfpq_sql

  /** DELETE + COMPACT against the MERGED layout — the proof that a merged
    * index is a first-class MUTABLE layout, not a terminal artifact:
    * [[sim_index_compact]]'s tombstone rewrite applied to
    * [[mergedIvfpqIndex]]'s per-vector tables (quantizer untouched), then
    * served. With [[stream_ann_serve]]'s shape run against the merged
    * layout (`stream_ann_serve_merged`), this closes the lifecycle matrix:
    * every verb (serve, insert-by-filing, delete) runs against every
    * layout origin (one-shot, compacted, merged). Oracle shared with
    * [[sim_index_compact]] — merged ≡ one-shot row-for-row, so compaction
    * over it must too. */
  def sim_index_merge_compact(s: SparkSession, dir: String): DataFrame = {
    val idx = mergedIvfpqIndex(s, dir)
    val keep = expr(s"NOT ($TombstonePred)")
    val p = graft.Staging.tempDir("graft-ivfpq-merged-compact-").toString
    s.read.parquet(s"$idx/cells").filter(keep).write.parquet(s"$p/cells")
    s.read.parquet(s"$idx/codes").filter(keep).write.parquet(s"$p/codes")
    ivfpqSearchFor(Tables.embeddings(s, dir).filter(col("vec_id") < 50),
      Tables.embeddingsDim(s, dir),
      s.read.parquet(s"$idx/centroids"),
      s.read.parquet(s"$p/cells"),
      s.read.parquet(s"$idx/codebook"),
      s.read.parquet(s"$p/codes"))
  }

  lazy val sim_index_merge_compact_sql: String = sim_index_compact_sql

  /** The arriving-batch predicate of the SEMANTIC incremental-dedup gate —
    * ~2% of the corpus, deterministic and SQL-stateable on both engines. */
  private[graft] val IncrEmbBatchPred = "vec_id % 53 = 5"

  /** SEMANTIC incremental dedup, served from the STANDING index — the
    * third member of the incremental-dedup trio (exact fingerprints:
    * `Pipeline.pipe_dedup_incremental`; lexical MinHash-LSH:
    * `Dedup.pipe_dedup_incremental_lsh`; semantic: this): each vector of
    * an arriving batch ([[IncrEmbBatchPred]]) probes the PERSISTED IVF×PQ
    * layout ([[persistedIvfpqIndex]]) for its nearest CORPUS near-dups —
    * batch members are excluded from the candidate side, so the output is
    * exactly the "is this new document semantically already in the
    * corpus, and where" decision input. (The batch's own vectors are
    * already FILED in the layout — the insert path runs on arrival,
    * `stream_index_update` — so the dedup screen is a re-probe that asks
    * which EARLIER members they duplicate; excluding them from the
    * candidate side is what makes the answer "corpus near-dups only".)
    * No trainer stage anywhere: the
    * batch is coarse-probed and ADC-scored against stored centroids,
    * cells, codebooks and codes ([[ivfpqSearchFor]], the serve path's
    * plan).
    *
    * Scale: per-batch cost is O(batch × probes × cell-size) ADC lookups
    * against 5-small-int index rows — the corpus's raw embeddings are
    * never read, never shuffled; this is the SemDeDup-style screen a
    * 100 TB ingest runs on every arrival increment. */
  def pipe_dedup_incremental_embedding(s: SparkSession, dir: String): DataFrame = {
    val idx = persistedIvfpqIndex(s, dir)
    val batch = expr(IncrEmbBatchPred)
    ivfpqSearchFor(
      Tables.embeddings(s, dir).filter(batch),
      Tables.embeddingsDim(s, dir),
      s.read.parquet(s"$idx/centroids"),
      s.read.parquet(s"$idx/cells").filter(!batch),
      s.read.parquet(s"$idx/codebook"),
      s.read.parquet(s"$idx/codes"))
  }

  lazy val pipe_dedup_incremental_embedding_sql: String =
    ivfpqSearchSqlFor(IncrEmbBatchPred, s" AND NOT (cellof.$IncrEmbBatchPred)")

  /** TRIANGLE census + local clustering coefficient over the staged kNN
    * graph — the standard density diagnostic for an embedding space: a
    * node whose neighbors are also neighbors of each other sits in a tight
    * semantic cluster (near-dup nest, template family); a zero-coefficient
    * hub bridges unrelated regions. Used to audit kNN-graph quality before
    * trusting it for SemDeDup-style clustering or graph-ANN construction.
    *
    * The graph is first symmetrized to distinct undirected edges (a<b),
    * then triangles are counted with the classic two-join wedge-close:
    * edges (a,b)⋈(b,c) form wedges with a<b<c, and a semi-join against the
    * closing edge (a,c) keeps actual triangles — each triangle is produced
    * exactly once because its vertices appear in sorted roles. Per-node
    * participation explodes each triangle to its three corners; the
    * coefficient is emitted in integer micro-units
    * (`2·10^6·tri div deg·(deg-1)`) so the gate hashes exact BIGINTs.
    *
    * Scale: the undirected edge table is ≤ 2kN rows of two integers. Both
    * joins key on a single vertex, so per-key work is bounded by the square
    * of that vertex's degree — out-degree is k by construction and
    * in-degree is bounded by the LSH probe-bucket ceiling (~(nb+1)·64
    * candidates can ever rank a given node), so no wedge explosion and no
    * skew surface. Work is O(Σ deg²) ≈ O(N·k²), never O(N²); this is the
    * same plan a 10^9-node GraphFrames triangle count runs distributed. */
  def sim_triangles(s: SparkSession, dir: String): DataFrame = {
    val und = knnGraphStaged(s, dir)
      .select(least(col("src"), col("neighbor_id")).as("a"),
        greatest(col("src"), col("neighbor_id")).as("b"))
      .distinct()
    val wedges = und.join(
        und.select(col("a").as("b"), col("b").as("c")), "b")
      .select(col("a"), col("b"), col("c"))
    val tri = wedges.join(und.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val perNode = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("n_tri"))
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("vec_id"))
      .groupBy(col("vec_id")).agg(count(lit(1)).as("degree"))
    deg.join(perNode, Seq("vec_id"), "left")
      .select(col("vec_id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("degree") >= 2,
          expr("(2000000 * coalesce(n_tri, 0)) div (degree * (degree - 1))"))
          .otherwise(lit(0L)).as("cc_micro"))
  }

  val sim_triangles_sql: String =
    s"""WITH g AS MATERIALIZED ($sim_knn_graph_sql),
       |und AS MATERIALIZED (SELECT DISTINCT least(src, neighbor_id) AS a,
       |    greatest(src, neighbor_id) AS b FROM g),
       |tri AS (SELECT e1.a, e1.b, e2.b AS c
       |  FROM und e1 JOIN und e2 ON e1.b = e2.a
       |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
       |pn AS (SELECT v AS vec_id, count(*) AS n_tri
       |  FROM (SELECT unnest([a, b, c]) AS v FROM tri) GROUP BY 1),
       |deg AS (SELECT v AS vec_id, count(*) AS degree
       |  FROM (SELECT unnest([a, b]) AS v FROM und) GROUP BY 1)
       |SELECT deg.vec_id, degree, coalesce(n_tri, CAST(0 AS BIGINT)) AS n_tri,
       |  CASE WHEN degree >= 2
       |    THEN (2000000 * coalesce(n_tri, 0)) // (degree * (degree - 1))
       |    ELSE CAST(0 AS BIGINT) END AS cc_micro
       |FROM deg LEFT JOIN pn ON deg.vec_id = pn.vec_id""".stripMargin

  /** kNN LABEL-PURITY audit — for each label, the fraction (integer
    * micro-units) of its members' kNN edges that stay inside the label.
    * The classifier-free alignment check between an embedding space and a
    * labeling: purity near the 1/#labels chance floor for a class means
    * its labels are noise to this encoder, and any curation rule keyed on
    * them (quality classes, domain tags) will leak across that boundary.
    * Complements [[sim_label_separability]] (centroid-level, parametric)
    * with the local non-parametric view.
    *
    * Scale: two joins of the staged k·N-row edge table against the
    * (vec_id, label) projection — narrow keys, shuffle-joined on vec_id at
    * any corpus size — then a map-side-combined count per label. Nothing
    * beyond the already-materialized graph is ever recomputed. */
  def sim_knn_label_purity(s: SparkSession, dir: String): DataFrame = {
    val lab = Tables.embeddings(s, dir).select(col("vec_id"), col("label"))
    val l1 = lab.select(col("vec_id").as("src"), col("label").as("label_src"))
    val l2 = lab.select(col("vec_id").as("neighbor_id"), col("label").as("label_nb"))
    knnGraphStaged(s, dir)
      .join(l1, "src").join(l2, "neighbor_id")
      .groupBy(col("label_src"))
      .agg(count(lit(1)).as("n_edges"),
        sum(when(col("label_src") === col("label_nb"), 1L).otherwise(0L)).as("n_same"))
      .select(col("label_src").as("label"), col("n_edges"), col("n_same"),
        expr("(1000000 * n_same) div n_edges").as("purity_micro"))
  }

  val sim_knn_label_purity_sql: String =
    s"""WITH g AS MATERIALIZED ($sim_knn_graph_sql),
       |per AS (SELECT l1.label AS label, count(*) AS n_edges,
       |    CAST(sum(CASE WHEN l1.label = l2.label THEN 1 ELSE 0 END) AS BIGINT) AS n_same
       |  FROM g
       |  JOIN embeddings l1 ON g.src = l1.vec_id
       |  JOIN embeddings l2 ON g.neighbor_id = l2.vec_id
       |  GROUP BY 1)
       |SELECT label, n_edges, n_same,
       |  (1000000 * n_same) // n_edges AS purity_micro
       |FROM per""".stripMargin

  /** LABEL-SEPARABILITY audit of the embedding space — for every label
    * pair, a Fisher-style ratio of between-centroid distance to pooled
    * within-class variance. The pre-training check on labeled embedding
    * data: a near-zero ratio means the two classes overlap (label noise, or
    * an embedding model that can't tell them apart); downstream quality
    * classifiers and SemDeDup thresholds are only trustworthy where this
    * is comfortably positive.
    *
    * All statistics are exact integers over components quantized to
    * `floor(x·2^10)` (the k-means/PQ discipline): per label, the count, the
    * [[graft.functions.VecSumLong]] component sum `cv` and the squared-norm
    * sum `s2` give `varnum = n·s2 − |cv|² = n²·σ²` with no division; the
    * pair's between-term `|n_b·cv_a − n_a·cv_b|² = (n_a·n_b)²·|μ_a−μ_b|²`
    * and denominator `n_b²·varnum_a + n_a²·varnum_b` carry the SAME
    * `(n_a·n_b)²` scale, so `fisher_ratio` is one mirrored IEEE division of
    * two exact BIGINTs. Magnitude headroom: with |x|≤1, the between dot
    * peaks at ~2^62 at sf0.1 (measured bounds) — fine for the gate scales;
    * a 10^6+-per-label corpus would move the accumulators to DECIMAL(38,0)
    * (Spark) / HUGEINT (DuckDB), same plan.
    *
    * Scale: one corpus scan into a map-side-combined per-label aggregate
    * (VecSumLong ships ONE dim-length array per label × partition); the
    * label table (≤ #labels rows) is checkpointed and self-joined — work
    * after the scan is O(labels²·dim), independent of corpus size. */
  private val SepQ = 1024L

  /** Once-per-fixture-dir overflow-guard memo (the guard is a bounded
    * driver-side audit, not part of the returned plan). */
  private val sepGuardMemo = new graft.Memo[Unit]

  def sim_label_separability(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{VecDot, VecSumLong}
    val e = Tables.embeddings(s, dir)
      .select(col("label"),
        expr(s"transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $SepQ) AS BIGINT))")
          .as("qv"))
      // norm2 over integer arrays: every partial is an exact integer < 2^53,
      // so the double-typed kernel is exact and the cast back is lossless
      .withColumn("d2", VecDot.norm2(col("qv")).cast("long"))
    val per = e.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), VecSumLong.of(col("qv")).as("cv"),
        sum(col("d2")).as("s2"))
      .withColumn("varnum", expr(
        "n * s2 - aggregate(zip_with(cv, cv, (x, y) -> x * y), CAST(0 AS BIGINT), (a, v) -> a + v)"))
      .localCheckpoint(true) // tiny (≤ #labels rows); one corpus scan total
    // Overflow guard: the pair arithmetic below is exact BIGINT and wraps
    // SILENTLY in non-ANSI Spark if a fixture outgrows the documented ~2^62
    // headroom. The per-label table is ≤ #labels rows and already
    // checkpointed, so recomputing the exact pair terms in BigInt driver-
    // side is O(labels²·dim) — label-bounded, never data-bounded — and
    // fails LOUDLY with the migration path instead of hash-failing. The
    // label column is read GENERICALLY (`r.get(0)`: int, bigint, or string
    // labels all work) and pairs enumerate by row index — the magnitude
    // terms are symmetric in (a, b), so any once-per-unordered-pair
    // enumeration checks the same values the query computes. Memoized per
    // fixture dir: repeated builder invocations (bench repeats) skip the
    // collect + O(labels²·dim) loop after the first.
    sepGuardMemo.getOrStage(dir) {
      val lim = BigInt(Long.MaxValue)
      val rows = per.select(col("label"), col("n"), col("cv"), col("s2"),
        col("varnum")).collect()
      for (r <- rows) {
        val (n, s2) = (BigInt(r.getLong(1)), BigInt(r.getLong(3)))
        require(n * s2 <= lim && r.getSeq[Long](2).map(x => BigInt(x) * x).sum <= lim,
          s"sim_label_separability: per-label accumulators for label " +
            s"${r.get(0)} exceed BIGINT (n=$n) — move n*s2/|cv|^2 to " +
            "DECIMAL(38,0) (Spark) / HUGEINT (DuckDB); same plan")
      }
      for (i <- rows.indices; j <- (i + 1) until rows.length) {
        val (ra, rb) = (rows(i), rows(j))
        val (na, nb) = (BigInt(ra.getLong(1)), BigInt(rb.getLong(1)))
        val between = ra.getSeq[Long](2).zip(rb.getSeq[Long](2))
          .map { case (x, y) => val t = nb * x - na * y; t * t }.sum
        val denom = nb * nb * ra.getLong(4) + na * na * rb.getLong(4)
        require(between <= lim && denom <= lim,
          s"sim_label_separability: pair (${ra.get(0)}, ${rb.get(0)}) " +
            s"between/denominator exceed BIGINT (between=$between, " +
            s"denom=$denom) — move the pair terms to DECIMAL(38,0) " +
            "(Spark) / HUGEINT (DuckDB); same plan")
      }
    }
    val a = per.select(col("label").as("label_a"), col("n").as("n_a"),
      col("cv").as("cv_a"), col("varnum").as("varnum_a"))
    val b = per.select(col("label").as("label_b"), col("n").as("n_b"),
      col("cv").as("cv_b"), col("varnum").as("varnum_b"))
    a.join(b, col("label_a") < col("label_b"))
      .withColumn("between_num", expr(
        """aggregate(zip_with(cv_a, cv_b, (x, y) ->
          |  (n_b * x - n_a * y) * (n_b * x - n_a * y)),
          |  CAST(0 AS BIGINT), (a, v) -> a + v)""".stripMargin))
      .select(col("label_a"), col("label_b"), col("n_a"), col("n_b"),
        col("varnum_a"), col("varnum_b"), col("between_num"),
        expr("""CAST(between_num AS DOUBLE) /
               |CAST(n_b * n_b * varnum_a + n_a * n_a * varnum_b AS DOUBLE)""".stripMargin)
          .as("fisher_ratio"))
  }

  val sim_label_separability_sql: String =
    s"""WITH d AS (SELECT label,
       |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * $SepQ) AS BIGINT)) AS qv
       |  FROM embeddings),
       |d2 AS (SELECT label, qv, CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS d2 FROM d),
       |comp AS (SELECT label, i, CAST(sum(qv[i]) AS BIGINT) AS s
       |  FROM d2 CROSS JOIN range(1, ${Lsh.Dim + 1}) r(i) GROUP BY label, i),
       |cvt AS (SELECT label, list(s ORDER BY i) AS cv FROM comp GROUP BY label),
       |agg AS (SELECT label, count(*) AS n, CAST(sum(d2) AS BIGINT) AS s2 FROM d2 GROUP BY label),
       |per AS (SELECT agg.label, n, s2, cv,
       |    n * s2 - CAST(list_sum(list_transform(cv, x -> x * x)) AS BIGINT) AS varnum
       |  FROM agg JOIN cvt ON agg.label = cvt.label),
       |pair AS (SELECT a.label AS label_a, b.label AS label_b, a.n AS n_a, b.n AS n_b,
       |    a.varnum AS varnum_a, b.varnum AS varnum_b,
       |    CAST(list_sum(list_transform(range(1, ${Lsh.Dim + 1}), i ->
       |      (b.n * a.cv[i] - a.n * b.cv[i]) * (b.n * a.cv[i] - a.n * b.cv[i]))) AS BIGINT)
       |      AS between_num
       |  FROM per a JOIN per b ON a.label < b.label)
       |SELECT label_a, label_b, n_a, n_b, varnum_a, varnum_b, between_num,
       |  CAST(between_num AS DOUBLE) /
       |    CAST(n_b * n_b * varnum_a + n_a * n_a * varnum_b AS DOUBLE) AS fisher_ratio
       |FROM pair""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_triangles" -> sim_triangles _,
    "sim_label_separability" -> sim_label_separability _,
    "sim_knn_label_purity" -> sim_knn_label_purity _,
    "sim_knn_graph" -> sim_knn_graph _,
    "sim_mutual_knn" -> sim_mutual_knn _,
    "sim_recall_eval" -> sim_recall_eval _,
    "sim_ivf_recall" -> sim_ivf_recall _,
    "sim_pagerank" -> sim_pagerank _,
    "sim_bucket_sample" -> sim_bucket_sample _,
    "sim_topk_graph" -> sim_topk_graph _,
    "sim_topk_hnsw" -> sim_topk_hnsw _,
    "sim_kcenter" -> sim_kcenter _,
    "sim_topk_ivfpq" -> sim_topk_ivfpq _,
    "sim_index_persist" -> sim_index_persist _,
    "sim_index_compact" -> sim_index_compact _,
    "sim_index_merge" -> sim_index_merge _,
    "sim_index_merge_compact" -> sim_index_merge_compact _,
    "pipe_dedup_incremental_embedding" -> pipe_dedup_incremental_embedding _,
    "sim_topk_pq" -> sim_topk_pq _,
    "sim_pq_distortion" -> sim_pq_distortion _,
    "sim_quantize_int8" -> sim_quantize_int8 _,
    "sim_centroid_outlier" -> sim_centroid_outlier _,
    "sim_topk_bruteforce" -> sim_topk_bruteforce _,
    "sim_rrf_fusion" -> sim_rrf_fusion _,
    "sim_topk_filtered" -> sim_topk_filtered _,
    "sim_topk_rerank" -> sim_topk_rerank _,
    "sim_topk_lsh" -> sim_topk_lsh _,
    "sim_topk_ivf" -> sim_topk_ivf _,
    "sim_topk_ivf_filtered" -> sim_topk_ivf_filtered _,
    "sim_drift_embedding" -> sim_drift_embedding _,
    "sim_topk_ivf_trained" -> sim_topk_ivf_trained _,
    "sim_ivf_balance" -> sim_ivf_balance _,
    "sim_range" -> sim_range _,
  )

  val oracles: Map[String, String] = Map(
    "sim_triangles" -> sim_triangles_sql,
    "sim_label_separability" -> sim_label_separability_sql,
    "sim_knn_label_purity" -> sim_knn_label_purity_sql,
    "sim_knn_graph" -> sim_knn_graph_sql,
    "sim_mutual_knn" -> sim_mutual_knn_sql,
    "sim_recall_eval" -> sim_recall_eval_sql,
    "sim_ivf_recall" -> sim_ivf_recall_sql,
    "sim_pagerank" -> sim_pagerank_sql,
    "sim_bucket_sample" -> sim_bucket_sample_sql,
    "sim_topk_graph" -> sim_topk_graph_sql,
    "sim_topk_hnsw" -> sim_topk_hnsw_sql,
    "sim_kcenter" -> sim_kcenter_sql,
    "sim_topk_ivfpq" -> sim_topk_ivfpq_sql,
    "sim_index_persist" -> sim_index_persist_sql,
    "sim_index_compact" -> sim_index_compact_sql,
    "sim_index_merge" -> sim_index_merge_sql,
    "sim_index_merge_compact" -> sim_index_merge_compact_sql,
    "pipe_dedup_incremental_embedding" -> pipe_dedup_incremental_embedding_sql,
    "sim_topk_pq" -> sim_topk_pq_sql,
    "sim_pq_distortion" -> sim_pq_distortion_sql,
    "sim_quantize_int8" -> sim_quantize_int8_sql,
    "sim_centroid_outlier" -> sim_centroid_outlier_sql,
    "sim_topk_bruteforce" -> sim_topk_bruteforce_sql,
    "sim_rrf_fusion" -> sim_rrf_fusion_sql,
    "sim_topk_filtered" -> sim_topk_filtered_sql,
    "sim_topk_rerank" -> sim_topk_rerank_sql,
    "sim_topk_lsh" -> sim_topk_lsh_sql,
    "sim_topk_ivf" -> sim_topk_ivf_sql,
    "sim_topk_ivf_filtered" -> sim_topk_ivf_filtered_sql,
    "sim_drift_embedding" -> sim_drift_embedding_sql,
    "sim_topk_ivf_trained" -> sim_topk_ivf_trained_sql,
    "sim_ivf_balance" -> sim_ivf_balance_sql,
    "sim_range" -> sim_range_sql,
  )
}
