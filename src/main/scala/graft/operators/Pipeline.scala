package graft.operators

import graft.Tables
import graft.functions.WordShingles
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data pipeline steps, composed from the primitive
  * operators — the two jobs every pre-training corpus build runs after the
  * per-document analyses:
  *
  *  - **decontamination**: find training documents that share n-grams with
  *    an evaluation/benchmark set, so benchmark material can be excluded
  *    from the training corpus (the fixture's eval set is the deterministic
  *    5% slice `doc_id % 20 = 0`; in production it is the benchmark suite).
  *  - **corpus materialization**: the final filter join — keep documents
  *    that pass the quality gate AND are their exact-duplicate group's
  *    representative.
  *
  * Scale notes: an eval/benchmark set is KBs–MBs against a 100 TB corpus,
  * so its shingle inverted index is broadcast — the train side streams
  * map-side with no shuffle of the corpus; only (train, eval) pairs that
  * actually collide reach the aggregation. Corpus materialization is two
  * hash-joins on doc_id against aggregates the optimizer computes in one
  * pass each over `documents`.
  */
object Pipeline {

  /** Contamination threshold: a train/eval pair sharing at least this many
    * distinct word-3-shingles is flagged (3 shingles = a 5+-word run or
    * several shorter collisions — the conventional loose screen; exact
    * dedup handles the identical-text case separately). */
  private val MinCommonShingles = 3

  /** Max total eval-side text bytes for which the eval posting set is
    * broadcast. Above it we fall back to a shuffle join: a benchmark set
    * is normally KBs–MBs, but an operator that OOMs the driver when handed
    * an oversized "eval set" is a trap at production scale — degrade to a
    * shuffle instead. ~64 MiB of raw text ≈ a few hundred MB of 12-byte
    * posting rows after shingling, the conventional broadcast ceiling. */
  private[operators] val BroadcastMaxEvalBytes = "spark.graft.decontaminate.broadcastMaxEvalBytes"
  private val DefaultMaxEvalBytes = 64L * 1024 * 1024

  def pipe_decontaminate(s: SparkSession, dir: String): DataFrame = {
    val posts = Tables.documents(s, dir)
      .select(col("doc_id"), WordShingles.of(col("text"), 3).as("sh"))
      .select(col("doc_id"), explode(col("sh")).as("s0"))
      .select(col("doc_id"), expr(Dedup.h60S("s0", "")).as("s"))
    val evalPosts = posts.filter(col("doc_id") % 20 === 0).toDF("eval_doc_id", "s")
    val trainPosts = posts.filter(col("doc_id") % 20 =!= 0).toDF("train_doc_id", "s")
    // Size-gate the broadcast on raw eval text bytes (a narrow two-column
    // scan, not a shingle job): posting-set size is proportional to it.
    val maxBytes = s.conf.get(BroadcastMaxEvalBytes, DefaultMaxEvalBytes.toString).toLong
    val evalBytes = Tables.documents(s, dir).filter(col("doc_id") % 20 === 0)
      .agg(coalesce(sum(length(col("text"))), lit(0L))).head.getLong(0)
    val evalSide = if (evalBytes <= maxBytes) broadcast(evalPosts) else evalPosts
    trainPosts.join(evalSide, "s")
      .groupBy(col("train_doc_id"), col("eval_doc_id"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= MinCommonShingles)
  }

  val pipe_decontaminate_sql: String =
    s"""WITH tok AS (SELECT doc_id, trim(text) tx, string_split_regex(trim(text), '\\s+') toks FROM documents),
       |sh AS (SELECT doc_id, ${Dedup.shinglesD} AS sh FROM tok),
       |post AS (SELECT doc_id, CAST(('0x' || substr(md5(s0), 1, 15)) AS BIGINT) AS s
       |         FROM (SELECT doc_id, unnest(sh) AS s0 FROM sh)),
       |ev AS (SELECT doc_id AS eval_doc_id, s FROM post WHERE doc_id % 20 = 0),
       |tr AS (SELECT doc_id AS train_doc_id, s FROM post WHERE doc_id % 20 <> 0)
       |SELECT train_doc_id, eval_doc_id, count(*) AS n_common
       |FROM tr JOIN ev USING (s)
       |GROUP BY 1, 2 HAVING count(*) >= $MinCommonShingles""".stripMargin

  /** The corpus cut: quality-pass documents that represent their exact-dup
    * group, with the columns a downstream tokenizer run needs. */
  def pipe_corpus(s: SparkSession, dir: String): DataFrame = {
    val quality = TextAnalysis.text_quality(s, dir)
      .select(col("doc_id"), col("n_tokens"), col("quality_class"))
    val reps = Dedup.dedup_exact(s, dir)
      .select(col("rep_doc_id").as("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"))
      .join(quality, "doc_id")
      .join(reps, Seq("doc_id"), "left_semi")
      .filter(col("quality_class") === "ok")
      .select(col("doc_id"), col("lang"), col("source"), col("n_tokens"))
  }

  val pipe_corpus_sql: String =
    s"""WITH q AS (SELECT doc_id,
       |        len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       |        len(list_filter(string_split_regex(trim(text), '\\s+'), t -> t IN ${TextAnalysis.sqlStopList})) AS stop_hits,
       |        len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS uniq
       |      FROM documents),
       |cls AS (SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
       |        CASE WHEN n_tokens < 20 THEN 'too_short'
       |             WHEN (stop_hits * 1000) // n_tokens > 150 THEN 'stopword_heavy'
       |             WHEN (uniq * 1000) // n_tokens < 400 THEN 'repetitive'
       |             ELSE 'ok' END AS quality_class
       |        FROM q),
       |reps AS (SELECT min(doc_id) AS doc_id
       |         FROM (SELECT doc_id, md5(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS fp FROM documents)
       |         GROUP BY fp)
       |SELECT d.doc_id, d.lang, d.source, cls.n_tokens
       |FROM documents d
       |JOIN cls ON d.doc_id = cls.doc_id
       |JOIN reps ON d.doc_id = reps.doc_id
       |WHERE cls.quality_class = 'ok'""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipe_decontaminate" -> (pipe_decontaminate(_, _)),
    "pipe_corpus" -> (pipe_corpus(_, _)))

  def oracles: Map[String, String] = Map(
    "pipe_decontaminate" -> pipe_decontaminate_sql,
    "pipe_corpus" -> pipe_corpus_sql)
}
