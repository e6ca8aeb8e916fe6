package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge-round semantics of `text_bpe_pairs`: the round-1 winner is
  * merged corpus-wide (so it can never survive as an adjacent pair into
  * round 2), the marker symbol appears only through merging, and `replace`'s
  * leftmost-non-overlapping contract handles self-overlapping winners the
  * way a sequential BPE tokenizer does. */
class TextBpeSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .appName("text-bpe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  test("two rounds, winner eliminated, marker only via merge") {
    val rows = operators.TextAnalysis.text_bpe_pairs(spark, sfDir).collect()
    assert(rows.length === 20, "top-10 per round x 2 rounds")
    assert(rows.forall(_.getString(1).length == 2), "pairs are 2-symbol strings")

    val r1 = rows.filter(_.getInt(0) == 1)
    val r2 = rows.filter(_.getInt(0) == 2)
    assert(r1.length === 10 && r2.length === 10)
    assert(r1.forall(!_.getString(1).contains('0')),
      "round 1 runs before any merge — the marker cannot exist yet")

    // the round-1 winner (max count, pair ASC tiebreak) must be fully
    // merged away: no adjacent raw-char occurrence can survive replace-all
    val winner = r1.minBy(r => (-r.getLong(2), r.getString(1))).getString(1)
    assert(!r2.map(_.getString(1)).contains(winner),
      s"winner '$winner' must not reappear as a round-2 pair")
  }

  test("persisted-merge encode equals a from-scratch Scala application of the merge table") {
    val merges = operators.TextAnalysis.text_bpe_train(spark, sfDir)
      .collect().sortBy(_.getInt(0))
      .map(r => (r.getString(1), ('0' + (r.getInt(0) - 1)).toChar.toString))
    val got = operators.TextAnalysis.text_bpe_persist(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
    assert(docs.length === got.size, "one encode row per document")
    docs.foreach { r =>
      val ws = "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toVector
      val before = ws.map(_.length).sum
      val after = ws.map(w =>
        merges.foldLeft(w) { case (acc, (p, m)) => acc.replace(p, m) }.length).sum
      val (nw, sb, sa) = got(r.getLong(0))
      assert(nw === ws.length && sb === before && sa === after,
        s"doc ${r.getLong(0)}: got ($nw,$sb,$sa), expected (${ws.length},$before,$after)")
    }
  }

  test("replace merges leftmost-non-overlapping like a sequential tokenizer") {
    // pin the engine-shared semantics the operator relies on: 'aaa' under
    // winner 'aa' segments as [aa][a], never the overlapping middle pair
    val out = spark.sql("SELECT replace('aaa', 'aa', '0') AS m").collect()(0).getString(0)
    assert(out === "0a")
  }
}
