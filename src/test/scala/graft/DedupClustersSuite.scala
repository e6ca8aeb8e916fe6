package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The distributed connected-components loop vs a driver-side union-find on
  * adversarial graph shapes. The oracle gate exercises it only on the
  * fixture's shallow near-dup clusters; these tests pin the loop's behavior
  * on the shapes that break naive propagation — long chains (diameter >>
  * rounds without pointer jumping), cliques, forests of mixed components,
  * and seeded random graphs — and that exhausting the round cap fails
  * loudly instead of returning truncated labels.
  */
class DedupClustersSuite extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-dedup-clusters")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = { spark; () }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  /** Symmetric, checkpointed edge DataFrame from undirected pairs. */
  private def edgeDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    val both = pairs ++ pairs.map(p => (p._2, p._1))
    both.toDF("src", "dst").localCheckpoint(true)
  }

  /** Driver-side union-find: component min-label per node. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    nodes.map(n => n -> find(n)).toMap
  }

  private def run(pairs: Seq[(Long, Long)], maxRounds: Int = 20): Map[Long, Long] =
    Dedup.connectedComponents(edgeDf(pairs), maxRounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("embedding clusters: every vector labeled once; edges honored; sizes consistent") {
    val dir = "/root/testdata/sf0.001"
    val out = Dedup.dedup_clusters_embedding(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(out.length === n, "every vector gets exactly one cluster row")
    assert(out.map(_._1).distinct.length === n, "no vector labeled twice")
    // representative is the component min → rep <= member everywhere
    assert(out.forall { case (id, rep, _) => rep <= id })
    // cluster_size is consistent with the label multiset
    val sizes = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(out.forall { case (_, rep, sz) => sizes(rep) === sz })
    // every near-dup edge joins its endpoints into one cluster
    val label = out.map(t => t._1 -> t._2).toMap
    Dedup.dedup_embedding(spark, dir).collect().foreach { r =>
      assert(label(r.getLong(0)) === label(r.getLong(1)),
        s"edge (${r.getLong(0)}, ${r.getLong(1)}) split across clusters")
    }
  }

  test("long chain converges within the cap via pointer jumping") {
    // path 0-1-2-...-300: diameter 300 >> 20 rounds of plain neighbor-min;
    // pointer jumping must collapse it in O(log d)
    val chain = (0L until 300L).map(i => (i, i + 1))
    assert(run(chain) === unionFind(chain))
  }

  test("clique, star, and disjoint components labeled by their minimum") {
    val clique = for { a <- 10L to 15L; b <- (a + 1) to 15L } yield (a, b)
    val star = (31L to 40L).map(i => (30L, i))
    val pair = Seq((100L, 101L))
    val pairs = clique ++ star ++ pair
    val got = run(pairs)
    assert(got === unionFind(pairs))
    assert(got(15L) === 10L && got(40L) === 30L && got(101L) === 100L)
  }

  test("seeded random graphs match union-find") {
    val rnd = new scala.util.Random(11)
    (1 to 3).foreach { _ =>
      val n = 80
      val pairs = Seq.fill(60)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2)
      assert(run(pairs) === unionFind(pairs))
    }
  }

  test("iterative rounds release their predecessors' checkpoint blocks") {
    // 2000-node path needs ~11 pointer-jumping rounds; before the round-7
    // fix every round left its localCheckpoint blocks pinned, so a deep
    // chain would show +rounds persisted RDDs here. Only the FINAL labels
    // checkpoint may stay live (the caller still reads it).
    val chain = (0L until 2000L).map(i => (i, i + 1))
    val edges = edgeDf(chain)
    val before = spark.sparkContext.getPersistentRDDs.size
    val labels = Dedup.connectedComponents(edges, 40)
    assert(labels.collect().length === 2001)
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"checkpoint leak across rounds: persisted RDDs before=$before after=$after")
  }

  test("exhausting the round cap fails loudly instead of returning wrong labels") {
    val chain = (0L until 300L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException](run(chain, maxRounds = 2))
    assert(e.getMessage.contains("did not converge"))
  }

  test("MinHash-LSH recall: every strong exact pair is found, all output verified") {
    // the dedup quality loop (the text-side sibling of sim_recall_eval):
    // banding theory says a jaccard>=0.7 pair survives 16 bands x 2 rows
    // with P ~ 1 - (1 - 0.7^2)^16 ~ 0.9999, so on the fixture every strong
    // pair from the exact anchor MUST appear among the LSH-verified pairs;
    // and the LSH output is exactly-verified, so nothing below the 0.6
    // gate may leak through.
    val dir = "/root/testdata/sf0.01"
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Long] =
      df.collect().map(r => ((r.getAs[Long]("doc_id_a"), r.getAs[Long]("doc_id_b")),
        r.getAs[Long]("jaccard_per_mille"))).toMap
    val exact = pairs(Dedup.dedup_ngram_jaccard(spark, dir))
    val lsh = pairs(Dedup.dedup_minhash_lsh(spark, dir))
    assert(exact.nonEmpty, "fixture must contain near-dup pairs")
    val strong = exact.filter(_._2 >= 700).keySet
    assert(strong.nonEmpty && strong.subsetOf(lsh.keySet),
      s"LSH missed strong pairs: ${(strong -- lsh.keySet).take(5)}")
    assert(lsh.values.forall(_ >= 600), "unverified pair leaked through the LSH gate")
  }
}
