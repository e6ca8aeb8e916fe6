package graft

import java.nio.file.{Files, Paths}

import graft.operators.{Similarity, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** `spark.graft.index.root`: the persisted IVF×PQ index and the BPE merge
  * table land under a DURABLE configured root (deterministic per-corpus
  * subdirectories, reused when already complete — the cross-JVM
  * train-once path), with results identical to the default
  * staging-memo path. */
class IndexRootSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .appName("indexroot")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  test("persisted IVF×PQ index lands under the configured root; search equals staged path") {
    val root = Files.createTempDirectory("graft-index-root-").toString
    val s2 = spark.newSession()
    s2.conf.set(Similarity.IndexRootConf, root)
    val durable = Similarity.sim_index_persist(s2, sfDir).collect()
      .map(_.toSeq).toSet
    val layout = Paths.get(root, s"ivfpq-${Similarity.corpusSlug(sfDir)}")
    Seq("centroids", "cells", "codebook", "codes").foreach { t =>
      assert(Files.exists(layout.resolve(t).resolve("_SUCCESS")), s"$t written under the root")
    }
    val staged = Similarity.sim_index_persist(spark, sfDir).collect()
      .map(_.toSeq).toSet
    assert(durable === staged, "durable-root search equals the staging-memo search")
  }

  test("a complete layout under the root is reused, not retrained") {
    val root = Files.createTempDirectory("graft-index-reuse-").toString
    val p = s"$root/ivfpq-x"
    Similarity.ensureIvfpqLayout(spark, sfDir, p)
    val marker = Paths.get(p, "codes", "_SUCCESS")
    val before = Files.getLastModifiedTime(marker)
    Similarity.ensureIvfpqLayout(spark, sfDir, p)
    assert(Files.getLastModifiedTime(marker) === before,
      "second ensure must not rewrite a complete layout")

    val bp = s"$root/bpe-x"
    TextAnalysis.ensureBpeMerges(spark, sfDir, bp)
    val bMarker = Paths.get(bp, "merges", "_SUCCESS")
    val bBefore = Files.getLastModifiedTime(bMarker)
    TextAnalysis.ensureBpeMerges(spark, sfDir, bp)
    assert(Files.getLastModifiedTime(bMarker) === bBefore)
  }

  test("persisted BPE merges land under the configured root; encode equals staged path") {
    val root = Files.createTempDirectory("graft-bpe-root-").toString
    val s2 = spark.newSession()
    s2.conf.set(Similarity.IndexRootConf, root)
    val durable = TextAnalysis.text_bpe_persist(s2, sfDir).collect()
      .map(_.toSeq).toSet
    val layout = Paths.get(root, s"bpe-merges-${Similarity.corpusSlug(sfDir)}")
    assert(Files.exists(layout.resolve("merges").resolve("_SUCCESS")))
    val staged = TextAnalysis.text_bpe_persist(spark, sfDir).collect()
      .map(_.toSeq).toSet
    assert(durable === staged)
  }
}
