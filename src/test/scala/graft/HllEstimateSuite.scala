package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The q43 gate hashes the HLL register table's exact integer summary; the
  * float ESTIMATE lives outside the gate, so this suite carries its
  * statistical claim: α·m² / Σ2^(−Mj), reconstructed from the sketch
  * columns alone, lands within ±15% of the true distinct count (HLL p=8
  * standard error is 1.04/√256 = 6.5%; ±15% ≈ 2.3σ). Uses the standard
  * small-range linear-counting correction when E ≤ 2.5m with empty
  * registers — the regime the sf0.001 fixture's smaller flags land in. */
class HllEstimateSuite extends AnyFunSuite with BeforeAndAfterAll {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-hll-estimate")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "4")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("q43 sketch columns reconstruct a ±15% cardinality estimate") {
    val m = 256.0
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val rows = operators.Relational.q43_hll_distinct(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val flag = r.getAs[String]("l_returnflag")
      val nBuckets = r.getAs[Long]("n_buckets")
      val sScaled = r.getAs[Long]("s_scaled")
      val nExact = r.getAs[Long]("n_exact")
      // s_scaled = Σ_j floor(2^40 / 2^Mj) over all 256 registers (empty → 2^40),
      // so Σ 2^(−Mj) = s_scaled / 2^40 up to the floor truncation (≤ 1 ulp/reg)
      val harmonic = sScaled.toDouble / math.pow(2.0, 40.0)
      val raw = alpha * m * m / harmonic
      val empty = m - nBuckets
      val est =
        if (raw <= 2.5 * m && empty > 0) m * math.log(m / empty) // linear counting
        else raw
      val relErr = math.abs(est - nExact) / nExact.toDouble
      assert(relErr <= 0.15,
        f"flag $flag: estimate $est%.1f vs exact $nExact (${relErr * 100}%.1f%% > 15%%)")
    }
  }
}
