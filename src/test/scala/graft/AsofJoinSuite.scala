package graft

import graft.operators.Relational
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The sharded as-of join (q18): the (user, day-bucket) shard + cross-bucket
  * carry must (a) reproduce the single-window unsharded formulation row for
  * row, and (b) actually shard — no EVENT-level window (one ordered by ts)
  * may partition on user_id alone, which at scale would put a whole user's
  * history in one task. (The carry window partitions by user_id by design:
  * its input is one row per (user, bucket), bounded by time range, not by
  * event volume.) */
class AsofJoinSuite extends AnyFunSuite with BeforeAndAfterAll
    with AdaptiveSparkPlanHelper {

  private val sfDir = "/root/testdata/sf0.001"
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config(Tables.nanosConf._1, Tables.nanosConf._2)
      .appName("asof")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  test("sharded plan equals the unsharded single-window formulation") {
    val ev = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val unsharded = ev.select(col("*"),
        last(when(col("event_type") === "click", col("event_id")), ignoreNulls = true)
          .over(w).as("click_id"),
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
          .over(w).as("click_ts"))
      .filter(col("event_type") === "purchase" && col("click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"), col("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ts"))).as("lag_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    val sharded = Relational.q18_asof_join(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet

    assert(sharded.nonEmpty, "fixture must produce matches")
    assert(sharded === unsharded, "shard + carry must be exactly as-of")
  }

  test("streaming as-of (transformWithState) equals the batch operator") {
    val batch = Relational.q18_asof_join(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val streamed = graft.streaming.StreamingQueries.queries("stream_asof")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === batch,
      "incremental ValueState as-of must equal the batch sort-window answer")
  }

  test("no event-level window partitions on user_id alone") {
    val df = Relational.q18_asof_join(spark, sfDir)
    val windows = collect(df.queryExecution.executedPlan) { case w: WindowExec => w }
    assert(windows.nonEmpty, "expected Window nodes in the plan")
    val eventLevel = windows.filter(
      _.orderSpec.exists(_.child.references.exists(_.name == "ts")))
    assert(eventLevel.nonEmpty, "expected the within-bucket running-click window")
    eventLevel.foreach { w =>
      val partCols = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
      assert(partCols !== Set("user_id"),
        s"event-level window partitions a whole user into one task: $w")
      assert(partCols.contains("bucket"),
        s"event-level window must shard by the time bucket: partition=$partCols")
    }
  }
}
