package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** The sharded sessionization (`q23_sessionize`) vs a naive driver-side
  * model on adversarial shapes the fixture barely exercises: sessions
  * crossing one day boundary, a CONTINUOUS multi-day session (whole-bucket
  * head=tail chains the merge must walk through), events exactly at the
  * 30-minute gap (gap == G keeps the session; G+1µs splits it), same-µs
  * ties, and interleaved users. The gate's oracle only proves the fixture's
  * distribution; this pins the merge machinery on the shapes that would
  * break it. */
class SessionizeSuite extends AnyFunSuite with BeforeAndAfterAll {

  private var spark: SparkSession = _
  private val GapUs = 30L * 60 * 1000000
  private val DayUs = 86400L * 1000000

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("sessionize")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
  }

  override def afterAll(): Unit = spark.stop()

  /** Naive model: one pass per user over the sorted event list. */
  private def model(events: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Long)] = {
    events.groupBy(_._1).flatMap { case (uid, evs) =>
      val sorted = evs.map(e => (e._3, e._2)).sorted // (us, event_id)
      val sessions = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
      sorted.foreach { case (us, _) =>
        sessions.lastOption match {
          case Some((st, en, n)) if us - en <= GapUs =>
            sessions.update(sessions.length - 1, (st, us, n + 1))
          case _ => sessions += ((us, us, 1L))
        }
      }
      sessions.map { case (st, en, n) => (uid, st, en - st, n) }
    }.toSet
  }

  private def run(events: Seq[(Long, Long, Long)]): Set[(Long, Long, Long, Long)] = {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val dir = Staging.tempDir("graft-sess-test-").toString
    events.toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        expr("timestamp_micros(us)").as("ts"),
        expr("'click'").as("event_type"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    operators.Relational.q23_sessionize(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
  }

  test("adversarial shapes match the naive model") {
    val d0 = 1700000000L * 1000000 // some epoch-µs base
    var eid = 0L
    def ev(uid: Long, us: Long): (Long, Long, Long) = { eid += 1; (uid, eid, us) }

    val events = Seq.newBuilder[(Long, Long, Long)]
    // user 1: session crossing one midnight (events 10 min apart around it)
    val mid1 = (d0 / DayUs + 1) * DayUs
    events += ev(1, mid1 - 600000000L) += ev(1, mid1 - 1000000L) += ev(1, mid1 + 600000000L)
    // user 1: separate session later the same day
    events += ev(1, mid1 + 5 * 3600000000L)
    // user 2: CONTINUOUS 3-day session, one event every 25 minutes
    val start2 = (d0 / DayUs) * DayUs + 1000000L
    (0L until (3 * 58)).foreach { k => events += ev(2, start2 + k * 25 * 60000000L) }
    // user 3: events exactly G apart (one session) then G+1µs (split)
    val s3 = d0 + 3 * DayUs + 1000000L
    events += ev(3, s3) += ev(3, s3 + GapUs) += ev(3, s3 + GapUs + GapUs + 1)
    // user 4: same-microsecond ties at a bucket edge
    val mid4 = (d0 / DayUs + 5) * DayUs
    events += ev(4, mid4) += ev(4, mid4) += ev(4, mid4 - 1)
    // user 5: single event
    events += ev(5, d0 + 7 * DayUs + 42)

    val evs = events.result()
    assert(run(evs) === model(evs))
  }
}
