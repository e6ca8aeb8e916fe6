package graft.state

import java.nio.file.Files

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** COLD `statestore`-source reads of transformWithState variables: Spark's
  * reader never calls `createColFamilyIfAbsent` — it opens the provider and
  * iterates the variable's column family directly, expecting the provider to
  * recall its own layout. The graft provider persists per-CF registration
  * records (key/value schemas + encoder spec + multi-value flag) in its meta
  * CF and auto-registers on first use, making every tws state variable —
  * value, list (order preserved), map (composite prefix keys), and
  * registered timers — readable from a checkpoint no live query has open.
  * This is both a user-facing audit path and the read half of the offline
  * tws repartition.
  */
class StateSourceTwsSuite extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-state-source-tws")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.streaming.stateStore.providerClass",
      classOf[RocksDbStateStoreProvider].getName)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def beforeAll(): Unit = { spark; () }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  import StateSourceTwsSuite.AllStateProcessor

  test("cold statestore reads of tws value/list/map state and timers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-tws-src-").toString
    val input = MemoryStream[(String, Int)]
    val q = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new AllStateProcessor, TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF("k", "c")
      .writeStream.format("memory").queryName("tws_src_sink")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt).start()
    // proc-time timers keep scheduling batches on their own (including
    // EMPTY ones racing ahead of addData), so neither processAllAvailable
    // nor a commit-log count identifies the data batch — poll the SINK for
    // the expected emission, then wait for one more commit so the batch
    // that produced it is durably committed before stop()
    def waitForSink(expect: (String, Long)): Unit = {
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      def seen: Boolean = spark.table("tws_src_sink").as[(String, Long)]
        .collect().contains(expect)
      while (!seen) {
        assert(System.nanoTime() < deadline, s"timed out waiting for sink row $expect")
        Thread.sleep(100)
      }
      val commits = java.nio.file.Paths.get(ckpt, "commits")
      def lastCommit: Long = {
        val it = Files.list(commits).iterator()
        var m = -1L
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.forall(_.isDigit)) m = math.max(m, n.toLong)
        }
        m
      }
      val seenAt = lastCommit
      while (lastCommit <= seenAt) {
        assert(System.nanoTime() < deadline, s"timed out waiting for commit after $seenAt")
        Thread.sleep(100)
      }
    }
    try {
      input.addData(("a", 1), ("b", 2), ("c", 3))
      waitForSink(("a", 1L))
      input.addData(("a", 4), ("d", 5))
      waitForSink(("d", 1L))
    } finally q.stop()

    def read(opts: (String, String)*) = {
      val r = spark.read.format("statestore").option("operatorId", "0")
      opts.foreach { case (k, v) => r.option(k, v) }
      r.load(ckpt)
    }

    val cnt = read("stateVarName" -> "cnt")
      .selectExpr("key.value AS k", "value.value AS c")
      .as[(String, Long)].collect().toMap
    assert(cnt === Map("a" -> 2L, "b" -> 1L, "c" -> 1L, "d" -> 1L))

    // list elements come back per key in APPEND ORDER (frame order)
    val vals = read("stateVarName" -> "vals")
      .selectExpr("key.value AS k", "list_element.value AS v")
      .as[(String, Int)].collect().toSeq
    assert(vals.filter(_._1 == "a").map(_._2) === Seq(1, 4),
      "ListState elements must decode in append order")
    assert(vals.toSet === Set(("a", 1), ("a", 4), ("b", 2), ("c", 3), ("d", 5)))

    val byTag = read("stateVarName" -> "byTag")
      .selectExpr("key.value AS k", "user_map_key.value AS tag", "user_map_value.value AS n")
      .as[(String, String, Long)].collect().toSet
    assert(byTag === Set(("a", "odd", 1L), ("a", "even", 1L), ("b", "even", 1L),
      ("c", "odd", 1L), ("d", "odd", 1L)))

    val timers = read("readRegisteredTimers" -> "true")
      .selectExpr("key.value AS k").as[String].collect().toSet
    assert(timers === Set("a", "b", "c", "d"), "every key registered a timer")
  }
}

object StateSourceTwsSuite {
  /** Top-level (serializable closure) — every tws state-variable type plus
    * a processing-time timer per key. */
  class AllStateProcessor extends StatefulProcessor[String, (String, Int), (String, Long)] {
    @transient private var v: ValueState[Long] = _
    @transient private var l: ListState[Int] = _
    @transient private var m: MapState[String, Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      v = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)
      l = getHandle.getListState[Int]("vals", Encoders.scalaInt, TTLConfig.NONE)
      m = getHandle.getMapState[String, Long]("byTag", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }
    override def handleInputRows(key: String, rows: Iterator[(String, Int)],
        timerValues: TimerValues): Iterator[(String, Long)] = {
      var c = if (v.exists()) v.get() else 0L
      rows.foreach { r =>
        c += 1
        l.appendValue(r._2)
        val tag = if (r._2 % 2 == 0) "even" else "odd"
        m.updateValue(tag, (if (m.containsKey(tag)) m.getValue(tag) else 0L) + 1L)
      }
      v.update(c)
      getHandle.registerTimer(timerValues.getCurrentProcessingTimeInMs() + 3600L * 1000)
      Iterator.single((key, c))
    }
  }
}
