package graft.state

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Dev scratch main (NOT a test): run a transformWithState query using every
  * state-variable type (value, list, map) plus processing-time timers on the
  * graft provider, then dump the checkpoint's operator metadata (v2), the
  * state-schema files, and the column-family registry the offline
  * [[StateRepartition]] tws path must understand.
  */
object TwsProbeMain {

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

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ckpt = Files.createTempDirectory("graft-tws-probe-").toString
    val input = MemoryStream[(String, Int)]
    val df = input.toDS()
      .groupByKey(_._1)
      .transformWithState(new AllStateProcessor, TimeMode.ProcessingTime(), OutputMode.Update())
      .toDF("k", "c")
    val q = df.writeStream.format("memory").queryName("tws_probe")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", ckpt).start()
    // processing-time timers keep scheduling batches, so
    // processAllAvailable never returns — poll the commit log instead
    def waitForCommit(b: Long): Unit = {
      val p = Paths.get(ckpt, "commits", b.toString)
      val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (!Files.exists(p)) {
        require(System.nanoTime() < deadline, s"timed out waiting for commit $b")
        Thread.sleep(200)
      }
    }
    try {
      input.addData(("a", 1), ("b", 2), ("c", 3))
      waitForCommit(0)
      input.addData(("a", 4), ("d", 5))
      waitForCommit(1)
    } finally q.stop()

    println(s"CKPT=$ckpt")
    def walk(p: Path, indent: String): Unit = {
      val entries = Files.list(p).iterator()
      while (entries.hasNext) {
        val e = entries.next()
        val sz = if (Files.isRegularFile(e)) s" (${Files.size(e)} B)" else ""
        println(indent + e.getFileName + sz)
        if (Files.isDirectory(e)) walk(e, indent + "  ")
      }
    }
    walk(Paths.get(ckpt), "")

    val lastOffset = Files.list(Paths.get(ckpt, "offsets")).iterator()
      .asInstanceOf[java.util.Iterator[Path]]
    var maxB = -1L
    lastOffset.forEachRemaining { f =>
      val n = f.getFileName.toString
      if (n.forall(_.isDigit)) maxB = math.max(maxB, n.toLong)
    }
    println(s"---- offsets/$maxB ----")
    println(new String(Files.readAllBytes(Paths.get(ckpt, "offsets", maxB.toString)), "UTF-8"))
    println("---- state/0/_metadata/v2/0 ----")
    println(new String(Files.readAllBytes(Paths.get(ckpt, "state", "0", "_metadata", "v2", "0")), "UTF-8"))
    // dump any schema files under state/0
    Files.walk(Paths.get(ckpt, "state", "0", "_stateSchema")).iterator().forEachRemaining { f =>
      if (Files.isRegularFile(f) && !f.getFileName.toString.startsWith(".")) {
        println(s"---- schema file $f (${Files.size(f)} B) ----")
        val bytes = Files.readAllBytes(f)
        // may be a compressed metadata log; print printable bytes
        val txt = new String(bytes, "ISO-8859-1")
        println(txt.map(c => if (c >= 32 && c < 127 || c == '\n') c else '·').take(7000))
      }
    }

    // what the statestore source exposes per state var
    for (varName <- Seq("cnt", "vals", "byTag")) {
      println(s"---- statestore read: $varName ----")
      val st = spark.read.format("statestore")
        .option("operatorId", "0").option("stateVarName", varName).load(ckpt)
      st.printSchema()
      st.show(20, false)
    }
    println("---- statestore read: timers ----")
    val tm = spark.read.format("statestore")
      .option("operatorId", "0").option("readRegisteredTimers", "true").load(ckpt)
    tm.printSchema()
    tm.show(20, false)
    spark.stop()
  }
}
