package graft.state

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TimeMode, Trigger}

/** Scratch probe: does the `statestore` source decode EVOLVED list state
  * (added field default) the same way through Spark's built-in RocksDB
  * provider as through the graft provider? Run manually:
  * `sbt "Test/runMain graft.state.EvolveReadProbeMain <providerClass>"`. */
object EvolveReadProbeMain {
  def main(args: Array[String]): Unit = {
    val provider = if (args.nonEmpty) args(0)
      else "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("evolve-read-probe")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.streaming.stateStore.providerClass", provider)
      .config("spark.sql.streaming.stateStore.encodingFormat", "avro")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import StateSourceTwsSuite.{EvolveListP1, EvolveListP2}
    val inDir = Files.createTempDirectory("probe-in-")
    val ckpt = Files.createTempDirectory("probe-ckpt-").toString
    var tick = System.currentTimeMillis() - 3600000L
    def stage(name: String, rows: Seq[(String, Int)]): Unit = {
      val tmp = Files.createTempDirectory("probe-stage-")
      rows.toDF("k", "v").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val st = Files.list(tmp)
      val part = {
        import scala.jdk.CollectionConverters._
        try st.iterator().asScala.find(_.getFileName.toString.startsWith("part-")).get
        finally st.close()
      }
      val dst = inDir.resolve(name)
      Files.copy(part, dst)
      Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(tick))
      tick += 60000L
    }
    val mode = if (args.length > 1) args(1) else "add"
    val schema = Seq(("x", 1)).toDF("k", "v").schema
    def input = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(inDir.toString).as[(String, Int)]
    def run(out: DataFrame): Unit = {
      val q = out.writeStream
        .outputMode(OutputMode.Update())
        .foreachBatch { (b: DataFrame, id: Long) =>
          println(s"BATCH $id: " + b.collect().mkString(", "))
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    import EvolveReadProbeMain._
    if (mode == "add") {
      stage("f1.parquet", Seq(("a", 1), ("a", 2), ("b", 3)))
      run(input.groupByKey(_._1)
        .transformWithState(new EvolveListP1, TimeMode.None(), OutputMode.Update())
        .toDF("k", "n"))
      stage("f2.parquet", Seq(("a", 4)))
      run(input.groupByKey(_._1)
        .transformWithState(new EvolveListP2, TimeMode.None(), OutputMode.Update())
        .toDF("k", "n", "w"))
      val got = spark.read.format("statestore").option("operatorId", "0")
        .option("stateVarName", "vals").load(ckpt)
        .selectExpr("key.value AS k", "to_json(list_element) AS el")
        .collect().toSeq
      println("PROBE provider=" + provider + " mode=" + mode)
      println("PROBE rows=" + got.mkString(", "))
      spark.stop()
      sys.exit(0)
    }
    if (mode == "ttl") {
      // proc-time tws self-schedules forever: paced trigger + poll + stop
      val outDir = Files.createTempDirectory("probe-ttlout-").toString
      def runTtl(p: StatefulProcessor[String, (String, Int), (String, String)],
          expect: (String, String)): Unit = {
        val q = input.groupByKey(_._1)
          .transformWithState(p, TimeMode.ProcessingTime(), OutputMode.Update())
          .toDF("k", "dump")
          .writeStream.outputMode(OutputMode.Update())
          .foreachBatch { (b: DataFrame, id: Long) =>
            b.withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
              .write.mode("overwrite").format("parquet").partitionBy("batch_id")
              .option("partitionOverwriteMode", "dynamic").save(outDir)
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.ProcessingTime("100 milliseconds"))
          .start()
        try {
          import org.apache.spark.sql.functions.col
          def seen: Boolean = scala.util.Try(
            spark.read.parquet(outDir).filter(col("k") === expect._1 &&
              col("dump") === expect._2).limit(1).count() == 1L).getOrElse(false)
          val deadline = System.nanoTime() + 120L * 1000000000L
          while (!seen && System.nanoTime() < deadline &&
            q.exception.isEmpty) Thread.sleep(150)
          q.exception.foreach(e => throw e)
          if (!seen) {
            val rows = scala.util.Try(
              spark.read.parquet(outDir).collect().mkString(", ")).getOrElse("<unreadable>")
            require(seen, s"probe: expected $expect never emitted; sink = $rows")
          }
          def progressId: Long = Option(q.lastProgress).map(_.batchId).getOrElse(-1L)
          val at = progressId
          while (progressId <= at + 1 && System.nanoTime() < deadline) Thread.sleep(100)
        } finally q.stop()
      }
      stage("f1.parquet", Seq(("a", 1), ("a", 2), ("b", 3)))
      runTtl(new TtlEvP1, ("a", "2"))
      stage("f2.parquet", Seq(("a", 4)))
      try {
        runTtl(new TtlEvP2, ("a", "3/1"))
        val got = spark.read.format("statestore").option("operatorId", "0")
          .option("stateVarName", "agg").load(ckpt)
          .selectExpr("key.value AS k", "to_json(value) AS el")
          .collect().toSeq
        println("PROBE provider=" + provider + " mode=ttl")
        println("PROBE rows=" + got.mkString(", "))
      } catch {
        case e: Throwable =>
          var c: Throwable = e
          while (c.getCause != null && c.getCause != c) c = c.getCause
          println(s"PROBE provider=$provider mode=ttl REJECTED: " +
            s"${c.getClass.getSimpleName}: ${String.valueOf(c.getMessage).take(400)}")
      }
      spark.stop()
      sys.exit(0)
    }
    val (p1, p2) = mode match {
      case "widen" => (() => new WidenP1, () => new WidenP2)
      case "remove" => (() => new RemoveP1, () => new RemoveP2)
      case "reorder" => (() => new ReorderP1, () => new ReorderP2)
    }
    val tm = TimeMode.None()
    stage("f1.parquet", Seq(("a", 1), ("a", 2), ("b", 3)))
    run(input.groupByKey(_._1)
      .transformWithState(p1(), tm, OutputMode.Update())
      .toDF("k", "n"))
    stage("f2.parquet", Seq(("a", 4)))
    try {
      run(input.groupByKey(_._1)
        .transformWithState(p2(), tm, OutputMode.Update())
        .toDF("k", "dump"))
      val got = spark.read.format("statestore").option("operatorId", "0")
        .option("stateVarName", "vals").load(ckpt)
        .selectExpr("key.value AS k", "to_json(list_element) AS el")
        .collect().toSeq
      println("PROBE provider=" + provider + " mode=" + mode)
      println("PROBE rows=" + got.mkString(", "))
    } catch {
      case e: Throwable =>
        var c: Throwable = e
        while (c.getCause != null && c.getCause != c) c = c.getCause
        println(s"PROBE provider=$provider mode=$mode REJECTED: " +
          s"${c.getClass.getSimpleName}: ${String.valueOf(c.getMessage).take(400)}")
    }
    spark.stop()
    sys.exit(0)
  }

  case class Wa(m: Int)
  case class Wb(m: Long)
  class WidenP1 extends StatefulProcessor[String, (String, Int), (String, Long)] {
    @transient private var vals: ListState[Wa] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      vals = getHandle.getListState[Wa]("vals",
        org.apache.spark.sql.Encoders.product[Wa],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Int)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long)] = {
      var n = 0L
      rows.foreach { r => n += 1; vals.appendValue(Wa(r._2)) }
      Iterator.single((key, n))
    }
  }
  class WidenP2 extends StatefulProcessor[String, (String, Int), (String, String)] {
    @transient private var vals: ListState[Wb] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      vals = getHandle.getListState[Wb]("vals",
        org.apache.spark.sql.Encoders.product[Wb],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Int)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, String)] = {
      rows.foreach(r => vals.appendValue(Wb(r._2.toLong)))
      Iterator.single((key, vals.get().map(_.m).mkString("|")))
    }
  }

  case class Ra(mille: Long, extra: Long)
  case class Rb(mille: Long)
  class RemoveP1 extends StatefulProcessor[String, (String, Int), (String, Long)] {
    @transient private var vals: ListState[Ra] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      vals = getHandle.getListState[Ra]("vals",
        org.apache.spark.sql.Encoders.product[Ra],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Int)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long)] = {
      var n = 0L
      rows.foreach { r => n += 1; vals.appendValue(Ra(r._2.toLong, 99L)) }
      Iterator.single((key, n))
    }
  }
  class RemoveP2 extends StatefulProcessor[String, (String, Int), (String, String)] {
    @transient private var vals: ListState[Rb] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      vals = getHandle.getListState[Rb]("vals",
        org.apache.spark.sql.Encoders.product[Rb],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Int)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, String)] = {
      rows.foreach(r => vals.appendValue(Rb(r._2.toLong)))
      Iterator.single((key, vals.get().map(_.mille).mkString("|")))
    }
  }

  case class Ta(cnt: Long)
  case class Tb(cnt: Long, extra: Long)
  class TtlEvP1 extends StatefulProcessor[String, (String, Int), (String, String)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Ta] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      st = getHandle.getValueState[Ta]("agg",
        org.apache.spark.sql.Encoders.product[Ta],
        org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofHours(1)))
    override def handleInputRows(key: String, rows: Iterator[(String, Int)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, String)] = {
      var n = 0L
      rows.foreach(_ => n += 1)
      val cnt = (if (st.exists()) st.get().cnt else 0L) + n
      st.update(Ta(cnt))
      Iterator.single((key, cnt.toString))
    }
  }
  class TtlEvP2 extends StatefulProcessor[String, (String, Int), (String, String)] {
    @transient private var st: org.apache.spark.sql.streaming.ValueState[Tb] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      st = getHandle.getValueState[Tb]("agg",
        org.apache.spark.sql.Encoders.product[Tb],
        org.apache.spark.sql.streaming.TTLConfig(java.time.Duration.ofHours(1)))
    override def handleInputRows(key: String, rows: Iterator[(String, Int)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, String)] = {
      var n = 0L
      rows.foreach(_ => n += 1)
      val prev = if (st.exists()) st.get() else Tb(0L, 0L)
      val v = Tb(prev.cnt + n, prev.extra + 1L)
      st.update(v)
      Iterator.single((key, s"${v.cnt}/${v.extra}"))
    }
  }

  case class Oa(a: Long, b: String)
  case class Ob(b: String, a: Long)
  class ReorderP1 extends StatefulProcessor[String, (String, Int), (String, Long)] {
    @transient private var vals: ListState[Oa] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      vals = getHandle.getListState[Oa]("vals",
        org.apache.spark.sql.Encoders.product[Oa],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Int)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long)] = {
      var n = 0L
      rows.foreach { r => n += 1; vals.appendValue(Oa(r._2.toLong, s"s${r._2}")) }
      Iterator.single((key, n))
    }
  }
  class ReorderP2 extends StatefulProcessor[String, (String, Int), (String, String)] {
    @transient private var vals: ListState[Ob] = _
    override def init(o: OutputMode, t: TimeMode): Unit =
      vals = getHandle.getListState[Ob]("vals",
        org.apache.spark.sql.Encoders.product[Ob],
        org.apache.spark.sql.streaming.TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[(String, Int)],
        tv: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, String)] = {
      rows.foreach(r => vals.appendValue(Ob(s"s${r._2}", r._2.toLong)))
      Iterator.single((key, vals.get().map(v => s"${v.a}/${v.b}").mkString("|")))
    }
  }
}
