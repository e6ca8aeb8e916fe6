package graft.state

import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.UnsafeProjection
import org.apache.spark.sql.execution.streaming.state.{KeyStateEncoderSpec, NoPrefixKeyStateEncoderSpec, PrefixKeyScanStateEncoderSpec, StateStoreConf, StateStoreId}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Offline state-repartition tool: rewrite a Structured Streaming
  * checkpoint written by [[RocksDbStateStoreProvider]] so the query can
  * resume with a DIFFERENT `spark.sql.shuffle.partitions`.
  *
  * Spark pins the shuffle-partition count of a stateful query at its first
  * checkpoint forever (the restart path re-applies the count recorded in the
  * offset log), which is the standing operational trap for long-lived jobs:
  * a stream sized at 32 partitions on day one cannot absorb 100 TB/day of
  * state growth on day 400. This tool performs the offline migration a
  * production deployment needs (the reference has no answer to this — its
  * provider inherits the same pin, reference
  * `RocksDbStateStoreProvider.scala:347-380`):
  *
  *  1. every (operator, store) state at the last committed batch is read
  *     through the `statestore` data source against the OLD checkpoint —
  *     decoded key/value rows, schema included, no byte-format knowledge;
  *  2. rows are redistributed with `df.repartition(newN, hashCols)`, i.e.
  *     exactly Spark's own `HashPartitioning` — the placement the resumed
  *     query's `StatefulOpClusteredDistribution` will require. Using the
  *     engine's own hash (not a reimplementation) makes placement correct
  *     by construction, including the murmur3 seed and type widening;
  *  3. each new partition commits its rows through a fresh provider at the
  *     exact state version the resumed query will load (`lastBatch + 1`),
  *     publishing one full snapshot per (operator, new partition, store) —
  *     plain SPI calls, so TTL wrapping, meta-CF key counts and codec
  *     layout all come from the provider itself;
  *  4. the non-state checkpoint files are copied, with the offset log's
  *     recorded `spark.sql.shuffle.partitions` and each operator's
  *     `_metadata` `numPartitions` rewritten to the new count.
  *
  * The ENTIRE move is a distributed Spark job — state never collects to the
  * driver, so a 10 TB state store repartitions with the same shuffle
  * machinery as any other 10 TB join.
  *
  * Hash-column rule (which prefix of the state key the engine clusters by):
  * `numColsPrefixKey > 0` in the operator metadata → that prefix (session
  * windows); `symmetricHashJoin`'s `*KeyWithIndexToValue` stores → all key
  * columns but the trailing index; everything else → the full key. Operators
  * outside the supported set (e.g. `transformWithState`, whose metadata is
  * v2) and checkpoint format v2 (per-commit state IDs are arrays sized to
  * the partition count inside Spark's commit log) are rejected loudly
  * rather than migrated wrong.
  *
  * Caveat (documented, not silent): per-key TTL clocks restart at migration
  * time — the importer re-puts every row, so lazy-mode expiry measures from
  * the migration, and strict-mode deadlines (internal CF, not exposed
  * through the `statestore` source) are not carried over.
  */
object StateRepartition extends Logging {

  /** One migrated store: `keys` rows moved into `newPartitions` snapshots
    * at state `version`. */
  case class StoreResult(
      operatorId: Long,
      storeName: String,
      operatorName: String,
      oldPartitions: Int,
      newPartitions: Int,
      version: Long,
      keys: Long)

  private val SupportedOperators = Set(
    "stateStoreSave", "dedupe", "dedupeWithinWatermark",
    "sessionWindowStateStoreSaveExec", "flatMapGroupsWithState", "symmetricHashJoin")

  def main(args: Array[String]): Unit = {
    require(args.length == 3,
      "usage: StateRepartition <oldCheckpointDir> <newCheckpointDir> <newPartitionCount>")
    val spark = SparkSession.builder()
      .config("spark.sql.shuffle.partitions", "32")
      .getOrCreate()
    run(spark, args(0), args(1), args(2).toInt).show(100, truncate = false)
  }

  /** Migrate `oldCkpt` to `newCkpt` with `newParts` state partitions; the
    * old checkpoint is left untouched (it IS the rollback plan). Returns a
    * one-row-per-store summary.
    *
    * The write side always lands graft-RocksDB snapshots while the read
    * side replays through whatever provider the checkpoint recorded, so
    * the same pass is also the PROVIDER migration: a checkpoint written by
    * Spark's stock `HDFSBackedStateStoreProvider` (the memory-bound
    * provider the reference exists to replace) comes out the other end as
    * a graft-provider checkpoint — the recorded `providerClass` is
    * rewritten so the resumed query picks the new engine up from the
    * offset log with no code change. Same-partition-count calls are
    * therefore meaningful too: they migrate the provider alone. */
  def run(spark: SparkSession, oldCkpt: String, newCkpt: String, newParts: Int): DataFrame = {
    require(newParts >= 1, s"newParts must be >= 1, got $newParts")
    val hadoopConf = spark.sessionState.newHadoopConf()
    val oldRoot = new Path(oldCkpt)
    val newRoot = new Path(newCkpt)
    val fs = oldRoot.getFileSystem(hadoopConf)
    require(fs.exists(oldRoot), s"old checkpoint $oldCkpt does not exist")
    require(!fs.exists(new Path(newRoot, "state")),
      s"new checkpoint $newCkpt already has a state/ directory — refusing to overwrite")

    // ---- resolve the batch to migrate: last committed, nothing in flight
    def batchIds(dir: String): Seq[Long] = {
      val p = new Path(oldRoot, dir)
      if (!fs.exists(p)) Nil
      else fs.listStatus(p).toSeq.map(_.getPath.getName).filter(_.forall(_.isDigit)).map(_.toLong)
    }
    val commits = batchIds("commits")
    val offsets = batchIds("offsets")
    require(commits.nonEmpty, s"$oldCkpt has no committed batches — nothing to repartition")
    val lastBatch = commits.max
    require(offsets.max == lastBatch,
      s"batch ${offsets.max} is in flight (offsets written, no commit) — resume the query to " +
        "finish it (or delete the dangling offsets file) before repartitioning")
    val version = lastBatch + 1

    val mapper = new ObjectMapper()
    val commitText = readText(fs, new Path(oldRoot, s"commits/$lastBatch"))
    require(!commitText.contains("stateUniqueIds"),
      "checkpoint uses state store checkpoint format v2 (per-commit state IDs in the commit " +
        "log are sized to the partition count) — repartitioning v2 checkpoints is not supported")

    val offsetLines = readText(fs, new Path(oldRoot, s"offsets/$lastBatch")).split("\n", -1)
    val offsetMeta = mapper.readTree(offsetLines(1)).asInstanceOf[ObjectNode]
    val confNode = offsetMeta.get("conf").asInstanceOf[ObjectNode]
    val oldParts = confNode.get("spark.sql.shuffle.partitions").asText().toInt
    logInfo(s"Repartitioning $oldCkpt: batch $lastBatch (state version $version), " +
      s"$oldParts -> $newParts partitions")

    // ---- copy the non-state metadata (offsets rewritten below)
    fs.mkdirs(newRoot)
    fs.listStatus(oldRoot).foreach { st =>
      val name = st.getPath.getName
      if (name != "state" && name != "offsets") {
        FileUtil.copy(fs, st.getPath, fs, new Path(newRoot, name), false, true, hadoopConf)
      }
    }
    // every offsets entry gets the new count and the graft provider class
    // (the restart reads the latest entry's conf; uniform history keeps
    // later inspection unconfusing) — rewriting providerClass is what makes
    // the same pass the stock-to-graft provider migration
    fs.mkdirs(new Path(newRoot, "offsets"))
    offsets.foreach { b =>
      val lines = readText(fs, new Path(oldRoot, s"offsets/$b")).split("\n", -1)
      val meta = mapper.readTree(lines(1)).asInstanceOf[ObjectNode]
      val c = meta.get("conf").asInstanceOf[ObjectNode]
      c.put("spark.sql.shuffle.partitions", newParts.toString)
      c.put("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
      lines(1) = mapper.writeValueAsString(meta)
      writeText(fs, new Path(newRoot, s"offsets/$b"), lines.mkString("\n"))
    }

    // ---- a session pinned to the checkpoint's own streaming confs for the
    // statestore reads (INCLUDING the recorded providerClass — an
    // HDFSBackedStateStoreProvider checkpoint replays through the stock
    // provider here); AQE off so repartition(n, cols) keeps exactly n
    // reduce partitions aligned with partition indices
    val readSession = spark.newSession()
    val it = confNode.fieldNames()
    while (it.hasNext) { val k = it.next(); readSession.conf.set(k, confNode.get(k).asText()) }
    readSession.conf.set(SQLConf.ADAPTIVE_EXECUTION_ENABLED.key, "false")

    // ---- per-operator migration
    val stateRoot = new Path(oldRoot, "state")
    val newStateRoot = new Path(newRoot, "state").toString
    val hadoopBc = spark.sparkContext.broadcast(new SerializableConfiguration(hadoopConf))
    val importerConf: StateStoreConf = {
      // changelog OFF so the importer's single commit publishes one full
      // snapshot; incremental OFF so the fresh layout has no sst pool to GC
      val sqlConf = new SQLConf()
      sqlConf.setConfString(RocksDbConf.CHANGELOG, "false")
      sqlConf.setConfString(RocksDbConf.INCREMENTAL_SNAPSHOT, "false")
      sqlConf.setConfString("spark.sql.streaming.stateStore.commitValidation.enabled", "false")
      new StateStoreConf(sqlConf, Map.empty)
    }

    val results = mutable.ArrayBuffer.empty[StoreResult]
    val opDirs = fs.listStatus(stateRoot).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.forall(_.isDigit))
      .sortBy(_.getPath.getName.toLong)
    opDirs.foreach { opSt =>
      val opId = opSt.getPath.getName.toLong
      val mdPath = new Path(opSt.getPath, "_metadata/metadata")
      require(fs.exists(mdPath),
        s"operator $opId has no _metadata/metadata — cannot determine its stores")
      val mdLines = readText(fs, mdPath).split("\n", -1)
      require(mdLines(0).trim == "v1",
        s"operator $opId metadata is ${mdLines(0).trim}, not v1 — " +
          "(transformWithState checkpoints are not supported)")
      val md = mapper.readTree(mdLines(1)).asInstanceOf[ObjectNode]
      val operatorName = md.get("operatorInfo").get("operatorName").asText()
      require(SupportedOperators.contains(operatorName),
        s"operator $opId ($operatorName) is not in the supported set " +
          s"${SupportedOperators.mkString("{", ",", "}")}")

      // rewrite numPartitions in the operator metadata
      val stores = md.get("stateStoreInfo")
      (0 until stores.size()).foreach { i =>
        stores.get(i).asInstanceOf[ObjectNode].put("numPartitions", newParts)
      }
      mdLines(1) = mapper.writeValueAsString(md)
      writeText(fs, new Path(newRoot, s"state/$opId/_metadata/metadata"), mdLines.mkString("\n"))

      // carry the partition-0 schema file (restart-time compatibility check)
      val schemaDir = new Path(opSt.getPath, "0/_metadata")
      if (fs.exists(schemaDir)) {
        FileUtil.copy(fs, schemaDir, fs, new Path(newRoot, s"state/$opId/0/_metadata"),
          false, true, hadoopConf)
      }

      (0 until stores.size()).foreach { i =>
        val info = stores.get(i)
        val storeName = info.get("storeName").asText()
        val numColsPrefixKey = info.get("numColsPrefixKey").asInt()
        results += migrateStore(readSession, oldCkpt, newStateRoot, opId, operatorName,
          storeName, numColsPrefixKey, lastBatch, version, oldParts, newParts,
          importerConf, hadoopBc)
      }
    }
    logInfo(s"Repartition complete: ${results.map(_.keys).sum} keys across " +
      s"${results.size} stores now at $newParts partitions in $newCkpt")
    import spark.implicits._
    results.toSeq.toDF()
  }

  /** Move one (operator, store): statestore-source read at `lastBatch`,
    * HashPartitioning shuffle to `newParts`, per-partition SPI import
    * committing `version`. */
  private def migrateStore(
      readSession: SparkSession,
      oldCkpt: String,
      newStateRoot: String,
      opId: Long,
      operatorName: String,
      storeName: String,
      numColsPrefixKey: Int,
      lastBatch: Long,
      version: Long,
      oldParts: Int,
      newParts: Int,
      importerConf: StateStoreConf,
      hadoopBc: org.apache.spark.broadcast.Broadcast[SerializableConfiguration]): StoreResult = {
    val df = readSession.read.format("statestore")
      .option("batchId", lastBatch.toString)
      .option("operatorId", opId.toString)
      .option("storeName", storeName)
      .load(oldCkpt)
      .select(col("key"), col("value"))
    val keySchema = df.schema("key").dataType.asInstanceOf[StructType]
    val valueSchema = df.schema("value").dataType.asInstanceOf[StructType]

    // the prefix of the key the engine clusters on (scaladoc rule)
    val hashFields: Seq[String] =
      if (numColsPrefixKey > 0) keySchema.fieldNames.take(numColsPrefixKey).toSeq
      else if (operatorName == "symmetricHashJoin" && storeName.endsWith("keyWithIndexToValue"))
        keySchema.fieldNames.dropRight(1).toSeq
      else keySchema.fieldNames.toSeq
    require(hashFields.nonEmpty, s"operator $opId store $storeName has an empty hash key")
    val hashCols: Seq[Column] = hashFields.map(f => col("key").getField(f))

    val keySpec: KeyStateEncoderSpec =
      if (numColsPrefixKey > 0) PrefixKeyScanStateEncoderSpec(keySchema, numColsPrefixKey)
      else NoPrefixKeyStateEncoderSpec(keySchema)

    val nKey = keySchema.length
    val nVal = valueSchema.length
    val repart = df.repartition(newParts, hashCols: _*)
    val perPartitionKeys = repart.queryExecution.toRdd.mapPartitionsWithIndex { (pid, rows) =>
      val provider = new RocksDbStateStoreProvider()
      provider.init(
        StateStoreId(newStateRoot, opId, pid, storeName),
        keySchema, valueSchema, keySpec,
        useColumnFamilies = false, importerConf, hadoopBc.value.value,
        useMultipleValuesPerKey = false, stateSchemaProvider = None)
      var n = 0L
      try {
        // version-1 is absent in the fresh layout by design: the provider's
        // v1 recovery contract starts EMPTY there, and the single commit
        // below publishes the full snapshot the resumed query will load
        val store = provider.getStore(version - 1, None)
        val keyProj = UnsafeProjection.create(keySchema)
        val valueProj = UnsafeProjection.create(valueSchema)
        rows.foreach { r =>
          store.put(keyProj(r.getStruct(0, nKey)), valueProj(r.getStruct(1, nVal)))
          n += 1
        }
        val committed = store.commit()
        assert(committed == version, s"importer committed $committed, expected $version")
      } finally provider.close()
      Iterator.single(n)
    }.collect() // newParts partition COUNTS — scalars, not state rows

    StoreResult(opId, storeName, operatorName, oldParts, newParts, version,
      perPartitionKeys.sum)
  }

  private def readText(fs: org.apache.hadoop.fs.FileSystem, p: Path): String = {
    val in = fs.open(p)
    try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 4096, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
  }

  private def writeText(fs: org.apache.hadoop.fs.FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }
}
