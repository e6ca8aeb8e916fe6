package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{RuntimeConfig, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** User-facing helper API, mirroring the reference's `implicits.scala`.
  *
  *  - `useGraftRocksDbStateStore()` on a session builder sets the provider
  *    class conf, exactly like the reference's `useRocksDBStateStore()`
  *    (reference `implicits.scala:32-38`).
  *  - `stateTimeout(...)` on a [[DataStreamWriter]] wires a per-query state
  *    TTL (reference `implicits.scala:40-71`) by (1) resolving the query
  *    name (explicit arg, else `UNNAMED_QUERY`), (2) resolving the
  *    checkpoint root (explicit arg, else the session's
  *    `spark.sql.streaming.checkpointLocation`, else error), (3) appending
  *    the query name to the checkpoint path — the channel through which the
  *    executor-side provider recovers the query name — and (4) publishing
  *    `spark.sql.streaming.stateStore.stateExpirySecs.<queryName>`.
  *
  * The reference read the writer's previously-set options through a private
  * field via reflection (`implicits.scala:73-79`); that hack is dropped:
  * callers pass the name/location explicitly or rely on session conf.
  */
object implicits {

  implicit class GraftStateSessionBuilder(builder: SparkSession.Builder) {
    def useGraftRocksDbStateStore(): SparkSession.Builder =
      builder.config("spark.sql.streaming.stateStore.providerClass",
        classOf[RocksDbStateStoreProvider].getName)
  }

  implicit class GraftStateDataStreamWriter[T](writer: DataStreamWriter[T]) {

    def stateTimeout(
        runtimeConfig: RuntimeConfig,
        queryName: String = "",
        expirySecs: Int = -1,
        checkpointLocation: String = ""): DataStreamWriter[T] = {
      val name = Option(queryName).map(_.trim).filter(_.nonEmpty)
        .getOrElse(RocksDbConf.UNNAMED_QUERY)
      val root = Option(checkpointLocation).map(_.trim).filter(_.nonEmpty)
        .orElse(runtimeConfig.getOption("spark.sql.streaming.checkpointLocation"))
        .getOrElse(throw new IllegalStateException(
          "Checkpoint location must be specified either via stateTimeout(checkpointLocation = ...) " +
            "or spark.sql.streaming.checkpointLocation"))
      val location = new Path(root, name).toString

      runtimeConfig.set(
        s"${RocksDbConf.STATE_EXPIRY_SECS}.$name", math.max(expirySecs, -1).toString)

      (if (name != RocksDbConf.UNNAMED_QUERY) writer.queryName(name) else writer)
        .option("checkpointLocation", location)
    }
  }
}
