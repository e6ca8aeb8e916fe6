package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Bridge to release the block-manager blocks behind a
  * `localCheckpoint(true)`-ed frame. `Dataset.unpersist` only touches
  * `CacheManager` entries from `.persist`/`.cache`; a local checkpoint's
  * blocks are pinned by the persisted RDD inside the plan's [[LogicalRDD]]
  * leaf and are otherwise only reclaimed when the driver happens to GC the
  * RDD object (ContextCleaner weak refs) — nondeterministic, which is how
  * iterative loops leak storage memory round over round. Like
  * [[ColumnBridge]], this file lives outside `graft` only to reach
  * `private[sql]` surface and contains no logic beyond the traversal.
  */
object CheckpointBridge {
  /** Unpersist every persisted RDD leaf in `df`'s analyzed plan (the local
    * checkpoint's blocks). Only call once nothing still reads from `df`. */
  def unpersistLocalCheckpoint(df: DataFrame, blocking: Boolean = false): Unit =
    df.queryExecution.analyzed.foreach {
      case l: LogicalRDD if l.rdd.getStorageLevel != StorageLevel.NONE =>
        l.rdd.unpersist(blocking)
      case _ => ()
    }
}
