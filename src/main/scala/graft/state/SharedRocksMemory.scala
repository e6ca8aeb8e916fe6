package graft.state

import org.apache.spark.internal.Logging
import org.rocksdb.{Cache, LRUCache, WriteBufferManager}

/** JVM-wide RocksDB memory budget, shared by every provider instance in the
  * executor.
  *
  * Why: per-instance write-buffer knobs (the reference's fixed 200 MB × 3,
  * `RocksDbStateStoreProvider.scala:101-107`, kept configurable in
  * [[RocksDbConf]]) bound ONE instance — but an executor hosts one instance
  * per (operator × partition × store name), so a 4-store watermarked join at
  * 200 shuffle partitions can open hundreds of DBs whose worst-case native
  * memory is instances × buffers, far beyond any container limit. The
  * standard RocksDB recipe caps the fleet instead: one [[LRUCache]] holding
  * the budget, one [[WriteBufferManager]] charging every instance's
  * memtables INTO that cache, so block cache + memtables together never
  * exceed the budget; when memtables reach the manager's share (half the
  * budget) RocksDB flushes/stalls writers instead of growing.
  *
  * Set `spark.sql.streaming.stateStore.rocksdb.totalMemoryMb` > 0 to enable
  * (0 = per-instance sizing only, the reference-compatible default). The
  * budget is fixed by the FIRST provider that observes a positive value —
  * one executor has one memory ceiling; later differing values log a
  * warning and reuse the existing pool. The native objects are deliberately
  * never closed: they must outlive every DB, and they live exactly as long
  * as the executor JVM.
  */
object SharedRocksMemory extends Logging {
  final case class Pool(cache: Cache, writeBufferManager: WriteBufferManager, budgetBytes: Long)

  @volatile private var pool: Option[Pool] = None

  /** The shared pool for a positive budget, or None when unbounded. */
  def forBudget(totalMemoryMb: Long): Option[Pool] = {
    if (totalMemoryMb <= 0) return None
    val bytes = totalMemoryMb * 1024L * 1024L
    pool match {
      case Some(p) =>
        if (p.budgetBytes != bytes) logWarning(
          s"RocksDB memory budget already fixed at ${p.budgetBytes / (1024 * 1024)} MB " +
            s"by an earlier provider; ignoring $totalMemoryMb MB (one pool per JVM)")
        Some(p)
      case None => synchronized {
        pool.orElse {
          // Memtables get at most half the budget (allowStall=true blocks
          // writers at the cap instead of overshooting); because they are
          // cost-charged into the cache, cache usage accounts for BOTH and
          // the budget is a true combined ceiling.
          val cache = new LRUCache(bytes)
          val wbm = new WriteBufferManager(bytes / 2, cache, /*allowStall=*/ true)
          logInfo(s"RocksDB shared memory pool: $totalMemoryMb MB " +
            s"(write buffers capped at ${totalMemoryMb / 2} MB, charged to the block cache)")
          pool = Some(Pool(cache, wbm, bytes))
          pool
        }
      }
    }
  }

  /** Combined usage (blocks + charged memtables) in bytes; 0 if unbounded. */
  def usageBytes: Long = pool.map(_.cache.getUsage).getOrElse(0L)
}
