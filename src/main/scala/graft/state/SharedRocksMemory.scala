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
  * budget) RocksDB schedules flushes instead of growing.
  *
  * The manager is created with `allowStall=false` — flush-don't-stall, the
  * same mode Spark's built-in bounded-memory RocksDB provider uses. With
  * `allowStall=true` an executor hosting many instances deadlocks: each
  * memtable's ARENA is charged on allocation, dozens of idle-but-allocated
  * arenas alone can cross the cap, and a stalled writer waits on flushes
  * that never run because the memtables holding the budget belong to idle
  * stores (round-7 postmortem: 4-store join × 8 partitions wedged every
  * writer in the JVM for 400+ s). Flush mode instead picks the largest
  * mutable memtable and flushes it, so the cap is enforced by I/O, never by
  * blocking. Budget-aware per-instance buffer sizing (see
  * `RocksDbStateStoreProvider.cfOptions`) keeps those flushes rare.
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
          // Memtables get at most half the budget; because they are
          // cost-charged into the cache, cache usage accounts for BOTH and
          // the budget is a true combined ceiling. allowStall MUST stay
          // false — see the class doc for the many-instance deadlock that
          // stall mode causes.
          val cache = new LRUCache(bytes)
          val wbm = new WriteBufferManager(bytes / 2, cache, /*allowStall=*/ false)
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

  /** Test-only: forget the current pool so the next `forBudget` re-pins at
    * the caller's budget. The old native objects are deliberately NOT closed
    * — DBs opened against them may still be live, and native cache/manager
    * objects must outlive every DB that references them — so they leak for
    * the remainder of the test JVM (same lifetime contract as production).
    * Without this hook, whichever suite runs first pins the JVM's budget and
    * every later squeeze test silently asserts against the wrong ceiling. */
  private[state] def resetForTest(): Unit = synchronized { pool = None }
}
