package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.streaming.state.{RecordType, SupportsFineGrainedReplay}
import org.apache.spark.util.NextIterator

/** Bridge for [[SupportsFineGrainedReplay]]'s change-feed method, whose
  * return type [[NextIterator]] is `private[spark]` and therefore cannot be
  * named from the `graft` namespace. The provider implements
  * [[changeFeedRecords]] (accessible types only, plus a close hook); this
  * trait adapts it to the SPI shape. Like [[ColumnBridge]], no logic lives
  * here beyond the adaptation.
  */
trait ChangeFeedBridge extends SupportsFineGrainedReplay {

  /** One closeable record stream: (recordType, key, value, batchId). */
  protected def changeFeedRecords(
      startVersion: Long,
      endVersion: Long,
      colFamilyNameOpt: Option[String],
      endStateStoreCkptId: Option[String])
    : Iterator[(RecordType.Value, UnsafeRow, UnsafeRow, Long)] with AutoCloseable

  override def getStateStoreChangeDataReader(
      startVersion: Long,
      endVersion: Long,
      colFamilyNameOpt: Option[String],
      endStateStoreCkptId: Option[String])
    : NextIterator[(RecordType.Value, UnsafeRow, UnsafeRow, Long)] = {
    val records = changeFeedRecords(startVersion, endVersion, colFamilyNameOpt, endStateStoreCkptId)
    new NextIterator[(RecordType.Value, UnsafeRow, UnsafeRow, Long)] {
      override protected def getNext(): (RecordType.Value, UnsafeRow, UnsafeRow, Long) =
        if (records.hasNext) records.next()
        else { finished = true; null }
      override protected def close(): Unit = records.close()
    }
  }
}
