package org.apache.spark.sql.graftx

import org.apache.spark.scheduler.SparkListenerBlockUpdated
import org.apache.spark.storage.{BlockManagerId, BlockUpdatedInfo, RDDBlockId,
  StorageLevel}

/** Test-only factory for synthetic block-update events: the
  * `BlockManagerId`/`BlockUpdatedInfo` companions are `private[spark]`,
  * reachable from the graftx bridge package only (the same boundary the
  * main-source bridge objects use). Lets `StorageTelemetry`'s
  * eviction-transition logic be specified deterministically — a genuine
  * LRU drop needs real memory pressure, which a unit test can't arrange
  * reliably.
  */
object BlockEvents {
  private val bm = BlockManagerId("driver", "localhost", 7077)

  def updated(rddId: Int, part: Int, level: StorageLevel,
              mem: Long): SparkListenerBlockUpdated =
    SparkListenerBlockUpdated(
      BlockUpdatedInfo(bm, RDDBlockId(rddId, part), level, mem, 0L))
}
