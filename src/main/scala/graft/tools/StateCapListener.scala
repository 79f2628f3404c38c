package graft.tools

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Captures the peak state-operator footprint (numRowsTotal /
  * memoryUsedBytes) across a streaming query's progress events — the
  * scale gate's evidence that a state-store provider holds the st13
  * session state within bounds. Max, not last: availableNow runs can
  * shrink state at the final watermark-driven eviction. */
final class StateCapListener extends StreamingQueryListener {
  @volatile var maxStateRows: Long = 0L
  @volatile var maxStateMem: Long = 0L

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit =
    e.progress.stateOperators.foreach { so =>
      maxStateRows = math.max(maxStateRows, so.numRowsTotal)
      // memoryUsedBytes alone is racy for the on-heap provider: a progress
      // event posted after the final commit can estimate an already-
      // unloaded map at a few hundred bytes. The provider custom metrics
      // carry the real figures; take the max across all of them.
      val custom = Option(so.customMetrics).map { m =>
        Seq("stateOnCurrentVersionSizeBytes", "loadedMapCacheSizeBytes",
          "rocksdbTotalMemoryUsage")
          .flatMap(k => Option(m.get(k)).map(_.longValue))
          .foldLeft(0L)(math.max)
      }.getOrElse(0L)
      maxStateMem = math.max(maxStateMem, math.max(so.memoryUsedBytes, custom))
    }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
