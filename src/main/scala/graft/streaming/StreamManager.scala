package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** ST5 topology lifecycle: a named registry of running streams — the
  * engine's analog of the reference's Storm topology management (submit /
  * check / kill by bucket name; `StormController` usage in
  * `aleph2_analytic_services_storm`). On this engine a "topology" is a
  * `StreamingQuery`; lifecycle is start/status/stop, checkpoint-resumable
  * by construction (the checkpoint dir, not this registry, is the durable
  * state — the registry is per-driver bookkeeping, exactly like the
  * reference's in-memory topology handle cache).
  */
final class StreamManager {

  final case class StreamStatus(
      name: String,
      id: String,
      isActive: Boolean,
      statusMessage: String,
      lastBatchRows: Option[Long])

  private val queries = TrieMap.empty[String, StreamingQuery]

  /** Start a configured writer under `name`; fails if that name is live
    * (the reference likewise refuses duplicate topology names). */
  def start(name: String, writer: DataStreamWriter[Row]): StreamingQuery = {
    require(!queries.get(name).exists(_.isActive), s"stream '$name' already running")
    val q = writer.queryName(name).start()
    queries.put(name, q)
    q
  }

  def get(name: String): Option[StreamingQuery] = queries.get(name)

  def status(name: String): Option[StreamStatus] = queries.get(name).map { q =>
    StreamStatus(name, q.id.toString, q.isActive, q.status.message,
      Option(q.lastProgress).map(_.numInputRows))
  }

  def listStreams(): Seq[String] = queries.keys.toSeq.sorted

  /** Stop (and deregister) a stream; true iff it existed. Restart later by
    * `start`-ing the same writer/checkpoint — Structured Streaming resumes
    * from the checkpoint, the at-least-once contract the reference's
    * kill/resubmit cycle provided. */
  def stop(name: String): Boolean = queries.remove(name).exists { q =>
    if (q.isActive) q.stop()
    true
  }

  def stopAll(): Unit = listStreams().foreach(stop)

  /** Block until every registered stream terminates (AvailableNow drains). */
  def awaitAll(timeoutMs: Long = 300000): Unit =
    queries.values.foreach(_.awaitTermination(timeoutMs))
}
