package graft.util

/** Driver-thread overlap for INDEPENDENT deterministic legs of one query
  * (guide §2.6): Spark's scheduler happily runs several jobs at once —
  * actions are only sequential because driver code calls them
  * sequentially. A leg whose value does not depend on any other leg
  * (a retrain for the NEXT index generation, a stream-input staging
  * write) can run on a pooled thread so its stages back-fill the cores
  * the calling thread's per-action tail leaves idle.
  *
  * Use only for legs with no shared mutable state; values must be
  * identical regardless of execution order (all graft legs are
  * deterministic functions of their frozen inputs). Job
  * descriptions/groups are thread-local, so concurrent legs stay
  * correctly labeled in the UI.
  */
object Async {
  def future[A](body: => A): java.util.concurrent.CompletableFuture[A] =
    java.util.concurrent.CompletableFuture.supplyAsync(() => body)
}
