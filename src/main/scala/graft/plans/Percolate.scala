package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator percolation: match every input row against a large
  * registry of stored-query predicates in ONE scan (SURVEY §2 X-family
  * "reverse search"; the reference round-trips documents through ES's
  * percolator — `aleph2_search_index_service_elasticsearch` delegates the
  * whole workload).
  *
  * Why a custom plan node instead of the fused `explode(array(when..))`
  * projection ([[graft.ops.Percolator.matches]] keeps that path for small
  * registries): whole-stage codegen inlines EVERY expression into one
  * `doConsume` method and — when operator inputs are pipelined local
  * variables rather than an `InternalRow` — `splitExpressionsWithCurrentInputs`
  * refuses to carve them into helper methods, so a ~600-predicate registry
  * overflows janino's 64KB method limit and the whole stage silently falls
  * back to INTERPRETED expression eval (~10× per-row). Sharding the
  * registry into a union of fused projections keeps codegen but re-reads
  * the input once per shard — S scans at 100 TB.
  *
  * This node gets both halves: the input is scanned ONCE, and each shard
  * of ≤`maxPerProjection` predicates compiles into its own row-based
  * [[UnsafeProjection]] — a separate generated class with its own 64KB
  * methods and constant pool, where Catalyst's `splitExpressions` DOES
  * split (the input is a real row). Matching is narrow (no shuffle, no
  * state), so the node preserves the child's partitioning and drops into
  * Structured Streaming unchanged.
  */
case class PercolateNode(
    shards: Seq[Seq[Expression]], // per shard: one boolean predicate per query
    queryIds: Seq[String], // flattened, parallel to shards.flatten
    idAttrs: Seq[Attribute], // record-identifying columns, ⊆ child.output
    qidAttr: Attribute, // the output query_id column
    child: LogicalPlan)
    extends UnaryNode {
  require(shards.map(_.size).sum == queryIds.size,
    "one query id per stored predicate")
  override def output: Seq[Attribute] = idAttrs :+ qidAttr
  // query_id is minted by this node, not read from the child
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(qidAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): PercolateNode =
    copy(child = newChild)
}

case class PercolateExec(
    shards: Seq[Seq[Expression]],
    queryIds: Seq[String],
    idAttrs: Seq[Attribute],
    qidAttr: Attribute,
    child: SparkPlan)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = idAttrs :+ qidAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(qidAttr :: Nil)
  // narrow: one input row fans out to its matches in place
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val shardExprs = shards
    val ids = queryIds.map(UTF8String.fromString).toArray
    val outAttrs = idAttrs :+ qidAttr
    child.execute().mapPartitions({ iter =>
      // one generated class per shard — row-based, so splitExpressions
      // carves oversized shards into helper methods instead of failing
      val projs = shardExprs.map(sh => UnsafeProjection.create(sh, childOutput))
      val shardSizes = shardExprs.map(_.size)
      val outProj = UnsafeProjection.create(outAttrs, childOutput :+ qidAttr)
      val qidRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val hits = new scala.collection.mutable.ArrayBuffer[Int](16)
      iter.flatMap { row =>
        hits.clear()
        var base = 0
        var s = 0
        while (s < projs.length) {
          val m = projs(s)(row) // reused buffer; consumed before next apply
          var i = 0
          val n = shardSizes(s)
          while (i < n) {
            // NULL predicate = non-match, the WHERE-clause rule
            if (!m.isNullAt(i) && m.getBoolean(i)) hits += base + i
            i += 1
          }
          base += n
          s += 1
        }
        if (hits.isEmpty) Iterator.empty
        else {
          // snapshot: flatMap consumes this iterator fully before the next
          // input row, but the closure must not share the mutable buffer
          val matched = hits.toArray
          matched.iterator.map { qi =>
            qidRow.update(0, ids(qi))
            outProj(joined(row, qidRow))
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): PercolateExec =
    copy(child = newChild)
}

/** Plans [[PercolateNode]] 1:1 onto [[PercolateExec]]; injected via
  * [[GraftExtensions]] so the node works from batch AND streaming plans
  * (IncrementalExecution uses the session's injected strategies too). */
case class PercolateStrategy(spark: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PercolateNode(shards, ids, idAttrs, qidAttr, child) =>
      PercolateExec(shards, ids, idAttrs, qidAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}
