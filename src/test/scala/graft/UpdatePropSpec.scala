package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.dsl._

/** Property-based check of the update-DSL compiler: for randomly generated
  * (predicate, op-sequence) pairs, the Spark rewrite must produce exactly
  * the documents a direct Mongo-semantics reference evaluator produces —
  * the update-side analog of [[QueryPropSpec]]. The evaluator mirrors the
  * documented contract: the match predicate is evaluated ONCE against the
  * original document, ops fold sequentially over the doc state, nulls are
  * treated as the compiler treats them (coalesce-to-0 increments, null
  * arrays stay null through $pullAll/$pull, null-safe negated equality).
  */
object UpdatePropSpec extends Properties("UpdateCompiler") {
  private lazy val spark = TestSession.spark

  private final case class D(key: Long, status: Option[String],
      n: Option[Long], tags: Option[Seq[Long]])

  // deterministic fixture with nulls and duplicate array elements
  private lazy val docs: Seq[D] = (0L until 48L).map { k =>
    val status = (k % 4) match {
      case 0 => Some("A"); case 1 => Some("B"); case 2 => Some("C"); case _ => None
    }
    val n = if (k % 5 == 4) None else Some(k % 7)
    val tags = (k % 6) match {
      case 0 => None
      case 1 => Some(Seq.empty[Long])
      case m => Some((0L until m).map(i => (k + i) % 5) ++ Seq(k % 5)) // dupes
    }
    D(k, status, n, tags)
  }

  private lazy val df = {
    val s = spark
    import s.implicits._
    docs.map(d => (d.key, d.status, d.n, d.tags))
      .toDF("key", "status", "n", "tags").cache()
  }

  // ---- generators ----------------------------------------------------------

  private val genPredClause: Gen[Clause] = Gen.oneOf(
    for { v <- Gen.oneOf("A", "B", "C", "Z"); neg <- Gen.oneOf(true, false) }
      yield Eq("status", v, neg),
    for {
      lo <- Gen.option(Gen.chooseNum(0L, 6L))
      hi <- Gen.option(Gen.chooseNum(0L, 6L))
      loInc <- Gen.oneOf(true, false)
      hiInc <- Gen.oneOf(true, false)
    } yield RangeClause("n", lo, loInc, hi, hiInc))

  private val genPred: Gen[QueryComponent] = for {
    k <- Gen.chooseNum(0, 2)
    cs <- Gen.listOfN(k, genPredClause)
    any <- Gen.oneOf(true, false)
  } yield SingleQuery(cs, any)

  private val genElemQuery: Gen[QueryComponent] = Gen.oneOf(
    for { v <- Gen.chooseNum(0L, 4L); neg <- Gen.oneOf(true, false) }
      yield SingleQuery(Seq(Eq("", v, neg)), false),
    for { lo <- Gen.chooseNum(0L, 4L); loInc <- Gen.oneOf(true, false) }
      yield SingleQuery(Seq(RangeClause("", Some(lo), loInc, None, false)), false))

  private val genVals: Gen[Seq[Any]] =
    Gen.nonEmptyListOf(Gen.chooseNum(0L, 5L)).map(_.take(3).map(v => v: Any))

  private val genOp: Gen[UpdateOp] = Gen.frequency(
    3 -> Gen.oneOf("A", "X").map(v => SetField("status", v)),
    3 -> Gen.chooseNum(0L, 9L).map(v => SetField("n", v)),
    3 -> Gen.oneOf("status", "n", "tags").map(UnsetField),
    3 -> Gen.chooseNum(-3L, 3L).map(by => Increment("n", by)),
    3 -> (for { vs <- genVals; dd <- Gen.oneOf(true, false) }
      yield AddItems("tags", vs, dd)),
    2 -> genVals.map(vs => RemoveItems("tags", vs)),
    2 -> genElemQuery.map(q => RemoveMatching("tags", q)),
    1 -> Gen.const(DeleteDoc))

  private val genUpdate: Gen[UpdateComponent] =
    Gen.chooseNum(1, 4).flatMap(k =>
      Gen.listOfN(k, genOp).map(ops => UpdateComponent(ops)))

  // ---- reference evaluator -------------------------------------------------

  private def asL(a: Any): Long = a.asInstanceOf[Long]

  /** Three-valued predicate collapsed to boolean exactly as the compiler's
    * coalesce(pred, false) + null-safe negation do. */
  private def evalClause(c: Clause, d: D): Boolean = c match {
    case Eq("status", v, false) => d.status.contains(v)
    case Eq("status", v, true) => !d.status.contains(v) // IS DISTINCT FROM
    case RangeClause("n", lo, loInc, hi, hiInc) =>
      // a range with NO bounds compiles to lit(true) — it matches null-n
      // docs too, so the model must not require n to be present
      if (lo.isEmpty && hi.isEmpty) true
      else d.n.exists(x =>
        lo.forall(l => if (loInc) x >= asL(l) else x > asL(l)) &&
          hi.forall(h => if (hiInc) x <= asL(h) else x < asL(h)))
    case other => sys.error(s"not generated: $other")
  }

  private def evalPred(q: QueryComponent, d: D): Boolean = q match {
    case SingleQuery(Nil, _, _) => true
    case SingleQuery(cs, any, _) =>
      if (any) cs.exists(evalClause(_, d)) else cs.forall(evalClause(_, d))
    case other => sys.error(s"not generated: $other")
  }

  private def evalElem(q: QueryComponent, x: Long): Boolean = q match {
    case SingleQuery(cs, any, _) =>
      val hit = (c: Clause) => c match {
        case Eq("", v, false) => x == asL(v)
        case Eq("", v, true) => x != asL(v)
        case RangeClause("", lo, loInc, hi, hiInc) =>
          lo.forall(l => if (loInc) x >= asL(l) else x > asL(l)) &&
            hi.forall(h => if (hiInc) x <= asL(h) else x < asL(h))
        case other => sys.error(s"not generated: $other")
      }
      if (any) cs.exists(hit) else cs.forall(hit)
    case other => sys.error(s"not generated: $other")
  }

  private def applyOps(d0: D, ops: Seq[UpdateOp]): D =
    ops.foldLeft(d0) { (d, op) =>
      op match {
        case SetField("status", v: String) => d.copy(status = Some(v))
        case SetField("n", v: Long) => d.copy(n = Some(v))
        case SetField(f, v) => sys.error(s"not generated: $f=$v")
        case UnsetField("status") => d.copy(status = None)
        case UnsetField("n") => d.copy(n = None)
        case UnsetField("tags") => d.copy(tags = None)
        case UnsetField(f) => sys.error(s"not generated: $f")
        case Increment("n", by) => d.copy(n = Some(d.n.getOrElse(0L) + by.longValue))
        case Increment(f, _) => sys.error(s"not generated: $f")
        case AddItems("tags", vs, false) => // $push: concat, null seeds empty
          d.copy(tags = Some(d.tags.getOrElse(Seq.empty) ++ vs.map(_.asInstanceOf[Long])))
        case AddItems("tags", vs, true) => // $addToSet: union dedups everything
          d.copy(tags = Some(
            (d.tags.getOrElse(Seq.empty) ++ vs.map(_.asInstanceOf[Long])).distinct))
        case AddItems(f, _, _) => sys.error(s"not generated: $f")
        case RemoveItems("tags", vs) => // $pullAll: array_except dedups, null stays null
          d.copy(tags = d.tags.map(_.distinct.filterNot(vs.contains)))
        case RemoveItems(f, _) => sys.error(s"not generated: $f")
        case RemoveMatching("tags", q) => // $pull: per-element filter, keeps dupes
          d.copy(tags = d.tags.map(_.filterNot(evalElem(q, _))))
        case RemoveMatching(f, _) => sys.error(s"not generated: $f")
        case DeleteDoc => d // handled at set level
      }
    }

  private def model(pred: QueryComponent, u: UpdateComponent): Seq[D] = {
    if (u.ops.contains(DeleteDoc)) docs.filterNot(evalPred(pred, _))
    else docs.map(d => if (evalPred(pred, d)) applyOps(d, u.ops) else d)
  }

  // ---- the property --------------------------------------------------------

  private def key(d: D) = (d.key, d.status, d.n, d.tags.map(_.toList))

  property("rewrite equals the Mongo-semantics reference evaluator") =
    Prop.forAllNoShrink(genPred, genUpdate) { (pred, u) =>
      val expected = model(pred, u).map(key).sortBy(_._1)
      val got = UpdateCompiler
        .applyUpdate(df, QueryCompiler.compile(pred), u)
        .collect().map { r =>
          (r.getLong(0),
            Option(r.getString(1)),
            if (r.isNullAt(2)) None else Some(r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getSeq[Long](3).toList))
        }.toSeq.sortBy(_._1)
      if (got != expected) {
        val diff = got.zip(expected).filter { case (a, b) => a != b }
        println(s"MISMATCH pred=$pred ops=${u.ops}\n first diffs: ${diff.take(3)}")
      }
      got == expected
    }
}
