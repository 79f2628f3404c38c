package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.dsl._

/** Property-based check of the query-DSL compiler: for randomly generated
  * query trees, the Spark-compiled predicate must select exactly the rows a
  * direct reference evaluator selects — the algebraic analog of the
  * reference's translator enumeration tests (`TestElasticsearchUtils`).
  * Runs against a fixed in-memory slice of `orders` so each trial is a
  * local filter, not a parquet scan.
  */
object QueryPropSpec extends Properties("QueryCompiler") {
  private lazy val spark = TestSession.spark

  private final case class O(key: Long, status: String, priority: String, price: Double)

  private lazy val rows: Seq[O] = {
    val collected = Tables.t(spark, TestSession.sf, "orders")
      .selectExpr("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
      .limit(300).collect()
    collected.map(r => O(r.getLong(0), r.getString(1), r.getString(2), r.getDouble(3))).toSeq
  }

  private lazy val df = {
    val s = spark
    import s.implicits._
    // tuples, not the local case class: Janino can't codegen accessors of a
    // case class nested in a test object (falls back to interpreted rows)
    rows.map(o => (o.key, o.status, o.priority, o.price))
      .toDF("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")
      .cache()
  }

  // ---- generators ----------------------------------------------------------

  private val statuses = Seq("O", "F", "P", "X") // X never occurs
  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  private val genClause: Gen[Clause] = Gen.oneOf(
    for { v <- Gen.oneOf(statuses); n <- Gen.oneOf(true, false) }
      yield Eq("o_orderstatus", v, n),
    for { vs <- Gen.someOf(priorities) }
      yield AnyOf("o_orderpriority", vs.toSeq),
    for { k <- Gen.chooseNum(0L, 20000L) } yield Eq("o_orderkey", k),
    for {
      lo <- Gen.option(Gen.chooseNum(0.0, 300000.0))
      hi <- Gen.option(Gen.chooseNum(0.0, 300000.0))
      loInc <- Gen.oneOf(true, false)
      hiInc <- Gen.oneOf(true, false)
    } yield RangeClause("o_totalprice", lo, loInc, hi, hiInc))

  private val genSingle: Gen[QueryComponent] = for {
    n <- Gen.chooseNum(0, 3)
    cs <- Gen.listOfN(n, genClause)
    any <- Gen.oneOf(true, false)
  } yield SingleQuery(cs, any)

  private val genQuery: Gen[QueryComponent] = Gen.oneOf(
    genSingle,
    for {
      a <- genSingle; b <- genSingle; and <- Gen.oneOf(true, false)
    } yield MultiQuery(and, Seq(a, b)))

  // ---- reference evaluator -------------------------------------------------

  private def fieldOf(o: O, f: String): Any = f match {
    case "o_orderkey" => o.key
    case "o_orderstatus" => o.status
    case "o_orderpriority" => o.priority
    case "o_totalprice" => o.price
  }

  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case _ => sys.error(s"type mismatch: $a vs $b")
  }

  private def evalClause(c: Clause, o: O): Boolean = c match {
    case Eq(f, v, false) => fieldOf(o, f) == v
    case Eq(f, v, true) => fieldOf(o, f) != v // columns are non-null here
    case AnyOf(f, vs) => vs.contains(fieldOf(o, f))
    case Present(f, p) => p // non-null data
    case AllOf(_, _) => sys.error("not generated")
    case RangeClause(f, lo, loInc, hi, hiInc) =>
      val x = fieldOf(o, f)
      lo.forall(l => if (loInc) cmp(x, l) >= 0 else cmp(x, l) > 0) &&
        hi.forall(h => if (hiInc) cmp(x, h) <= 0 else cmp(x, h) < 0)
  }

  private def evalQuery(q: QueryComponent, o: O): Boolean = q match {
    case SingleQuery(Nil, _, _) => true
    case SingleQuery(cs, any, _) =>
      if (any) cs.exists(evalClause(_, o)) else cs.forall(evalClause(_, o))
    case MultiQuery(_, Nil, _) => true
    case MultiQuery(and, qs, _) =>
      if (and) qs.forall(evalQuery(_, o)) else qs.exists(evalQuery(_, o))
  }

  // ---- the property --------------------------------------------------------

  property("compiled predicate selects exactly the model-selected rows") =
    Prop.forAllNoShrink(genQuery) { q =>
      val expected = rows.filter(evalQuery(q, _)).map(_.key).toSet
      val got = df.filter(QueryCompiler.compile(q))
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      if (got != expected) {
        println(s"MISMATCH for $q: spark=${got.size} model=${expected.size} " +
          s"diff=${(got diff expected) ++ (expected diff got)}")
      }
      got == expected
    }
}
