package graft.dsl

/** The update DSL — algebra of the reference's `UpdateComponent`, whose only
  * complete translation is MongoDB's `MongoDbUtils.createUpdateObject`
  * (`aleph2_crud_service_mongodb/.../utils/MongoDbUtils.java:273-336`); the ES
  * side is unimplemented in the reference, so Mongo semantics are the spec.
  *
  * In a Spark engine, updates over immutable columnar files are *rewrite
  * jobs*: compile the update to per-column expressions guarded by the match
  * predicate (U1-U8), then rewrite the table (U9-U11) — see
  * [[UpdateCompiler]].
  */
sealed trait UpdateOp
/** U1 `$set` */
final case class SetField(field: String, value: Any) extends UpdateOp
/** U2 `$unset` */
final case class UnsetField(field: String) extends UpdateOp
/** U3 `$inc` */
final case class Increment(field: String, by: Number) extends UpdateOp
/** U4/U5 `$push` / `$addToSet` (+`$each` — always a collection here) */
final case class AddItems(field: String, values: Seq[Any], dedup: Boolean) extends UpdateOp
/** U6 `$pullAll` */
final case class RemoveItems(field: String, values: Seq[Any]) extends UpdateOp
/** U7 `$pull` with a nested query on array elements */
final case class RemoveMatching(field: String, pred: QueryComponent) extends UpdateOp
/** (beyond ref) Mongo `$set` with `arrayFilters` — `{"items.$[e].f": v}
  * , arrayFilters: [{e: <pred>}]`: set a sub-field of the array ELEMENTS
  * matching the element predicate, leaving other elements untouched.
  * The positional-update surface RemoveMatching filters with, applied to
  * mutation instead of removal. */
final case class SetMatching(field: String, elemPred: QueryComponent,
    subField: String, value: Any) extends UpdateOp
/** U8 whole-document delete sentinel (`MongoDbUtils.java:303-304`) */
case object DeleteDoc extends UpdateOp

final case class UpdateComponent(ops: Seq[UpdateOp] = Nil) {
  private def add(op: UpdateOp) = copy(ops = ops :+ op)
  def set(field: String, v: Any): UpdateComponent = add(SetField(field, v))
  def unset(field: String): UpdateComponent = add(UnsetField(field))
  def increment(field: String, by: Number): UpdateComponent = add(Increment(field, by))
  def push(field: String, vs: Seq[Any], dedup: Boolean = false): UpdateComponent =
    add(AddItems(field, vs, dedup))
  def pullAll(field: String, vs: Seq[Any]): UpdateComponent = add(RemoveItems(field, vs))
  def pull(field: String, pred: QueryComponent): UpdateComponent =
    add(RemoveMatching(field, pred))
  def setMatching(field: String, elemPred: QueryComponent,
      subField: String, v: Any): UpdateComponent =
    add(SetMatching(field, elemPred, subField, v))
  def deleteDoc(): UpdateComponent = add(DeleteDoc)
}

object Update {
  def update(): UpdateComponent = UpdateComponent()
}
