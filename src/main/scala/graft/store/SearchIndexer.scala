package graft.store

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.functions.TextFunctions
import graft.model.SearchIndexSchema

/** Search-index field shaping driven by the bucket's [[SearchIndexSchema]] —
  * the engine's analog of the reference's dual analyzed/raw field
  * generation (`ElasticsearchIndexUtils.java:192-206` default templates:
  * every string field gets an analyzed form plus a `.raw` keyword form).
  *
  * Columnar re-expression: the RAW field is the column itself (Parquet is
  * already exact-match/sort friendly); the ANALYZED form is an added
  * `<field>__tokens` array column. `tokenize_by_default` picks which string
  * fields get the analyzed form; a `type_override` entry pins a field to
  * its declared type and suppresses tokenization (the reference's
  * not-analyzed override), while override value `"TOKENIZED"` forces
  * tokenization when the default is off.
  *
  * One narrow projection — no shuffle, no UDF; token arrays are
  * `TextFunctions.tokens` (codegen'd split).
  */
object SearchIndexer {

  val TokensSuffix = "__tokens"

  /** Which columns of `df` the schema says to tokenize: default-on → every
    * string column unless pinned to a non-TOKENIZED declared type;
    * default-off → only columns explicitly overridden TOKENIZED. */
  def tokenizedFields(df: DataFrame, s: SearchIndexSchema): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType == StringType &&
        (if (s.tokenizeByDefault)
           s.typeOverride.get(f.name).forall(_ == "TOKENIZED")
         else s.typeOverride.get(f.name).contains("TOKENIZED")) => f.name
    }.toSeq

  /** Add `<field>__tokens` alongside each tokenized field (raw columns stay
    * untouched — dual-field semantics). */
  def withAnalyzedFields(df: DataFrame, s: SearchIndexSchema): DataFrame =
    tokenizedFields(df, s).foldLeft(df) { (d, f) =>
      d.withColumn(f + TokensSuffix, TextFunctions.tokens(col(f)))
    }
}
