package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{ColumnMapping, TargetSchema}

/** Transform layer (SURVEY.md §2.A A10–A13, A19; §7 module 3).
  *
  * All transforms are declarative single-projection / single-aggregate plans
  * so Catalyst keeps pushdown and whole-stage codegen intact. The reference's
  * per-column `withColumn` loop (`services/transformer.py:25-48`) is folded
  * into ONE `select` — n `withColumn` calls would build n nested projections
  * that the optimizer must collapse; one projection node is the idiomatic
  * Spark shape.
  */
object Transforms {

  /** Exact all-column dedup ≙ `SparkDataTransformer.clean_data`
    * (`services/transformer.py:13-17`). Catalyst rewrites Deduplicate into a
    * hash aggregate over all columns — map-side partial aggregation makes
    * this one shuffle of distinct rows, which scales.
    */
  def dedupExact(df: DataFrame): DataFrame = df.dropDuplicates()

  /** Keyed dedup with a deterministic survivor (B14). `dropDuplicates(keys)`
    * keeps an ARBITRARY row per key — unacceptable for reproducible pipelines
    * — so the survivor is pinned: first row per key ordered by `tieBreak`.
    * One shuffle on the key (window partition), no driver involvement.
    */
  def dedupKeyed(df: DataFrame, keys: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Type vocabulary ≙ reference transformer (`services/transformer.py:31-46`):
    * string/integer/float/boolean are plain casts; date/timestamp parse with
    * an optional format (defaults `yyyy-MM-dd` / `yyyy-MM-dd HH:mm:ss`);
    * anything else raises.
    */
  private def castTo(c: Column, m: ColumnMapping): Column = m.dataType.toLowerCase match {
    case "string"  => c.cast(StringType)
    case "integer" => c.cast(IntegerType)
    case "float"   => c.cast(FloatType)
    case "double"  => c.cast(DoubleType)
    case "boolean" => c.cast(BooleanType)
    case "date" =>
      m.format.fold(c.cast(DateType))(fmt => to_date(c.cast(StringType), fmt))
    case "timestamp" =>
      m.format.fold(c.cast(TimestampType))(fmt => to_timestamp(c.cast(StringType), fmt))
    case other => throw new IllegalArgumentException(s"Unsupported data type: $other")
  }

  /** Rename+cast projection ≙ `map_columns_to_target`
    * (`services/transformer.py:25-48`) as a single `select`.
    */
  def mapColumnsToTarget(df: DataFrame, schema: TargetSchema): DataFrame =
    df.select(schema.columns.map(m => castTo(col(m.source), m).as(m.name)): _*)

  /** SCD Type-2 historization: collapse an ordered change stream into
    * versioned validity intervals per key. Consecutive rows whose tracked
    * attributes are unchanged (null-safe compare) fold into one version;
    * each surviving version spans [valid_from, valid_to) with the open
    * interval flagged `is_current` — the standard warehouse dimension-
    * history shape, built from two window passes over the SAME (key,
    * order) partitioning: change detection on the full stream, then
    * lead() interval stitching on the (much smaller) version set. One
    * exchange keyed on the dimension key at any scale; `tieBreak` makes
    * ordering total so the version history is deterministic.
    */
  def scd2Historize(
      df: DataFrame, keys: Seq[String], attrs: Seq[String],
      ts: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (ts +: tieBreak).map(col)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    val changed = attrs.map(a => not(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val versions = df
      .withColumn("__chg", row_number().over(w) === 1 || changed)
      .filter(col("__chg"))
    versions.select(
      (keys ++ attrs).map(col) ++ Seq(
        col(ts).as("valid_from"),
        lead(col(ts), 1).over(w).as("valid_to"),
        lead(col(ts), 1).over(w).isNull.as("is_current"),
        row_number().over(w).as("version")): _*)
  }

  /** AES-GCM column decryption ≙ driver-side `decrypt_pass`
    * (`utils/helper_functions.py:54-74`) lifted into a codegen'd Spark
    * expression: runs distributed on executors instead of one Python driver.
    * Ciphertext layout: IV || ciphertext || tag (Spark's GCM convention).
    */
  def aesDecryptCol(ciphertext: Column, key: Column): Column =
    aes_decrypt(ciphertext, key, lit("GCM")).cast(StringType)

  def aesEncryptCol(plaintext: Column, key: Column): Column =
    aes_encrypt(plaintext.cast(StringType).cast(BinaryType), key, lit("GCM"))
}
