package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (ETL validation stage): each check
  * contributes a violation-count AGGREGATE expression, so `run` evaluates
  * every check in ONE aggregation pass over the data — no per-check scans
  * — and returns a row per check with total/violations/pass.
  */
object QualityChecks {

  /** `violations` is an aggregate Column counting violating rows. */
  final case class Check(name: String, violations: Column)

  // coalesce: on an EMPTY input sum(...) is NULL, which would make both
  // `violations` and `passed` NULL — the gate would neither pass nor fail
  // and a downstream filter on `passed` would silently drop the check row
  private def countWhere(pred: Column): Column =
    coalesce(sum(when(pred, 1L).otherwise(0L)), lit(0L))

  def notNull(c: String): Check =
    Check(s"not_null_$c", countWhere(col(c).isNull))
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"range_$c", countWhere(col(c) < lo || col(c) > hi))
  def matches(c: String, regex: String): Check =
    Check(s"regex_$c", countWhere(!col(c).rlike(regex)))
  def inSet(c: String, values: Seq[String]): Check =
    Check(s"in_set_$c", countWhere(!col(c).isin(values: _*)))
  /** Duplicate-key count — an aggregate check, same single pass. */
  def uniqueKey(c: String): Check =
    Check(s"unique_$c", count(col(c)) - countDistinct(col(c)))

  /** One aggregate over the frame, then stack to one row per check.
    * Check names are spliced into SQL, so identifiers are backtick-quoted
    * and the literal is escaped — a column like `unit-price` would
    * otherwise parse as subtraction, and a quote would break the literal.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "at least one check required")
    val aggs = count(lit(1)).as("total") +:
      checks.map(c => c.violations.cast("long").as(c.name))
    val wide = df.agg(aggs.head, aggs.tail: _*)
    def ident(n: String): String = "`" + n.replace("`", "``") + "`"
    def strLit(n: String): String = "'" + n.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stacked = checks.map(c => s"${strLit(c.name)}, ${ident(c.name)}").mkString(", ")
    wide.selectExpr("total",
        s"stack(${checks.size}, $stacked) AS (check_name, violations)")
      .select(
        col("check_name"),
        col("total"),
        col("violations"),
        (col("violations") === 0L).as("passed"))
      .orderBy(col("check_name"))
  }
}
