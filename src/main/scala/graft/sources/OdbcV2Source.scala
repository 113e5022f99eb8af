package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate._
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector over the DSN-style database transport:
  * `spark.read.format("graft-odbc").option("url", ...).option("dbtable", ...)`.
  *
  * Where [[OdbcSource]] reproduces the reference's driver-materializing
  * pyodbc flow, this is the SCALE posture for the same transport: each
  * input partition opens its own `java.sql` connection ON THE EXECUTOR,
  * column pruning and simple filters push into the generated SQL (visible
  * as `PushedFilters`/`ReadSchema` in the scan), and a numeric
  * `partitionColumn` with bounds splits the read into range predicates —
  * the same contract as Spark's JDBC source, built on the public V2 API.
  * Aggregates (COUNT/SUM/MIN/MAX + GROUP BY on plain columns) push COMPLETE
  * into the database on single-partition reads — the rollup runs where the
  * data lives and only the k result rows cross the wire; range-partitioned
  * reads keep aggregation in Spark (complete mode cannot merge per-slice
  * results). LIMIT and ORDER-BY+LIMIT (top-N) push as ANSI
  * `ORDER BY … FETCH FIRST n ROWS ONLY`, partially — Spark re-applies its
  * own final limit, which makes the per-slice push safe under partitioning.
  *
  * Options: `url` (required), `dbtable` (required), `driver`, `user`,
  * `password`, `quote` (identifier quote, default `"`), and
  * `partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`.
  */
class OdbcV2Source extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-odbc"

  private def connect(opts: CaseInsensitiveStringMap): java.sql.Connection = {
    Option(opts.get("driver")).foreach(Class.forName)
    java.sql.DriverManager.getConnection(
      opts.get("url"), opts.getOrDefault("user", ""), opts.getOrDefault("password", ""))
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val table = options.get("dbtable")
    require(options.get("url") != null && table != null,
      "graft-odbc requires url and dbtable options")
    val conn = connect(options)
    try {
      val rs = conn.createStatement().executeQuery(
        s"SELECT * FROM $table WHERE 1=0")
      OdbcV2Source.schemaOf(rs.getMetaData)
    } finally conn.close()
  }

  override def getTable(
      schema: StructType, partitioning: Array[Transform], properties: JMap[String, String]): Table =
    new OdbcV2Table(schema, new CaseInsensitiveStringMap(properties))
}

object OdbcV2Source {
  /** JDBC → Catalyst type mapping, shared with [[OdbcSource]] so the V1
    * and V2 transports cannot drift.
    */
  def catalystType(md: java.sql.ResultSetMetaData, i: Int): DataType = {
    import java.sql.Types
    md.getColumnType(i) match {
      case Types.BIT | Types.BOOLEAN => BooleanType
      case Types.TINYINT | Types.SMALLINT | Types.INTEGER => IntegerType
      case Types.BIGINT => LongType
      case Types.FLOAT | Types.DOUBLE => DoubleType
      case Types.REAL => FloatType
      case Types.NUMERIC | Types.DECIMAL =>
        DecimalType(math.min(math.max(md.getPrecision(i), 1), 38),
          math.max(md.getScale(i), 0))
      case Types.DATE => DateType
      case Types.TIMESTAMP => TimestampType
      case Types.BINARY | Types.VARBINARY | Types.LONGVARBINARY | Types.BLOB =>
        BinaryType
      case _ => StringType
    }
  }

  def schemaOf(md: java.sql.ResultSetMetaData): StructType = {
    import java.sql.ResultSetMetaData
    StructType((1 to md.getColumnCount).map { i =>
      StructField(md.getColumnLabel(i), catalystType(md, i),
        md.isNullable(i) != ResultSetMetaData.columnNoNulls)
    })
  }

  /** Compile a catalyst source Filter to a SQL predicate, or None if the
    * filter shape has no faithful SQL translation (it then stays in Spark —
    * returning it from pushedFilters as unsupported keeps correctness).
    */
  def compileFilter(f: Filter, q: String => String): Option[String] = {
    def lit(v: Any): Option[String] = v match {
      // backslashes are dialect-sensitive (MySQL escapes with them; ANSI
      // dialects do not), so a backslash-bearing literal cannot be pushed
      // faithfully everywhere — keep that filter in Spark instead of
      // producing malformed (or injectable) SQL on one dialect family
      case s: String if s.contains("\\") => None
      case s: String => Some("'" + s.replace("'", "''") + "'")
      case n @ (_: Int | _: Long | _: Short | _: Byte | _: Double | _: Float) => Some(n.toString)
      case b: Boolean => Some(b.toString.toUpperCase)
      case d: java.math.BigDecimal => Some(d.toPlainString)
      case _ => None // dates/timestamps/binary: dialect-sensitive — keep in Spark
    }
    f match {
      case EqualTo(a, v) => lit(v).map(l => s"${q(a)} = $l")
      case GreaterThan(a, v) => lit(v).map(l => s"${q(a)} > $l")
      case GreaterThanOrEqual(a, v) => lit(v).map(l => s"${q(a)} >= $l")
      case LessThan(a, v) => lit(v).map(l => s"${q(a)} < $l")
      case LessThanOrEqual(a, v) => lit(v).map(l => s"${q(a)} <= $l")
      case IsNull(a) => Some(s"${q(a)} IS NULL")
      case IsNotNull(a) => Some(s"${q(a)} IS NOT NULL")
      case In(a, vs) if vs.nonEmpty =>
        val ls = vs.toSeq.map(lit)
        if (ls.forall(_.isDefined)) Some(s"${q(a)} IN (${ls.flatten.mkString(", ")})")
        else None
      case And(l, r) =>
        for (ls <- compileFilter(l, q); rs <- compileFilter(r, q))
          yield s"($ls AND $rs)"
      case Or(l, r) =>
        for (ls <- compileFilter(l, q); rs <- compileFilter(r, q))
          yield s"($ls OR $rs)"
      case _ => None
    }
  }
}

class OdbcV2Table(tableSchema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = options.get("dbtable")
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new OdbcV2ScanBuilder(tableSchema, opts)
}

class OdbcV2ScanBuilder(fullSchema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit with SupportsPushDownTopN {

  private val quoteCh = options.getOrDefault("quote", "\"")
  private def q(name: String): String = quoteCh + name + quoteCh

  private var prunedSchema: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  // aggregate pushdown state: SELECT list, GROUP BY clause, output schema
  private var agg: Option[(String, Option[String], StructType)] = None
  private var limit: Option[Int] = None
  private var orderBy: Option[String] = None

  override def pruneColumns(requiredSchema: StructType): Unit = {
    // preserve the source column order for a stable SELECT list. When an
    // aggregate is pushed the scan schema IS the aggregate's output —
    // Spark projects any narrower need on top of it
    if (agg.isEmpty) {
      val wanted = requiredSchema.fieldNames.toSet
      prunedSchema = StructType(fullSchema.fields.filter(f => wanted.contains(f.name)))
    }
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, unsupported) =
      filters.partition(f => OdbcV2Source.compileFilter(f, q).isDefined)
    pushed = supported
    unsupported // Spark re-applies what the source cannot evaluate
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Single plain column reference, or None (complex expressions stay in
    * Spark).
    */
  private def ref(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: NamedReference if nr.fieldNames.length == 1 => Some(nr.fieldNames.head)
      case _ => None
    }

  private def fieldType(name: String): Option[DataType] =
    fullSchema.fields.find(_.name == name).map(_.dataType)

  /** Result type Spark expects for a pushed SUM over the given input. */
  private def sumType(dt: DataType): DataType = dt match {
    case ByteType | ShortType | IntegerType | LongType => LongType
    case FloatType | DoubleType => DoubleType
    case d: DecimalType => DecimalType(math.min(38, d.precision + 10), d.scale)
    case other => other
  }

  private def compileAgg(f: AggregateFunc): Option[(String, DataType)] = f match {
    case _: CountStar => Some(("COUNT(*)", LongType))
    case c: Count =>
      ref(c.column).map { n =>
        val d = if (c.isDistinct) "DISTINCT " else ""
        (s"COUNT($d${q(n)})", LongType)
      }
    case s: Sum if !s.isDistinct =>
      for (n <- ref(s.column); t <- fieldType(n)) yield (s"SUM(${q(n)})", sumType(t))
    case m: Min =>
      for (n <- ref(m.column); t <- fieldType(n)) yield (s"MIN(${q(n)})", t)
    case m: Max =>
      for (n <- ref(m.column); t <- fieldType(n)) yield (s"MAX(${q(n)})", t)
    case _ => None
  }

  private def compileAggregation(
      a: Aggregation): Option[(String, Option[String], StructType)] = {
    // COMPLETE pushdown only, so it is gated on the single-partition read:
    // a range-partitioned scan would hand Spark per-slice aggregates that
    // complete mode would NOT re-merge — returning false keeps the
    // aggregation in Spark, which is always correct
    if (options.get("partitionColumn") != null) return None
    val groups = a.groupByExpressions.toSeq.map(ref)
    val funcs = a.aggregateExpressions.toSeq.map(compileAgg)
    if (groups.exists(_.isEmpty) || funcs.exists(_.isEmpty)) None
    else {
      val groupCols = groups.flatten
      val aggSqls = funcs.flatten
      val select = (groupCols.map(q) ++ aggSqls.map(_._1)).mkString(", ")
      val groupBy =
        if (groupCols.isEmpty) None
        else Some(groupCols.map(q).mkString("GROUP BY ", ", ", ""))
      val schema = StructType(
        groupCols.map(n => StructField(n, fieldType(n).getOrElse(StringType))) ++
          aggSqls.zipWithIndex.map { case ((_, t), i) => StructField(s"agg_$i", t) })
      Some((select, groupBy, schema))
    }
  }

  override def supportCompletePushDown(a: Aggregation): Boolean =
    compileAggregation(a).isDefined

  override def pushAggregation(a: Aggregation): Boolean = {
    compileAggregation(a) match {
      case Some(compiled) => agg = Some(compiled); true
      case None => false
    }
  }

  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }

  // Spark still applies its own final limit/topN on top — required for the
  // range-partitioned read, where FETCH FIRST n applies per slice
  override def isPartiallyPushed(): Boolean = true

  override def pushTopN(orders: Array[SortOrder], n: Int): Boolean = {
    // after a pushed aggregate the sort references the AGGREGATE OUTPUT
    // (agg_i), but the compiled SELECT list emits raw un-aliased aggregate
    // SQL — an ORDER BY on agg_i would name a column the database query
    // doesn't have. Keep the topN in Spark in that case (always correct).
    if (agg.isDefined) return false
    val compiled = orders.toSeq.map { o =>
      ref(o.expression()).map { c =>
        val dir = if (o.direction() == SortDirection.ASCENDING) "ASC" else "DESC"
        val nulls = o.nullOrdering().toString.replace('_', ' ') // NULLS FIRST/LAST
        s"${q(c)} $dir $nulls"
      }
    }
    if (compiled.exists(_.isEmpty)) false
    else {
      orderBy = Some(compiled.flatten.mkString("ORDER BY ", ", ", ""))
      limit = Some(n)
      true
    }
  }

  override def build(): Scan =
    new OdbcV2Scan(prunedSchema, pushed, options, agg, orderBy, limit)
}

/** One range slice of the table (or the whole table when unpartitioned). */
case class OdbcRangePartition(wherePart: Option[String]) extends InputPartition

class OdbcV2Scan(
    prunedSchema: StructType, pushed: Array[Filter], options: CaseInsensitiveStringMap,
    agg: Option[(String, Option[String], StructType)],
    orderBy: Option[String], limit: Option[Int])
    extends Scan with Batch {
  override def readSchema(): StructType = agg.map(_._3).getOrElse(prunedSchema)
  override def toBatch: Batch = this
  override def description(): String = {
    val f = pushed.map(_.toString).mkString(", ")
    val a = agg.map { case (sel, _, _) => s", PushedAggregates: [$sel]" }.getOrElse("")
    val l = limit.map(n => s", PushedLimit: $n").getOrElse("")
    val o = orderBy.map(ob => s", PushedTopN: [$ob]").getOrElse("")
    s"graft-odbc ${options.get("dbtable")} PushedFilters: [$f]$a$l$o"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val col = options.get("partitionColumn")
    if (col == null) Array(OdbcRangePartition(None))
    else {
      require(options.get("lowerBound") != null && options.get("upperBound") != null,
        "graft-odbc: partitionColumn requires lowerBound and upperBound " +
          "(and usually numPartitions)")
      val lower = options.get("lowerBound").toLong
      val upper = options.get("upperBound").toLong
      val n = math.max(options.getOrDefault("numPartitions", "1").toInt, 1)
      val quoteCh = options.getOrDefault("quote", "\"")
      val qc = quoteCh + col + quoteCh
      // same stride contract as Spark's JDBC source: first/last partitions
      // are unbounded so rows outside [lower, upper) are never lost
      val stride = math.max((upper - lower) / n, 1L)
      (0 until n).map { i =>
        val lo = lower + i * stride
        val hi = lower + (i + 1) * stride
        val cond =
          if (n == 1) None
          else if (i == 0) Some(s"$qc < $hi OR $qc IS NULL")
          else if (i == n - 1) Some(s"$qc >= $lo")
          else Some(s"$qc >= $lo AND $qc < $hi")
        OdbcRangePartition(cond)
      }.toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // serializable snapshot with NORMALIZED keys: the driver-side path
    // resolves options case-insensitively (CaseInsensitiveStringMap), so
    // the executor-side lookups must too — a caller's option("URL", ...)
    // must not plan fine and then crash every partition reader
    val opts = options.asCaseSensitiveMap().asScala.map {
      case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v
    }.toMap
    val sch = readSchema()
    val filterSql = {
      val quoteCh = opts.getOrElse("quote", "\"")
      pushed.flatMap(OdbcV2Source.compileFilter(_, n => quoteCh + n + quoteCh))
    }
    new OdbcPartitionReaderFactory(sch, filterSql, opts,
      agg.map { case (sel, gb, _) => (sel, gb) }, orderBy, limit)
  }
}

class OdbcPartitionReaderFactory(
    schema: StructType, filterSql: Array[String], opts: Map[String, String],
    aggSql: Option[(String, Option[String])],
    orderBy: Option[String], limit: Option[Int])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val part = partition.asInstanceOf[OdbcRangePartition]
    new PartitionReader[InternalRow] {
      // the connection opens HERE — on the executor, per partition
      opts.get("driver").foreach(Class.forName)
      private val conn = java.sql.DriverManager.getConnection(
        opts("url"), opts.getOrElse("user", ""), opts.getOrElse("password", ""))
      private val quoteCh = opts.getOrElse("quote", "\"")
      private val cols = aggSql.map(_._1).getOrElse {
        if (schema.isEmpty) "1" // COUNT(*)-style scans need no columns
        else schema.fieldNames.map(n => quoteCh + n + quoteCh).mkString(", ")
      }
      private val conds = filterSql ++ part.wherePart.map(w => s"($w)")
      private val where = if (conds.isEmpty) "" else conds.mkString(" WHERE ", " AND ", "")
      private val tail = Seq(
        aggSql.flatMap(_._2),               // GROUP BY
        orderBy,                            // ORDER BY (top-N)
        limit.map(n => s"FETCH FIRST $n ROWS ONLY")) // ANSI FETCH (limit/top-N)
        .flatten.map(" " + _).mkString
      private val rs = conn.createStatement().executeQuery(
        s"SELECT $cols FROM ${opts("dbtable")}$where$tail")

      override def next(): Boolean = rs.next()

      override def get(): InternalRow = {
        val vals = new Array[Any](schema.length)
        var i = 0
        while (i < schema.length) {
          val v: Any = schema(i).dataType match {
            case BooleanType => rs.getBoolean(i + 1)
            case IntegerType => rs.getInt(i + 1)
            case LongType => rs.getLong(i + 1)
            case DoubleType => rs.getDouble(i + 1)
            case FloatType => rs.getFloat(i + 1)
            case d: DecimalType =>
              val bd = rs.getBigDecimal(i + 1)
              if (bd == null) null
              else org.apache.spark.sql.types.Decimal(bd, d.precision, d.scale)
            case DateType =>
              val dt = rs.getDate(i + 1)
              if (dt == null) null
              else org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaDate(dt)
            case TimestampType =>
              val ts = rs.getTimestamp(i + 1)
              if (ts == null) null
              else org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(ts)
            case BinaryType => rs.getBytes(i + 1)
            case _ =>
              val s = rs.getString(i + 1)
              if (s == null) null else UTF8String.fromString(s)
          }
          vals(i) = if (rs.wasNull()) null else v
          i += 1
        }
        new GenericInternalRow(vals)
      }

      override def close(): Unit = conn.close()
    }
  }
}
