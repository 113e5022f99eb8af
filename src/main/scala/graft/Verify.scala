package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg (dev loop only): regex over query names to run a
    // subset; the driver always passes exactly (sfDir, outDir)
    val Array(sfDir, outDir) = args.take(2)
    val nameFilter = args.lift(2).map(_.r)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // tz-naive testdata timestamps must read as TIMESTAMP, not NTZ
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // ORACLE-COUPLING GUARD (round-15 advice): several queries honor
    // spark.graft.* confs (the mixture token budget, the staged
    // intermediate tables) whose oracle SQL hardcodes the default-config
    // derivation. A verify run with any such conf injected (system
    // property / spark-defaults) would hash-mismatch spuriously — or
    // worse, verify a non-default configuration against a default-config
    // oracle. The gate contract is "confs unset"; enforce it.
    val injected = spark.conf.getAll.keys.filter(_.startsWith("spark.graft."))
    require(injected.isEmpty,
      s"verify requires default graft config, found: ${injected.mkString(", ")}")
    SparkEntry.queries
      .filter { case (name, _) => nameFilter.forall(_.findFirstIn(name).isDefined) }
      .foreach { case (name, fn) =>
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => nameFilter.forall(_.findFirstIn(k).isDefined) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Staged-intermediate oracle variants (round 15): for every cascade
    // oracle, the sf0.1 replay SQL that reads the engine-persisted pair
    // parquet (registered as the `staged_pairs` DuckDB view) instead of
    // re-deriving the quadratic candidate join from raw. The driver's
    // sf0.01 gate ignores this file — from-raw stays the hard gate; only
    // the dev-side 10x replay harness (dev/check.py --staged-pairs)
    // consumes it. See queries.StagedOracles.
    val stagedJson = SparkEntry.oracleSql
      .filter { case (k, _) => nameFilter.forall(_.findFirstIn(k).isDefined) }
      .flatMap { case (k, v) => queries.StagedOracles.staged(v).map(k -> _) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql_staged.json"), stagedJson)
    spark.stop()
  }
}
