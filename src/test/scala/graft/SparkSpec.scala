package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (guide: one session per suite,
  * shared here process-wide since Test/fork gives us a dedicated JVM).
  */
object SparkTest {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      // tz-naive testdata timestamps must read as TIMESTAMP, not NTZ
      // (same setting as SparkSessionFactory)
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      // static conf: needed by the bucketing spec's saveAsTable
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec {
  lazy val spark: SparkSession = SparkTest.session
  val sfDir = "/root/testdata/sf0.001"
}
