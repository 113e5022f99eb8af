package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-16 optimization evidence tool (same contract as [[PlanDumpR15]]):
  * dump `.explain("formatted")` for a named list of queries to
  * plans/r16/<query>_<tag>.txt. Run:
  * `sbt "runMain graft.PlanDumpR16 <tag> q236_weighted_jaccard,..."`.
  * Uses the same session shape as Bench (32 cores, AQE on) so the dumped
  * initial plans match what the bench executes.
  */
object PlanDumpR16 {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val names: Seq[String] = args.lift(1) match {
      case Some(csv) => csv.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      case None => SparkEntry.queries.keys.toSeq.sorted
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val outDir = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLANS_OUT", "plans/r16"))
    Files.createDirectories(outDir)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${name}_$tag.txt"), txt)
      println(s"wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
