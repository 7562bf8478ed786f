package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Plan-dump harness (optimization rounds): writes the
  * `.explain("formatted")` output of each named declared query to
  * `<outDir>/<name>.txt`, under the same session config as Bench so the
  * captured plan is the one the bench actually runs. Usage:
  *
  *   sbt "runMain graft.Explain <outDir> <query> [query...]"
  *
  * Reads SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like Bench. Never run by
  * the driver — purely a measurement/evidence tool.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val qs = SparkEntry.queries
    names.foreach { name =>
      qs.get(name) match {
        case Some(fn) =>
          val df = fn(spark, sfDir)
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(s"$outDir/$name.txt"), plan)
          System.err.println(s"[explain] wrote $outDir/$name.txt")
          spark.catalog.clearCache()
        case None =>
          System.err.println(s"[explain] UNKNOWN query: $name")
      }
    }
    spark.stop()
  }
}
