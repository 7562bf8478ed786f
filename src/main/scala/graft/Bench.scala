package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // One-time session warmup so JIT/codegen/scheduler startup is not
    // attributed to whichever query happens to run first.
    locally {
      import org.apache.spark.sql.functions._
      spark.range(100000).selectExpr("sum(id)").collect()
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      li.groupBy("l_returnflag")
        .agg(sum(col("l_quantity").cast("decimal(18,4)")), count(lit(1)))
        .collect()
      li.limit(1000).select(org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("l_returnflag").orderBy("l_orderkey"))).count()
    }
    // Two timed passes per query, keep the min: external machine load
    // contaminated round 1's single-pass numbers by up to 5× on trivial
    // queries; min-of-2 keeps a load spike during one pass from being
    // reported as engine time (runs=2 recorded in the output line).
    // A failed query is recorded as an explicit error, never as a timing —
    // elapsed-time-to-crash is not a measurement.
    def once(fn: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val first = once(fn)
      // clearCache BETWEEN the passes too: persisted sketch frames
      // (shingles/signatures/edges) from pass 1 would otherwise satisfy
      // pass 2 via the CacheManager's canonicalized-plan match, and the
      // reported min would exclude sketch-construction cost entirely.
      // JIT/page-cache warmth (the legitimate steady-state effect) survives.
      spark.catalog.clearCache()
      val second = once(fn)
      spark.catalog.clearCache()
      val t = (first, second) match {
        case (Right(a), Right(b)) => Right(math.min(a, b))
        case (Left(e), _)         => Left(e)
        case (_, Left(e))         => Left(e)
      }
      (name, t, first, second)
    }
    // Driver tail-captures stdout; round 1 the single ~3 KB line with the
    // full per-query map got truncated → BENCH parsed:null. Emit the long
    // diagnostic line FIRST, then a short summary as the LAST line so the
    // driver's JSON parse always sees a complete object.
    // Locale.ROOT: the f-interpolator uses the default JVM locale, which
    // on comma-decimal locales would print 31,575 and break the driver's
    // JSON parse.
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    def qmap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => s"\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val ok = results.collect { case (k, Right(v), _, _) => k -> v }.toMap
    val errs = results.collect { case (k, Left(e), _, _) => k -> e }
    val cold = results.collect { case (k, _, Right(v), _) => k -> v }
    val warm = results.collect { case (k, _, _, Right(v)) => k -> v }
    val errJson = errs.map { case (k, e) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = if (ok.nonEmpty) ok.values.sum else 0.0
    val detail =
      s"""{"metric":"total_detail","value":${fmt(total)},"unit":"sec","queries":${qmap(ok)},"errors":$errJson,"runs":2,"sf":"$sfDir"}"""
    val summary =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${ok.size},"n_errors":${errs.size},"runs":2,"sf":"$sfDir"}"""
    println(detail)
    println(summary)
    // Side-channel file: the driver's stdout tail-parse has failed two
    // rounds running (sbt decorates the last line with [info]/[success]),
    // so the same JSON also lands in BENCH_SELF.json. It additionally
    // carries the per-pass maps the stdout line omits: `queries_cold`
    // (pass 1 — honest-cold sketch construction) and `queries_warm`
    // (pass 2 — JIT/page-cache steady state), which separate engine cost
    // from first-touch cost and keep round-over-round comparisons robust.
    // Path: anchored via SPARK_GRAFT_BENCH_OUT when set (the cwd of a
    // forked sbt run is not guaranteed); failures are LOGGED, not
    // swallowed — a silently-stale file misreports the round.
    val coldWarm =
      s"""{"metric":"cold_warm","queries_cold":${qmap(cold)},"queries_warm":${qmap(warm)},"sf":"$sfDir"}"""
    val benchOut = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_SELF.json"))
      .toAbsolutePath
    try {
      java.nio.file.Files.writeString(
        benchOut, detail + "\n" + summary + "\n" + coldWarm + "\n")
      System.err.println(s"[bench] wrote $benchOut")
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] FAILED writing $benchOut: $e")
    }
    spark.stop()
  }
}
