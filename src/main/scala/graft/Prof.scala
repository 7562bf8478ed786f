package graft
// Temporary round-10 profiling scratch (deleted before round close):
// stage-by-stage timing of llm_minhash_est_quality's plan at sf0.1.
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Prof {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[String]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val dur = (for {
            c <- si.completionTime; s <- si.submissionTime
          } yield (c - s) / 1000.0).getOrElse(-1.0)
          val tm = si.taskMetrics
          stages.add(f"[stage] ${si.stageId}%4d $dur%7.2fs " +
            f"tasks=${si.numTasks}%3d exec=${tm.executorRunTime / 1000.0}%7.2fs " +
            f"cpu=${tm.executorCpuTime / 1e9}%7.2fs " +
            f"gc=${tm.jvmGCTime / 1000.0}%5.2fs " +
            f"deser=${tm.executorDeserializeTime / 1000.0}%5.2fs " +
            f"shR=${tm.shuffleReadMetrics.totalBytesRead / 1024}%8dKB " +
            f"shW=${tm.shuffleWriteMetrics.bytesWritten / 1024}%8dKB")
        }
      })
    println("[prof] aqe=" + spark.conf.get("spark.sql.adaptive.enabled") +
      " coalesce=" +
      spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") +
      " cachedRepart=" + spark.conf.getOption(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"))
    // AQE coalescing sanity: a tiny two-shuffle query — how many tasks?
    locally {
      val t = spark.range(1000).groupBy((col("id") % 7).as("k"))
        .agg(count(lit(1)).as("n"))
        .groupBy((col("k") % 3).as("j")).agg(sum(col("n")).as("s"))
      t.collect()
      Thread.sleep(500)
      println("[prof] tiny 2-shuffle query stages:")
      stages.forEach(s => println(s))
      stages.clear()
    }
    locally {
      val p = SparkEntry.queries("llm_ann_ivf")(spark, d)
        .queryExecution.executedPlan.toString
      println("[prof] ann_ivf dynamicpruning=" +
        "dynamicpruning".r.findAllIn(p.toLowerCase).size +
        " PartitionFilters=" + "PartitionFilters: \\[[^\\]]".r.findAllIn(p).size)
      SparkEntry.queries("llm_ann_ivf")(spark, d).count()
    }
    val docsAll = Tables(spark, d, "documents")
    val pred = graft.functions.PortableHash.pHash(
      concat(lit("eqd:"), col("doc_id").cast("string"))) % 3 === 0
    for (rep <- 1 to 2) {
      println(s"[prof] --- rep $rep ---")
      time("docs scan")(docsAll.count())
      time("docs filtered")(docsAll.where(pred).count())
      val (mhv, sk) = operators.Llm.minhashVerifiedWithSketch(
        docsAll.where(pred))
      time("sketch frame (sampled)")(sk.count())
      time("verified pairs (sampled)")(mhv.count())
      time("full est_quality key")(
        SparkEntry.queries("llm_minhash_est_quality")(spark, d).count())
      // tail decomposition: with sh/sk/bands/mhv all warm in cache, what
      // do the agreement joins + bucket agg alone cost?
      val kExpr = (0 until 16)
        .map(i => when(col(s"a.m_$i") === col(s"b.m_$i"), 1L).otherwise(0L))
        .reduce(_ + _)
      time("agree joins (warm cache)")(
        mhv.join(sk.hint("shuffle_hash").as("a"), col("d1") === col("a.doc_id"))
          .join(sk.hint("shuffle_hash").as("b"), col("d2") === col("b.doc_id"))
          .select(col("d1"), col("d2"), col("est_jaccard"), kExpr.as("k"))
          .count())
      if (rep == 2) {
        stages.clear()
        time("key again (warm cache)")(
          SparkEntry.queries("llm_minhash_est_quality")(spark, d).count())
        Thread.sleep(500)
        stages.forEach(s => println(s))
        val ep = SparkEntry.queries("llm_minhash_est_quality")(spark, d)
          .queryExecution.executedPlan.toString
        println("[plan] InMemoryTableScan x" +
          "InMemoryTableScan".r.findAllIn(ep).size)
        println("[plan] FileScan x" + "FileScan".r.findAllIn(ep).size)
        println("[plan] collect_set x" + "collect_set".r.findAllIn(ep).size)
        println("[plan] md5 x" + "md5".r.findAllIn(ep).size)
        println("[plan] ShuffledHashJoin x" +
          "ShuffledHashJoin".r.findAllIn(ep).size)
        println("[plan] Exchange x" + "Exchange".r.findAllIn(ep).size)
      } else {
        time("key again (warm cache)")(
          SparkEntry.queries("llm_minhash_est_quality")(spark, d).count())
      }
      spark.catalog.clearCache()
      val (mhvF, skF) = operators.Llm.minhashVerifiedWithSketch(docsAll)
      time("sketch frame (full)")(skF.count())
      time("verified pairs (full)")(mhvF.count())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
