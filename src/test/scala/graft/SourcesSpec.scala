package graft

import graft.sources.Sources
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("json ingest: explicit schema and inference agree on typed rows") {
    val d = Files.createTempDirectory("graft_src").toString
    val json = Seq(
      """{"id": 1, "name": "a", "score": 1.5}""",
      """{"id": 2, "name": "b", "score": 2.5}""")
    Files.write(java.nio.file.Paths.get(s"$d/in.json"),
      json.mkString("\n").getBytes)
    val typed = Sources.readJson(spark, s"$d/in.json", schema)
    assert(typed.schema == schema)
    assert(typed.count() == 2)
    val inferred = Sources.inferJson(spark, s"$d/in.json")
    assert(inferred.select("id", "name", "score").count() == 2)
  }

  test("csv ingest: header + typed casting") {
    val d = Files.createTempDirectory("graft_csv").toString
    Files.write(java.nio.file.Paths.get(s"$d/in.csv"),
      "id,name,score\n1,a,1.5\n2,b,2.5\n".getBytes)
    val df = Sources.readCsv(spark, s"$d/in.csv", schema)
    assert(df.schema == schema)
    assert(df.agg(sum("score")).as[Double].head() == 4.0)
  }

  test("partitioned sink lays out by event_date and prunes on read") {
    val d = Files.createTempDirectory("graft_lake").toString
    val df = Seq(
      (1L, TestSpark.ts("2024-01-01 10:00:00")),
      (2L, TestSpark.ts("2024-01-02 10:00:00")))
      .toDF("id", "ts")
    Sources.sinkPartitioned(df, "ts", s"$d/lake")
    assert(new java.io.File(s"$d/lake/event_date=2024-01-01").isDirectory)
    val pruned = spark.read.parquet(s"$d/lake")
      .where(col("event_date") === "2024-01-02")
    assert(pruned.count() == 1)
    // partition pruning visible in the scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_date"))
  }

  test("orc round-trip preserves rows and pushes filters to the scan") {
    val d = Files.createTempDirectory("graft_orc").toString
    val li = Tables(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity", "l_shipdate")
    Sources.sinkOrc(li, s"$d/li_orc")
    val back = Sources.readOrc(spark, s"$d/li_orc")
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).head().getDouble(0) ==
      li.agg(sum("l_quantity")).head().getDouble(0))
    // ORC scans carry pushdown + pruning like parquet
    val q = back.where(col("l_orderkey") === 1L).select("l_quantity")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey,1)"),
      s"ORC scan must carry the pushed filter:\n$plan")
    assert(q.count() > 0)
  }

  test("jdbc round-trip: sink to embedded Derby, partition-parallel read back") {
    // Derby ships in /opt/spark/jars — an in-JVM warehouse stand-in, so
    // the R1/R2 JDBC interop claim is exercised with real rows moving
    // over a real JDBC connection, no network.
    val d = Files.createTempDirectory("graft_derby").toString
    val url = s"jdbc:derby:$d/db;create=true"
    val props = Map("driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val df = (1L to 100L).map(i => (i, s"name_$i", i * 1.5))
      .toDF("id", "name", "score")
    Sources.writeJdbc(df, url, "events_wh", props)
    val back = Sources.readJdbc(spark, url, "events_wh", "id", 1L, 100L, 3, props)
    // the partition column split the read into range-bounded cursors
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == 100)
    val r = back.where(col("id") === 42L).collect().head
    assert(r.getAs[String]("name") == "name_42" && r.getAs[Double]("score") == 63.0)
    assert(back.agg(sum("id")).as[Long].head() == 5050L)
    // documented contract is APPEND: a second write doubles the rows
    Sources.writeJdbc(df, url, "events_wh", props)
    assert(Sources.readJdbc(spark, url, "events_wh", "id", 1L, 100L, 2, props)
      .count() == 200)
  }

  test("schema evolution: added + renamed columns keep v1 data queryable") {
    val d = Files.createTempDirectory("graft_evo").toString
    // v1 snapshot: (id, amt) — the original schema
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amt")
      .write.parquet(s"$d/lake/v=1")
    // v2 snapshot: amt RENAMED to total_amount, region ADDED
    Seq((3L, 30.0, "eu"), (4L, 40.0, "us"))
      .toDF("id", "total_amount", "region")
      .write.parquet(s"$d/lake/v=2")
    val df = Sources.readEvolved(spark, s"$d/lake",
      renames = Map("amt" -> "total_amount"),
      casts = Map("total_amount" -> "decimal(12,2)"))
    assert(df.count() == 4)
    assert(!df.columns.contains("amt"))
    val byId = df.select("id", "total_amount", "region")
      .collect().map(r => r.getLong(0) ->
        ((r.getDecimal(1).doubleValue(), Option(r.getString(2))))).toMap
    // v1 rows surface under the canonical name, with the added column null
    assert(byId(1L) == ((10.0, None)) && byId(2L) == ((20.0, None)))
    assert(byId(3L) == ((30.0, Some("eu"))) && byId(4L) == ((40.0, Some("us"))))
    // the whole lake is queryable with the v2 schema
    assert(df.where(col("region") === "us").count() == 1)
  }

  test("schema evolution: widened int->long type drift via readVersioned") {
    val d = Files.createTempDirectory("graft_evo2").toString
    Seq((1L, 7), (2L, 8)).toDF("id", "amount")          // amount: INT
      .write.parquet(s"$d/v1")
    Seq((3L, 9L)).toDF("id", "amount")                  // amount: BIGINT
      .write.parquet(s"$d/v2")
    // int32 vs int64 footers cannot schema-merge at scan time
    intercept[Exception] {
      spark.read.option("mergeSchema", "true").parquet(s"$d/v1", s"$d/v2")
        .collect()
    }
    val df = Sources.readVersioned(spark, Seq(s"$d/v1", s"$d/v2"),
      (v, _) => v.withColumn("amount", col("amount").cast("long")))
    assert(df.schema("amount").dataType == LongType)
    assert(df.agg(sum("amount")).as[Long].head() == 24L)
  }

  test("binaryFile source feeds the multimodal column end-to-end") {
    import graft.operators.Multimodal
    import graft.operators.Multimodal.{Media, MediaHeaderCodec, MediaRow}
    val d = Files.createTempDirectory("graft_bin").toString
    // real JDK-encoded objects on disk — the crawl-ingest shape
    val img = new java.awt.image.BufferedImage(
      9, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    assert(javax.imageio.ImageIO.write(img, "png", new java.io.File(s"$d/a.png")))
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val pcm = new Array[Byte](3200)
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, 1600L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE,
      new java.io.File(s"$d/b.wav"))
    Files.writeString(java.nio.file.Paths.get(s"$d/notes.txt"), "not media")

    // glob prunes at listing time: the txt never costs a byte fetch
    val bin = Sources.readBinary(spark, d, "*.{png,wav}")
    assert(bin.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    val rows = bin.select("path", "content")
      .as[(String, Array[Byte])].collect()
    assert(rows.length == 2)
    val mediaRows = rows.zipWithIndex.map { case ((p, c), i) =>
      val mime = if (p.endsWith(".png")) "image/png" else "audio/wav"
      MediaRow(i.toLong, Media(c, mime, Map("path" -> p)))
    }
    val feats = Multimodal
      .decodeFeatures(spark.createDataset(mediaRows.toSeq), MediaHeaderCodec)
      .collect().map(f => f.mime -> f.features).toMap
    // [w, h, depth, channels, ...] for the png; [rate, ch, bits, dur...] wav
    assert(feats("image/png").take(2).sameElements(Array(9f, 6f)))
    assert(feats("audio/wav").take(3).sameElements(Array(16000f, 1f, 16f)))
    assert(feats.values.forall(_(6) == 1f), "both containers must parse")
  }

  test("small-file compaction: fewer files, same rows, target-sized output") {
    val d = Files.createTempDirectory("graft_compact").toString + "/t"
    // simulate streaming-ingest debris: 16 one-partition micro-batch writes
    spark.range(4000L).select(col("id"), (col("id") * 3).as("v"))
      .repartition(16)
      .write.parquet(d)
    val fsPath = new org.apache.hadoop.fs.Path(d)
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def parts(): Array[org.apache.hadoop.fs.FileStatus] = fs.listStatus(fsPath)
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
    val before = parts()
    assert(before.length == 16)
    val total = before.map(_.getLen).sum
    // target = just over half the bytes → exactly 2 output files
    val (nBefore, nAfter) =
      Sources.compactSmallFiles(spark, d, targetBytes = total / 2 + 1)
    assert(nBefore == 16 && nAfter == 2)
    assert(parts().length == 2, "published dir must hold the compacted files")
    // contents survive byte-for-byte (same rows, same values)
    val got = spark.read.parquet(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == (0L until 4000L).map(i => (i, i * 3)))
    // and the temp/retired dirs are gone — no debris for the next listing
    assert(!fs.exists(new org.apache.hadoop.fs.Path(d + ".compacting")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(d + ".compacted_old")))
  }
}
