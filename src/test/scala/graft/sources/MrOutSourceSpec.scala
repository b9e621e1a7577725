package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MrOutSourceSpec extends SparkSpec {

  private def writeSample(): String = {
    val dir = new java.io.File("target/graft-io/mrout_spec")
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "mr-out-0"),
      "apple 3\nbanana 1 extra\n")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "mr-out-1"),
      "cherry 7\n")
    dir.getAbsolutePath
  }

  test("mrout: reads key/value lines, value = rest after first space") {
    val dir = writeSample()
    val rows = spark.read.format("mrout").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("apple", "3"), ("banana", "1 extra"), ("cherry", "7")))
  }

  test("mrout: one scan partition per output file") {
    val dir = writeSample()
    assert(spark.read.format("mrout").load(dir).rdd.getNumPartitions === 2)
  }

  test("mrout: column pruning reaches the scan's ReadSchema") {
    val dir = writeSample()
    val plan = spark.read.format("mrout").load(dir)
      .select(col("key")).queryExecution.executedPlan.toString
    // DSv2 BatchScan prints the pruned output attributes inline
    val scanLine = plan.linesIterator.find(_.contains("BatchScan")).get
    assert(scanLine.contains("[key#") && !scanLine.contains("value#"),
      plan)
    val keys = spark.read.format("mrout").load(dir).select("key")
      .collect().map(_.getString(0)).sorted
    assert(keys === Array("apple", "banana", "cherry"))
  }

  test("mrout: count(*) works with an empty projection") {
    val dir = writeSample()
    assert(spark.read.format("mrout").load(dir).count() === 3L)
  }

  test("mrout write path: mr-out-<N> naming, reference line format") {
    import spark.implicits._
    val dir = new java.io.File("target/graft-io/mrout_spec_write")
    val df = Seq(("apple", "3"), ("banana", "1 extra"), ("cherry", "7"))
      .toDF("key", "value").repartition(2)
    df.write.format("mrout").mode("overwrite").save(dir.getAbsolutePath)
    val names = dir.listFiles().map(_.getName).sorted
    assert(names.forall(_.startsWith("mr-out-")), names.mkString(","))
    assert(names.length === 2)
    // no temp droppings survive the commit
    assert(!dir.listFiles().exists(_.getName.startsWith(".mr-tmp-")))
    val back = spark.read.format("mrout").load(dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(("apple", "3"), ("banana", "1 extra"), ("cherry", "7")))
  }

  test("mrout write path: overwrite replaces prior mr-out files") {
    import spark.implicits._
    val dir = "target/graft-io/mrout_spec_ow"
    Seq(("a", "1"), ("b", "2"), ("c", "3"), ("d", "4"))
      .toDF("key", "value").repartition(4)
      .write.format("mrout").mode("overwrite").save(dir)
    // second write with FEWER partitions must not leave stale mr-out-3
    Seq(("x", "9")).toDF("key", "value").repartition(1)
      .write.format("mrout").mode("overwrite").save(dir)
    val back = spark.read.format("mrout").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(("x", "9")))
  }

  test("mrout write path rejects inputs that don't fit (key, value)") {
    import spark.implicits._
    // Three columns can't resolve against the 2-column table schema;
    // Spark's DSv2 resolution rejects it before any file is touched.
    val dir = new java.io.File("target/graft-io/mrout_spec_bad")
    dir.listFiles() match {
      case null  => ()
      case files => files.foreach(_.delete())
    }
    dir.delete()
    intercept[Exception] {
      Seq((1, "x", "y")).toDF("key", "value", "extra").write.format("mrout")
        .mode("overwrite").save(dir.getPath)
    }
    assert(!dir.exists())
  }

  test("mrout: a large file splits into byte ranges, every line exactly once") {
    val dir = new java.io.File("target/graft-io/mrout_spec_split")
    dir.mkdirs()
    // one file, varied line lengths (multi-byte chars included) so range
    // boundaries land mid-line at every alignment
    val lines = (0 until 5000).map(i => s"k$i v-${"déjà" * (i % 7)}-$i")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "mr-out-0"),
      lines.mkString("", "\n", "\n"))
    val whole = spark.read.format("mrout").load(dir.getAbsolutePath)
    assert(whole.rdd.getNumPartitions === 1) // below threshold: one per file
    val split = spark.read.format("mrout")
      .option("maxSplitBytes", "1024").load(dir.getAbsolutePath)
    assert(split.rdd.getNumPartitions > 1)
    val back = split.collect().map(r => s"${r.getString(0)} ${r.getString(1)}")
    assert(back.length === lines.length)
    assert(back.sorted.sameElements(lines.sorted))
  }

  test("mrout: maxSplitBytes must be a positive long") {
    val dir = writeSample()
    for (bad <- Seq("0", "-5", "nope")) {
      val e = intercept[IllegalArgumentException] {
        spark.read.format("mrout").option("maxSplitBytes", bad).load(dir)
          .count()
      }
      assert(e.getMessage.contains("maxSplitBytes"), e.getMessage)
    }
  }

  test("mrout: pushed prefix filter matches residual UTF8String semantics") {
    // a prefix ending in a lone HIGH surrogate: UTF8String encodes the
    // unpaired surrogate as a replacement, and the pushed pre-filter
    // must agree with the residual filter (keep the row) rather than
    // dropping it at the scan with Java UTF-16 semantics
    val dir = new java.io.File("target/graft-io/mrout_spec_surrogate")
    dir.mkdirs()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getPath, "mr-out-0"),
      "plain😀tail 1\nother 2\n")
    val df = spark.read.format("mrout").load(dir.getAbsolutePath)
    val lonePrefix = "plain\uD83D" // emoji's high surrogate, unpaired
    val viaScan = df.filter(col("key").startsWith(lonePrefix))
      .collect().map(_.getString(0)).toSeq
    // ground truth: the same predicate evaluated WITHOUT pushdown
    val noPush = df.collect().map(_.getString(0))
      .filter(k => org.apache.spark.unsafe.types.UTF8String.fromString(k)
        .startsWith(
          org.apache.spark.unsafe.types.UTF8String.fromString(lonePrefix)))
      .toSeq
    assert(viaScan === noPush)
  }

  test("mrout: equality/prefix/IN filters push into the scan") {
    val dir = writeSample()
    val df = spark.read.format("mrout").load(dir)
    val eq = df.filter(col("key") === "apple")
    // pushed filter is visible in the scan's description
    val plan = eq.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("apple"), plan)
    assert(eq.collect().map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("apple", "3")))
    assert(df.filter(col("key").startsWith("ba")).collect()
      .map(_.getString(0)).toSeq === Seq("banana"))
    assert(df.filter(col("key").isin("apple", "cherry")).count() === 2L)
    // value-side filter (value may contain spaces — full rest-of-line)
    assert(df.filter(col("value") === "1 extra").collect()
      .map(_.getString(0)).toSeq === Seq("banana"))
  }

  test("mrout write: nReduce clusters keys into exactly N sorted files") {
    import spark.implicits._
    val dir = new java.io.File("target/graft-io/mrout_spec_nreduce")
    val rows = (1 to 40).flatMap(i => Seq((f"k$i%02d", "a"), (f"k$i%02d", "b")))
    rows.toDF("key", "value").repartition(7) // writer must re-cluster
      .write.format("mrout").option("nReduce", "3")
      .mode("overwrite").save(dir.getAbsolutePath)
    val names = dir.listFiles().map(_.getName).sorted
    assert(names.toSeq === Seq("mr-out-0", "mr-out-1", "mr-out-2"))
    val perFile = names.map { n =>
      scala.io.Source.fromFile(new java.io.File(dir, n)).getLines().toSeq
    }
    // KEY-sorted within each file (value order within a key is not part
    // of the contract), and no key spans two files
    perFile.foreach { ls =>
      val keys = ls.map(_.split(" ")(0))
      assert(keys === keys.sorted)
    }
    val fileOfKey = perFile.zipWithIndex.flatMap { case (ls, i) =>
      ls.map(l => (l.split(" ")(0), i))
    }
    fileOfKey.groupBy(_._1).foreach { case (k, fs) =>
      assert(fs.map(_._2).distinct.length === 1, s"key $k spans files")
    }
    val back = spark.read.format("mrout").load(dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(back.sorted.toSeq === rows.sorted)
  }

  test("mrout streaming sink: epoch-named files, no temps, lossless") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val dir = new java.io.File("target/graft-io/mrout_spec_stream")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(dir.getAbsolutePath + "_chk"))
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    in.addData(("apple", "3"), ("banana", "1 extra"))
    in.addData(("cherry", "7"))
    val q = in.toDF().toDF("key", "value")
      .writeStream.format("mrout")
      .option("checkpointLocation", dir.getAbsolutePath + "_chk")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start(dir.getAbsolutePath)
    q.awaitTermination()
    val names = dir.listFiles().map(_.getName)
    assert(names.nonEmpty && names.forall(_.matches("mr-out-\\d+-\\d+")),
      names.mkString(","))
    assert(!names.exists(_.startsWith(".mr-tmp-")))
    val back = spark.read.format("mrout").load(dir.getAbsolutePath)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(("apple", "3"), ("banana", "1 extra"), ("cherry", "7")))
  }

  test("mrout streaming sink: restart from checkpoint is exactly-once") {
    import spark.implicits._
    val root = new java.io.File("target/graft-io/mrout_spec_restart")
    org.apache.commons.io.FileUtils.deleteDirectory(root)
    val src = new java.io.File(root, "src").getAbsolutePath
    val out = new java.io.File(root, "out").getAbsolutePath
    val chk = new java.io.File(root, "chk").getAbsolutePath
    val schema = org.apache.spark.sql.types.StructType
      .fromDDL("key STRING, value STRING")
    def drain(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .writeStream.format("mrout")
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start(out)
      q.awaitTermination()
    }
    def snapshot(): Map[String, String] =
      new java.io.File(out).listFiles().map(f =>
        f.getName -> java.nio.file.Files.readString(f.toPath)).toMap
    Seq(("a", "1"), ("b", "2")).toDF("key", "value").coalesce(1)
      .write.mode("append").parquet(src)
    drain()
    val after1 = snapshot()
    // restart over the SAME checkpoint with no new data: the commit log
    // says everything is processed — no new epochs, nothing rewritten
    drain()
    assert(snapshot() === after1)
    // new data after a restart: ONLY the delta appears, in new epoch
    // files; the first run's files are untouched
    Seq(("c", "3")).toDF("key", "value").coalesce(1)
      .write.mode("append").parquet(src)
    drain()
    val after3 = snapshot()
    after1.foreach { case (n, content) => assert(after3(n) === content) }
    val rows = spark.read.format("mrout").load(out)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows === Set(("a", "1"), ("b", "2"), ("c", "3")))
  }

  test("mrout streaming commit: epoch replay with fewer partitions sweeps " +
       "the stale extras") {
    // A prior attempt of epoch 7 renamed 2 partitions, then crashed
    // BEFORE Spark wrote its commit log. The replay produces only 1
    // writer partition (partition-count drift). The commit must delete
    // the earlier attempt's extra mr-out-7-1 — a per-name
    // delete-then-rename alone would leave it to double-count on read.
    val dir = new java.io.File("target/graft-io/mrout_spec_epoch_sweep")
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
    dir.mkdirs()
    def put(name: String, content: String): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir.getPath, name), content)
    put("mr-out-7-0", "stale 0\n")      // prior attempt, will be replaced
    put("mr-out-7-1", "stale 1\n")      // prior attempt, must be swept
    put("mr-out-6-0", "other 6\n")      // other epoch, must be untouched
    put("mr-out-70-0", "other 70\n")    // prefix trap: epoch 70 != epoch 7
    put(".mr-tmp-7-0-42", "fresh 0\n")  // the replay's single written temp
    val write = new MrOutStreamingWrite(dir.getAbsolutePath,
      new SerializableConf(spark.sparkContext.hadoopConfiguration))
    write.commit(7L, Array(MrOutCommit(0,
      new java.io.File(dir, ".mr-tmp-7-0-42").getAbsolutePath)))
    val state = dir.listFiles().map(f =>
      f.getName -> java.nio.file.Files.readString(f.toPath)).toMap
    assert(state === Map(
      "mr-out-7-0"  -> "fresh 0\n",
      "mr-out-6-0"  -> "other 6\n",
      "mr-out-70-0" -> "other 70\n"), state)
  }

  test("mrout round-trips MapReduceJob.saveText output") {
    import spark.implicits._
    val out = graft.mr.MapReduceJob.runOnCorpus(
      Seq(("d1", "a b a"), ("d2", "b c")).toDS(),
      graft.mr.Apps.WordCount.map, graft.mr.Apps.WordCount.reduce)
    val dir = "target/graft-io/mrout_spec_rt"
    graft.mr.MapReduceJob.saveText(out, dir)
    val back = spark.read.format("mrout").load(dir)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back === Set(("a", "2"), ("b", "2"), ("c", "1")))
  }
}
