package graft

import org.apache.spark.sql.functions._
import graft.sources.{Sink, Tables}

/** Curated-output write path: directory partitioning, bounded file sizes,
  * lossless round trip. */
class SinkSpec extends SparkSpec {

  test("writeCurated partitions by column, bounds file size, round-trips") {
    val dir = tmpDir("curated_out")
    val docs = Tables.t(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars")
    Sink.writeCurated(docs, dir, partitionCols = Seq("lang"),
      sortCols = Seq("doc_id"), maxRecordsPerFile = 50)
    // directory layout: one subdir per language (reader-prunable)
    val langDirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val langs = docs.select("lang").distinct().collect()
      .map(_.getString(0)).toSet
    assert(langDirs == langs.map(l => s"lang=$l"))
    // file sizes bounded: every parquet file holds <= 50 rows
    for (d <- new java.io.File(dir).listFiles() if d.isDirectory;
        f <- d.listFiles() if f.getName.endsWith(".parquet")) {
      assert(spark.read.parquet(f.getPath).count() <= 50)
    }
    // lossless round trip (lang comes back from the directory key)
    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())
    assert(back.select("doc_id", "lang", "n_chars").except(docs).isEmpty)
    // rows inside a file are clustered by the sort key
    val firstFile = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .head.listFiles().filter(_.getName.endsWith(".parquet")).head
    val ids = spark.read.parquet(firstFile.getPath)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(ids == ids.sorted)
  }

  test("writeBucketed: co-bucketed tables join with zero Exchange") {
    val orders = Tables.t(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.t(spark, sf, "customer")
      .select("c_custkey", "c_name")
    // deliberately many input partitions: the writer must still produce
    // one file per bucket (rows routed to buckets before the write), not
    // tasks x buckets small files
    Sink.writeBucketed(orders.repartition(8), "bkt_orders", buckets = 4,
      bucketCols = Seq("o_custkey"), sortCols = Seq("o_custkey"))
    Sink.writeBucketed(customer, "bkt_customer", buckets = 4,
      bucketCols = Seq("c_custkey"), sortCols = Seq("c_custkey"))
    try {
      // exactly one data file per bucket despite the 8-partition input
      val warehouse = new java.io.File(
        new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath,
        "bkt_orders")
      val files = warehouse.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 4,
        s"expected 4 bucket files, found ${files.length}: ${files.map(_.getName).toSeq}")
      // forbid broadcast so the join must be sort-merge — the layout, not
      // the small fixture, has to carry the no-shuffle property
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_orders")
        .join(spark.table("bkt_customer"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"plan:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle either side:\n$plan")
      // the bucketed round trip is lossless and the join is correct
      assert(joined.count() ==
        orders.join(customer, col("o_custkey") === col("c_custkey")).count())
      // groupBy on the bucket key is exchange-free too
      val agg = spark.table("bkt_orders").groupBy("o_custkey")
        .agg(sum("o_totalprice"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"),
        s"bucketed groupBy should not shuffle:\n$aggPlan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_customer")
    }
  }

  test("TextCorpus jsonl: gz round-trip lossless; corrupt lines counted, kept") {
    import graft.sources.TextCorpus
    val docs = graft.sources.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "lang")
    val dir = tmpDir("jsonl")
    TextCorpus.writeJsonl(docs, dir)
    // gzip shards on disk (gz = one task per shard; size is the knob)
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(".json.gz")))
    val (back, bad) = TextCorpus.readJsonlClean(spark, dir, docs.schema)
    assert(bad == 0)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // a shard with a truncation seam: the bad line is COUNTED and the
    // good lines around it survive — nothing silently dropped
    val dir2 = tmpDir("jsonl-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir2, "part-00000.json"),
      """{"doc_id":1,"text":"ok","lang":"en"}
        |{"doc_id":2,"text":"truncat
        |{"doc_id":3,"text":"fine","lang":"de"}
        |""".stripMargin)
    val (clean, nBad) = TextCorpus.readJsonlClean(spark, dir2, docs.schema)
    assert(nBad == 1)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    // declaring the reserved corrupt column is an error, not a surprise
    val e = intercept[IllegalArgumentException] {
      TextCorpus.readJsonl(spark, dir2, docs.schema
        .add(TextCorpus.CorruptCol, "string"))
    }
    assert(e.getMessage.contains(TextCorpus.CorruptCol))
  }

  test("TextCorpus csv: round-trip with quoting; corrupt lines counted, kept") {
    import graft.sources.TextCorpus
    val docs = graft.sources.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "lang")
    val dir = tmpDir("csv")
    TextCorpus.writeCsv(docs, dir)
    assert(new java.io.File(dir).listFiles()
      .exists(_.getName.endsWith(".csv.gz")))
    // the writer quotes embedded delimiters, so the single-line parse
    // round-trips losslessly (documents contain commas-adjacent text)
    val (back, bad) = TextCorpus.readCsvClean(spark, dir, docs.schema)
    assert(bad == 0)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // a shard with a malformed row: counted, quarantined, neighbors kept
    val dir2 = tmpDir("csv-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir2, "part-00000.csv"),
      """doc_id,text,lang
        |1,ok,en
        |not_a_long,broken,xx
        |3,fine,de
        |""".stripMargin)
    val (clean, nBad) = TextCorpus.readCsvClean(spark, dir2, docs.schema)
    assert(nBad == 1)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
      == Seq(1L, 3L))
    val e = intercept[IllegalArgumentException] {
      TextCorpus.readCsv(spark, dir2, docs.schema
        .add(TextCorpus.CorruptCol, "string"))
    }
    assert(e.getMessage.contains(TextCorpus.CorruptCol))
  }

  test("TextCorpus orc: lossless round-trip; filters push down to the scan") {
    import graft.sources.TextCorpus
    val docs = graft.sources.Tables.t(spark, sf, "documents")
    val dir = tmpDir("orc")
    TextCorpus.writeOrc(docs, dir)
    val back = TextCorpus.readOrc(spark, dir)
    assert(back.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    // predicate pushdown + column pruning reach the ORC scan — the
    // properties that make ORC corpora first-class pipeline inputs
    val q = back.where(col("doc_id") > 100 && col("lang") === "en")
      .select("doc_id", "lang")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      !plan.contains("PushedFilters: []"), s"no ORC pushdown:\n$plan")
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,lang:string>"),
      s"ORC scan reads more than the projection:\n$plan")
  }

  test("compactDataset rewrites a small-file mess into few files, losslessly") {
    import graft.sources.Sink
    val docs = graft.sources.Tables.t(spark, sf, "documents")
      .select("doc_id", "text", "lang")
    val src = tmpDir("frag")
    // simulate a streaming sink's damage: many tiny files per partition dir
    docs.repartition(24).write.mode("overwrite")
      .partitionBy("lang").parquet(src)
    val dest = tmpDir("compact")
    val (before, after) = Sink.compactDataset(spark, src, dest,
      partitionCols = Seq("lang"), sortCols = Seq("doc_id"))
    assert(before > after,
      s"compaction must shrink the file count: $before -> $after")
    val langs = docs.select("lang").distinct().count()
    assert(after <= langs * 2, s"still fragmented: $after files")
    // content identical, partition layout preserved (lang dirs exist)
    assert(spark.read.parquet(dest).orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    assert(new java.io.File(dest).listFiles()
      .exists(f => f.getName.startsWith("lang=")))
    // non-destructive: the source is untouched
    assert(spark.read.parquet(src).count() == docs.count())
  }

  test("readEvolved merges snapshot schemas; old files null-fill new columns") {
    import graft.sources.Sink
    import spark.implicits._
    val root = tmpDir("evolve")
    // generation 1: (doc_id, text); generation 2 adds lang
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$root/gen1")
    Seq((3L, "gamma", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$root/gen2")
    val merged = Sink.readEvolved(spark, s"$root/gen1", s"$root/gen2")
      .orderBy("doc_id").collect()
    assert(merged.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(merged.map(r => Option(r.getAs[String]("lang"))).toSeq ==
      Seq(None, None, Some("en")))
  }

  test("zOrderColumn matches a reference Morton interleave bit-for-bit") {
    import spark.implicits._
    // quantizer inputs chosen so quantization is the identity: values
    // 0..(2^bits - 1) over exactly that range — the test isolates the
    // INTERLEAVE, the part with shift arithmetic worth pinning
    val bits = 8
    val lim = (1 << bits) - 1
    val rows = for (a <- 0 to lim by 17; b <- 0 to lim by 13)
      yield (a.toLong, b.toLong)
    val df = rows.toDF("a", "b").repartition(4)
    val got = df.withColumn("z",
        graft.sources.Sink.zOrderColumn(df, "a", "b", bits))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference: the same range quantizer in plain Scala doubles (floor
    // of a float ratio can land one level off the integer identity — the
    // reference must share that arithmetic, not idealize it away), then
    // the textbook bit interleave
    val (aMax, bMax) = (rows.map(_._1).max, rows.map(_._2).max)
    def quant(c: Long, hi: Long): Long =
      math.min(lim.toLong, math.max(0L,
        math.floor(c.toDouble / hi.toDouble * lim.toDouble).toLong))
    def morton(a: Long, b: Long): Long = {
      val (qa, qb) = (quant(a, aMax), quant(b, bMax))
      (0 until bits).map(i =>
        (((qa >> i) & 1L) << (2 * i + 1)) | (((qb >> i) & 1L) << (2 * i)))
        .reduce(_ | _)
    }
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == morton(a, b),
        s"z($a, $b): ${got((a, b))} != ${morton(a, b)}")
    }
  }

  test("writeZOrdered: per-file bounding boxes prune BOTH dimensions") {
    val events = Tables.t(spark, sf, "events")
      .select("event_id", "user_id", "ts")
    val nFiles = 16
    def fileBoxes(dir: String): Seq[(Long, Long, Long, Long)] = {
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet"))
      files.toSeq.map { f =>
        val r = spark.read.parquet(f.getPath)
          .agg(min("user_id"), max("user_id"), min("ts"), max("ts"))
          .collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      }
    }
    // layout A: single-column time sort — the naive archive layout
    val sortedDir = tmpDir("ts_sorted")
    events.repartitionByRange(nFiles, col("ts"))
      .sortWithinPartitions("ts").write.mode("overwrite").parquet(sortedDir)
    // layout B: (user_id, ts) z-ordered
    val zDir = tmpDir("z_ordered")
    Sink.writeZOrdered(events, zDir, "user_id", "ts", numFiles = nFiles)
    // round trip is lossless
    assert(spark.read.parquet(zDir).count() == events.count())
    val (uMin, uMax) = {
      val r = events.agg(min("user_id"), max("user_id")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    // a point predicate on user_id alone: fraction of files whose
    // user_id range contains an average user — the ts-sorted layout
    // cannot prune (every file spans ~all users); the z-layout must
    // touch at most half the files
    val probes = (uMin to uMax by ((uMax - uMin) / 20 + 1)).toSeq
    def touchFraction(boxes: Seq[(Long, Long, Long, Long)]): Double = {
      val fr = probes.map(u =>
        boxes.count(b => b._1 <= u && u <= b._2).toDouble / boxes.size)
      fr.sum / fr.size
    }
    val zTouch = touchFraction(fileBoxes(zDir))
    val sortedTouch = touchFraction(fileBoxes(sortedDir))
    assert(sortedTouch > 0.9,
      s"ts-sorted layout should span users per file: $sortedTouch")
    assert(zTouch <= 0.5, s"z-layout must prune user probes: $zTouch")
    // and the z-layout still prunes TIME probes statistically (individual
    // files that straddle a high z-bit flip legitimately span wide ts
    // ranges — the curve's known trade — but the average point query
    // must still skip a real fraction of files)
    val zBoxes = fileBoxes(zDir)
    val (tMin, tMax) = {
      val r = events.agg(min("ts"), max("ts")).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val tProbes = (tMin to tMax by ((tMax - tMin) / 20 + 1)).toSeq
    val tTouch = tProbes.map(t =>
      zBoxes.count(b => b._3 <= t && t <= b._4).toDouble / zBoxes.size)
      .sum / tProbes.size
    assert(tTouch <= 0.75, s"z-layout must prune ts probes on average: $tTouch")
  }

  test("idempotentAppend: re-delivered batch no-ops; crashed staging recovers; reads see no partials") {
    import spark.implicits._
    val dir = tmpDir("idemp")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(graft.sources.Sink.idempotentAppend(b0, dir, 0L))
    // re-delivery of batch 0 — even with DIFFERENT data (which the
    // engine never does, but the sink must not trust that) — no-ops
    assert(!graft.sources.Sink.idempotentAppend(
      Seq((9L, "dup")).toDF("id", "v"), dir, 0L))
    assert(spark.read.parquet(dir).count() == 2)
    // a crash mid-stage leaves only .staging-<id>: plant one, then the
    // re-delivery must clean it, publish, and the dot-dir stays invisible
    val staged = Seq((3L, "c")).toDF("id", "v")
    staged.write.parquet(s"$dir/.staging-1")
    assert(spark.read.parquet(dir).count() == 2,
      "a staged (uncommitted) batch must be invisible to readers")
    assert(graft.sources.Sink.idempotentAppend(staged, dir, 1L))
    assert(!new java.io.File(s"$dir/.staging-1").exists())
    val all = spark.read.parquet(dir)
    assert(all.count() == 3)
    // batch provenance surfaces as a partition column
    assert(all.columns.contains("batch"))
    assert(all.where(col("batch") === 1).select("id").head().getLong(0) == 3L)
  }

  test("idempotentAppend lineage guard: a new checkpoint lineage cannot silently no-op into an old output dir") {
    // the r10 advisor finding: delete/recreate the checkpoint while
    // keeping the output dir and batch ids restart at 0 — under
    // skip-if-present the new query's batches would VANISH. The first
    // publish records the query id; a different id must fail loudly.
    import spark.implicits._
    val dir = tmpDir("idemp-lineage")
    val df = Seq((1L, "a")).toDF("id", "v")
    assert(graft.sources.Sink.idempotentAppend(df, dir, 0L,
      lineage = Some("query-A")))
    // same lineage: normal idempotent behavior (replay no-ops, next
    // batch publishes)
    assert(!graft.sources.Sink.idempotentAppend(df, dir, 0L,
      lineage = Some("query-A")))
    assert(graft.sources.Sink.idempotentAppend(df, dir, 1L,
      lineage = Some("query-A")))
    // a DIFFERENT query id over the same dir: loud failure, not a no-op
    val e = intercept[IllegalStateException] {
      graft.sources.Sink.idempotentAppend(df, dir, 0L,
        lineage = Some("query-B"))
    }
    assert(e.getMessage.contains("query-A") &&
      e.getMessage.contains("query-B"))
    // the marker is invisible to readers (underscore-prefixed)
    assert(spark.read.parquet(dir).count() == 2)
    // no-lineage callers (batch tooling, old tests) keep the unguarded
    // contract — outside a streaming thread nothing is auto-derived
    assert(!graft.sources.Sink.idempotentAppend(df, dir, 1L))
  }

  test("idempotentAppend first-writer race: the raced writer throws; exactly one lineage survives") {
    // The r12 fix re-reads the marker UNCONDITIONALLY after the rename:
    // POSIX/LocalFileSystem rename OVERWRITES an existing destination and
    // returns true, so two racing first-writers both see rename=true — only
    // the re-read reveals whose lineage the marker records. RaceLineageFs
    // injects the concurrent winner deterministically: it lets our rename
    // land, then immediately overwrites the marker with the interloper's
    // lineage (the racer's rename arriving a tick later), which is
    // indistinguishable from losing the race.
    import spark.implicits._
    val local = tmpDir("idemp-race")
    val dir = s"race://$local"
    spark.sparkContext.hadoopConfiguration
      .set("fs.race.impl", classOf[RaceLineageFs].getName)
    RaceLineageFs.interloper = Some("query-INTERLOPER")
    try {
      val df = Seq((1L, "a")).toDF("id", "v")
      val e = intercept[IllegalStateException] {
        graft.sources.Sink.idempotentAppend(df, dir, 0L,
          lineage = Some("query-A"))
      }
      assert(e.getMessage.contains("query-INTERLOPER") &&
        e.getMessage.contains("query-A"))
      // exactly one writer survives: the loser published NOTHING and the
      // marker records the winner
      assert(!new java.io.File(s"$local/batch=0").exists(),
        "the raced (losing) writer published a batch directory")
      val recorded = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$local/_query_lineage")), "UTF-8").trim
      assert(recorded == "query-INTERLOPER")
      // the winner proceeds normally under its recorded lineage
      RaceLineageFs.interloper = None
      assert(graft.sources.Sink.idempotentAppend(df, dir, 0L,
        lineage = Some("query-INTERLOPER")))
      assert(new java.io.File(s"$local/batch=0").exists())
    } finally RaceLineageFs.interloper = None
  }
}

/** Deterministic race injector for the first-writer lineage race: a
  * local filesystem whose rename, when it publishes `_query_lineage`,
  * immediately lets a concurrent writer's marker land on top (what a
  * POSIX rename race produces: both renames "succeed", the later one
  * owns the file). */
class RaceLineageFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("race:///")
  override def rename(src: org.apache.hadoop.fs.Path,
      dst: org.apache.hadoop.fs.Path): Boolean = {
    val r = super.rename(src, dst)
    if (dst.getName == "_query_lineage") {
      RaceLineageFs.interloper.foreach { lin =>
        val out = super.create(dst, true)
        try out.write(lin.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
    }
    r
  }
}

object RaceLineageFs {
  @volatile var interloper: Option[String] = None
}
