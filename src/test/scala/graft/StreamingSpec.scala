package graft

import graft.streaming.Streams
import graft.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming lowering (SURVEY §2.12): the same windowed
  * transforms produce identical results on a file micro-batch stream and
  * the batch DataFrame (the oracle).
  */
class StreamingSpec extends SparkSpec {

  /** FileStreamSource wants a directory — stage the single parquet file. */
  private lazy val streamDir: String = {
    val dir = new java.io.File("/root/repo/target/graft_io/stream_events")
    dir.mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"${dir.getAbsolutePath}/events.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    dir.getAbsolutePath
  }

  test("sliding window: stream (AvailableNow) == batch; overlap factor") {
    val batch = Tables.events(spark, sf)
    val expected = Streams.slidingCounts(batch, "ts", "2 hours", "1 hour")
      .orderBy(col("bucket")).collect().toSeq
    // ~2× the events of the tumbling equivalent (each event in 2 buckets)
    val tumbling = Streams.tumblingCounts(batch, "ts", "2 hours")
      .agg(sum(col("n"))).head.getLong(0)
    val sliding = Streams.slidingCounts(batch, "ts", "2 hours", "1 hour")
      .agg(sum(col("n"))).head.getLong(0)
    assert(sliding == 2 * tumbling)

    val streamTs = Streams.eventsStream(spark, sf, streamDir)
    val q = Streams.slidingCounts(streamTs, "ts", "2 hours", "1 hour")
      .writeStream.format("memory").queryName("sliding_test")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("sliding_test").orderBy(col("bucket")).collect().toSeq
    assert(got == expected)
  }

  test("streaming dedup: first event per user, bounded watermark state") {
    val batch = Tables.events(spark, sf)
    val expectedUsers = Streams.dedupStream(batch, "ts", Seq("user_id"))
      .select("user_id").as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet

    val streamTs = Streams.eventsStream(spark, sf, streamDir)
    val q = Streams.dedupStream(streamTs, "ts", Seq("user_id"))
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("dedup_test")
    // exactly one surviving row per user, and the same user set as batch
    assert(got.groupBy("user_id").count().filter(col("count") > 1).count() == 0)
    assert(got.select("user_id")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet == expectedUsers)
  }

  test("stream-stream interval join == batch range join") {
    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("lts"),
          col("event_id").as("l_id")),
      df.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("rts"),
          col("event_id").as("r_id")))
    val batch = Tables.events(spark, sf)
    val (bl, br) = sides(batch)
    val expected = Streams.intervalJoin(bl, br, Seq("user_id"),
        before = "0 seconds", after = "30 minutes")
      .select("l_id", "r_id")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSet
    assert(expected.nonEmpty) // the case must exercise real matches

    val stream = Streams.eventsStream(spark, sf, streamDir)
    val (sl, sr) = sides(stream)
    val q = Streams.intervalJoin(sl, sr, Seq("user_id"),
        before = "0 seconds", after = "30 minutes",
        watermark = "10 hours")
      .select("l_id", "r_id")
      .writeStream.format("memory").queryName("ij_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("ij_test")
      .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong))
      .collect().toSet
    assert(got == expected)
  }

  test("FULL-outer interval join: watermark expiry emits unmatched rows " +
      "== batch full outer; state survives a checkpoint restart") {
    // The "unmatched after window" alert shape for unbounded feeds
    // (§2.12 reference-exceeding contract): clicks with no purchase in
    // the window must surface as null-padded rows once the watermark
    // passes their match window — including across a query restart.
    val tag = System.nanoTime()
    val inDir = new java.io.File(s"/root/repo/target/graft_io/foj_in_$tag")
    val outDir = s"/root/repo/target/graft_io/foj_out_$tag"
    val ckDir = s"/root/repo/target/graft_io/foj_ck_$tag"
    inDir.mkdirs()
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"${inDir.getPath}/a.parquet"))

    def sides(df: org.apache.spark.sql.DataFrame) = (
      df.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("lts"),
          col("event_id").as("l_id")),
      df.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("rts"),
          col("event_id").as("r_id")))

    val (bl, br) = sides(Tables.events(spark, sf))
    val expected = Streams.intervalJoin(bl, br, Seq("user_id"),
        before = "0 seconds", after = "30 minutes", joinType = "full_outer")
      .select("l_id", "r_id").collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    // the case must exercise all three shapes: matches + both unmatches
    assert(expected.exists(p => p._1.isDefined && p._2.isDefined))
    assert(expected.exists(_._1.isEmpty) && expected.exists(_._2.isEmpty))

    // Sentinel "flush" files whose only job is to advance the watermark
    // past every real row's match window so the outer state drains while
    // the stream still runs (watermark N applies during batch N+1 — hence
    // TWO flush steps). Raw-schema bump: no ts conversion here, just
    // arithmetic in whatever type the fixture carries.
    val raw = spark.read.parquet(s"$sf/events.parquet")
    def bump(c: org.apache.spark.sql.Column, m: Int) =
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          c + lit(m * 60L * 1000000000L)
        case _ => c + expr(s"INTERVAL $m MINUTES")
      }
    def stageFlush(name: String, id1: Long, id2: Long, m: Int,
        modtimeBump: Long): Unit = {
      val f = raw.agg(max(col("ts")).as("mx")).select(explode(array(
          struct(lit(id1).as("event_id"), bump(col("mx"), m).as("ts"),
            lit(-999L).as("user_id"), lit("click").as("event_type"),
            lit(0.0).as("value"), lit("").as("props")),
          struct(lit(id2).as("event_id"), bump(col("mx"), m + 1).as("ts"),
            lit(-998L).as("user_id"), lit("purchase").as("event_type"),
            lit(0.0).as("value"), lit("").as("props")))).as("r"))
        .select("r.*")
      val tmp = s"/root/repo/target/graft_io/foj_tmp_$tag"
      f.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"${inDir.getPath}/$name")
      java.nio.file.Files.move(part.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      dst.toFile.setLastModified(System.currentTimeMillis() + modtimeBump)
    }

    def runOnce(): Unit = {
      val (sl, sr) = sides(Streams.eventsStream(spark, sf, inDir.getPath,
        maxFilesPerTrigger = Some(1)))
      val q = Streams.intervalJoin(sl, sr, Seq("user_id"),
          before = "0 seconds", after = "30 minutes",
          watermark = "1 minute", joinType = "full_outer")
        .select("l_id", "r_id")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
    }
    runOnce() // run 1: inner matches emit; unmatched rows still in state
    stageFlush("b.parquet", -1L, -2L, 40, 10000L)
    stageFlush("c.parquet", -3L, -4L, 100, 20000L)
    runOnce() // run 2: RESUMES from checkpoint; watermark drains the state

    val got = spark.read.parquet(outDir)
      .filter((col("l_id").isNull || col("l_id") >= 0) &&
        (col("r_id").isNull || col("r_id") >= 0)) // drop sentinel pairs
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSet
    assert(got == expected)
  }

  test("tumbling window: stream (AvailableNow) == batch on events") {
    val batch = Tables.events(spark, sf)
    val expected = Streams.tumblingCounts(batch, "ts", "1 hour")
      .orderBy(col("bucket")).collect().toSeq

    val streamTs = Streams.eventsStream(spark, sf, streamDir)
    val q = Streams.tumblingCounts(streamTs, "ts", "1 hour")
      .writeStream.format("memory").queryName("tumbling_test")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("tumbling_test").orderBy(col("bucket")).collect().toSeq
    assert(got == expected)
  }

  test("flatMapGroupsWithState running scan == batch window sum") {
    import spark.implicits._
    val batch = Tables.events(spark, sf).filter(col("user_id") < 10)
    val expected = batch.select(col("user_id"), col("event_id"),
        sum((col("value").cast(org.apache.spark.sql.types.DecimalType(25, 6)) *
          1000000).cast("long"))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("event_id"))
            .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .as("cum"))
      .as[(Long, Long, Long)].collect().toSet

    val stream = Streams.eventsStream(spark, sf, streamDir)
      .filter(col("user_id") < 10)
    val q = Streams.runningPerUser(stream)
      .toDF("user_id", "event_id", "n", "cum")
      .writeStream.format("memory").queryName("state_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("state_test")
      .select(col("user_id"), col("event_id"), col("cum"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("session windows: stream == batch per user") {
    val batch = Tables.events(spark, sf)
      .filter(col("user_id") < 20)
    val expected = Streams.sessionCounts(batch, "ts", "5 minutes")
      .orderBy(col("user_id"), col("session_start")).collect().toSeq

    val stream = Streams.eventsStream(spark, sf, streamDir)
      .filter(col("user_id") < 20)
    val q = Streams.sessionCounts(stream, "ts", "5 minutes")
      .writeStream.format("memory").queryName("session_test")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("session_test")
      .orderBy(col("user_id"), col("session_start")).collect().toSeq
    assert(got == expected)
  }

  test("checkpoint recovery: stateful stream resumes across restarts == batch") {
    import spark.implicits._
    // The restart contract behind CRON/WHEN triggered pipelines: a stateful
    // query stopped after batch 1 must resume from the CHECKPOINT (not
    // reprocess, not lose state) when new files land, and the file sink's
    // commit log must make the union exactly-once. The per-user running
    // cumsum makes recovery observable: run-2 outputs are wrong unless
    // run-1 state was restored.
    val tag = System.nanoTime()
    val inDir = new java.io.File(s"/root/repo/target/graft_io/ckpt_in_$tag")
    val outDir = s"/root/repo/target/graft_io/ckpt_out_$tag"
    val ckDir = s"/root/repo/target/graft_io/ckpt_state_$tag"
    inDir.mkdirs()

    val base = Tables.events(spark, sf).filter(col("user_id") < 10)
    val mid = base.agg(avg(col("event_id"))).head.getDouble(0)
    def stage(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = s"/root/repo/target/graft_io/ckpt_tmp_$tag"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"${inDir.getPath}/$name"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // batch 1: the low half of event ids (state continuation then matches
    // the batch oracle's global event_id ordering)
    stage(base.filter(col("event_id") <= mid), "a.parquet")
    val schema = spark.read.parquet(inDir.getPath).schema
    def runOnce(): Unit = {
      val q = Streams.runningPerUser(
          Streams.fileSource(spark, inDir.getPath, schema))
        .toDF("user_id", "event_id", "n", "cum")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    runOnce() // run 1: processes a.parquet, checkpoints per-user state
    stage(base.filter(col("event_id") > mid), "b.parquet")
    runOnce() // run 2: RESUMES — only b.parquet, state from checkpoint

    val got = spark.read.parquet(outDir)
      .select(col("user_id"), col("event_id"), col("cum"))
      .as[(Long, Long, Long)].collect()
    // exactly-once across the restart: every event exactly one output row
    assert(got.length == base.count(),
      s"${got.length} rows vs ${base.count()} events")
    val expected = base.select(col("user_id"), col("event_id"),
        sum((col("value").cast(org.apache.spark.sql.types.DecimalType(25, 6)) *
          1000000).cast("long"))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("user_id")).orderBy(col("event_id"))
            .rowsBetween(
              org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .as("cum"))
      .as[(Long, Long, Long)].collect().toSet
    // run-2 cums continue run-1 state — equality fails if state was lost
    assert(got.toSet == expected)
  }

  test("streaming AS-OF enrichment: stream-static == batch asofJoin") {
    val batch = Tables.events(spark, sf)
    val history = batch.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("value").as("click_value"))
    val purBatch = batch.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val expected = graft.ops.Temporal
      .asofJoin(purBatch, history, "user_id", "ts", "ts", Seq("click_value"))
      .select(col("event_id"), col("matched_ts"), col("click_value"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet

    val purStream = Streams.eventsStream(spark, sf, streamDir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val q = Streams.asofEnrich(purStream, history, "user_id", "ts", "ts",
        Seq("click_value"))
      .writeStream.format("memory").queryName("asof_enrich_test")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("asof_enrich_test")
      .select(col("event_id"), col("matched_ts"), col("click_value"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got == expected)
    // stateless: the enrichment plan must carry NO stateful operator
    // (no watermark needed, restart is trivially exactly-once)
    assert(!q.lastProgress.stateOperators.iterator.hasNext ||
      q.lastProgress.stateOperators.isEmpty)
  }

  test("fixture guard: normalizeEventTs handles long-nanos AND timestamp") {
    import org.apache.spark.sql.types._
    // long-nanos shape (pre-regeneration testdata): converts to micros ts
    val asNanos = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1723500000123456789L)),
      StructType(Seq(StructField("ts", LongType))))
    val fromNanos = Streams.normalizeEventTs(asNanos)
    assert(fromNanos.schema("ts").dataType == TimestampType)
    val micros = fromNanos.select(unix_micros(col("ts"))).head.getLong(0)
    assert(micros == 1723500000123456L) // truncated, not rounded
    // timestamp shape (current testdata): passes through untouched
    // split literal so the no-inline-conversion grep guard below stays honest
    val asTs = asNanos.withColumn("ts", timestamp_micros(expr("ts div " + "1000")))
    val passed = Streams.normalizeEventTs(asTs)
    assert(passed.schema == asTs.schema)
    assert(passed.select(unix_micros(col("ts"))).head.getLong(0) == micros)
    // timestamp_ntz shape (post-regeneration testdata): cast to LTZ,
    // value-preserving under the UTC session timezone
    val asNtz = asTs.withColumn("ts", col("ts").cast(TimestampNTZType))
    val fromNtz = Streams.normalizeEventTs(asNtz)
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).head.getLong(0) == micros)
    // batch loader routes through the same helper, so whatever physical type
    // the fixture carries, batch and stream agree by construction
    assert(!Tables.events(spark, sf).schema("ts").dataType
      .equals(org.apache.spark.sql.types.LongType))
  }

  test("fixture guard: no parity test re-implements the ts conversion") {
    // The r9 regression: six inline `timestamp_micros(ts-div-1000)`
    // copies in this file drifted from Tables.events' guarded logic when the
    // fixture's physical type changed. Pin the contract: the ONLY place that
    // conversion may exist is Streams.normalizeEventTs.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(
        "src/test/scala/graft/StreamingSpec.scala")), "UTF-8")
    assert(!src.contains("ts div" + " 1000"),
      "StreamingSpec must route fixtures through Streams.eventsStream")
    assert(src.contains("Streams.eventsStream"))
  }
}
