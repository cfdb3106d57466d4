package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingOps

/** Streaming operators driven synchronously: the events parquet acts as a
  * one-batch file source into a memory sink (processAllAvailable). */
class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .appName("streaming-spec")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("windowed counts with watermark produce one row per (window, type)") {
    val agg = StreamingOps.windowedCounts(StreamingOps.eventStream(spark, sf))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    // append mode emits only watermark-closed windows; with a single batch
    // the final windows stay open, so compare against the batch equivalent
    // minus the tail beyond the watermark cutoff
    val got = spark.table("win_counts")
    assert(got.columns.toSeq === Seq("w_start", "w_end", "event_type", "n", "sum_value"))
    val n = got.count()
    assert(n > 0, "no closed windows emitted")
    // every emitted row must agree with the batch computation
    val batch = graft.queries.QueryDsl.events(spark, sf)
      .groupBy(window(col("ts"), "5 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n").as("n_batch"))
    val joined = got.join(batch, Seq("w_start", "event_type"), "left")
    val mismatches = joined.filter(col("n") =!= col("n_batch")).count()
    assert(mismatches === 0)
  }

  test("streaming hopping windows agree with batch q101 on every closed window") {
    val agg = StreamingOps.hoppingCounts(StreamingOps.eventStream(spark, sf))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("hop_counts")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hop_counts")
      .select(unix_micros(col("w_start")).as("w_start_us"), col("event_type"),
        col("n"), col("sum_value").cast("double").as("sum_value"))
    assert(got.count() > 0, "no closed hopping windows emitted")
    val batch = SparkEntry.queries("q101_hopping_window")(spark, sf)
      .select("w_start_us", "event_type", "n", "sum_value")
    // append mode emits only watermark-closed windows; each emitted row
    // must match the batch aggregation exactly (count AND decimal sum)
    assert(got.exceptAll(batch).count() === 0,
      "every closed streaming window must equal its batch twin")
    // closed windows dominate a one-batch replay: only the final hour's
    // W/S window set can still be open
    assert(got.count() >= batch.count() - 8 * 5)
  }

  test("streaming session paths: every emission is a true batch path, closed sessions all emit") {
    import spark.implicits._
    val deb = StreamingOps.sessionPathsStream(
      StreamingOps.eventStream(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[StreamingOps.Event], gapHours = 12)
    val q = deb.writeStream.outputMode("append")
      .format("memory").queryName("session_paths")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("session_paths")
      .select("user_id", "session_start_us", "path").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got.nonEmpty, "no sessions emitted")
    // batch reference: q99's sessionization before its top-k cut
    import org.apache.spark.sql.expressions.Window
    val wu = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val batch = graft.queries.QueryDsl.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("brk",
        when(col("ts_us") - lag("ts_us", 1).over(wu) > 12L * 3600 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("sid", sum("brk").over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts_us").as("session_start_us"),
        sort_array(collect_list(struct(col("ts_us"), col("event_id"),
          col("event_type")))).as("evs"),
        max("ts_us").as("last_us"))
      .select(col("user_id"), col("session_start_us"), col("last_us"),
        expr("array_join(transform(evs, e -> e.event_type), '>')").as("path"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val batchSet = batch.map(b => (b._1, b._2, b._4)).toSet
    assert(got.subsetOf(batchSet), "every emitted path must be a true batch session")
    // sessions whose gap closed under the final watermark must have emitted
    val maxTs = graft.queries.QueryDsl.events(spark, sf)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val cutoff = maxTs - 10L * 60 * 1000000 - 12L * 3600 * 1000000
    val due = batch.filter(_._3 < cutoff).map(b => (b._1, b._2, b._4)).toSet
    assert(due.subsetOf(got), "a session closed under the watermark must emit its path")
  }

  test("streaming debounce over one batch equals the batch anchor walk exactly") {
    import spark.implicits._
    val deb = StreamingOps.debounceStream(
      StreamingOps.eventStream(spark, sf)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[StreamingOps.Event], tolHours = 24)
    val q = deb.writeStream.outputMode("append")
      .format("memory").queryName("debounce_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("debounce_stream")
      .select("user_id", "event_type", "event_id", "ts_us")
    val batch = SparkEntry.queries("q98_event_debounce")(spark, sf)
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() === 0 && batch.exceptAll(got).count() === 0,
      "single-batch streaming debounce must equal the batch fold row-for-row")
  }

  test("debounce anchors persist across micro-batches and suppress late arrivals") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(hours: Int, id: Long) = StreamingOps.Event(
      id, new java.sql.Timestamp(t0.getTime + hours * 3600L * 1000), 1L, "click", 0.0)
    val ms = MemoryStream[StreamingOps.Event]
    val q = StreamingOps.debounceStream(ms.toDS(), tolHours = 24).writeStream
      .outputMode("append").format("memory").queryName("debounce_state").start()
    ms.addData(at(0, 1)); q.processAllAvailable()     // anchor at t0 → emitted
    ms.addData(at(1, 2), at(25, 3)); q.processAllAvailable() // +1 h suppressed, +25 h emitted
    ms.addData(at(26, 4)); q.processAllAvailable()    // 1 h after the NEW anchor → suppressed
    q.stop()
    val ids = spark.table("debounce_state").select("event_id").as[Long].collect().toSet
    assert(ids === Set(1L, 3L),
      "the anchor must survive micro-batch boundaries with no timeout")
  }

  test("session path overflow keeps the event-time-smallest events and an exact " +
      "count, whatever the arrival order") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(mins: Int, id: Long, typ: String) = StreamingOps.Event(
      id, new java.sql.Timestamp(t0.getTime + mins * 60000L), 1L, typ, 0.0)
    // 6 in-session events (one per minute, types a..f) for a maxEvents=4
    // cap, then a far-future event to close the session past the watermark
    val session = (0 until 6).map(i => at(i, i + 1, ('a' + i).toChar.toString))
    val closer = at(60 * 24 * 40, 99, "z")
    def run(name: String, batches: Seq[Seq[StreamingOps.Event]]): (Long, String) = {
      val ms = MemoryStream[StreamingOps.Event]
      val q = StreamingOps.sessionPathsStream(ms.toDS(), gapHours = 12, maxEvents = 4)
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      q.processAllAvailable(); q.stop()
      val r = spark.table(name).filter(col("n_events") > 1)
        .select("n_events", "path").head()
      (r.getLong(0), r.getString(1))
    }
    // arrival order 1: event-time order; order 2: the LAST four events
    // arrive first, the first two trickle in late (still inside the gap)
    val inOrder = run("paths_ovf1", Seq(session, Seq(closer)))
    val scrambled = run("paths_ovf2",
      Seq(session.drop(2), session.take(2).reverse, Seq(closer)))
    // n_events is the TRUE count (6, not the cap), and the truncated path
    // is the event-time-smallest 4 — identically in both arrival orders
    assert(inOrder === ((6L, "a>b>c>d>…")))
    assert(scrambled === inOrder,
      "overflow truncation must be arrival-order-invariant")
  }

  test("streaming dropDuplicates matches the batch distinct over the same keys") {
    val dd = StreamingOps.dedupStream(StreamingOps.eventStream(spark, sf))
    val q = dd.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("dedup_stream")
    val batch = graft.queries.QueryDsl.events(spark, sf)
      .select("user_id", "event_type").distinct()
    // withinWatermark may re-emit a key after its state expires: the emitted
    // DISTINCT key set must equal the batch distinct exactly
    assert(got.distinct().count() === batch.count())
    assert(got.distinct().exceptAll(batch).count() === 0)
    assert(got.count() >= batch.count())
  }

  test("streaming KMV sketch equals the batch KMV on the same events") {
    val agg = StreamingOps.kmvDistinctStream(StreamingOps.eventStream(spark, sf))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("kmv_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("kmv_stream")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(3))).toSet
    // batch reference: q78's formulation (distinct + bottom-32) over the
    // same key/hash — must agree EXACTLY (the sketch is a set function)
    import org.apache.spark.sql.graft.functions.top_k_struct
    val batch = graft.queries.QueryDsl.events(spark, sf)
      .select(col("event_type").as("grp"),
        conv(substring(md5(col("user_id").cast("string")), 1, 14), 16, 10)
          .cast("long").as("h"))
      .distinct()
      .groupBy("grp")
      .agg(top_k_struct(struct(col("h")), 32).as("bottomk"), count(lit(1)).as("n"))
      .withColumn("n_kept", least(col("n"), lit(32L)).cast("int"))
      .withColumn("kth", expr("try_element_at(bottomk, 32).h"))
      .withColumn("est_distinct", expr(
        s"CASE WHEN n >= 32 THEN 31L * ${1L << 56}L DIV kth ELSE n END"))
      .collect().map(r => (r.getString(0), r.getInt(r.fieldIndex("n_kept")),
        r.getLong(r.fieldIndex("est_distinct")))).toSet
    assert(got.nonEmpty && got == batch)
  }

  test("kmvDistinctStream rejects k outside [2, 128]: (k-1)*2^56 must not " +
      "overflow the Long estimator") {
    val df = graft.queries.QueryDsl.events(spark, sf)
    intercept[IllegalArgumentException] { StreamingOps.kmvDistinctStream(df, k = 129) }
    intercept[IllegalArgumentException] { StreamingOps.kmvDistinctStream(df, k = 1) }
    // k = 128 is the exact boundary: 127 * 2^56 < 2^63 still fits
    assert(StreamingOps.kmvDistinctStream(df, k = 128).columns.nonEmpty)
  }

  test("streaming KMV state is merge-order- and batching-independent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1 to 500).map(i => ((i * 37) % 120L, if (i % 3 == 0) "click" else "view"))
    def run(name: String, splits: Seq[Seq[(Long, String)]]): Set[(String, Int, Long)] = {
      val ms = MemoryStream[(Long, String)]
      val df = ms.toDF().toDF("user_id", "event_type")
      val q = StreamingOps.kmvDistinctStream(df).writeStream
        .outputMode("complete").format("memory").queryName(name).start()
      splits.foreach { s => ms.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getInt(1), r.getLong(3))).toSet
    }
    val oneBatch = run("kmv_one", Seq(rows))
    val manyBatches = run("kmv_many", Seq(rows.drop(200).reverse, rows.take(200), rows))
    assert(oneBatch.nonEmpty && oneBatch == manyBatches,
      "bottom-k distinct state must be a pure function of the key set")
  }

  test("streaming CMS matrix is batching-independent and equals the batch build") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // additive counters: the same events split ANY way across micro-batches
    // (each event exactly once — counts, unlike the KMV set function, are
    // multiplicity-sensitive) must land on the identical d×w matrix
    val rows = (1 to 400).map(i => (i * 37) % 90L)
    def run(name: String, splits: Seq[Seq[Long]]): Set[(Int, Long, Long)] = {
      val ms = MemoryStream[Long]
      val df = ms.toDF().toDF("user_id")
      val q = StreamingOps.cmsFreqStream(df).writeStream
        .outputMode("complete").format("memory").queryName(name).start()
      splits.foreach { s => ms.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    }
    val oneBatch = run("cms_one", Seq(rows))
    val (a, b) = rows.splitAt(150)
    val manyBatches = run("cms_many", Seq(b.reverse, a))
    assert(oneBatch.nonEmpty && oneBatch == manyBatches,
      "additive counter state must not depend on batching or order")
    // and the stream-built matrix is interchangeable with the batch build
    val batch = StreamingOps.cmsFreqStream(rows.toDF("user_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(oneBatch == batch, "stream and batch builds must agree cell-for-cell")
    // state bound: never more than d·w cells
    assert(oneBatch.size <= 4 * 64)
  }

  test("streaming count-sketch cells fold a TURNSTILE stream: retractions " +
    "cancel exactly and the matrix equals the batch sketch of the net multiset") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // inserts, then a later micro-batch RETRACTS a subset (delta = -1):
    // signed cells must land exactly on the sketch of what remains —
    // the property CMS counters don't have under deletes
    val inserts = (1 to 300).map(i => ((i * 31) % 70L, 1L))
    val retracts = inserts.take(120).map { case (k, _) => (k, -1L) }
    val net = inserts.drop(120)
    def run(name: String, splits: Seq[Seq[(Long, Long)]]): Set[(Int, Long, Long)] = {
      val ms = MemoryStream[(Long, Long)]
      val df = ms.toDF().toDF("k", "delta")
      val q = StreamingOps.countSketchCellsStream(df).writeStream
        .outputMode("complete").format("memory").queryName(name).start()
      splits.foreach { s => ms.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).filter(col("cell") =!= 0)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    }
    val turnstile = run("cs_turnstile", Seq(inserts, retracts))
    val netOnly = run("cs_net", Seq(net))
    assert(turnstile.nonEmpty && turnstile == netOnly,
      "retractions must cancel cell-for-cell")
    // interchangeable with the batch build over the net multiset
    val batch = StreamingOps.countSketchCellsStream(net.toDF("k", "delta"))
      .filter(col("cell") =!= 0)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(turnstile == batch, "stream and batch builds must agree cell-for-cell")
    // and q105's hashing: the same function on lineitem part keys equals
    // the q105 query's internal cell table (cell-for-cell hashing parity)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey").as("k"), lit(1L).as("delta"))
    val cells = StreamingOps.countSketchCellsStream(li)
    assert(cells.count() <= 5 * 64 && cells.filter(col("cell") =!= 0).count() > 0)
  }

  test("streaming HLL registers are batching-independent, equal the batch " +
    "build, and absorb at-least-once replays (max is idempotent)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = (1 to 400).map(i => (s"type${i % 3}", (i * 37) % 90L))
    def run(name: String, splits: Seq[Seq[(String, Long)]]): Set[(String, Long, Int)] = {
      val ms = MemoryStream[(String, Long)]
      val df = ms.toDF().toDF("event_type", "user_id")
      val q = StreamingOps.hllDistinctStream(df).writeStream
        .outputMode("complete").format("memory").queryName(name).start()
      splits.foreach { s => ms.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    }
    val oneBatch = run("hll_one", Seq(rows))
    val (a, b) = rows.splitAt(150)
    val manyBatches = run("hll_many", Seq(b.reverse, a))
    assert(oneBatch.nonEmpty && oneBatch == manyBatches,
      "max-fold register state must not depend on batching or order")
    // idempotence: replaying every event (at-least-once delivery) must
    // leave the registers untouched — the property the additive CMS lacks
    val replayed = run("hll_replay", Seq(rows, rows.take(200), rows))
    assert(replayed == oneBatch, "duplicate delivery must not move a max register")
    // and the stream build is interchangeable with the batch build
    val batch = StreamingOps.hllDistinctStream(
      rows.toDF("event_type", "user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(oneBatch == batch, "stream and batch register tables must agree")
    // state bound: ≤ 64 registers per group
    assert(oneBatch.groupBy(_._1).values.forall(_.size <= 64))
  }

  test("streaming histogram bins are batching-independent, equal the batch " +
    "build, and clamp out-of-domain values to the edge bins") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // values spanning below-domain (negative → bin 0) and above-domain
    // (huge → bin 1023) plus an in-domain spread
    val rows = (1 to 400).map(i =>
      (s"type${i % 2}", if (i % 97 == 0) -5.0 else if (i % 89 == 0) 1e9 else i * 317.0))
    def run(name: String, splits: Seq[Seq[(String, Double)]]): Set[(String, Long, Long)] = {
      val ms = MemoryStream[(String, Double)]
      val df = ms.toDF().toDF("event_type", "value")
      val q = StreamingOps.histQuantileStream(df).writeStream
        .outputMode("complete").format("memory").queryName(name).start()
      splits.foreach { s => ms.addData(s); q.processAllAvailable() }
      q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    val oneBatch = run("hist_one", Seq(rows))
    val (a, b) = rows.splitAt(150)
    val manyBatches = run("hist_many", Seq(b.reverse, a))
    assert(oneBatch.nonEmpty && oneBatch == manyBatches,
      "additive bin state must not depend on batching or order")
    val batch = StreamingOps.histQuantileStream(
      rows.toDF("event_type", "value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(oneBatch == batch, "stream and batch builds must agree bin-for-bin")
    // clamp semantics: the planted outliers land in the edge bins
    assert(oneBatch.exists { case (_, bin, _) => bin == 0L })
    assert(oneBatch.exists { case (_, bin, _) => bin == 1023L })
    // every bin inside the fixed domain
    assert(oneBatch.forall { case (_, bin, _) => bin >= 0L && bin <= 1023L })
  }

  test("stream-static broadcast join enriches every event exactly once") {
    val dim = spark.read.parquet(s"$sf/customer.parquet").select("c_custkey", "c_name")
    val joined = StreamingOps.enrichStream(StreamingOps.eventStream(spark, sf), dim)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("enriched")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("enriched")
    val nEvents = graft.queries.QueryDsl.events(spark, sf).count()
    assert(got.count() === nEvents, "left join must preserve stream cardinality")
    assert(got.filter(col("c_name").isNull).count() <
      got.count(), "some events must actually enrich")
  }

  test("stream-stream interval self-join matches the batch formulation") {
    val joined = StreamingOps.pairsWithinGap(StreamingOps.eventStream(spark, sf), gapMinutes = 1)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("pairs_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("pairs_stream")
    val e = graft.queries.QueryDsl.events(spark, sf)
    val a = e.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
    val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val batch = a.join(b, expr(
      """user_id = b_user AND b_ts BETWEEN a_ts AND a_ts + INTERVAL 1 MINUTES AND
         (b_ts > a_ts OR (b_ts = a_ts AND a_id < b_id)) AND a_id != b_id"""))
      .select(col("user_id"), col("a_id"), col("b_id"),
        ((unix_micros(col("b_ts")) - unix_micros(col("a_ts"))) / 1000000L)
          .cast("long").as("diff_sec"))
    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
    // pair emission must not depend on id/time order agreement: every
    // unordered close pair appears exactly once
    val undirected = batch.select(least(col("a_id"), col("b_id")), greatest(col("a_id"), col("b_id")))
    assert(undirected.distinct().count() === batch.count())
  }

  test("stream-stream LEFT OUTER interval join: matches emit exactly, and " +
    "non-matches emit null once the watermark proves them final") {
    val joined = StreamingOps.pairsWithinGapOuter(
      StreamingOps.eventStream(spark, sf), gapMinutes = 1)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("pairs_outer_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("pairs_outer_stream")
    val e = graft.queries.QueryDsl.events(spark, sf)
    val a = e.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
    val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val batch = a.join(b, expr(
      """user_id = b_user AND b_ts > a_ts AND
         b_ts <= a_ts + INTERVAL 1 MINUTES AND a_id != b_id"""), "left_outer")
      .select(col("user_id"), col("a_id"), col("b_id"),
        ((unix_micros(col("b_ts")) - unix_micros(col("a_ts"))) / 1000000L)
          .cast("long").as("diff_sec"))
    // matched rows stream out immediately — exact equality with the batch
    val gotM = got.filter(col("b_id").isNotNull)
    val batchM = batch.filter(col("b_id").isNotNull)
    assert(gotM.count() === batchM.count())
    assert(gotM.exceptAll(batchM).count() === 0)
    // null rows are the deferred half: one per unmatched left row, but
    // ONLY once the event-time watermark (max ts − 10 min) has passed the
    // row's join window (a_ts + gap) — rows near the stream's end stay
    // open and must NOT have been emitted
    val maxTs = e.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val cutoff = maxTs - (10L + 1L) * 60 * 1000000L
    // a_id is the event id — unique per left row, so null rows compare by id
    val gotNIds = got.filter(col("b_id").isNull)
      .select("a_id").collect().map(_.getLong(0)).toSet
    val batchNWithTs = batch.filter(col("b_id").isNull)
      .join(a, Seq("a_id"))
      .select(col("a_id"), unix_micros(col("a_ts")).as("ats"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotNIds.subsetOf(batchNWithTs.keySet),
      "every emitted null row must be a true batch non-match")
    val dueIds = batchNWithTs.filter(_._2 < cutoff).keySet
    assert(dueIds.subsetOf(gotNIds),
      "a non-match whose window closed under the final watermark must have emitted")
    assert(gotNIds.nonEmpty, "the fixture must exercise the deferred-null path")
  }

  test("stream-stream FULL OUTER interval join: matches exact, both null classes " +
    "emit only once their windows close under the watermark") {
    val joined = StreamingOps.pairsWithinGapFull(
      StreamingOps.eventStream(spark, sf), gapMinutes = 1)
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("pairs_full_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("pairs_full_stream")
    val e = graft.queries.QueryDsl.events(spark, sf)
    val a = e.select(col("event_id").as("a_id"), col("user_id"), col("ts").as("a_ts"))
    val b = e.select(col("event_id").as("b_id"), col("user_id").as("b_user"), col("ts").as("b_ts"))
    val batch = a.join(b, expr(
      """user_id = b_user AND b_ts > a_ts AND
         b_ts <= a_ts + INTERVAL 1 MINUTES AND a_id != b_id"""), "full_outer")
      .select(coalesce(col("user_id"), col("b_user")).as("user_id"),
        col("a_id"), col("b_id"),
        ((unix_micros(col("b_ts")) - unix_micros(col("a_ts"))) / 1000000L)
          .cast("long").as("diff_sec"))
    // matched rows stream out immediately — exact equality with the batch
    val gotM = got.filter(col("a_id").isNotNull && col("b_id").isNotNull)
    val batchM = batch.filter(col("a_id").isNotNull && col("b_id").isNotNull)
    assert(gotM.count() === batchM.count())
    assert(gotM.exceptAll(batchM).count() === 0)
    // the two deferred null classes, each gated by the final watermark
    val maxTs = e.agg(max(unix_micros(col("ts")))).head().getLong(0)
    val cutoff = maxTs - (10L + 1L) * 60 * 1000000L
    def nullSide(df: org.apache.spark.sql.DataFrame, idCol: String,
        otherCol: String): Set[Long] =
      df.filter(col(otherCol).isNull).select(idCol)
        .collect().map(_.getLong(0)).toSet
    val tsById = e.select(col("event_id"), unix_micros(col("ts")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((idCol, otherCol) <- Seq(("a_id", "b_id"), ("b_id", "a_id"))) {
      val gotN = nullSide(got, idCol, otherCol)
      val batchN = nullSide(batch, idCol, otherCol)
      assert(gotN.subsetOf(batchN),
        s"every emitted $idCol null row must be a true batch non-match")
      val due = batchN.filter(id => tsById(id) < cutoff)
      assert(due.subsetOf(gotN),
        s"a $idCol non-match whose window closed under the final watermark must emit")
      assert(gotN.nonEmpty, s"the fixture must exercise the $idCol deferred-null path")
    }
  }

  test("streaming ingest gate: redact → grade → novelty in one stateless pass, " +
      "each rejection class routed; stream equals the batch gate") {
    import spark.implicits._
    import org.apache.spark.sql.graft.functions.token_shingle_hashes
    val rows = Seq(
      (100L, "fresh wholesome document discussing catalyst optimizer details contact admin@example.com for help"),
      (101L, "a b c"), // too_short
      (102L, "a b a b a b a b a b a b"), // low_diversity: 2 of 12 distinct
      (103L, "p q r s t p q r s t p q r s t"), // repetitive: 5-token cycle
      (104L, "seen baseline document about spark joins and shuffles repeated verbatim downstream"),
      // repetitive ONLY after redaction: one sentence repeated with a
      // DIFFERENT email each time — raw-text shingles are all distinct
      // (each email differs), but [EMAIL] collapses the copies. The
      // cascade grades the redacted text, so this must grade repetitive.
      (105L, "please contact a@x.com about catalyst shuffles today " +
        "please contact b@y.com about catalyst shuffles today"))
    val seenText = rows.toMap.apply(104L) // 104 is an exact dup of the ingested corpus
    val seen = Seq((0L, seenText)).toDF("doc_id", "text")
      .select(explode(token_shingle_hashes($"text", 3)).as("e")).distinct()
    val digest = seen.stat.bloomFilter("e", 1000L, 0.01)

    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-gate")
    val df = rows.toDF("doc_id", "text")
    df.write.mode("overwrite").parquet(dir.resolve("in").toString)
    val incoming = spark.readStream.schema(df.schema).parquet(dir.resolve("in").toString)
    val q = StreamingOps.ingestGate(incoming, digest)
      .writeStream.outputMode("append")
      .format("memory").queryName("ingest_gate")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("ingest_gate").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("red"), r.getAs[String]("verdict"), r.getAs[Boolean]("novel"))).toMap

    assert(out(100L)._2 === "keep" && out(100L)._3, "clean novel doc must pass")
    assert(out(100L)._1.contains("[EMAIL]") && !out(100L)._1.contains("admin@example.com"),
      "PII must be redacted before anything downstream sees the text")
    assert(out(101L)._2 === "too_short")
    assert(out(102L)._2 === "low_diversity")
    assert(out(103L)._2 === "repetitive")
    assert(out(104L)._2 === "keep" && !out(104L)._3,
      "an exact dup of the ingested corpus is quality-clean but NOT novel")
    assert(out(105L)._2 === "repetitive",
      "repetition must be graded over the REDACTED text: the same sentence " +
        "repeated with different emails collapses only after [EMAIL] redaction")

    // micro-batch execution must equal the same gate run in batch
    val batch = StreamingOps.ingestGate(df, digest).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("red"), r.getAs[String]("verdict"), r.getAs[Boolean]("novel"))).toMap
    assert(out === batch)
    java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
  }

  test("streaming novelty filter drops every true near-dup, stateless and map-side") {
    import org.apache.spark.sql.graft.functions.token_shingle_hashes
    // static digest of the "ingested" corpus (doc_id < 400), built in batch
    val docsPath = s"$sf/documents.parquet"
    val batchDocs = spark.read.parquet(docsPath)
    val seenShingles = batchDocs.filter(col("doc_id") < 400)
      .select(explode(token_shingle_hashes(col("text"), 3)).as("e")).distinct()
    val digest = seenShingles.stat.bloomFilter("e", math.max(seenShingles.count(), 1000L), 0.01)

    val incoming = spark.readStream
      .schema(batchDocs.schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sf)
      .filter(col("doc_id") >= 400)
    val q = StreamingOps.novelDocsStream(incoming, digest)
      .writeStream.outputMode("append")
      .format("memory").queryName("novel_docs")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val survivors = spark.table("novel_docs")
      .select("doc_id").collect().map(_.getLong(0)).toSet

    // expected: exactly the incoming docs with fewer than half their
    // shingles in the digest (same digest object, driver-side recount)
    val sets = batchDocs.select(col("doc_id"), token_shingle_hashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val (seen, inc) = sets.partition(_._1 < 400)
    val expected = inc.collect {
      case (id, sh) if 2 * sh.count(digest.mightContainLong) < sh.size => id
    }.toSet
    assert(survivors === expected)

    // soundness: no surviving doc is an exact Jaccard>=0.5 near-dup of the
    // ingested corpus (the filter may over-drop — false positives — but
    // must never pass a true duplicate)
    val trueDups = inc.keySet.filter { i =>
      val a = sets(i).toSet
      seen.values.exists { sv =>
        val b = sv.toSet
        val ni = (a & b).size
        1000L * ni / (a.size + b.size - ni) >= 500
      }
    }
    assert((survivors & trueDups).isEmpty,
      s"true near-dups survived the novelty filter: ${survivors & trueDups}")
  }

  test("listener captures lineage of foreachBatch batch plans (streaming audit)") {
    import org.apache.spark.sql.graft.{GraphVizSink, SQLFlowListener}
    val outDir = java.nio.file.Files.createTempDirectory("stream-audit").toString
    val listener = SQLFlowListener(GraphVizSink(),
      options = Map("outputDirPath" -> outDir))
    spark.listenerManager.register(listener)
    try {
      val q = StreamingOps.eventStream(spark, sf)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // a real batch action inside the micro-batch: aggregate + count
          batch.groupBy("event_type").count().count()
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.processAllAvailable(); q.stop()
      // the QueryExecutionListener fires on the listener-bus thread
      def files() = Option(new java.io.File(outDir).listFiles()).getOrElse(Array.empty)
      val deadline = System.currentTimeMillis() + 10000
      while (files().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(files().nonEmpty, "no lineage appended for foreachBatch plans")
    } finally spark.listenerManager.unregister(listener)
  }

  test("sessionization with flatMapGroupsWithState emits gap-closed sessions") {
    import spark.implicits._
    val events = StreamingOps.eventStream(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamingOps.Event]
    val sessions = StreamingOps.sessionize(events, gapMinutes = 5)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("sessions")
    assert(got.count() > 0, "no sessions emitted")
    // session invariants
    assert(got.filter(col("session_end") < col("session_start")).count() === 0)
    assert(got.filter(col("n_events") <= 0).count() === 0)
    // sessions for one user must not overlap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_start")
    val overlaps = got
      .withColumn("prev_end", lag(col("session_end"), 1).over(w))
      .filter(col("prev_end").isNotNull && col("session_start") < col("prev_end") - expr("INTERVAL 5 MINUTES"))
      .count()
    assert(overlaps === 0)
  }
}
