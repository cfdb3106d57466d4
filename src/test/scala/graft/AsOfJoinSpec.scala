package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AsOf
import org.scalatest.funsuite.AnyFunSuite

/** Custom as-of join: semantics + plan shape. */
class AsOfJoinSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true") // events.parquet
    .config("spark.ui.enabled", "false")
    .appName("asof-spec")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("null keys/times never match: left emits unmatched, right rows are skipped") {
    import spark.implicits._
    val quotes = Seq(
      (Some(1L), Some(ts("2024-01-01 10:00:00")), 100.0),
      (None, Some(ts("2024-01-01 10:30:00")), 666.0),    // null key: never a candidate
      (Some(1L), None, 777.0)                            // null time: never a candidate
    ).toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (Some(1L), Some(ts("2024-01-01 11:00:00"))),       // → 100.0
      (None, Some(ts("2024-01-01 11:00:00"))),           // null key → unmatched
      (Some(1L), None)                                   // null time → unmatched
    ).toDF("t_key", "t_ts")
    val got = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
      .select("t_key", "price").collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1))).toSet
    assert(got === Set((1L, 100.0), (null, null), (1L, null)))
  }

  test("self-join (same base plan on both sides) matches against the right side") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),
      (1L, ts("2024-01-01 11:00:00"))
    ).toDF("key", "etime")
    val joined = AsOf.join(
      events.withColumnRenamed("etime", "t_ts"),
      events.select(col("key").as("r_key"), col("etime").as("q_ts")),
      "key", "r_key", "t_ts", "q_ts")
    // both rows must find an as-of match (themselves), and the matched
    // right column must be a real right-side value, not a left mirror
    val got = joined.select("key", "t_ts", "q_ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2)))
    assert(got.length === 2)
    got.foreach { case (_, t, q) => assert(q != null && !q.after(t)) }
  }

  test("picks the latest right row at-or-before each left time, per key") {
    import spark.implicits._
    val quotes = Seq( // key, time, price
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("q_key", "q_ts", "price")
    val trades = Seq( // key, time
      (1L, ts("2024-01-01 10:30:00")), // → 100.0
      (1L, ts("2024-01-01 11:00:00")), // exact match → 110.0
      (1L, ts("2024-01-01 13:00:00")), // → 120.0
      (2L, ts("2024-01-01 10:00:00")), // before any quote → null
      (3L, ts("2024-01-01 10:00:00"))  // unknown key → null
    ).toDF("t_key", "t_ts")

    val got = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts")
      .select("t_key", "t_ts", "price")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .toSet
    assert(got === Set(
      (1L, ts("2024-01-01 10:30:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 13:00:00"), 120.0),
      (2L, ts("2024-01-01 10:00:00"), null),
      (3L, ts("2024-01-01 10:00:00"), null)))
  }

  test("survives multi-partition shuffles (co-partitioned merge)") {
    import spark.implicits._
    // many keys across partitions; right side = step function per key
    val right = spark.range(0, 200)
      .select((col("id") % 20).as("k"), (col("id") * 1000).as("rt"), col("id").as("payload"))
    val left = spark.range(0, 1000)
      .select((col("id") % 20).as("k"), (col("id") * 250).as("lt"))
    val got = AsOf.join(left, right, "k", "k", "lt", "rt")
    // every match must satisfy rt <= lt and be the max such rt for (k, lt)
    val bad = got.filter(col("rt").isNotNull && col("rt") > col("lt")).count()
    assert(bad === 0)
    // cross-check a sample against the compose-with-window equivalent
    val viaWindow = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.rt") <= col("l.lt"), "left")
      .groupBy(col("l.k").as("k"), col("l.lt").as("lt"))
      .agg(max(col("r.rt")).as("expected_rt"))
    val joined = got.join(viaWindow, Seq("k", "lt"))
      .filter(coalesce(col("rt"), lit(-1L)) =!= coalesce(col("expected_rt"), lit(-1L)))
    assert(joined.count() === 0)
  }

  test("forward direction picks the earliest right row at-or-after each left time") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0),
      (2L, ts("2024-01-01 10:30:00"), 200.0)
    ).toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00")), // → 110.0 (next at-or-after)
      (1L, ts("2024-01-01 11:00:00")), // exact match → 110.0
      (1L, ts("2024-01-01 13:00:00")), // after every quote → null
      (2L, ts("2024-01-01 10:00:00")), // → 200.0
      (3L, ts("2024-01-01 10:00:00"))  // unknown key → null
    ).toDF("t_key", "t_ts")
    val got = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        direction = "forward")
      .select("t_key", "t_ts", "price")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got === Set(
      (1L, ts("2024-01-01 10:30:00"), 110.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 13:00:00"), null),
      (2L, ts("2024-01-01 10:00:00"), 200.0),
      (3L, ts("2024-01-01 10:00:00"), null)))
  }

  test("tolerance bounds the match distance in both directions") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0)
    ).toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:20:00")), // 20 min after 10:00
      (1L, ts("2024-01-01 11:30:00"))  // 90 min after 10:00, 30 before 12:00
    ).toDF("t_key", "t_ts")
    val tol30min = Some(30L * 60L * 1000000L)
    val back = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        tolerance = tol30min)
      .select("t_ts", "price").collect()
      .map(r => r.getTimestamp(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(back(ts("2024-01-01 10:20:00")) === 100.0) // 20 min back: in tolerance
    assert(back(ts("2024-01-01 11:30:00")) === null)  // 90 min back: out
    val fwd = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        direction = "forward", tolerance = tol30min)
      .select("t_ts", "price").collect()
      .map(r => r.getTimestamp(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(fwd(ts("2024-01-01 10:20:00")) === null)   // next is 100 min ahead: out
    assert(fwd(ts("2024-01-01 11:30:00")) === 120.0)  // 30 min ahead: in
  }

  test("forward matches the compose-with-window equivalent across partitions") {
    import spark.implicits._
    val right = spark.range(0, 200)
      .select((col("id") % 20).as("k"), (col("id") * 1000).as("rt"), col("id").as("payload"))
    val left = spark.range(0, 1000)
      .select((col("id") % 20).as("k"), (col("id") * 250).as("lt"))
    val got = AsOf.join(left, right, "k", "k", "lt", "rt", direction = "forward")
    val bad = got.filter(col("rt").isNotNull && col("rt") < col("lt")).count()
    assert(bad === 0)
    val viaWindow = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.rt") >= col("l.lt"), "left")
      .groupBy(col("l.k").as("k"), col("l.lt").as("lt"))
      .agg(min(col("r.rt")).as("expected_rt"))
    val joined = got.join(viaWindow, Seq("k", "lt"))
      .filter(coalesce(col("rt"), lit(-1L)) =!= coalesce(col("expected_rt"), lit(-1L)))
    assert(joined.count() === 0)
  }

  test("nearest direction picks the closer row, exact ties go backward") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0),
      (2L, ts("2024-01-01 09:00:00"), 200.0)
    ).toDF("q_key", "q_ts", "price")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00")), // 30m back vs 90m fwd → 100.0
      (1L, ts("2024-01-01 11:00:00")), // 60m back vs 60m fwd: TIE → backward 100.0
      (1L, ts("2024-01-01 11:45:00")), // 105m back vs 15m fwd → 120.0
      (1L, ts("2024-01-01 09:00:00")), // before all → forward 100.0
      (1L, ts("2024-01-01 13:00:00")), // after all → backward 120.0
      (3L, ts("2024-01-01 10:00:00"))  // unknown key → null
    ).toDF("t_key", "t_ts")
    val got = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        direction = "nearest")
      .select("t_key", "t_ts", "price")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    assert(got === Set(
      (1L, ts("2024-01-01 10:30:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 100.0),
      (1L, ts("2024-01-01 11:45:00"), 120.0),
      (1L, ts("2024-01-01 09:00:00"), 100.0),
      (1L, ts("2024-01-01 13:00:00"), 120.0),
      (3L, ts("2024-01-01 10:00:00"), null)))
    // with a 20-minute tolerance only the 11:45 trade keeps a match
    val tol = AsOf.join(trades, quotes, "t_key", "q_key", "t_ts", "q_ts",
        direction = "nearest", tolerance = Some(20L * 60L * 1000000L))
      .select("t_ts", "price").collect()
      .map(r => r.getTimestamp(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(tol(ts("2024-01-01 11:45:00")) === Some(120.0))
    assert(tol(ts("2024-01-01 10:30:00")) === None)
    assert(tol(ts("2024-01-01 11:00:00")) === None)
  }

  test("nearest+tolerance equals the brute-force window formulation on real data") {
    // the one merge_asof surface combination without a fixture-scale
    // check (r6-verdict item 8): every (direction=nearest, tolerance)
    // decision — in-window match, tie to backward, out-of-tolerance →
    // null, unmatched key → null — must agree with an independent
    // brute-force formulation (join all in-tolerance candidates, rank by
    // |Δt| with backward preferred on ties) over the real events×orders
    // tables, where same-user order dates collide and events fall on
    // both sides of them.
    import org.apache.spark.sql.expressions.Window
    val sf = "/root/testdata/sf0.001"
    val tol = 3L * 86400L * 1000000L // 3 days in micros
    val e = graft.queries.QueryDsl.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    // distinct right times per key: with duplicates, "which equal-time
    // row wins" is payload-order-defined in ANY formulation — the
    // deterministic property is about the matched TIME
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"), col("o_orderdate")).distinct()
    val got = AsOf.join(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
        direction = "nearest", tolerance = Some(tol))
      .select(col("event_id"), col("o_orderdate"))
    // o_orderdate is TIMESTAMP_NTZ — cast for unix_micros; the UTC session
    // makes the NTZ→TZ reinterpretation value-preserving
    val diff = unix_micros(col("o_orderdate").cast("timestamp")) - unix_micros(col("ts"))
    val joined = e.join(o,
      col("user_id") === col("o_custkey") && abs(diff) <= tol, "left_outer")
    val w = Window.partitionBy("event_id")
      .orderBy(abs(diff).asc_nulls_last,
        (diff > 0).cast("int").asc_nulls_last) // tie → backward
    val expected = joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("event_id"), col("o_orderdate"))
    assert(got.count() === e.count(), "as-of must emit every left row exactly once")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
    // the tolerance must actually bite on this corpus, or the test is
    // vacuous: some events must be unmatched despite having same-key
    // orders somewhere in time
    val unmatched = got.filter(col("o_orderdate").isNull).count()
    val noTol = AsOf.join(e, o, "user_id", "o_custkey", "ts", "o_orderdate",
      direction = "nearest").filter(col("o_orderdate").isNull).count()
    assert(unmatched > noTol, s"tolerance dropped no matches ($unmatched vs $noTol)")
  }

  test("composite keys join on the full key tuple") {
    import spark.implicits._
    val quotes = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, 20L, ts("2024-01-01 10:00:00"), 200.0),
      (2L, 10L, ts("2024-01-01 10:00:00"), 300.0)
    ).toDF("k1", "k2", "q_ts", "price")
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 11:00:00")), // → 100.0 (exact tuple match)
      (1L, 20L, ts("2024-01-01 11:00:00")), // → 200.0
      (2L, 20L, ts("2024-01-01 11:00:00"))  // no such tuple → null
    ).toDF("k1", "k2", "t_ts")
    val got = AsOf.joinMulti(trades, quotes, Seq("k1", "k2"), Seq("k1", "k2"), "t_ts", "q_ts")
      .select(trades("k1"), trades("k2"), col("price"))
      .collect().map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
      .toSet
    assert(got === Set((1L, 10L, 100.0), (1L, 20L, 200.0), (2L, 20L, null)))
  }

  test("rejects mixed time axes; integral widths and timestamp encodings may mix") {
    import spark.implicits._
    // TIMESTAMP micros against a BIGINT of arbitrary units would compare
    // incommensurable values and make tolerance meaningless
    val l = Seq((1L, ts("2024-01-01 10:00:00"))).toDF("k", "t_ts")
    val r = Seq((1L, 42L)).toDF("k", "t_long")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "k", "t_ts", "t_long")
    }
    assert(e.getMessage.contains("same time axis"))
    // int vs long is one integral axis (user-defined unit) — allowed
    val li = Seq((1L, 10)).toDF("k", "t_i")
    val rl = Seq((1L, 9L, 7.0)).toDF("k", "t_l", "v")
    val got = AsOf.join(li, rl, "k", "k", "t_i", "t_l")
      .select(col("v")).collect().map(_.getDouble(0))
    assert(got.toSeq === Seq(7.0))
    // TIMESTAMP vs TIMESTAMP_NTZ may mix (q38's shape: events vs a parquet
    // NTZ column): the NTZ side is converted through the SESSION zone (the
    // coercion Spark applies to mixed comparisons), so the merge compares
    // instants under any zone. Both sides are built from strings under a
    // pinned session zone so the expectation is JVM-default-TZ independent.
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val ln = Seq((1L, "2024-01-01 10:00:00")).toDF("k", "s")
        .select(col("k"), col("s").cast("timestamp").as("t_ts"))
      val rn = Seq((1L, "2024-01-01 09:00:00", 3.0)).toDF("k", "s", "v")
        .select(col("k"), col("s").cast("timestamp_ntz").as("t_ntz"), col("v"))
      val joined = AsOf.join(ln, rn, "k", "k", "t_ts", "t_ntz")
      // the coercion is INTERNAL: the join output keeps the user's NTZ
      // column — original name, original TIMESTAMP_NTZ type, original
      // wall-clock value (no synthetic instant column leaks either)
      assert(joined.columns.toSeq === Seq("k", "t_ts", "k", "t_ntz", "v"))
      assert(joined.schema.find(_.name == "t_ntz").get.dataType ===
        org.apache.spark.sql.types.TimestampNTZType)
      val row = joined.select(col("t_ntz").cast("string"), col("v")).head()
      assert(row.getString(0) === "2024-01-01 09:00:00",
        "NTZ wall-clock value must survive the join unshifted")
      assert(row.getDouble(1) === 3.0)
      // NTZ on the LEFT converts the same way
      val got3 = AsOf.join(rn.select(col("k"), col("t_ntz")), ln.withColumn("v", lit(5.0)),
          "k", "k", "t_ntz", "t_ts", direction = "forward")
        .select(col("v")).collect().map(_.getDouble(0))
      assert(got3.toSeq === Seq(5.0))
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  test("rejects non-orderable key/time types with a clear error") {
    import spark.implicits._
    val l = Seq(("a", 1L)).toDF("k", "t")
    val r = Seq(("a", 1L)).toDF("k", "t")
    val e = intercept[IllegalArgumentException] {
      AsOf.join(l, r, "k", "k", "t", "t")
    }
    assert(e.getMessage.contains("must be integral/timestamp"))
    val e2 = intercept[IllegalArgumentException] {
      AsOf.join(l.select(col("t").as("k2")), r, "missing", "k", "t", "t")
    }
    assert(e2.getMessage.contains("not found"))
  }
}
