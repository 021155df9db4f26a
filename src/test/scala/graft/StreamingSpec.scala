package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStreams

case class Ev(ts_utc: Timestamp, user_id: Long, event_type: String, value: Double)
case class Doc(ts_utc: Timestamp, doc_id: Long, text: String)

class StreamingSpec extends SparkSpec {

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  test("tumbling event-time window aggregates counts and means") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumblingStats(mem.toDF(), "1 day", "1 hour")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(
        Ev(ts(1, 1), 1, "click", 10.0), Ev(ts(1, 2), 2, "click", 20.0),
        Ev(ts(1, 3), 1, "purchase", 99.0),
        Ev(ts(2, 1), 1, "click", 30.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from tumbling").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "click", 2L, 3000L),
        ("2024-01-01 00:00:00.0", "purchase", 1L, 9900L),
        ("2024-01-02 00:00:00.0", "click", 1L, 3000L)))
    } finally q.stop()
  }

  test("sliding windows cover each event in window/slide panes") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.slidingMean(mem.toDF(), "2 days", "1 day", "1 hour")
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(Ev(ts(2, 12), 7, "click", 100.0))
      q.processAllAvailable()
      val rows = spark.sql("select w_start, user_id, n from sliding").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2))).toSet
      // event at Jan 2 12:00 belongs to [Jan 1, Jan 3) and [Jan 2, Jan 4)
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", 7L, 1L),
        ("2024-01-02 00:00:00.0", 7L, 1L)))
    } finally q.stop()
  }

  test("stream-static join enriches across micro-batches with one dim copy") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "AUTO"), (2L, "STEEL")).toDF("c_custkey", "c_mktsegment")
    val mem = MemoryStream[Ev]
    val q = EventStreams.enrichedStats(mem.toDF(), dim, "user_id",
        "c_custkey", "c_mktsegment")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(Ev(ts(1, 1), 1, "click", 10.0))
      q.processAllAvailable()
      // second micro-batch: same (day, segment, type) cell grows, an
      // unmatched user (99) drops, a second segment appears
      mem.addData(
        Ev(ts(1, 5), 1, "click", 2.5),
        Ev(ts(1, 6), 2, "click", 7.0),
        Ev(ts(1, 7), 99, "click", 1000.0))
      q.processAllAvailable()
      val rows = spark.sql("select * from enriched").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getString(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(rows == Set(
        ("2024-01-01 00:00:00.0", "AUTO", "click", 2L, 1250L),
        ("2024-01-01 00:00:00.0", "STEEL", "click", 1L, 700L)))
    } finally q.stop()
  }

  test("streaming dedup: duplicate keys within the watermark are dropped once") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.dedupWithinWatermark(mem.toDF(),
        Seq("user_id", "event_type"), "1 hour")
      .writeStream.format("memory").queryName("deduped")
      .outputMode(OutputMode.Append()).start()
    try {
      // three copies of the same (user, type) inside one watermark
      // horizon plus one distinct key -> exactly two survivors
      mem.addData(
        Ev(ts(1, 1), 1, "click", 10.0),
        Ev(ts(1, 1), 1, "click", 10.0),
        Ev(ts(1, 2), 1, "click", 11.0),
        Ev(ts(1, 2), 2, "click", 20.0))
      q.processAllAvailable()
      val rows = spark.sql("select user_id, event_type from deduped").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.length == 2, s"expected 2 survivors, got ${rows.mkString(",")}")
      assert(rows.toSet == Set((1L, "click"), (2L, "click")))
    } finally q.stop()
  }

  test("stream-stream interval join matches pairs across micro-batches") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val views = MemoryStream[Ev]
    val buys = MemoryStream[Ev]
    val q = EventStreams.intervalJoin(views.toDF(), buys.toDF(), "user_id",
        maxLag = "6 hours", watermark = "1 hour")
      .writeStream.format("memory").queryName("ssjoin")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: a view with no purchase yet — join state must HOLD it
      views.addData(Ev(ts(1, 1), 1, "view", 1.0))
      buys.addData(Ev(ts(1, 0), 2, "purchase", 9.0)) // no matching view
      q.processAllAvailable()
      // batch 2: the purchase arrives 3 h later (within the 6 h lag) —
      // it must match the batch-1 view held in state; a second
      // purchase lands OUTSIDE the lag and must not match
      buys.addData(
        Ev(ts(1, 4), 1, "purchase", 5.0),
        Ev(ts(1, 9), 1, "purchase", 7.0))
      q.processAllAvailable()
      val rows = spark.sql("select l_key, l_ts, r_ts from ssjoin").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
      assert(rows == Set((1L, ts(1, 1), ts(1, 4))),
        s"expected exactly the within-lag cross-batch pair, got $rows")
    } finally q.stop()
  }

  test("near-dup gate: bucket state carries across micro-batches") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = MemoryStream[Doc]
    val q = graft.streaming.CorpusStreams.nearDupGate(docs.toDF())
      .writeStream.format("memory").queryName("ndgate")
      .outputMode(OutputMode.Append()).start()
    def verdicts(): Map[Long, Boolean] =
      spark.sql("select doc_id, max(case when dup then 1 else 0 end) from ndgate group by doc_id")
        .collect().map(r => r.getLong(0) -> (r.getInt(1) == 1)).toMap
    try {
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
      // batch 1: two distinct docs
      docs.addData(
        Doc(ts(1, 0), 1L, base),
        Doc(ts(1, 1), 2L, "one two three four five six seven eight nine ten"))
      q.processAllAvailable()
      assert(verdicts() == Map(1L -> false, 2L -> false))
      // batch 2: a near-copy of doc 1 (one token dropped) MUST be
      // flagged against batch-1 state; an unrelated doc must not
      docs.addData(
        Doc(ts(1, 2), 3L, base.split(" ").drop(1).mkString(" ")),
        Doc(ts(1, 3), 4L, "red orange yellow green blue indigo violet pink black white"))
      q.processAllAvailable()
      val v = verdicts()
      assert(v(3L), "cross-batch near-dup not flagged — state lost")
      assert(!v(4L), "unrelated doc falsely flagged")
    } finally q.stop()
  }

  test("KMV sketch aggregator: window state merges across micro-batches, estimate = batch sketch") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = MemoryStream[Ev]
    val k = 8
    val kmv = org.apache.spark.sql.functions.udaf(new graft.ops.Sketches.KmvAgg(k))
    import org.apache.spark.sql.functions._
    val u = expr("cast(conv(substring(md5(concat(cast(user_id as string), " +
      "'#kmv')), 1, 13), 16, 10) as long)")
    val out = events.toDF()
      .withWatermark("ts_utc", "1 hour")
      .select(window(col("ts_utc"), "1 day").as("w"), u.as("u"))
      .groupBy(col("w"))
      .agg(kmv(col("u")).as("s"))
      .select(col("w.start").as("w_start"), col("s.est_distinct"))
    val q = out.writeStream.format("memory").queryName("kmvstream")
      .outputMode(OutputMode.Complete()).start()
    try {
      // 20 distinct users for day 1, split across two micro-batches
      // (plus duplicates — the sketch must dedup within AND across)
      events.addData((0 until 10).map(i => Ev(ts(1, i % 24), i.toLong, "e", 0.0)): _*)
      q.processAllAvailable()
      events.addData((5 until 20).map(i => Ev(ts(1, i % 24), i.toLong, "e", 0.0)): _*)
      q.processAllAvailable()
      val streamed = spark.sql("select est_distinct from kmvstream").head.getLong(0)
      // the batch sketch over the same 20 users must agree exactly
      val batch = graft.ops.Sketches.kmvDistinct(
        (0 until 20).map(_.toLong).toDF("user_id"), "user_id", k)
        .head.getAs[Long]("est_distinct")
      assert(streamed == batch,
        s"stream=$streamed batch=$batch — cross-batch merge diverged")
    } finally q.stop()
  }

  test("CMS grid: counters summed across micro-batches equal the batch grid") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val events = MemoryStream[Ev]
    val d = 2; val w = 16
    def cells(user: org.apache.spark.sql.Column) =
      explode(array((0 until d).map(i => struct(lit(i).as("i"),
        graft.ops.CountMin.bucket(user.cast("string"), i, d, w)
          .as("bucket"))): _*))
    val out = events.toDF()
      .withWatermark("ts_utc", "1 hour")
      .select(window(col("ts_utc"), "1 day").as("wnd"),
        cells(col("user_id")).as("cell"))
      .groupBy(col("wnd"), col("cell.i").as("i"), col("cell.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("i"), col("bucket"), col("cnt"))
    val q = out.writeStream.format("memory").queryName("cmsstream")
      .outputMode(OutputMode.Complete()).start()
    try {
      // the same user recurring across batches must ACCUMULATE (sum
      // semantics), not dedup — the property that separates the CMS
      // counters from the KMV set state
      events.addData((0 until 30).map(i => Ev(ts(1, i % 24), (i % 5).toLong, "e", 0.0)): _*)
      q.processAllAvailable()
      events.addData((0 until 20).map(i => Ev(ts(1, i % 24), (i % 4).toLong, "e", 0.0)): _*)
      q.processAllAvailable()
      val streamed = spark.sql("select i, bucket, cnt from cmsstream")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
        .toSeq.sorted
      val batchUsers = ((0 until 30).map(_ % 5) ++ (0 until 20).map(_ % 4))
        .map(_.toLong).toDF("user_id")
      val batch = graft.ops.CountMin.sketch(
        batchUsers.select(col("user_id").cast("string").as("term")),
        "term", d, w)
        .collect().map(r => (r.getAs[Int]("i"), r.getAs[Long]("bucket"),
          r.getAs[Long]("cnt"))).toSeq.sorted
      assert(streamed == batch,
        s"stream grid $streamed != batch grid $batch")
    } finally q.stop()
  }

  test("append mode with watermark finalizes only closed windows") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.tumblingStats(mem.toDF(), "1 day", "1 hour")
      .writeStream.format("memory").queryName("appended")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(Ev(ts(1, 5), 1, "click", 1.0))
      q.processAllAvailable()
      // watermark is still at day-1: nothing finalized yet
      assert(spark.sql("select * from appended").count() == 0)
      // advance event time far past day 1 + watermark -> day-1 window emits
      mem.addData(Ev(ts(5, 12), 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(Ev(ts(5, 13), 1, "click", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("select w_start, n from appended").collect()
        .map(r => (r.getTimestamp(0).toString, r.getLong(1))).toSet
      assert(rows == Set(("2024-01-01 00:00:00.0", 1L)))
    } finally q.stop()
  }

  test("sessionize: gap timeout closes sessions via event-time state") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    // 10-minute gap, 0-second watermark delay so sessions close as
    // soon as the max seen event time passes last + gap
    val q = EventStreams.sessionize(mem.toDF(), gapMs = 10L * 60 * 1000,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // user 1: two events 5 min apart (one session), then an event
      // 30 min later -> IN-BATCH gap closes the first session
      mem.addData(
        Ev(t(1, 0), 1, "click", 1.0), Ev(t(1, 5), 1, "click", 1.0),
        Ev(t(1, 35), 1, "click", 1.0),
        Ev(t(1, 0), 2, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far past everything -> timeouts fire for
      // the open sessions of user 1 (at 01:35) and user 2 (at 01:00)
      mem.addData(Ev(t(3, 0), 99, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(4, 0), 99, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("select user_id, start_ms, end_ms, n_events from sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      def ms(h: Int, m: Int) = t(h, m).getTime
      assert(rows.contains((1L, ms(1, 0), ms(1, 5), 2)), s"in-batch gap close missing: $rows")
      assert(rows.contains((1L, ms(1, 35), ms(1, 35), 1)), s"timeout close missing: $rows")
      assert(rows.contains((2L, ms(1, 0), ms(1, 0), 1)), s"user 2 session missing: $rows")
    } finally q.stop()
  }

  test("sessionize: a far-late event forms its OWN session, not a mega-merge") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionize(mem.toDF(), gapMs = 10L * 60 * 1000,
        watermark = "2 hours")
      .writeStream.format("memory").queryName("farlate_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      def ms(h: Int, m: Int) = t(h, m).getTime
      // batch 1: open session at 03:00 (watermark after: 01:00)
      mem.addData(Ev(t(3, 0), 1, "click", 1.0))
      q.processAllAvailable()
      // batch 2: in-watermark event at 02:00 — 50 min BEFORE the open
      // session's start - gap. The old signed-gap check (t - last <=
      // gap) would merge it, creating a session with an internal
      // 60-minute hole; it must close as its own 1-event session
      mem.addData(Ev(t(2, 0), 1, "click", 1.0))
      q.processAllAvailable()
      // advance watermark past 03:10 so the open session times out too
      mem.addData(Ev(t(6, 0), 99, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(7, 0), 99, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "select user_id, start_ms, end_ms, n_events from farlate_sessions where user_id = 1")
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      assert(rows == Set((ms(2, 0), ms(2, 0), 1), (ms(3, 0), ms(3, 0), 1)),
        s"expected two separate sessions, got $rows")
    } finally q.stop()
  }

  test("sessionize: late in-watermark event extends the session BACKWARD") {
    val sess = spark
    import sess.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = EventStreams.sessionize(mem.toDF(), gapMs = 10L * 60 * 1000,
        watermark = "1 hour")
      .writeStream.format("memory").queryName("late_sessions")
      .outputMode(OutputMode.Append()).start()
    try {
      def t(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // batch 1: session opens at 02:00 (watermark after: 01:00)
      mem.addData(Ev(t(2, 0), 1, "click", 1.0))
      q.processAllAvailable()
      // batch 2: a LATE but in-watermark event at 01:55 — within the
      // gap of last_ms, and EARLIER than the stored session start
      mem.addData(Ev(t(1, 55), 1, "click", 1.0))
      q.processAllAvailable()
      // advance the watermark far enough to time the session out
      mem.addData(Ev(t(6, 0), 99, "click", 1.0))
      q.processAllAvailable()
      mem.addData(Ev(t(8, 0), 99, "click", 1.0))
      q.processAllAvailable()
      val rows = spark.sql("select user_id, start_ms, end_ms, n_events from late_sessions")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
      def ms(h: Int, m: Int) = t(h, m).getTime
      assert(rows.contains((1L, ms(1, 55), ms(2, 0), 2)),
        s"session start not extended backward: $rows")
    } finally q.stop()
  }
}