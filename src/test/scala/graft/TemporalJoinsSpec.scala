package graft

import org.apache.spark.sql.functions._

import graft.ops.{Contamination, TemporalJoins}

/** As-of join, interval join, and decontamination on constructed
  * fixtures with hand-computed expected outputs (the DuckDB oracles
  * for j9/j10/llm_decontaminate cover the sf tables; these pin the
  * operator semantics on adversarial edges: ties, unmatched keys,
  * interval overlap, bucket boundaries).
  */
class TemporalJoinsSpec extends SparkSpec {

  test("asofBackward: latest at-or-before match, ties match, left semantics") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l1"), // before any right row for key 1 -> null match
      (1L, 20L, "l2"), // tie with right at t=20 -> matches it
      (1L, 35L, "l3"), // between 30 and 40 -> matches t=30
      (2L, 50L, "l4")  // key 2 has no right rows at all -> null match
    ).toDF("k", "t", "lv")
    val right = Seq(
      (1L, 20L, 200.0),
      (1L, 30L, 300.0),
      (1L, 40L, 400.0)
    ).toDF("k", "t", "rv")
    val got = TemporalJoins.asofBackward(left, right, "k", "t", Seq("rv"))
      .collect()
      .map(r => r.getAs[String]("lv") ->
        ((Option(r.getAs[Any]("matched_t")), Option(r.getAs[Any]("matched_rv")))))
      .toMap
    assert(got("l1") == ((None, None)))
    assert(got("l2") == ((Some(20L), Some(200.0))))
    assert(got("l3") == ((Some(30L), Some(300.0))))
    assert(got("l4") == ((None, None)))
    assert(got.size == 4)
  }

  test("asofBackward: a null payload in the matched row stays null (no backfill)") {
    import spark.implicits._
    // right at t=20 has rv=null; the left row at t=25 must match the
    // t=20 ROW (matched_t=20, matched_rv=null) — NOT resurrect 5.0
    // from the older t=10 row (per-column last(ignoreNulls) would)
    val left = Seq((1L, 25L, "l")).toDF("k", "t", "lv")
    val right = Seq((1L, 10L, Some(5.0)), (1L, 20L, None))
      .toDF("k", "t", "rv")
    val r = TemporalJoins.asofBackward(left, right, "k", "t", Seq("rv"))
      .collect().head
    assert(r.getAs[Long]("matched_t") == 20L)
    assert(r.isNullAt(r.fieldIndex("matched_rv")))
  }

  test("asofBackward: right rows with a null time never match") {
    import spark.implicits._
    val left = Seq((1L, 5L, "l")).toDF("k", "t", "lv")
    val right = Seq((1L, Option.empty[Long], 9.0)).toDF("k", "t", "rv")
    val r = TemporalJoins.asofBackward(left, right, "k", "t", Seq("rv"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("matched_t")))
    assert(r.isNullAt(r.fieldIndex("matched_rv")))
  }

  test("asofBackward matches a brute-force formulation on seeded random data") {
    import spark.implicits._
    // deterministic pseudo-random fixture: 60 left rows, 40 right rows
    // over 6 keys and a coarse time axis (ties across sides guaranteed)
    def mix(i: Long, salt: Long) = (i * 2654435761L + salt) % 97
    val left = (0L until 60L).map(i => (i % 6, mix(i, 13), i)).toDF("k", "t", "lid")
    val right = (0L until 40L).map(i => (i % 6, mix(i, 57), i + 1000.0))
      .toDF("k", "t", "rv")
      .groupBy("k", "t").agg(max("rv").as("rv")) // unique (k, t) precondition
    val got = TemporalJoins.asofBackward(left, right, "k", "t", Seq("rv"))
      .select("lid", "matched_t", "matched_rv")
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("matched_t")),
        Option(r.getAs[Any]("matched_rv")))).toSet
    // brute force: max right t <= left t per left row, then re-join
    val brute = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("lid")).agg(max(col("r.t")).as("mt"))
      .join(left.select(col("k"), col("lid")), "lid")
      .join(right.select(col("k"), col("t").as("mt"), col("rv")), Seq("k", "mt"), "left")
      .select("lid", "mt", "rv")
      .collect()
      .map(r => (r.getLong(0), Option(r.getAs[Any]("mt")),
        Option(r.getAs[Any]("rv")))).toSet
    assert(got == brute,
      s"asof vs brute diff: ${(got diff brute) ++ (brute diff got)}")
  }

  test("intervalJoin matches a brute-force range join incl. overlap and edges") {
    import spark.implicits._
    // facts at every unit 0..99; intervals of length 25 striding 10
    // (heavy overlap), bucketWidth 30 >= max length; [start, end)
    // boundary semantics probed by facts landing exactly on starts/ends
    val facts = spark.range(100).select(col("id").as("ts"))
    val ivs = spark.range(9).select(col("id").as("iid"),
      (col("id") * 10).as("s"), (col("id") * 10 + 25).as("e"))
    val got = TemporalJoins.intervalJoin(facts, ivs, "ts", "s", "e", 30L)
      .select("iid", "ts").as[(Long, Long)].collect().toSet
    val brute = facts.join(ivs, col("ts") >= col("s") && col("ts") < col("e"))
      .select("iid", "ts").as[(Long, Long)].collect().toSet
    assert(got == brute, s"diff: ${(got diff brute) ++ (brute diff got)}")
    assert(brute.count(_._2 == 20) == 3) // ts=20 is inside 3 intervals
    assert(!brute.exists { case (i, t) => t == i * 10 + 25 }) // end exclusive
  }

  test("intervalJoin: result is identical for ANY bucket width (width is perf-only)") {
    import spark.implicits._
    val facts = spark.range(100).select(col("id").as("ts"))
    val ivs = spark.range(9).select(col("id").as("iid"),
      (col("id") * 10).as("s"), (col("id") * 10 + 25).as("e"))
    def run(w: Long) = TemporalJoins.intervalJoin(facts, ivs, "ts", "s", "e", w)
      .select("iid", "ts").as[(Long, Long)].collect().toSet
    val wide = run(30L) // >= interval length (the perf guideline)
    assert(run(7L) == wide, "width below interval length must not change results")
    assert(run(1L) == wide, "unit width must not change results")
    assert(run(1000L) == wide, "one giant bucket must not change results")
  }

  test("asofBackward rejects a prefix that collides with left columns") {
    import spark.implicits._
    val left = Seq((1L, 5L, 1.0)).toDF("k", "t", "matched_rv")
    val right = Seq((1L, 3L, 2.0)).toDF("k", "t", "rv")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(left, right, "k", "t", Seq("rv"))
    }
    assert(e.getMessage.contains("collide"))
  }

  test("asofBackward and intervalJoin reject reserved internal column names") {
    import spark.implicits._
    val left = Seq((1L, 5L, 1.0)).toDF("k", "t", "__side")
    val right = Seq((1L, 3L, 2.0)).toDF("k", "t", "rv")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.asofBackward(left, right, "k", "t", Seq("rv"))
    }
    assert(e.getMessage.contains("reserved"))
    val facts = Seq((1L, 2L)).toDF("ts", "__ibucket")
    val ivs = Seq((0L, 10L)).toDF("s", "e")
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.intervalJoin(facts, ivs, "ts", "s", "e", 10L)
    }
    assert(e2.getMessage.contains("reserved"))
  }

  test("intervalJoin handles column names that would need backtick quoting") {
    import spark.implicits._
    // the round-5 expr-string bucket arithmetic would fail to parse
    // these; Column-built arithmetic must not care
    val facts = spark.range(100).select(col("id").as("event ts"))
    val ivs = spark.range(5).select(col("id").as("iv.id"),
      (col("id") * 10).as("start ns"), (col("id") * 10 + 7).as("end ns"))
    val got = TemporalJoins.intervalJoin(facts, ivs, "event ts", "start ns", "end ns", 10L)
      .select(col("`iv.id`"), col("`event ts`")).as[(Long, Long)].collect().toSet
    val want = (for (i <- 0L until 5L; t <- i * 10 until i * 10 + 7) yield (i, t)).toSet
    assert(got == want)
  }

  test("intervalJoin rejects shared fact/interval column names (ambiguous output)") {
    import spark.implicits._
    val facts = Seq((1L, 7L)).toDF("ts", "tag")
    val ivs = Seq((0L, 10L, 9L)).toDF("s", "e", "tag")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.intervalJoin(facts, ivs, "ts", "s", "e", 10L)
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("asofBackward: null join keys never match, on either side") {
    import spark.implicits._
    val left = Seq((Option.empty[Long], 5L, "lnull"), (Some(1L), 5L, "l1"))
      .toDF("k", "t", "lv")
    val right = Seq((Option.empty[Long], 3L, 7.0), (Some(1L), 3L, 9.0))
      .toDF("k", "t", "rv")
    val got = TemporalJoins.asofBackward(left, right, "k", "t", Seq("rv"))
      .collect()
      .map(r => r.getAs[String]("lv") -> Option(r.getAs[Any]("matched_rv"))).toMap
    assert(got == Map("lnull" -> None, "l1" -> Some(9.0)), s"got $got")
  }

  test("intervalJoin: an inverted interval is dropped, not fanned out") {
    import spark.implicits._
    val facts = spark.range(10).select(col("id").as("ts"))
    // end << start: a naive sequence() would count DOWN across ~1e17
    // buckets; the guard must drop the row without touching it
    val ivs = Seq((0L, 1000000000000000000L, 0L), (1L, 2L, 8L))
      .toDF("iid", "s", "e")
    val got = TemporalJoins.intervalJoin(facts, ivs, "ts", "s", "e", 10L)
      .select("iid", "ts").as[(Long, Long)].collect().toSet
    assert(got == (2L until 8L).map((1L, _)).toSet, s"got $got")
  }

  test("packSequences: shard stays in [0, nShards) for negative and huge ids") {
    import spark.implicits._
    val docs = Seq(-5L, -4000000000L, 4000000000L, Long.MaxValue, 0L)
      .toDF("doc_id").withColumn("n_tokens", lit(10L))
    val shards = graft.ops.Packing.packSequences(docs, "doc_id", "n_tokens",
        nShards = 4, seqLen = 16L)
      .select("shard").as[Long].collect()
    assert(shards.length == 5 && shards.forall(s => s >= 0 && s < 4), shards.toSeq)
  }

  test("packSequences: seeded reshuffle permutes order but preserves the layout laws") {
    import spark.implicits._
    val docs = (0L until 60L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_tokens")
    def layout(seed: Long) =
      graft.ops.Packing.packSequences(docs, "doc_id", "n_tokens",
        nShards = 4, seqLen = 16L, seed = seed)
        .select("doc_id", "shard", "seq_id", "offset", "cum_before")
        .as[(Long, Long, Long, Long, Long)].collect()
    val s0 = layout(0L)
    val s1 = layout(1L)
    // same docs and shard assignment (shard is seed-independent),
    // different packing order within shards
    assert(s0.map(r => (r._1, r._2)).toSet == s1.map(r => (r._1, r._2)).toSet)
    assert(s0.map(_._1).toSet == (0L until 60L).toSet)
    assert(s0.toSet != s1.toSet, "seed must re-roll the packing order")
    // layout laws hold for any seed: offset < seqLen, offset/seq_id
    // derive from cum_before, and rerunning a seed is reproducible
    for (s <- Seq(s0, s1); r <- s) {
      assert(r._4 < 16L && r._4 == r._5 % 16L && r._3 == r._5 / 16L)
    }
    assert(layout(1L).toSet == s1.toSet)
  }

  test("contaminated finds exactly the docs sharing an n-gram with the bench set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"), // contains bench 4-gram
      (2L, "one two three four five"),             // no overlap
      (3L, "x y alpha beta gamma delta")           // same bench 4-gram, shifted
    ).toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta UNRELATED tail here")
    ).toDF("doc_id", "text")
    val got = Contamination.contaminated(corpus, bench, "doc_id", "text", n = 4)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 1, 3L -> 1), s"got $got")
  }
}
