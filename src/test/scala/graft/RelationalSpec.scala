package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Relational

class RelationalSpec extends SparkSpec {

  test("naReplace maps the sentinel to null on float/double columns only") {
    val d = df("s STRING, v DOUBLE", Seq(R("a", -9999.0), R("b", 1.5)))
    val out = Relational.naReplace(d).collect().map(r => (r.getString(0), r.isNullAt(1)))
    assert(out.toSet == Set(("a", true), ("b", false)))
  }

  test("dedupKeepFirst keeps the row with the smallest tie-break key") {
    val d = df("k STRING, ord INT, v STRING",
      Seq(R("x", 2, "late"), R("x", 1, "early"), R("y", 5, "only")))
    val out = Relational.dedupKeepFirst(d, Seq("k"), "ord")
      .collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(out == Set(("x", "early"), ("y", "only")))
  }

  test("incrementalMerge appends only missing keys; overwrite flips precedence") {
    val old = df("k INT, v STRING", Seq(R(1, "old1"), R(2, "old2")))
    val inc = df("k INT, v STRING", Seq(R(2, "new2"), R(3, "new3")))
    val keep = Relational.incrementalMerge(old, inc, Seq("k"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(keep == Set((1, "old1"), (2, "old2"), (3, "new3")))
    val over = Relational.incrementalMerge(old, inc, Seq("k"), overwrite = true)
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(over == Set((1, "old1"), (2, "new2"), (3, "new3")))
  }

  test("upsert dedups on the key") {
    val old = df("k INT, v STRING", Seq(R(1, "a"), R(2, "b")))
    val nw = df("k INT, v STRING", Seq(R(2, "b"), R(3, "c")))
    assert(Relational.upsert(old, nw, Seq("k")).count() == 3)
  }

  test("upsert: the incoming row deterministically wins a key collision") {
    // dropDuplicates(keys) kept an ARBITRARY row on collision — the
    // precedence column pins incoming-wins at any partitioning
    val old = df("k INT, v STRING", Seq(R(1, "old1"), R(2, "old2")))
    val nw = df("k INT, v STRING", Seq(R(2, "NEW2"), R(3, "new3")))
    Seq(1, 7).foreach { parts =>
      val out = Relational.upsert(
          old.repartition(parts), nw.repartition(parts), Seq("k"))
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(out == Map(1 -> "old1", 2 -> "NEW2", 3 -> "new3"), out.toString)
    }
  }

  test("wetPeriodFilter keeps whole qualifying hours") {
    val rows = Seq(
      R("s1", Timestamp.valueOf("2024-01-01 10:05:00"), 0.2),
      R("s1", Timestamp.valueOf("2024-01-01 10:25:00"), 0.3), // hour sum 0.5 >= 0.5
      R("s1", Timestamp.valueOf("2024-01-01 11:05:00"), 0.1)) // hour sum 0.1 < 0.5
    val d = df("sta STRING, ts TIMESTAMP, v DOUBLE", rows)
    val out = Relational.wetPeriodFilter(d, "sta", "ts", "v", 0.5)
    assert(out.count() == 2)
  }

  test("fullPeriodFilter keeps only groups with exactly n rows") {
    val rows = (0 until 6).map(i =>
      R("s1", Timestamp.valueOf(f"2024-01-01 10:${i * 10}%02d:00"), 1.0)) ++
      Seq(R("s1", Timestamp.valueOf("2024-01-01 11:10:00"), 1.0))
    val d = df("sta STRING, ts TIMESTAMP, v DOUBLE", rows)
    assert(Relational.fullPeriodFilter(d, "sta", "ts", 6).count() == 6)
  }

  test("threeWaySemi keeps keys present in all three tables") {
    val m = df("k INT, v STRING", Seq(R(1, "a"), R(2, "b"), R(3, "c")))
    val o1 = df("k INT", Seq(R(1), R(2)))
    val o2 = df("k INT", Seq(R(2), R(3)))
    val out = Relational.threeWaySemi(m, o1, o2, Seq("k")).collect().map(_.getInt(0))
    assert(out.toSeq == Seq(2))
  }

  test("scd2 collapses runs into versioned validity intervals") {
    val rows = Seq(
      R(1L, "bronze", Timestamp.valueOf("2024-01-01 00:00:00"), 1L),
      R(1L, "bronze", Timestamp.valueOf("2024-01-02 00:00:00"), 2L), // same run
      R(1L, "silver", Timestamp.valueOf("2024-01-03 00:00:00"), 3L),
      R(1L, "bronze", Timestamp.valueOf("2024-01-04 00:00:00"), 4L), // back again = NEW version
      R(2L, "gold", Timestamp.valueOf("2024-01-01 00:00:00"), 5L))
    val d = df("uid BIGINT, tier STRING, ts TIMESTAMP, eid BIGINT", rows)
    val out = Relational.scd2(d, "uid", "tier", "ts", "eid")
      .orderBy("uid", "version").collect()
    assert(out.length == 4)
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getAs[String]("tier")).toSeq == Seq("bronze", "silver", "bronze"),
      "a reverted attribute opens a new version, not a merge with the old run")
    assert(u1.map(_.getAs[Int]("version")).toSeq == Seq(1, 2, 3))
    // intervals chain: each valid_to equals the next version's valid_from
    assert(u1(0).getAs[Timestamp]("valid_to") == u1(1).getAs[Timestamp]("valid_from"))
    assert(u1(1).getAs[Timestamp]("valid_to") == u1(2).getAs[Timestamp]("valid_from"))
    assert(u1(2).getAs[Timestamp]("valid_to") == null && u1(2).getAs[Boolean]("is_current"))
    assert(u1.count(_.getAs[Boolean]("is_current")) == 1)
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getAs[Boolean]("is_current"))
  }

  test("dqProfile counts nulls, distincts, and whole-row duplicates") {
    val d = df("a BIGINT, b STRING", Seq(
      R(1L, "x"), R(1L, "x"), // exact duplicate row
      R(2L, null), R(3L, "y"), R(null, "y")))
    val out = Relational.dqProfile(d, Seq("a", "b"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("a") == ((5L, 1L, 3L)))   // one null a, distinct {1,2,3}
    assert(out("b") == ((5L, 1L, 2L)))   // one null b, distinct {x,y}
    assert(out("*") == ((5L, 1L, 4L)),   // 1 duplicate row, 4 distinct rows
      s"whole-row duplicate accounting wrong: ${out("*")}")
  }

  test("dqProfile approx path: exact nulls, HLL distincts within tolerance, no Expand") {
    import spark.implicits._
    val d = (1 to 5000).map(i => (i.toLong % 997, s"s${i % 313}"))
      .toDF("a", "b")
    val exact = Relational.dqProfile(d, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    val ap = Relational.dqProfile(d, Seq("a", "b"), approx = true).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    Seq("a", "b").foreach { c =>
      assert(ap(c)._1 == exact(c)._1, s"null counts must stay exact for $c")
      val (e, g) = (exact(c)._2.toDouble, ap(c)._2.toDouble)
      assert(math.abs(g - e) / e < 0.2, s"$c: approx $g vs exact $e")
    }
    // the scale point: the approx plan has no Expand (exact multi-distinct
    // costs rows × (cols+1))
    val apPlan = Relational.dqProfile(d, Seq("a", "b"), approx = true)
      .queryExecution.executedPlan.toString
    assert(!apPlan.contains("Expand"), apPlan.linesIterator.take(10).mkString("\n"))
  }

  test("dqOrphans reports fact keys missing from the dimension, largest first") {
    val fact = df("fk BIGINT", Seq(R(1L), R(1L), R(1L), R(2L), R(9L), R(9L)))
    val dim = df("k BIGINT", Seq(R(1L), R(3L)))
    val out = Relational.dqOrphans(fact, "fk", dim, "k", k = 5)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1, 9L, 2L), (2, 2L, 1L)),
      "only keys absent from dim orphan; ordered by row count desc")
  }

  test("cdcApply: latest op wins, deletes remove, later re-insert revives") {
    val d = df("k BIGINT, ts TIMESTAMP, ord BIGINT, op STRING, v DOUBLE", Seq(
      R(1L, Timestamp.valueOf("2024-01-01 00:00:00"), 1L, "I", 1.0),
      R(1L, Timestamp.valueOf("2024-01-02 00:00:00"), 2L, "U", 2.0),
      R(2L, Timestamp.valueOf("2024-01-01 00:00:00"), 3L, "I", 3.0),
      R(2L, Timestamp.valueOf("2024-01-03 00:00:00"), 4L, "D", null),
      R(3L, Timestamp.valueOf("2024-01-01 00:00:00"), 5L, "D", null),
      R(3L, Timestamp.valueOf("2024-01-02 00:00:00"), 6L, "I", 9.0),
      // key 4: delete and update share a timestamp — ord decides (D later)
      R(4L, Timestamp.valueOf("2024-01-01 00:00:00"), 7L, "U", 4.0),
      R(4L, Timestamp.valueOf("2024-01-01 00:00:00"), 8L, "D", null)))
    val out = Relational.cdcApply(d, "k", "ts", "ord", "op")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("v")).toMap
    assert(out == Map(1L -> 2.0, 3L -> 9.0),
      s"latest-op snapshot wrong: $out (2 deleted, 4 deleted by ord tie-break)")
  }

  test("scd2 breaks equal-timestamp ties by the order column") {
    val ts = Timestamp.valueOf("2024-01-01 00:00:00")
    val d = df("uid BIGINT, tier STRING, ts TIMESTAMP, eid BIGINT",
      Seq(R(1L, "b", ts, 2L), R(1L, "a", ts, 1L)))
    val out = Relational.scd2(d, "uid", "tier", "ts", "eid")
      .orderBy("version").collect()
    assert(out.map(_.getAs[String]("tier")).toSeq == Seq("a", "b"),
      "event_id must order equal timestamps deterministically")
  }

  test("cdcScd2: deletes close versions, re-inserts open new ones") {
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    val d = df("uid BIGINT, tier STRING, ts TIMESTAMP, eid BIGINT, op STRING",
      Seq(
        // key 1: I gold, U gold (no-op run), U silver, D, I silver again
        R(1L, "gold", t(1), 1L, "I"), R(1L, "gold", t(2), 2L, "U"),
        R(1L, "silver", t(3), 3L, "U"), R(1L, null, t(4), 4L, "D"),
        R(1L, "silver", t(5), 5L, "I"),
        // key 2: inserted then deleted — history only, nothing current
        R(2L, "gold", t(1), 6L, "I"), R(2L, null, t(2), 7L, "D"),
        // key 3: consecutive deletes collapse
        R(3L, "gold", t(1), 8L, "I"), R(3L, null, t(2), 9L, "D"),
        R(3L, null, t(3), 10L, "D"),
        // key 4: a null-VALUED update is real history, not a tombstone
        R(4L, "gold", t(1), 11L, "I"), R(4L, null, t(2), 12L, "U"),
        R(4L, "gold", t(3), 13L, "U")))
    val out = Relational.cdcScd2(d, "uid", "tier", "ts", "eid", "op")
      .orderBy("uid", "version").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        Option(r.getAs[Timestamp]("valid_to")), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      // key 1: gold [t1,t3), silver [t3,t4) closed by D, silver [t5,∞)
      (1L, 1, "gold", Some(t(3)), false),
      (1L, 2, "silver", Some(t(4)), false),
      (1L, 3, "silver", None, true),
      // key 2: one closed version, no current row
      (2L, 1, "gold", Some(t(2)), false),
      // key 3: the second D is not a boundary — one closed version
      (3L, 1, "gold", Some(t(2)), false),
      // key 4: the null-valued update opens its own (alive) version
      (4L, 1, "gold", Some(t(2)), false),
      (4L, 2, null, Some(t(3)), false),
      (4L, 3, "gold", None, true)), out.mkString(", "))
  }

  test("cdcScd2Bitemporal: correction replay — late fix visible at new txTs, invisible at old") {
    def t(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // key 1: insert (valid d1, recorded d2), update (valid d5, recorded d6),
    // then a LATE CORRECTION to the original valid time (valid d1, ord
    // after the insert, recorded d10) that rewrites the first interval
    val d = df(
      "uid BIGINT, tier STRING, vts TIMESTAMP, tts TIMESTAMP, eid BIGINT, op STRING",
      Seq(
        R(1L, "gold", t(1), t(2), 1L, "I"),
        R(1L, "silver", t(5), t(6), 2L, "U"),
        R(1L, "platinum", t(1), t(10), 3L, "U")))
    val hist = Relational.cdcScd2Bitemporal(d, "uid", "tier", "vts", "tts",
      "eid", "op").localCheckpoint()
    // three eras for key 1
    assert(hist.select("tx_from").distinct().count() == 3)
    def asOf(validD: Int, txD: Int): Set[String] =
      Relational.snapshotAsOf(hist, lit(t(validD)), lit(t(txD)))
        .collect().map(_.getString(4)).toSet
    assert(asOf(3, 1) == Set(), "nothing recorded yet at tx d1")
    assert(asOf(3, 2) == Set("gold"), "first era serves the insert")
    assert(asOf(3, 7) == Set("gold"), "pre-correction belief unchanged")
    assert(asOf(6, 7) == Set("silver"))
    assert(asOf(3, 11) == Set("platinum"),
      "the correction rewrites valid history from its record time on")
    assert(asOf(6, 11) == Set("silver"),
      "intervals after the correction's supersession point keep their state")
    // the latest era (tx_to null) equals cdcScd2 of the full log
    val latest = hist.filter(col("is_latest"))
      .select("uid", "version", "tier", "valid_from", "valid_to",
        "is_current")
      .collect().map(_.toString).sorted.toSeq
    val full = Relational.cdcScd2(d, "uid", "tier", "vts", "eid", "op")
      .collect().map(_.toString).sorted.toSeq
    assert(latest == full, s"latest era diverged:\n$latest\nvs\n$full")
  }

  test("cdcScd2Bitemporal: a high-churn key (per-op record times) fails LOUD, not quadratic") {
    import spark.implicits._
    // one key recording every op at its own second: N ops -> N eras ->
    // |ops|*|eras| fan-out. The guard must reject it at the era window
    // (executing side), and raising the cap must accept the same feed.
    val n = 40
    val churn = (1 to n).map { i =>
      (7L, s"v$i", Timestamp.valueOf("2024-01-01 10:00:00"),
        new Timestamp(Timestamp.valueOf("2024-02-01 00:00:00").getTime
          + i * 1000L), i.toLong, "U")
    }.toDF("uid", "tier", "vts", "tts", "eid", "op")
    val e = intercept[Exception] {
      Relational.cdcScd2Bitemporal(churn, "uid", "tier", "vts", "tts",
        "eid", "op", maxErasPerKey = n - 1).collect()
    }
    def rootMsg(t: Throwable): String = {
      var c: Throwable = t
      while (c.getCause != null) c = c.getCause
      Option(c.getMessage).getOrElse("")
    }
    assert(rootMsg(e).contains("maxErasPerKey"),
      s"wrong failure: ${rootMsg(e)}")
    // at the cap exactly, the same feed computes (and the era count is n)
    val ok = Relational.cdcScd2Bitemporal(churn, "uid", "tier", "vts",
      "tts", "eid", "op", maxErasPerKey = n)
    assert(ok.select("tx_from").distinct().count() == n)
  }

  test("snapshotAt returns the version covering the probe and drops deleted keys") {
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:0$m:00")
    val d = df("uid BIGINT, eid BIGINT, ts TIMESTAMP, tier STRING, op STRING",
      Seq(
        R(1L, 1L, t(1), "gold", "I"), R(1L, 2L, t(3), "silver", "U"),
        R(2L, 3L, t(1), "gold", "I"), R(2L, 4L, t(2), "gold", "D")))
    val hist = Relational.cdcScd2(d, "uid", "tier", "ts", "eid", "op")
    def snap(m: Int) = Relational.snapshotAt(hist, lit(t(m)))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(snap(1) == Set((1L, "gold"), (2L, "gold"))) // boundary inclusive
    assert(snap(2) == Set((1L, "gold")))               // key 2 deleted at t2
    assert(snap(4) == Set((1L, "silver")))             // key 1's newer version
  }

  test("maintainAgg: cnt/sum exact under retraction, min/max staleness + rescan") {
    val base = df("k STRING, v DOUBLE", Seq(
      R("a", 1.0), R("a", 5.0), R("a", 3.0),
      R("b", 2.0), R("b", 7.0),
      R("c", 9.0)))
    val state0 = Relational.buildAggState(base, Seq("k"), "v")
    // a: retract the min (5,3 remain) -> stale; b: insert 1.0 (tightens
    // min, no staleness); c: retract its only row -> group disappears;
    // d: brand new from inserts only
    val delta = df("k STRING, v DOUBLE, op INT", Seq(
      R("a", 1.0, -1),
      R("b", 1.0, 1),
      R("c", 9.0, -1),
      R("d", 4.0, 1), R("d", 2.0, 1)))
    val s1 = Relational.maintainAgg(state0, delta, Seq("k"), "v", "op")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue(), Option(r.get(3)),
         Option(r.get(4)), r.getBoolean(5))).toMap
    assert(s1.keySet == Set("a", "b", "d")) // c dropped at cnt 0
    assert(s1("a") == ((2L, 8.0, None, None, true)))        // stale: extremes null
    assert(s1("b") == ((3L, 10.0, Some(1.0), Some(7.0), false)))
    assert(s1("d") == ((2L, 6.0, Some(2.0), Some(4.0), false)))

    val current = df("k STRING, v DOUBLE", Seq(
      R("a", 5.0), R("a", 3.0),
      R("b", 2.0), R("b", 7.0), R("b", 1.0),
      R("d", 4.0), R("d", 2.0)))
    val s1df = Relational.maintainAgg(state0, delta, Seq("k"), "v", "op")
    val fixed = Relational.rescanExtremes(s1df, current, Seq("k"), "v")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(3)), Option(r.get(4)), r.getBoolean(5))).toMap
    assert(fixed("a") == ((Some(3.0), Some(5.0), false))) // repaired
    assert(fixed("b") == ((Some(1.0), Some(7.0), false))) // untouched path
  }

  test("maintainAgg: retraction equal to a duplicated extreme is conservative, not wrong") {
    val base = df("k STRING, v DOUBLE", Seq(R("a", 2.0), R("a", 2.0), R("a", 6.0)))
    val delta = df("k STRING, v DOUBLE, op INT", Seq(R("a", 2.0, -1)))
    val s1 = Relational.maintainAgg(
      Relational.buildAggState(base, Seq("k"), "v"), delta, Seq("k"), "v", "op")
    val row = s1.collect().head
    assert(row.getBoolean(5)) // flagged even though a 2.0 survives
    val fixed = Relational.rescanExtremes(s1,
      df("k STRING, v DOUBLE", Seq(R("a", 2.0), R("a", 6.0))), Seq("k"), "v")
      .collect().head
    assert(fixed.getDouble(3) == 2.0 && fixed.getDouble(4) == 6.0)
  }

  test("diffToChangelog classifies I/U/D and round-trips through applyChangelog") {
    val v1 = df("k BIGINT, a STRING, b DOUBLE", Seq(
      R(1L, "keep", 1.0),           // unchanged
      R(2L, "old", 2.0),            // updated
      R(3L, "gone", 3.0),           // deleted
      R(5L, null, 5.0)))            // null attr, unchanged
    val v2 = df("k BIGINT, a STRING, b DOUBLE", Seq(
      R(1L, "keep", 1.0),
      R(2L, "new", 2.0),
      R(4L, "fresh", 4.0),          // inserted
      R(5L, null, 5.0)))
    val log = Relational.diffToChangelog(v1, v2, "k", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)), Option(r.get(3)))).toSet
    assert(log == Set(
      (2L, "U", Some("new"), Some(2.0)),
      (3L, "D", None, None),          // tombstone carries no payload
      (4L, "I", Some("fresh"), Some(4.0))))

    val rebuilt = Relational.applyChangelog(v1,
        Relational.diffToChangelog(v1, v2, "k", Seq("a", "b")), "k", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    val expect = v2.collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getDouble(2))).toSet
    assert(rebuilt == expect)
  }

  test("property: applyChangelog(v1, diffToChangelog(v1, v2)) == v2 on random snapshots") {
    val rnd = new scala.util.Random(11)
    (1 to 4).foreach { _ =>
      def snap() = (0 to 9).filter(_ => rnd.nextBoolean())
        .map(k => (k.toLong, rnd.nextInt(3).toString, rnd.nextInt(3).toDouble))
      val s1 = snap(); val s2 = snap()
      val v1 = df("k BIGINT, a STRING, b DOUBLE", s1.map { case (k, a, b) => R(k, a, b) })
      val v2 = df("k BIGINT, a STRING, b DOUBLE", s2.map { case (k, a, b) => R(k, a, b) })
      val rebuilt = Relational.applyChangelog(v1,
          Relational.diffToChangelog(v1, v2, "k", Seq("a", "b")), "k", Seq("a", "b"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rebuilt == s2.toSet, s"v1=$s1 v2=$s2")
      // and the changelog is minimal: no row for unchanged keys
      val log = Relational.diffToChangelog(v1, v2, "k", Seq("a", "b"))
        .collect().map(_.getLong(0)).toSet
      val unchanged = s1.toSet.intersect(s2.toSet).map(_._1)
      assert(log.intersect(unchanged).isEmpty)
    }
  }

  test("property: maintainAgg + rescan equals direct recomputation on random op streams") {
    val rnd = new scala.util.Random(7)
    (1 to 4).foreach { _ =>
      val keys = Seq("x", "y", "z")
      val baseRows = Seq.fill(12)((keys(rnd.nextInt(3)), rnd.nextInt(10).toDouble))
      // retract a random sample of base rows, insert fresh ones
      val retracts = rnd.shuffle(baseRows).take(rnd.nextInt(baseRows.size))
      val inserts = Seq.fill(6)((keys(rnd.nextInt(3)), rnd.nextInt(10).toDouble))
      val currentRows = baseRows.diff(retracts) ++ inserts
      val base = df("k STRING, v DOUBLE", baseRows.map { case (k, v) => R(k, v) })
      val delta = df("k STRING, v DOUBLE, op INT",
        inserts.map { case (k, v) => R(k, v, 1) } ++
          retracts.map { case (k, v) => R(k, v, -1) })
      val current = df("k STRING, v DOUBLE", currentRows.map { case (k, v) => R(k, v) })
      val got = Relational.rescanExtremes(
          Relational.maintainAgg(Relational.buildAggState(base, Seq("k"), "v"),
            delta, Seq("k"), "v", "op"), current, Seq("k"), "v")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDecimal(2).doubleValue(),
           Option(r.get(3)), Option(r.get(4)))).toMap
      val expect = currentRows.groupBy(_._1).map { case (k, rows) =>
        val vs = rows.map(_._2)
        k -> ((rows.size.toLong, vs.sum, Some(vs.min), Some(vs.max)))
      }
      assert(got == expect, s"base=$baseRows retracts=$retracts inserts=$inserts")
    }
  }
}
