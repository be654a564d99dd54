package graft

import org.apache.spark.sql.functions._
import graft.operators.Events
import graft.functions.TextFunctions.naturalSortKey

/** Event-time operators (A6/A7/W4, §2.10 batch forms) + the natural
  * version-sort key (SURVEY §7 hard part 2). */
class EventsSpec extends SparkSuite {

  test("q20 latest-per-user: exactly one row per user") {
    val l = Events.latestPerUser(spark, Sf0001)
    val users = Tables.events(spark, Sf0001).select("user_id").distinct().count()
    assert(l.count() === users)
    assert(l.select("user_id").distinct().count() === users)
  }

  test("q21 tumbling-hour counts partition all events") {
    val t = Events.tumblingHour(spark, Sf0001)
    val total = Tables.events(spark, Sf0001).count()
    assert(t.agg(sum("n")).head().getLong(0) === total)
  }

  test("q57 sliding window: every event lands in exactly two windows") {
    val s = Events.slidingWindow(spark, Sf0001)
    val total = Tables.events(spark, Sf0001).count()
    assert(s.agg(sum("n")).head().getLong(0) === 2 * total)
    // every window start sits on a 30-minute slide boundary
    assert(s.filter(col("window_start").isNull ||
      expr("unix_micros(window_start) % 1800000000") =!= 0).count() === 0)
  }

  test("q22 sessionize: session counts bounded by event counts") {
    val s = Events.sessionize(spark, Sf0001)
    assert(s.filter(col("n_sessions") < 1).count() === 0)
    assert(s.filter(col("n_sessions") > col("n_events")).count() === 0)
  }

  test("q23 dedup keeps at most one event per (user, type)") {
    val d = Events.dedupEvents(spark, Sf0001)
    val pairs = Tables.events(spark, Sf0001)
      .select("user_id", "event_type").distinct().count()
    assert(d.agg(sum("n_first_events")).head().getLong(0) === pairs)
  }

  test("q54 as-of join: one row per purchase, matched click precedes it") {
    val a = Events.asofJoin(spark, Sf0001).cache()
    val purchases = Tables.events(spark, Sf0001)
      .filter(col("event_type") === "purchase").count()
    assert(a.count() === purchases)
    assert(a.select("purchase_id").distinct().count() === purchases)
    // matched clicks never come from the future
    assert(a.filter(col("gap_us") < 0).count() === 0)
    // purchases before any click have no match (null click_id, null gap)
    assert(a.filter(col("click_id").isNull && col("gap_us").isNotNull).count() === 0)
    a.unpersist()
  }

  test("q55 band join: every pair in band, matches brute-force theta join") {
    val b = Events.bandJoin(spark, Sf0001).cache()
    val bandUs = 3600L * 1000 * 1000
    assert(b.filter(abs(col("delta_us")) > bandUs).count() === 0)
    // bucket-explode candidates must equal the exact theta-join result
    val ev = Tables.events(spark, Sf0001)
      .withColumn("ts_us", expr("ts_ns div 1000"))
    val brute = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("error_id"), col("ts_us").as("e_us"))
      .join(ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("ts_us").as("c_us")),
        Seq("user_id"))
      .filter(abs(col("e_us") - col("c_us")) <= bandUs)
      .select("user_id", "error_id", "click_id")
    assert(b.select("user_id", "error_id", "click_id").exceptAll(brute).count() === 0)
    assert(brute.exceptAll(b.select("user_id", "error_id", "click_id")).count() === 0)
    b.unpersist()
  }

  test("naturalSortKey: space-containing names stay distinct from collapsed forms") {
    import spark.implicits._
    val keys = Seq("en 2", "en2", "en 2.json").toDF("n")
      .select(graft.functions.TextFunctions.naturalSortKey(col("n")).as("k"))
      .as[String].collect()
    assert(keys.distinct.length === 3, keys.mkString("|"))
  }

  test("naturalSortKey orders like sort -V (digit runs numerically)") {
    import spark.implicits._
    // openfootball-style names: en.2 < en.10, 1-bundesliga versions, etc.
    val names = Seq("en.10", "en.2", "en.1", "at.10a", "at.2a",
      "file9", "file10", "file1", "v1.2.3", "v1.10.0", "v1.2.10")
    val expected = Seq("at.2a", "at.10a", "en.1", "en.2", "en.10",
      "file1", "file9", "file10", "v1.2.3", "v1.2.10", "v1.10.0")
    val sorted = names.toDF("name")
      .orderBy(naturalSortKey(col("name")))
      .collect().map(_.getString(0)).toSeq
    assert(sorted === expected)
  }

  test("q83 sequences are deterministic and consistent with per-user counts") {
    val rows = Events.userSequences(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val seq = r.getAs[String]("seq")
      assert(seq.split(">").length.toLong === r.getAs[Long]("n_events"), r)
    }
    // collect_list alone would be arrival-ordered; the struct sort must
    // make the result identical under a different partitioning
    val shuffled = Tables.events(spark, Sf0001).filter(col("user_id") < 10)
      .repartition(7, col("event_type"))
    val again = shuffled
      .groupBy(col("user_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("ts_ns"), col("event_id"), col("event_type")))),
          x => x.getField("event_type")), ">").as("seq"))
      .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[String]("seq")).toMap
    rows.foreach(r =>
      assert(again(r.getAs[Long]("user_id")) === r.getAs[String]("seq")))
  }

  test("q98 scd2: versions contiguous, intervals chain, exactly one current per user") {
    val d = Events.scd2Build(spark, Sf0001).collect()
    assert(d.nonEmpty)
    d.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("version"))
      // versions are 1..n with no gaps
      assert(sorted.map(_.getAs[Long]("version")).toSeq === (1L to sorted.length.toLong), s"user $u")
      // half-open intervals chain exactly: each valid_to is the next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") === b.getAs[Long]("valid_from_us"), s"user $u")
        case _ =>
      }
      // exactly one open (current) version, and it is the last one
      assert(rows.count(_.getAs[Long]("is_current") == 1L) === 1, s"user $u")
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("valid_to_us")), s"user $u")
      // consecutive versions always change the tracked value
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("value") != b.getAs[Double]("value"), s"user $u")
        case _ =>
      }
    }
  }

  test("q98 scd2 null-safe transitions: A -> NULL -> A yields three versions") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 10L, Some(1.0)), (1L, 2L, 20L, None), (1L, 3L, 30L, Some(1.0)),
      (1L, 4L, 40L, Some(1.0)), // no change: still version 3
      (2L, 5L, 10L, None: Option[Double])) // user whose FIRST value is null
      .toDF("user_id", "event_id", "ts_us", "value")
    val out = Events.scd2Of(ev).collect()
    val u1 = out.filter(_.getLong(0) == 1L).sortBy(_.getAs[Long]("version"))
    assert(u1.length === 3)
    assert(u1.map(r => if (r.isNullAt(r.fieldIndex("value"))) None
      else Some(r.getAs[Double]("value"))).toSeq === Seq(Some(1.0), None, Some(1.0)))
    assert(u1.map(_.getAs[Long]("valid_from_us")).toSeq === Seq(10L, 20L, 30L))
    // a user opening with NULL still gets version 1
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length === 1 && u2.head.isNullAt(u2.head.fieldIndex("value")))
  }

  test("q144 PIT lookup: matches a brute-force latest-change-at-or-before replay") {
    import spark.implicits._
    val evs = Tables.events(spark, Sf0001)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts_ns div 1000").as("ts_us"), $"value")
      .as[(Long, Long, String, Long, Double)].collect()
    def dec2(d: Double): Double =
      BigDecimal.valueOf(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._2))
      // change rows: first, or value differs from the previous event
      val changes = ordered.zipWithIndex.filter { case (r, i) =>
        i == 0 || ordered(i - 1)._5 != r._5
      }.map(_._1).zipWithIndex.map { case (r, v) => (v + 1L, r._4, r._5) }
      ordered.filter(_._3 == "purchase").map { p =>
        // the version whose half-open interval covers the purchase:
        // the LAST change at-or-before its timestamp
        val (v, _, sv) = changes.takeWhile(_._2 <= p._4).last
        (u, p._2, p._4, dec2(p._5), v, dec2(sv))
      }
    }.sortBy(t => (t._1, t._3, t._2))
    val got = Events.pitLookup(spark, Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // every purchase resolved exactly once
    assert(got.length === evs.count(_._3 == "purchase"))
  }

  test("q144 PIT lookup: a NULL-valued version is carried, not skipped") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "click", 10L, Some(5.0)),
      (1L, 2L, "click", 20L, None: Option[Double]), // opens the NULL version
      // no value change (NULL <=> NULL): reads INSIDE the null window
      (1L, 3L, "purchase", 25L, None: Option[Double]),
      (1L, 4L, "click", 30L, Some(7.0)),
      // same value, same µs: sees the version opened AT its timestamp
      (1L, 5L, "purchase", 30L, Some(7.0)))
      .toDF("user_id", "event_id", "event_type", "ts_us", "value")
    val out = Events.pitOf(ev).collect().sortBy(_.getLong(1))
    assert(out.length === 2)
    val inNull = out(0)
    assert(inNull.getLong(4) === 2L, "purchase in the NULL window must see version 2")
    assert(inNull.isNullAt(5), "a last_value without the struct pack would skip " +
      "the NULL version and resurrect 5.0 here")
    val sameUs = out(1)
    assert(sameUs.getLong(4) === 3L && sameUs.getDouble(5) === 7.0,
      "a version opening at the purchase's exact µs is visible")
  }

  test("q123 retention cohorts match a brute-force per-user day replay") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf0001)
      .select($"user_id", $"ts_ns").as[(Long, Long)].collect()
    val days = ev.map { case (u, ns) => (u, ns / 86400000000000L) }.distinct
    val firstDay = days.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expected = days.map { case (u, d) => (firstDay(u), d - firstDay(u), u) }
      .groupBy { case (c, o, _) => (c, o) }.view
      .mapValues(_.map(_._3).distinct.length.toLong).toMap
    val rows = Events.retentionCohorts(spark, Sf0001).collect()
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(r.getLong(2) === expected(key), s"cell $key")
      val ret = r.getAs[Double]("retention")
      assert(ret > 0.0 && ret <= 1.0, r)
      // day-0 cell is the denominator: retention exactly 1
      if (r.getLong(1) == 0L) assert(ret === 1.0, r)
    }
    // offsets never negative; every cohort has its day-0 cell
    val byCohort = rows.groupBy(_.getLong(0))
    byCohort.foreach { case (c, rs) =>
      assert(rs.forall(_.getLong(1) >= 0L), s"cohort $c")
      assert(rs.exists(_.getLong(1) == 0L), s"cohort $c missing day-0")
    }
  }

  test("q124 burst detection matches a brute-force trailing-window replay") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf0001)
      .select($"event_type", $"ts_ns").as[(String, Long)].collect()
    val hourly = ev.map { case (t, ns) => (t, ns / 3600000000000L) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = hourly.keys.toSeq.map { case (t, hr) =>
      val prev = (1L to 6L).flatMap(d => hourly.get((t, hr - d)))
      (t, hr, hourly((t, hr)), prev.length.toLong, prev.sum)
    }.filter { case (_, _, n, hp, sp) => hp >= 3 && 2 * n * hp > 3 * sp }
      .sortBy { case (t, hr, _, _, _) => (t, hr) }
    val got = Events.burstDetection(spark, Sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(expected.nonEmpty, "no bursts at sf0.001 — threshold or corpus changed?")
    // the reported ratio really exceeds the 1.5x trailing mean
    Events.burstDetection(spark, Sf0001).collect().foreach { r =>
      assert(r.getAs[Double]("burst_ratio") > 1.5, r)
    }
  }

  test("q127 event trigrams match a brute-force per-user sequence replay") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf0001)
      .select($"user_id", $"ts_ns", $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val tris = ev.groupBy(_._1).values.flatMap { es =>
      es.sortBy(e => (e._2, e._3)).map(_._4).sliding(3).filter(_.length == 3)
        .map(s => (s(0), s(1), s(2))).toSeq
    }.toSeq
    val expected = tris.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(20)
      .zipWithIndex
      .map { case (((a, b, c), n), i) => (i + 1L, a, b, c, n) }
    val got = Events.eventTrigrams(spark, Sf0001).collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.nonEmpty && got.map(_._5).max === got.head._5)
  }

  test("q132 seasonal backtest matches a brute-force lag replay") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf0001)
      .select($"event_type", $"ts_ns").as[(String, Long)].collect()
    val hourly = ev.map { case (t, ns) => (t, ns / 3600000000000L) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expected = hourly.keys.map(_._1).toSeq.distinct.sorted.flatMap { t =>
      val cells = hourly.collect { case ((`t`, hr), n) => (hr, n) }.toMap
      val eval = cells.toSeq.flatMap { case (hr, n) =>
        for (s <- cells.get(hr - 168); p <- cells.get(hr - 1))
          yield (math.abs(n - s), math.abs(n - p))
      }
      if (eval.isEmpty) None
      else {
        val (sae, sap) = (eval.map(_._1).sum, eval.map(_._2).sum)
        Some((t, eval.length.toLong, sae, sap))
      }
    }
    val got = Events.seasonalBacktest(spark, Sf0001).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSeq === expected)
    got.foreach { r =>
      // skill defined iff seasonal error nonzero; both dec6 ratios sane
      val skillNull = r.isNullAt(r.fieldIndex("skill"))
      assert(skillNull === (r.getLong(2) == 0L), r)
      assert(r.getAs[Double]("mae_seasonal") >= 0.0, r)
    }
    assert(expected.nonEmpty, "no evaluable hours at sf0.001 — span shrank?")
  }

  test("q134 skew profile matches brute-force key histograms; uniform ~1, skewed > 1") {
    import spark.implicits._
    def expect(pairs: Seq[String], name: String): (String, Long, Long, Long, String, Double) = {
      val h = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val mx = h.values.max
      val top = h.filter(_._2 == mx).keys.max
      val (rows, keys) = (pairs.length.toLong, h.size.toLong)
      (name, rows, keys, mx, top,
        BigDecimal(mx * keys)./(BigDecimal(rows))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val li = Tables.lineitem(spark, Sf0001)
    val expected = Seq(
      expect(Tables.events(spark, Sf0001).select($"user_id".cast("string"))
        .as[String].collect().toSeq, "events.user_id"),
      expect(li.select($"l_orderkey".cast("string")).as[String].collect().toSeq,
        "lineitem.l_orderkey"),
      expect(li.select($"l_suppkey".cast("string")).as[String].collect().toSeq,
        "lineitem.l_suppkey"))
    val got = Events.skewProfile(spark, Sf0001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getDouble(5))).toSeq
    assert(got === expected)
    // the statistic means something: every ratio >= 1 by construction
    assert(got.forall(_._6 >= 1.0))
  }

  test("q128 approx quantiles: exact below sketch capacity, chain monotone") {
    import spark.implicits._
    val vals = Tables.events(spark, Sf0001)
      .select($"event_type", $"value").as[(String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // Spark's percentile_approx at quantile q returns the element at
    // rank ceil(q * n) (1-based); with n < accuracy the sketch holds
    // every value, so the answer must be EXACTLY that element
    def exactAt(s: Array[Double], q: Double): Double =
      s(math.max(0, math.ceil(q * s.length).toInt - 1))
    val rows = Events.approxQuantiles(spark, Sf0001).collect()
    assert(rows.map(_.getString(0)).toSet === vals.keySet)
    rows.foreach { r =>
      val s = vals(r.getString(0))
      assert(r.getLong(1) === s.length.toLong, r)
      assert(s.length < 10000, "sf0.001 grew past sketch capacity — exactness claim void")
      val (p50, p95, p99) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p50 === exactAt(s, 0.5), s"p50 $r")
      assert(p95 === exactAt(s, 0.95), s"p95 $r")
      assert(p99 === exactAt(s, 0.99), s"p99 $r")
      assert(p50 <= p95 && p95 <= p99, r)
    }
  }

  test("q136 time-weighted average: matches an exact driver-side recompute") {
    import spark.implicits._
    val evs = Tables.events(spark, Sf0001)
      .select($"user_id", $"event_type", $"ts_ns", $"event_id", $"value")
      .as[(Long, String, Long, Long, Double)].collect()
    def cents(d: Double): BigInt =
      BigDecimal.valueOf(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toBigInt
    // per user: sort by (ts, id), each event holds until the next one
    val intervals = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      es.sortBy(e => (e._3, e._4)).sliding(2).collect {
        case Array(a, b) => (a._2, cents(a._5), (b._3 - a._3) / 1000)
      }
    }
    val expected = intervals.groupBy(_._1).map { case (t, is) =>
      val wsum = is.map(i => i._2 * BigInt(i._3)).sum
      val dur = is.map(i => BigInt(i._3)).sum
      val twa = (BigDecimal(wsum) / BigDecimal(dur * 100))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      t -> (is.size.toLong, dur.toLong, twa)
    }
    val got = Events.timeWeightedAvg(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (n, dur, twa) = expected(r.getString(0))
      assert(r.getLong(1) === n, r)
      assert(r.getLong(2) === dur, r)
      assert(r.getDouble(3) === twa, r)
    }
  }

  test("q138 attribution: matches a driver-side last-touch replay") {
    import spark.implicits._
    val evs = Tables.events(spark, Sf0001)
      .select($"user_id", $"event_type", $"ts_ns", $"event_id", $"value")
      .as[(Long, String, Long, Long, Double)].collect()
    def cents(d: Double): BigInt =
      BigDecimal.valueOf(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toBigInt
    val purchases = evs.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._3, e._4))
      sorted.zipWithIndex.collect {
        case (p, i) if p._2 == "purchase" =>
          val touch = sorted.take(i)
            .filter(e => e._2 == "click" || e._2 == "view")
            .sortBy(e => (e._3, e._4)).lastOption
          val ch = touch match {
            case Some(t) if p._3 - t._3 <= 3600L * 1000 * 1000 * 1000 => t._2
            case _ => "direct"
          }
          (ch, cents(p._5))
      }
    }
    val total = purchases.size.toLong
    val expected = purchases.groupBy(_._1).map { case (ch, ps) =>
      val rev = (BigDecimal(ps.map(_._2).sum) / 100)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      val share = (BigDecimal(ps.size) / BigDecimal(total))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      ch -> (ps.size.toLong, rev, share)
    }
    val got = Events.lastTouchAttribution(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (n, rev, share) = expected(r.getString(0))
      assert(r.getLong(1) === n, r)
      assert(r.getDouble(2) === rev, r)
      assert(r.getDouble(3) === share, r)
    }
    // both marketing channels must appear for the test to mean anything
    assert(expected.keySet.intersect(Set("click", "view")).size === 2)
  }

  test("q152 Nelson-Aalen: matches a driver-side survival replay") {
    import spark.implicits._
    val life = Tables.events(spark, Sf0001)
      .select($"user_id", $"ts".cast("date").cast("string"))
      .as[(Long, String)].collect()
      .groupBy(_._1).map { case (_, rs) =>
        val days = rs.map(r => java.time.LocalDate.parse(r._2))
        java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max).toInt
      }.toSeq
    val dBy = life.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ts = dBy.keys.toSeq.sorted
    val got = operators.Events.nelsonAalen(spark, Sf0001).collect()
    assert(got.map(_.getInt(0)).toSeq === ts)
    var cum = BigDecimal(0)
    got.foreach { r =>
      val t = r.getInt(0)
      val n = life.count(_ >= t).toLong
      assert(r.getLong(1) === n, s"n_at_risk $r")
      assert(r.getLong(2) === dBy(t), s"churned $r")
      val h = (BigDecimal(dBy(t)) / BigDecimal(n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      assert(r.getDouble(3) === h.toDouble, s"hazard $r")
      cum += h
      assert(r.getDouble(4) === cum.toDouble, s"cum_hazard $r")
    }
    // risk set is the whole population at t = min lifetime
    assert(got.head.getLong(1) === life.size.toLong)
  }

  test("q153 EWMA trend: matches a driver-side weighted replay") {
    import spark.implicits._
    val hourly = Tables.events(spark, Sf0001)
      .select($"event_type", $"ts_ns", $"value").as[(String, Long, Double)]
      .collect()
      .groupBy(t => (t._1, t._2 / 3600000000000L))
      .view.mapValues(_.map(e => BigDecimal.valueOf(e._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact).sum)
      .toMap
    val got = operators.Events.ewmaTrend(spark, Sf0001).collect()
    assert(got.length === hourly.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      assert(hourly.contains(key), r)
      val (num, den) = (0 until 12).flatMap { i =>
        hourly.get((key._1, key._2 - i)).map { v =>
          val w = 1L << (11 - i)
          (BigInt(v) * w, BigInt(w))
        }
      }.foldLeft((BigInt(0), BigInt(0))) { case ((n, d), (a, b)) => (n + a, d + b) }
      val ewma = (BigDecimal(num) / BigDecimal(den * 100))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(3) === ewma, s"ewma $r")
      // the current hour always dominates the window: EWMA sits within
      // the window's value range by convexity
      assert(r.getDouble(2) === (BigDecimal(hourly(key)) / 100)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble, r)
    }
  }

  test("q154 session overlap: matches a driver-side interval replay") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf0001)
      .select($"user_id", $"event_type", $"event_id", $"ts_ns")
      .as[(Long, String, Long, Long)].collect()
    val gap = 30L * 60 * 1000 * 1000 * 1000
    val sessions = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((u, et), rs) =>
      val sorted = rs.sortBy(e => (e._4, e._3))
      val sess = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { e =>
        if (sess.nonEmpty && e._4 - sess.last._2 <= gap)
          sess(sess.length - 1) = (sess.last._1, e._4)
        else sess += ((e._4, e._4))
      }
      sess.map { case (s, e) => (u, et, s, e + gap) }
    }
    val pairs = for {
      a <- sessions; b <- sessions
      if a._1 == b._1 && a._2 < b._2 && a._3 < b._4 && b._3 < a._4
    } yield (a._2, b._2, a._1, (math.min(a._4, b._4) - math.max(a._3, b._3)) / 1000000000L)
    val expected = pairs.groupBy(p => (p._1, p._2)).view.mapValues { ps =>
      (ps.size.toLong, ps.map(_._3).distinct.size.toLong, ps.map(_._4).sum)
    }.toMap
    val got = operators.Events.sessionOverlap(spark, Sf0001).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === expected.keySet)
    got.foreach { r =>
      val e = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === e._1, s"n_pairs $r")
      assert(r.getLong(3) === e._2, s"n_users $r")
      assert(r.getLong(4) === e._3, s"total_overlap_s $r")
      val avg = (BigDecimal(e._3) / BigDecimal(e._1))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getDouble(5) === avg, s"avg_overlap_s $r")
    }
    assert(got.nonEmpty, "no overlapping cross-type sessions — test degenerate")
  }

  test("q159 conversion latency: matches a driver-side attribution replay") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf0001)
      .filter($"event_type".isin("click", "purchase"))
      .select($"user_id", $"event_type", $"event_id", $"ts_ns")
      .as[(Long, String, Long, Long)].collect()
    val lats = ev.groupBy(_._1).values.flatMap { rs =>
      val sorted = rs.sortBy(e => (e._4, e._3))
      sorted.zipWithIndex.collect {
        case ((_, "purchase", _, ts), i)
            if sorted.take(i).exists(_._2 == "click") =>
          val lc = sorted.take(i).filter(_._2 == "click").map(_._4).max
          ts - lc
      }.filter(_ <= 3600L * 1000 * 1000 * 1000).map(_ / 1000000000L)
    }.toSeq.sorted
    val got = operators.Events.conversionLatency(spark, Sf0001).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === lats.length.toLong, s"n $r")
    assert(lats.nonEmpty, "no conversions at sf0.001 — test degenerate")
    assert(r.getLong(1) === lats(((lats.length + 1) / 2 - 1)), s"p50 $r")
    assert(r.getLong(2) === lats(((9 * lats.length + 9) / 10 - 1)), s"p90 $r")
    val mean = (BigDecimal(lats.sum) / BigDecimal(lats.length))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(3) === mean, s"mean $r")
    assert(r.getLong(1) <= r.getLong(2), "p50 > p90")
  }

  test("q167 rolling active users: matches a brute-force trailing distinct") {
    import spark.implicits._
    val ud = Tables.events(spark, Sf0001)
      .select($"user_id", $"ts".cast("date").cast("string"))
      .as[(Long, String)].collect()
      .map { case (u, d) => (u, java.time.LocalDate.parse(d).toEpochDay) }
      .distinct
    val (mn, mx) = (ud.map(_._2).min, ud.map(_._2).max)
    val expected = (mn to mx).flatMap { d =>
      val n = ud.filter(t => t._2 <= d && t._2 > d - 7).map(_._1).distinct.size
      if (n > 0) Some(d -> n.toLong) else None
    }.toMap
    val got = operators.Events.rollingActiveUsers(spark, Sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val d = r.getDate(0).toLocalDate.toEpochDay
      assert(r.getLong(1) === expected(d), s"day $r")
    }
    // the interval merge produced no duplicate (user, day): counts never
    // exceed the distinct user population
    val users = ud.map(_._1).distinct.size.toLong
    got.foreach(r => assert(r.getLong(1) <= users, r))
  }

  test("q168 percentile bands: matches a driver-side sorted replay") {
    import spark.implicits._
    val evs = Tables.events(spark, Sf0001)
      .select($"ts".cast("date").cast("string"), $"value")
      .as[(String, Double)].collect()
    def cents(d: Double): Long =
      BigDecimal.valueOf(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
    val byDay = evs.groupBy(_._1).view.mapValues(_.map(e => cents(e._2)).sorted)
    val got = operators.Events.dailyPercentileBands(spark, Sf0001).collect()
    assert(got.map(_.getDate(0).toString).toSet === byDay.keys.toSet)
    got.foreach { r =>
      val s = byDay(r.getDate(0).toString)
      val n = s.length.toLong
      assert(r.getLong(1) === n, r)
      def at(rank: Long) = s((rank - 1).toInt) / 100.0
      assert(r.getDouble(2) === at((n + 9) / 10), s"p10 $r")
      assert(r.getDouble(3) === at((5 * n + 9) / 10), s"p50 $r")
      assert(r.getDouble(4) === at((9 * n + 9) / 10), s"p90 $r")
      assert(r.getDouble(2) <= r.getDouble(3) && r.getDouble(3) <= r.getDouble(4), r)
    }
  }

  test("q174 linear interpolation: matches a driver-side repair replay") {
    import spark.implicits._
    val hourly = Tables.events(spark, Sf0001)
      .select($"event_type", $"ts_ns", $"value").as[(String, Long, Double)]
      .collect()
      .groupBy(t => (t._1, t._2 / 3600000000000L))
      .view.mapValues(_.map(e => BigDecimal.valueOf(e._3)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact).sum)
      .toMap
    val got = operators.Events.linearInterpolation(spark, Sf0001).collect()
    val byType = hourly.keys.groupBy(_._1).view
      .mapValues(ks => (ks.map(_._2).min, ks.map(_._2).max)).toMap
    val expectedRows = byType.map { case (_, (mn, mx)) => mx - mn + 1 }.sum
    assert(got.length === expectedRows.toInt, "dense grid per type")
    got.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      if (r.getBoolean(2)) {
        assert(r.getDouble(3) === (BigDecimal(hourly(key)) / 100)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, r)
      } else {
        val hrs = hourly.keys.filter(_._1 == key._1).map(_._2)
        val ph = hrs.filter(_ < key._2).max
        val nh = hrs.filter(_ > key._2).min
        val (pv, nv) = (hourly((key._1, ph)), hourly((key._1, nh)))
        val interp = (BigDecimal(
          BigInt(pv) * (nh - key._2) + BigInt(nv) * (key._2 - ph))
          / BigDecimal(BigInt(nh - ph) * 100))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(r.getDouble(3) === interp, s"interp $r")
        // interpolation stays within the neighbour band
        assert(r.getDouble(3) >= math.min(pv, nv) / 100.0 - 1e-6
          && r.getDouble(3) <= math.max(pv, nv) / 100.0 + 1e-6, r)
      }
    }
    assert(got.exists(!_.getBoolean(2)), "no gaps at sf0.001 — degenerate")
  }

  test("q177 peak concurrency: matches a driver-side sweep-line replay") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf0001)
      .select($"user_id", $"event_type", $"event_id", $"ts_ns")
      .as[(Long, String, Long, Long)].collect()
    val gap = 30L * 60 * 1000 * 1000 * 1000
    val sessions = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((_, et), rs) =>
      val sorted = rs.sortBy(e => (e._4, e._3))
      val sess = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      sorted.foreach { e =>
        if (sess.nonEmpty && e._4 - sess.last._2 <= gap)
          sess(sess.length - 1) = (sess.last._1, e._4)
        else sess += ((e._4, e._4))
      }
      sess.map { case (s, e) => (et, s, e + gap) }
    }
    val got = operators.Events.peakConcurrency(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === sessions.map(_._1).toSet)
    got.foreach { r =>
      val et = r.getString(0)
      val mine = sessions.filter(_._1 == et)
      assert(r.getLong(1) === mine.length.toLong, s"n_sessions $r")
      val deltas = (mine.map(s => (s._2, 1)) ++ mine.map(s => (s._3, -1)))
        .sortBy(identity)
      var rs = 0L
      val trace = deltas.map { case (ns, d) => rs += d; (ns, rs) }
      val peak = trace.map(_._2).max
      val peakHour = trace.filter(_._2 == peak).map(_._1 / 3600000000000L).min
      assert(r.getLong(2) === peak, s"peak $r")
      assert(r.getLong(3) === peakHour, s"peak_hour $r")
      // peak is bounded by the session count of this type
      assert(peak <= mine.length)
    }
  }

  test("q178 min-max scaling: matches a driver-side replay") {
    import spark.implicits._
    val evs = Tables.events(spark, Sf0001)
      .select($"event_type", $"value").as[(String, Double)].collect()
    def cents(d: Double): Long =
      BigDecimal.valueOf(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
    val byType = evs.groupBy(_._1).view.mapValues(_.map(e => cents(e._2))).toMap
    val got = operators.Events.minmaxScaling(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === byType.keySet)
    got.foreach { r =>
      val cs = byType(r.getString(0))
      val (mn, mx) = (cs.min, cs.max)
      val scaled = cs.map(c => if (mx == mn) 0L
        else BigInt((c - mn)) * 1000 / BigInt(mx - mn) match { case b => b.toLong })
      assert(r.getLong(1) === cs.length.toLong, r)
      assert(r.getDouble(2) === mn / 100.0, s"min $r")
      assert(r.getDouble(3) === mx / 100.0, s"max $r")
      assert(r.getLong(4) === scaled.sum, s"sum_scaled $r")
      // scaled values live in [0, 1000]
      assert(scaled.forall(s => s >= 0 && s <= 1000))
    }
  }

  test("q181 RFM segments: matches a driver-side quintile replay") {
    import spark.implicits._
    val ev = Tables.events(spark, Sf0001)
      .select($"user_id", $"ts".cast("date").cast("string"), $"value")
      .as[(Long, String, Double)].collect()
    def cents(d: Double): Long =
      BigDecimal.valueOf(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact
    val maxDay = ev.map(e => java.time.LocalDate.parse(e._2)).max
    val users = ev.groupBy(_._1).map { case (_, rs) =>
      val last = rs.map(e => java.time.LocalDate.parse(e._2)).max
      (java.time.temporal.ChronoUnit.DAYS.between(last, maxDay),
        rs.length.toLong, rs.map(e => cents(e._3)).sum)
    }.toSeq
    val n = users.length.toLong
    def th(vals: Seq[Long]): Seq[Long] = {
      val s = vals.sorted
      (1 to 4).map(k => s((((k * n + 4) / 5) - 1).toInt))
    }
    val (rt, ft, mt) = (th(users.map(_._1)), th(users.map(_._2)), th(users.map(_._3)))
    def q(v: Long, t: Seq[Long]): Int = t.indexWhere(v <= _) match {
      case -1 => 5; case i => i + 1
    }
    val cells = users.groupBy(u => (q(u._1, rt), q(u._2, ft), q(u._3, mt)))
      .view.mapValues(us => (us.length.toLong, us.map(_._1).sum,
        us.map(_._2).sum, us.map(_._3).sum)).toMap
    val got = operators.Events.rfmSegments(spark, Sf0001).collect()
    assert(got.map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
      === cells.keySet)
    assert(got.map(_.getLong(3)).sum === n, "cells partition the users")
    got.foreach { r =>
      val (cnt, sr, sf, sm) = cells((r.getInt(0), r.getInt(1), r.getInt(2)))
      assert(r.getLong(3) === cnt, s"n_users $r")
      assert(r.getDouble(4) === (BigDecimal(sr) / cnt)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"avg_r $r")
      assert(r.getDouble(6) === (BigDecimal(sm) / (BigDecimal(cnt) * 100))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"avg_m $r")
    }
  }

  test("q193 grouped mode matches a driver-side frequency replay") {
    val cents = Tables.events(spark, Sf0001)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = cents.groupBy(_._1).map { case (et, rs) =>
      val freq = rs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val mx = freq.values.max
      val tied = freq.filter(_._2 == mx).keys
      et -> (tied.min, mx, tied.size.toLong)
    }
    val got = graft.operators.Events.groupedMode(spark, Sf0001).collect()
    assert(got.map(_.getString(0)).toSet === expected.keySet)
    got.foreach { r =>
      val (mc, mn, nm) = expected(r.getString(0))
      assert(r.getDouble(1) === mc.toDouble / 100, s"mode_value $r")
      assert(r.getLong(2) === mn, s"mode_n $r")
      assert(r.getLong(3) === nm, s"n_modes $r")
    }
  }

  test("q194 OHLC bars match a driver-side first/last/extremes replay") {
    val rows = Tables.events(spark, Sf0001)
      .select(col("event_type"), col("ts").cast("date").cast("string"),
        col("ts").cast("long"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val expected = rows.groupBy(r => (r._1, r._2)).map { case (k, g) =>
      val open = g.minBy(r => (r._3, r._4))._5
      val close = g.maxBy(r => (r._3, r._4))._5
      k -> (open, g.map(_._5).max, g.map(_._5).min, close,
        g.size.toLong, g.map(_._5).sum)
    }
    val got = graft.operators.Events.ohlcBars(spark, Sf0001).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (o, h, l, c, n, s) = expected((r.getString(0), r.getString(1)))
      assert(r.getDouble(2) === o.toDouble / 100, s"open $r")
      assert(r.getDouble(3) === h.toDouble / 100, s"high $r")
      assert(r.getDouble(4) === l.toDouble / 100, s"low $r")
      assert(r.getDouble(5) === c.toDouble / 100, s"close $r")
      assert(r.getLong(6) === n, s"n $r")
      assert(r.getDouble(7) === s.toDouble / 100, s"volume $r")
    }
  }

  test("q197 session flows match a driver-side sessionization replay") {
    val rows = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("ts_ns"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = 30L * 60 * 1000 * 1000 * 1000
    val sessions = rows.groupBy(_._1).values.flatMap { g =>
      val sorted = g.sortBy(r => (r._2, r._3)).toList
      // split at >30min gaps
      sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e._2 - acc.head.head._2 > gap) List(e) :: acc
        else (e :: acc.head) :: acc.tail // head of acc.head = latest event
      }.map(_.reverse)
    }.toSeq
    val expected = sessions.groupBy(s => (s.head._4, s.last._4))
      .map { case (k, g) =>
        k -> (g.size.toLong, g.count(_.size == 1).toLong,
          g.map(_.size.toLong).sum)
      }
    val got = graft.operators.Events.sessionFlows(spark, Sf0001).collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet === expected.keySet)
    def half(n: BigInt, d: BigInt) = (2 * n + d) / (2 * d)
    got.foreach { r =>
      val (ns, nb, se) = expected((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === ns, s"n_sessions $r")
      assert(r.getLong(3) === nb, s"n_bounce $r")
      assert(r.getDouble(4) ===
        (BigDecimal(half(BigInt(se) * 1000000, BigInt(ns))) / 1000000).toDouble,
        s"avg_events $r")
    }
    // conservation: matrix totals cover every session exactly once
    val totalSessions = graft.operators.Events.sessionize(spark, Sf0001)
      .agg(sum(col("n_sessions"))).head().getLong(0)
    assert(got.map(_.getLong(2)).sum === totalSessions)
  }
}
