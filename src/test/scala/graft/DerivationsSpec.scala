package graft

import org.apache.spark.sql.functions._
import graft.operators.Derivations

/** Scalar-derivation + aggregation-extension operators. Oracled queries
  * are value-checked by the driver gate; these pin the sketch bound and
  * rollup algebra. */
class DerivationsSpec extends SparkSuite {

  test("q49 approx distinct: HLL estimate within the configured rsd") {
    // exact side from q19 (same grouping) — kept OUT of q49 itself
    // because the mixed-distinct rewrite is pathological (see scaladoc)
    val a = Derivations.approxDistinct(spark, Sf0001)
      .join(Derivations.distinctCounts(spark, Sf0001), Seq("l_returnflag"))
    // rsd 5% → allow 3 sigma ≈ 15%
    val bad = a.filter(
      abs(col("approx_parts") - col("n_parts")) > col("n_parts") * 0.15 ||
      abs(col("approx_supps") - col("n_supps")) > col("n_supps") * 0.15 ||
      abs(col("approx_orders") - col("n_orders")) > col("n_orders") * 0.15)
    assert(bad.count() === 0, bad.collect().mkString(","))
  }

  test("percentile_approx tracks the exact percentile") {
    val o = Tables.orders(spark, Sf0001)
    val r = o.agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("approx"),
      expr("percentile(o_totalprice, 0.5)").as("exact")).head()
    val (a, e) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(a - e) <= e * 0.01, s"approx=$a exact=$e")
  }

  test("q52 cube: every grouping-set shape present, totals consistent") {
    val c = Derivations.cubeCounts(spark, Sf0001).cache()
    // cube of 2 cols = 4 grouping-set shapes
    assert(c.select("g_status", "g_prio").distinct().count() === 4)
    val grand = c.filter(col("g_status") === 1 && col("g_prio") === 1)
      .head().getAs[Long]("n")
    val leaves = c.filter(col("g_status") === 0 && col("g_prio") === 0)
      .agg(sum("n")).head().getLong(0)
    assert(leaves === grand)
    c.unpersist()
  }

  test("q53 pivot: wide columns partition the yearly total") {
    val p = Derivations.pivotStatus(spark, Sf0001)
    val o = Tables.orders(spark, Sf0001)
    val total = o.agg(sum(col("o_totalprice").cast("decimal(18,2)")))
      .head().getDecimal(0)
    // outputs are DOUBLE (driver-hash discipline); the values are exact
    // 2-decimal quantities, so casting back to decimal recovers them
    val pivotTotal = p.agg(
      sum(coalesce(col("total_f"), lit(0)).cast("decimal(38,2)")
        + coalesce(col("total_o"), lit(0)).cast("decimal(38,2)")
        + coalesce(col("total_p"), lit(0)).cast("decimal(38,2)"))).head().getDecimal(0)
    assert(pivotTotal.compareTo(total) === 0)
  }

  test("q60 grouping sets: exactly the two marginal shapes, no grand total") {
    val g = Derivations.groupingSets(spark, Sf0001).cache()
    val shapes = g.select("g_flag", "g_status").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(shapes === Set((0L, 1L), (1L, 0L))) // marginals only — not expressible as ROLLUP/CUBE
    val total = Tables.lineitem(spark, Sf0001).count()
    // each marginal partitions all rows
    assert(g.filter(col("g_status") === 1).agg(sum("n")).head().getLong(0) === total)
    assert(g.filter(col("g_flag") === 1).agg(sum("n")).head().getLong(0) === total)
    g.unpersist()
  }

  test("q50 rollup: subtotal rows sum to the grand total") {
    val r = Derivations.rollupCounts(spark, Sf0001).cache()
    val grand = r.filter(col("g_flag") === 1 && col("g_status") === 1)
    assert(grand.count() === 1)
    val total = grand.head().getAs[Long]("n")
    val leaves = r.filter(col("g_flag") === 0 && col("g_status") === 0)
      .agg(sum("n")).head().getLong(0)
    val mids = r.filter(col("g_flag") === 0 && col("g_status") === 1)
      .agg(sum("n")).head().getLong(0)
    assert(leaves === total)
    assert(mids === total)
    r.unpersist()
  }

  test("q82 exact variance agrees with var_samp and is partition-invariant") {
    val prof = Derivations.numericProfile(spark, Sf0001).collect()
    val ref = Tables.lineitem(spark, Sf0001)
      .groupBy(col("l_returnflag"))
      .agg(var_samp(col("l_extendedprice")).as("v"), avg(col("l_extendedprice")).as("m"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    prof.foreach { r =>
      val (v, m) = ref(r.getAs[String]("l_returnflag"))
      assert(math.abs(r.getAs[Double]("var_price") - v) / v < 1e-9, r)
      assert(math.abs(r.getAs[Double]("mean_price") - m) / m < 1e-9, r)
    }
    // decimal sufficient statistics are order/partition independent
    val again = Derivations.numericProfile(spark, Sf0001).collect()
    assert(prof.toSeq === again.toSeq)
  }

  test("q51 distributed quantiles are bit-identical to the percentile aggregate") {
    import spark.implicits._
    def viaAgg(in: org.apache.spark.sql.DataFrame) = {
      val Seq(g, v) = in.columns.toSeq
      in.groupBy(col(g))
        .agg(
          graft.functions.Parity.dec6(expr(s"percentile($v, 0.5)")).as("median"),
          graft.functions.Parity.dec6(expr(s"percentile($v, 0.95)")).as("p95"),
          count(lit(1)).as("n"))
        .orderBy(col(g))
    }
    // the real corpus
    val orders = Tables.orders(spark, Sf0001)
      .select(col("o_orderstatus"), col("o_totalprice"))
    val got = Derivations.quantilesDistributed(spark, orders).collect()
    val exp = viaAgg(orders).collect()
    assert(got.toSeq === exp.toSeq)
    // adversarial groups: n=1, n=2, heavy ties, an all-null group, and
    // a null mixed into a live group (percentile skips it, count doesn't)
    val edge = Seq(
      ("one", Some(42.0)), ("two", Some(1.0)), ("two", Some(2.0)),
      ("tie", Some(7.0)), ("tie", Some(7.0)), ("tie", Some(7.0)), ("tie", Some(9.0)),
      ("nul", None: Option[Double]),
      ("mix", Some(5.0)), ("mix", None)).toDF("g", "v")
    assert(Derivations.quantilesDistributed(spark, edge).collect().toSeq
      === viaAgg(edge).collect().toSeq)
  }

  test("q170 equi-depth histogram: matches a driver-side sorted replay") {
    import spark.implicits._
    val cents = Tables.lineitem(spark, Sf0001)
      .select($"l_extendedprice").as[Double].collect()
      .map(d => BigDecimal.valueOf(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
        .*(100).toLongExact).sorted
    val n = cents.length.toLong
    val b = Derivations.HistogramBuckets
    val bounds = (1 to b).map(k => cents((((k * n + b - 1) / b) - 1).toInt))
    val got = Derivations.equiDepthHistogram(spark, Sf0001).collect()
    assert(got.map(_.getInt(0)).toSeq === (1 to b))
    assert(got.map(_.getLong(3)).sum === n, "buckets partition the rows")
    got.foreach { r =>
      val k = r.getInt(0)
      val lo = if (k == 1) cents.head else bounds(k - 2)
      val loExcl = if (k == 1) cents.head - 1 else bounds(k - 2)
      assert(r.getDouble(1) === lo / 100.0, s"lo $r")
      assert(r.getDouble(2) === bounds(k - 1) / 100.0, s"hi $r")
      assert(r.getLong(3) ===
        cents.count(c => c > loExcl && c <= bounds(k - 1)).toLong, s"n $r")
    }
  }

  test("q176 join-cardinality audit: exact actual, estimates only over-count") {
    import spark.implicits._
    val ok = Tables.orders(spark, Sf0001).select($"o_custkey").as[Long].collect()
    val ck = Tables.customer(spark, Sf0001).select($"c_custkey").as[Long].collect()
    val cCnt = ck.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val actual = ok.map(k => cCnt.getOrElse(k, 0L)).sum
    val got = Derivations.joinCardinalityAudit(spark, Sf0001).collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getLong(0) === actual, s"actual $r")
    // bucket collisions only ADD phantom matches
    assert(r.getLong(1) >= r.getLong(0), "est_16 under-counted")
    assert(r.getLong(2) >= r.getLong(0), "est_256 under-counted")
    // finer buckets estimate no worse than coarser ones
    assert(r.getLong(2) <= r.getLong(1), "more buckets got worse")
    assert(r.getDouble(3) >= 1.0 && r.getDouble(4) >= 1.0, r)
  }

  test("q186 equi-width histogram matches a driver-side bucket replay") {
    import graft.operators.Derivations
    val b = Derivations.WidthBuckets
    val cents = Tables.events(spark, Sf0001)
      .select(col("event_type"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("decimal(18,0)").cast("long").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = cents.groupBy(_._1).flatMap { case (et, rs) =>
      val vs = rs.map(_._2)
      val (mn, mx) = (vs.min, vs.max)
      def bucket(c: Long) =
        if (mx == mn) 0L else math.min((b - 1).toLong, (c - mn) * b / (mx - mn))
      vs.groupBy(bucket).map { case (bk, g) =>
        (et, bk.toInt) -> (mn + bk * (mx - mn) / b, mn + (bk + 1) * (mx - mn) / b,
          g.size.toLong)
      }
    }
    val got = Derivations.equiWidthHistogram(spark, Sf0001).collect()
    assert(got.map(r => (r.getString(0), r.getInt(1))).toSet === expected.keySet)
    got.foreach { r =>
      val (lo, hi, n) = expected((r.getString(0), r.getInt(1)))
      assert(r.getDouble(2) === lo.toDouble / 100, s"lo $r")
      assert(r.getDouble(3) === hi.toDouble / 100, s"hi $r")
      assert(r.getLong(4) === n, s"n $r")
    }
    // per type, bucket counts cover every event exactly once
    val byType = got.groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(4)).sum)
    val totals = cents.groupBy(_._1).view.mapValues(_.size.toLong)
    byType.foreach { case (et, n) => assert(n === totals(et), et) }
  }
}
