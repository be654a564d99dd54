package graft

import org.apache.spark.sql.functions._
import graft.operators.Quality

/** Behavior pins for the round-8 operator tail (q245-q248). Oracles are
  * the primary gate; these assert each operator's DEFINING property —
  * the invariant a hash compare can't name.
  */
class Round8Spec extends SparkSuite {

  test("q245 Spearman: Cauchy-Schwarz holds exactly; rho bounded and NULL only on zero variance") {
    Quality.spearmanMonthly(spark, Sf0001).collect().foreach { r =>
      val num = r.getAs[Long]("cov_num")
      val vx = r.getAs[Long]("v_x")
      val vy = r.getAs[Long]("v_y")
      // integer-exact Cauchy-Schwarz on the rank frame
      assert(num.toDouble * num <= vx.toDouble * vy + 1e-6, r)
      if (vx > 0 && vy > 0) {
        val rho = r.getAs[Double]("spearman_rho")
        assert(rho >= -1.0 - 1e-12 && rho <= 1.0 + 1e-12, r)
      } else assert(r.isNullAt(r.fieldIndex("spearman_rho")), r)
    }
  }

  test("q246 Brown-Forsythe: medians match a driver-side sorted replay; F and sums are consistent") {
    val row = Quality.brownForsythe(spark, Sf0001).collect()(0)
    // independent lower-median replay per priority group
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("decimal(18,0)").cast("long")
    val byG = Tables.orders(spark, Sf0001)
      .select(col("o_orderpriority").as("g"), cents.as("c"))
      .collect().groupBy(_.getString(0)).map { case (g, rs) =>
        val sorted = rs.map(_.getLong(1)).sorted
        g -> sorted(((sorted.length + 1) / 2) - 1)
      }
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    prios.zipWithIndex.foreach { case (p, i) =>
      assert(row.getAs[Long](s"med${i + 1}") === byG(p), s"median of $p")
    }
    val ssb = row.getAs[Double]("ssb")
    val ssw = row.getAs[Double]("ssw")
    assert(ssb >= 0 && ssw >= 0, row)
    assert(row.getAs[Double]("f_stat") >= 0, row)
  }

  test("q247 Pettitt: k_stat matches a driver-side split sweep; t_star is the first argmax") {
    val got = Quality.pettittTest(spark, Sf0001).collect()
      .map(r => r.getAs[String]("nation") ->
        (r.getAs[Long]("k_stat"), r.getAs[Long]("t_star"), r.getAs[Long]("u_star")))
      .toMap
    // independent replay from the monthly frame
    val monthly = Tables.orders(spark, Sf0001)
      .join(Tables.customer(spark, Sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, Sf0001), col("c_nationkey") === col("n_nationkey"))
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("m"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long")).as("rev"))
      .collect().groupBy(_.getString(0))
    monthly.foreach { case (nation, rows) =>
      val xs = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1).map(_._2)
      if (xs.length >= 2) {
        val us = (1 until xs.length).map { t =>
          (for (i <- 0 until t; j <- t until xs.length)
            yield java.lang.Long.signum(xs(j) - xs(i)).toLong).sum
        }
        val k = us.map(math.abs).max
        val tStar = us.indexWhere(u => math.abs(u) == k) + 1
        assert(got(nation) === ((k, tStar.toLong, us(tStar - 1))), nation)
      } else assert(!got.contains(nation), nation)
    }
  }

  test("q249 PQ: every subspace assignment is argmin over its codebook (ties to smallest cid)") {
    val asg = graft.operators.Clustering.pqAssignments(spark, Sf0001).collect()
    val centsPath = Scratch.artifactPath("pq", Sf0001, "_m4k8i3d64") + "_cents"
    val books = spark.read.schema("sub INT, cid INT, cent ARRAY<BIGINT>")
      .parquet(centsPath).collect()
      .groupBy(_.getInt(0)).view.mapValues(_.sortBy(_.getInt(1))
        .map(_.getSeq[Long](2).toArray)).toMap
    asg.foreach { r =>
      val codes = r.getSeq[Long](r.fieldIndex("codes")).toArray
      (0 until 4).foreach { s =>
        val sub = codes.slice(s * 16, s * 16 + 16)
        val dists = books(s).map(c =>
          sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
        val best = dists.indexOf(dists.min)
        assert(r.getAs[Int](s"cid$s") === best,
          s"vec ${r.getLong(0)} sub $s: assignment must be the first argmin")
      }
    }
    val audit = graft.operators.Clustering.pqAdcRecall(spark, Sf0001).collect()
    audit.foreach { r =>
      val overlap = r.getAs[Long]("n_overlap")
      assert(overlap >= 0 && overlap <= 10, r)
      assert(r.getAs[Double]("recall_at_10") === overlap / 10.0, r)
    }
  }

  test("q250 stream semi join: each click at most once, and only if a purchase follows within 1h") {
    val rows = graft.operators.StreamingQueries.streamSemiJoin(spark, Sf0001).collect()
    val clickIds = rows.map(_.getAs[Long]("click_id"))
    assert(clickIds.distinct.length === clickIds.length, "semi join must not duplicate clicks")
    assert(rows.nonEmpty, "fixture has converting clicks")
    // batch replay of the existence predicate
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us")).collect()
    val purchases = ev.filter(_.getString(2) == "purchase")
      .map(r => (r.getLong(0), r.getLong(3)))
    val converting = ev.filter(_.getString(2) == "click").filter { c =>
      purchases.exists { case (u, pus) =>
        u == c.getLong(0) && pus >= c.getLong(3) && pus - c.getLong(3) <= 3600000000L
      }
    }.map(_.getLong(1)).toSet
    assert(clickIds.toSet === converting)
  }

  test("q251 RAKE: matches a driver-side degree/frequency replay") {
    val got = graft.operators.TextAnalysis.rakeKeywords(spark, Sf0001).collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_occurrences"), r.getAs[Double]("rake_score")))
    // independent replay: build phrases, word stats, micro-unit scores
    val stop = graft.functions.TextFunctions.EnglishStopwords.toSet
    val docs = Tables.documents(spark, Sf0001).filter(col("text").isNotNull)
      .select("text").collect().map(_.getString(0))
    val phrases = docs.flatMap { t =>
      val out = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var cur = Vector.empty[String]
      t.split(" ", -1).foreach { w =>
        if (stop(w)) { if (cur.nonEmpty) out += cur; cur = Vector.empty }
        else cur :+= w
      }
      if (cur.nonEmpty) out += cur
      out
    }
    val freq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val deg = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    phrases.foreach(p => p.foreach { w => freq(w) += 1; deg(w) += p.length })
    def r6(w: String) = (2 * deg(w) * 1000000 + freq(w)) / (2 * freq(w))
    val expected = phrases.groupBy(_.mkString(" ")).map { case (ph, occ) =>
      (ph, occ.head.length.toLong, occ.length.toLong, occ.head.map(r6).sum)
    }.toSeq.sortBy { case (ph, _, _, s6) => (-s6, ph) }.take(20)
      .map { case (ph, nw, no, s6) => (ph, nw, no, s6.toDouble / 1000000) }
    assert(got.toSeq === expected)
  }

  test("q252 stump: split minimizes exact weighted Gini over the histogram; never above root") {
    val row = graft.operators.MlQueries.decisionStump(spark, Sf0001).collect()(0)
    assert(row.getAs[Double]("gini_split") <= row.getAs[Double]("gini_root") + 1e-6, row)
    // independent replay with BigInt rationals (no micro rounding):
    // the emitted split must be optimal under the EXACT order too
    val hist = Tables.documents(spark, Sf0001)
      .groupBy(col("n_chars")).agg(count(lit(1)).as("n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val nt = hist.map(_._2).sum; val et = hist.map(_._3).sum
    var nl = 0L; var el = 0L
    val cands = hist.dropRight(1).map { case (v, n, e) =>
      nl += n; el += e
      val num = BigInt(2) * (BigInt(el) * (nl - el) * (nt - nl)
        + BigInt(et - el) * ((nt - nl) - (et - el)) * nl)
      val den = BigInt(nt) * nl * (nt - nl)
      (v, num, den)
    }
    val best = cands.minBy { case (v, num, den) =>
      // exact rational order with value tiebreak: compare via scaled BigInt
      (num * 1000000000000L / den, v)
    }
    // micro-unit argmin may differ from exact argmin only when two
    // splits tie at 1e-6 resolution; assert the emitted split's EXACT
    // impurity is within 1 micro-unit of the exact optimum
    val emitted = cands.find(_._1 == row.getAs[Long]("split_value")).get
    val diff = (emitted._2 * best._3 - best._2 * emitted._3).toDouble /
      (best._3 * emitted._3).toDouble
    assert(diff >= 0 && diff <= 1e-6, s"emitted split must be micro-optimal (gap $diff)")
  }

  test("q253 Durbin-Watson: dw in [0,4]; scaled residuals match a BigInt replay") {
    val rows = Quality.durbinWatson(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    // independent replay of the integer OLS-residual dag
    val monthly = Tables.orders(spark, Sf0001)
      .join(Tables.customer(spark, Sf0001), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, Sf0001), col("c_nationkey") === col("n_nationkey"))
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("n_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).cast("long").as("m"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long")).as("rev"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val dw = r.getAs[Double]("dw")
      assert(dw >= 0 && dw <= 4.0 + 1e-9, r)
      val ys = monthly(r.getString(0)).map(x => (x.getLong(1), x.getLong(2)))
        .sortBy(_._1).map(_._2)
      val n = ys.length
      val sx = BigInt(n) * (n + 1) / 2
      val sxx = BigInt(n) * (n + 1) * (2 * n + 1) / 6
      val sy = ys.map(BigInt(_)).sum
      val sxy = ys.zipWithIndex.map { case (y, i) => BigInt(y) * (i + 1) }.sum
      val den = n * sxx - sx * sx
      val bN = n * sxy - sx * sy
      val aN = sy * sxx - sx * sxy
      val rs = ys.zipWithIndex.map { case (y, i) => den * y - (aN + bN * (i + 1)) }
      val ssr = rs.map(x => x * x).sum
      val ssd = rs.zip(rs.drop(1)).map { case (a, b) => (b - a) * (b - a) }.sum
      assert(BigInt(r.getString(2)) === ssr, s"${r.getString(0)} ssr")
      assert(BigInt(r.getString(3)) === ssd, s"${r.getString(0)} ssd")
    }
  }

  test("q254 Haar: exact integer Parseval - 64*sum(x^2) = sum(e_k * 2^(6-k)) + total^2") {
    val ev = Tables.events(spark, Sf0001)
      .select(col("event_type"), expr("ts_ns div 86400000000000").as("day")).collect()
    val day0 = ev.map(_.getLong(1)).min
    val rows = graft.operators.Events.haarEnergy(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getString(0)
      val counts = Array.fill(64)(0L)
      ev.filter(_.getString(0) == t).map(_.getLong(1) - day0)
        .filter(_ < 64).foreach(off => counts(off.toInt) += 1)
      val sumSq = counts.map(c => BigInt(c) * c).sum
      val energies = (1 to 6).map(k => BigInt(r.getAs[Long](s"e$k")))
      val total = BigInt(r.getAs[Long]("total_sum"))
      assert(total === counts.map(BigInt(_)).sum, s"$t total")
      val rhs = (1 to 6).map(k => energies(k - 1) * BigInt(2).pow(6 - k)).sum + total * total
      assert(BigInt(64) * sumSq === rhs, s"$t Parseval")
    }
  }

  test("q255 CUPED: sums match a driver replay; adjusted variance never exceeds raw") {
    val r = graft.operators.Events.cupedAdjustment(spark, Sf0001).collect()(0)
    // driver replay of the per-user pre/post split and the six sums
    val ev = Tables.events(spark, Sf0001)
      .select(col("user_id"), expr("ts_ns div 86400000000000").as("day"),
        (col("value").cast("decimal(18,2)") * 100).cast("decimal(18,0)")
          .cast("long").as("cents")).collect()
    val day0 = ev.map(_.getLong(1)).min
    val perUser = ev.groupBy(_.getLong(0)).map { case (_, rs) =>
      (rs.filter(_.getLong(1) - day0 < 15).map(_.getLong(2)).sum,
        rs.filter(_.getLong(1) - day0 >= 15).map(_.getLong(2)).sum)
    }.toSeq
    assert(r.getAs[Long]("n_users") === perUser.length.toLong)
    assert(r.getAs[Long]("sx") === perUser.map(_._1).sum)
    assert(r.getAs[Long]("sy") === perUser.map(_._2).sum)
    assert(BigInt(r.getString(4)) ===
      perUser.map { case (x, y) => BigInt(x) * y }.sum) // sxy
    val rho2 = r.getAs[Double]("rho_sq")
    assert(rho2 >= 0 && rho2 <= 1.0 + 1e-12, r)
    // CUPED guarantee: adjusted variance = raw * (1 - rho^2) <= raw
    val n = r.getAs[Long]("n_users").toDouble
    val vyRaw = (BigInt(r.getString(5)).toDouble * n -
      r.getAs[Long]("sy").toDouble * r.getAs[Long]("sy")) / (n * n)
    assert(r.getAs[Double]("var_adjusted") <= vyRaw + 1e-6, r)
  }

  test("q256 Cochran-Armitage: witnesses match a BigInt replay of the ordered-group counts") {
    val r = Quality.cochranArmitage(spark, Sf0001).collect()(0)
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val perOrder = Tables.orders(spark, Sf0001)
      .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .join(Tables.lineitem(spark, Sf0001).select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderpriority"))
      .agg(max(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"), 1L)
        .otherwise(0L)).as("late"))
      .collect()
    val byG = perOrder.groupBy(_.getString(1)).view
      .mapValues(rs => (rs.length.toLong, rs.map(_.getLong(2)).sum)).toMap
    val ns = prios.map(p => byG.get(p).map(_._1).getOrElse(0L))
    val es = prios.map(p => byG.get(p).map(_._2).getOrElse(0L))
    val n = ns.sum; val e = es.sum
    val tNum = (1 to 5).map(i => BigInt(i) * (es(i - 1) * n - ns(i - 1) * e)).sum
    val swn = (1 to 5).map(i => BigInt(i) * ns(i - 1)).sum
    val sw2n = (1 to 5).map(i => BigInt(i * i) * ns(i - 1)).sum
    val varNum = BigInt(e) * (n - e) * (BigInt(n) * sw2n - swn * swn)
    assert(r.getAs[Long]("n_total") === n)
    assert(r.getAs[Long]("n_late") === e)
    assert(BigInt(r.getAs[Long]("t_num")) === tNum)
    assert(BigInt(r.getString(4)) === varNum)
    if (varNum > 0)
      // z's sign IS the trend direction of the weighted late-count excess
      assert(r.getAs[Double]("z_trend").sign === tNum.toDouble.sign, r)
  }

  test("q257 overlap audit: partition identity holds and matches the two producers") {
    val r = graft.operators.Dedup.dedupStrategyOverlap(spark, Sf0001).collect()(0)
    val nBlk = r.getAs[Long]("n_blocking")
    val nSnm = r.getAs[Long]("n_snm")
    val both = r.getAs[Long]("n_both")
    assert(nBlk === both + r.getAs[Long]("n_only_blocking"), r)
    assert(nSnm === both + r.getAs[Long]("n_only_snm"), r)
    // cross-check each side's total against its own producer query
    val blkPairs = graft.operators.Dedup.neardupJaccard(spark, Sf0001).count()
    val snmPairs = graft.operators.Dedup.sortedNeighborhood(spark, Sf0001).count()
    assert(nBlk === blkPairs, "n_blocking must equal q30's pair count")
    assert(nSnm === snmPairs, "n_snm must equal q216's pair count")
  }

  test("q258 triples: anti-monotone — every top triple's support <= each contained pair's") {
    val triples = graft.operators.Relational.basketTriples(spark, Sf0001).collect()
    assert(triples.nonEmpty)
    // driver-side pair counts from the same basket frame
    val items = Tables.lineitem(spark, Sf0001)
      .select(col("l_orderkey"), col("l_partkey")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = items.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    def pairCount(a: Long, b: Long) =
      byOrder.values.count(s => s.contains(a) && s.contains(b)).toLong
    triples.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val cnt = r.getAs[Long]("n_orders_together")
      assert(cnt <= pairCount(a, b) && cnt <= pairCount(a, c) && cnt <= pairCount(b, c),
        s"triple ($a,$b,$c) support must not exceed its pairs'")
      assert(a < b && b < c, "canonical part order")
    }
  }

  test("q259 rules: metric identities hold on every emitted rule") {
    val rules = graft.operators.Relational.basketRules(spark, Sf0001).collect()
    assert(rules.length === 40) // 20 pairs x 2 directions
    rules.foreach { r =>
      val cnt = r.getAs[Long]("n_together")
      val fa = r.getAs[Long]("n_ante")
      val conf = r.getAs[Double]("confidence")
      assert(conf > 0 && conf <= 1.0 + 1e-9, r)
      assert(math.abs(conf - cnt.toDouble / fa) <= 1e-6, "confidence = cnt/fa")
      // leverage sign agrees with lift vs 1 (both measure the same surplus)
      val lift = r.getAs[Double]("lift")
      val lev = r.getAs[Double]("leverage")
      if (math.abs(lift - 1.0) > 1e-5)
        assert(lev.sign === (lift - 1.0).sign, r)
      // conviction defined iff the rule is imperfect
      assert(r.isNullAt(r.fieldIndex("conviction")) === (cnt == fa), r)
    }
    // symmetric metrics match across the two directions of one pair
    rules.groupBy(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).values.foreach { dirs =>
      assert(dirs.length === 2)
      assert(dirs(0).getAs[Double]("lift") === dirs(1).getAs[Double]("lift"))
      assert(dirs(0).getAs[Double]("leverage") === dirs(1).getAs[Double]("leverage"))
    }
  }

  test("q260 blob sync: status partition reconciles with both generations' file counts") {
    val rows = graft.operators.Multimodal.blobSyncDiff(spark, Sf0001).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_files")).toMap
    def n(s: String) = rows.getOrElse(s, 0L)
    val docs = Tables.documents(spark, Sf0001)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val genA = docs.filter(_._1 < 512).map(_._1).toSet
    val genB = docs.filter(d => d._1 >= 256 && d._1 < 768).map(_._1).toSet
    assert(n("removed") + n("changed") + n("unchanged") === genA.size.toLong)
    assert(n("added") + n("changed") + n("unchanged") === genB.size.toLong)
    // changed = overlap docs with id % 7 == 0 whose text is not a palindrome
    val expectedChanged = docs.filter { case (id, t) =>
      genA(id) && genB(id) && id % 7 == 0 && t != t.reverse
    }.length.toLong
    assert(n("changed") === expectedChanged)
  }

  test("q248 isotonic: non-decreasing, in [0,1], and within 2 micro-units of exact-rational PAV") {
    val rows = Quality.isotonicCalibration(spark, Sf0001).collect()
      .sortBy(_.getAs[Int]("score_bin"))
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    iso.sliding(2).foreach {
      case Array(a, b) => assert(a <= b + 1e-12, "isotonic output must be monotone")
      case _ =>
    }
    assert(iso.forall(v => v >= 0 && v <= 1))
    // classic sequential pool-adjacent-violators on EXACT rationals —
    // independent algorithm (pooling loop, not the max-min closed form)
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)] // (e, n)
    rows.foreach { r =>
      pools += ((r.getAs[Long]("n_en"), r.getAs[Long]("n_docs")))
      // pool while the last rate <= previous rate (exact cross-multiply)
      while (pools.length >= 2 &&
          pools(pools.length - 1)._1 * pools(pools.length - 2)._2 <=
          pools(pools.length - 2)._1 * pools(pools.length - 1)._2) {
        val b = pools.remove(pools.length - 1)
        val a = pools.remove(pools.length - 1)
        pools += ((a._1 + b._1, a._2 + b._2))
      }
    }
    // rebuild the per-bin expected rates by walking pool sizes
    val perBin = scala.collection.mutable.ArrayBuffer.empty[Double]
    var i = 0
    pools.foreach { case (e, n) =>
      var covered = 0L
      while (covered < n) {
        covered += rows(i).getAs[Long]("n_docs")
        perBin += e.toDouble / n
        i += 1
      }
      assert(covered === n, "pool boundaries must align with bins")
    }
    iso.zip(perBin).foreach { case (got, exact) =>
      assert(math.abs(got - exact) <= 2e-6, s"micro-unit PAV vs exact: $got vs $exact")
    }
  }
}
