package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Relational}

/** Behavior pins for the round-9 operator tail. Oracles are the primary
  * gate; these assert each operator's DEFINING property — the invariant
  * a hash compare can't name.
  */
class Round9Spec extends SparkSuite {

  val Sf001 = "/root/testdata/sf0.01"

  test("q261 md5 twin and q31 kernel agree on verified near-dup pairs (sf0.01)") {
    // different hash families give different BAND collisions, but on
    // this corpus every true J>=0.5 pair is caught by both (high-J
    // pairs collide in >=1 of 8 bands with probability ~1): the
    // verified outputs are identical sets — the twin certifies the
    // kernel end-to-end, not just per-stage
    val kernel = Dedup.minhashLsh(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val twin = Dedup.minhashLshMd5(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(twin.map(t => (t._1, t._2)).toSet === kernel,
      "twin/kernel verified pair sets diverged")
    assert(twin.nonEmpty, "no near-dup pairs at sf0.01 — test degenerate")
    // the twin's published (n_inter, n_union) must satisfy J >= 1/2
    // by integer cross-multiplication — the operator's threshold
    twin.foreach { case (a, b, ni, nu) =>
      assert(2 * ni >= nu, s"pair ($a,$b) below threshold: $ni/$nu")
      assert(ni <= nu, s"pair ($a,$b) intersection exceeds union")
    }
  }

  test("q261 signature permutation constants are 30-bit odd multipliers (overflow safety)") {
    // the BIGINT-safety argument (A·v1 + B·v2 + C < 2^63 with v < 2^32)
    // requires A, B < 2^30; odd multipliers keep the map 2-adic-mixing
    Dedup.getClass // touch the object so the val initializes
    val field = Dedup.minhashLshMd5Sql
    val consts = """\((\d+) \* v1 \+ (\d+) \* v2 \+ (\d+)\)""".r
      .findAllMatchIn(field).map(m =>
        (m.group(1).toLong, m.group(2).toLong, m.group(3).toLong)).toSeq
    assert(consts.size === 32)
    consts.foreach { case (a, b, c) =>
      assert(a < (1L << 30) && b < (1L << 30) && c < (1L << 30), s"($a,$b,$c)")
      assert(a % 2 === 1 && b % 2 === 1, s"even multiplier ($a,$b)")
    }
  }

  test("q263 closed itemsets: anti-monotonicity, closure consistency, lattice edges") {
    val rows = Relational.closedItemsets(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    val byLevel = rows.groupBy(_.getAs[Long]("level"))
    assert(byLevel.keySet === Set(1L, 2L, 3L))
    // closure consistency: is_closed <=> (no extension OR strict drop)
    rows.foreach { r =>
      val sup = r.getAs[Long]("support")
      val ext = Option(r.getAs[Any]("max_ext_support")).map(_.asInstanceOf[Long])
      // anti-monotonicity: a superset can never exceed the subset
      ext.foreach(e => assert(e <= sup, s"extension support exceeds itemset: $r"))
      assert(r.getAs[Boolean]("is_closed") === ext.forall(_ < sup), s"$r")
    }
    // lattice edges: every mined pair's support <= each member item's
    // support, every mined triple's <= the containing mined pair's
    val l1 = byLevel(1L).map(r => r.getAs[Long]("part_a") -> r.getAs[Long]("support")).toMap
    byLevel(2L).foreach { r =>
      val sup = r.getAs[Long]("support")
      Seq("part_a", "part_b").foreach { c =>
        val p = r.getAs[Long](c)
        l1.get(p).foreach(s1 => assert(sup <= s1, s"pair support > item $p: $r"))
      }
    }
    val l2 = byLevel(2L).map(r =>
      (r.getAs[Long]("part_a"), r.getAs[Long]("part_b")) -> r.getAs[Long]("support")).toMap
    byLevel(3L).foreach { r =>
      val (a, b, c) = (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("part_c"))
      val sup = r.getAs[Long]("support")
      Seq((a, b), (a, c), (b, c)).foreach { p =>
        l2.get(p).foreach(s2 => assert(sup <= s2, s"triple support > pair $p: $r"))
      }
    }
  }

  test("q265 winnowing: coverage gap <= w, guarantee catches a shared 11-char substring") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // coverage: every window of w consecutive gram positions contains a
    // selection, so consecutive selected positions differ by <= w
    val docs = Tables.documents(spark, Sf0001).limit(200)
    val sel = TextAnalysis.winnowSelect(docs)
      .select($"doc_id", $"spos").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(sel.nonEmpty)
    sel.foreach { case (doc, ps) =>
      ps.zip(ps.tail).foreach { case (a, b) =>
        assert(b - a <= TextAnalysis.WinnowW, s"doc $doc coverage gap $a -> $b")
      }
    }
    // guarantee: two docs sharing ONE substring of length w + k - 1
    // (= 11) at different offsets, different elsewhere, MUST share a
    // fingerprint hash (Schleimer et al. theorem 1); the shared window
    // of k-grams forces a common selection
    val shared = "QWERTYUIOPA" // 11 chars, alphabet disjoint from fillers
    val fixture = Seq(
      (1L, "s", "aaaaaaaaaaaaaaaa" + shared + "bbbbbbbbbbbbbbbb"),
      (2L, "s", "cccccccccc" + shared + "dddddddddddddddddddddd"))
      .toDF("doc_id", "source", "text")
    val fsel = TextAnalysis.winnowSelect(fixture)
      .select($"doc_id", $"sh").as[(Long, String)].collect()
    val h1 = fsel.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fsel.filter(_._1 == 2L).map(_._2).toSet
    assert(h1.intersect(h2).nonEmpty,
      "winnowing guarantee violated: shared 11-char substring produced no shared fingerprint")
  }

  test("q263 L1 supports replay against a driver-side item-frequency count") {
    import spark.implicits._
    val itemFreq = Tables.lineitem(spark, Sf0001)
      .filter(col("l_orderkey").isNotNull && col("l_partkey").isNotNull)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .groupBy(col("l_partkey")).count()
      .as[(Long, Long)].collect().toMap
    Relational.closedItemsets(spark, Sf0001).filter(col("level") === 1)
      .collect().foreach { r =>
        assert(r.getAs[Long]("support") === itemFreq(r.getAs[Long]("part_a")), s"$r")
      }
  }
}
