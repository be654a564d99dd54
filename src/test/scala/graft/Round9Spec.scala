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

  test("q266 hyperplane twin: sound vs brute force, recall floor, threshold exact") {
    import graft.operators.Similarity
    val out = Similarity.hyperplaneLshMd5(spark, Sf0001).collect()
    assert(out.nonEmpty, "no pairs at sf0.001 — test degenerate")
    // driver-side brute force over the SAME persisted SQ8 codes: the
    // exact integer-cosine >= 2/5 pair set (ground truth)
    val codes = spark.read.parquet(Similarity.buildSq8(spark, Sf0001))
      .collect().map { r =>
        r.getAs[Long]("vec_id") ->
          r.getAs[Seq[Byte]]("qcodes").map(_.toLong).toArray
      }.sortBy(_._1)
    val truth = (for {
      i <- codes.indices.iterator; j <- (i + 1) until codes.length
      (ida, sa) = codes(i); (idb, sb) = codes(j)
      dot = sa.zip(sb).map { case (x, y) => x * y }.sum
      na = sa.map(x => x * x).sum; nb = sb.map(x => x * x).sum
      if dot > 0 && 25L * dot * dot >= 4L * na * nb
    } yield (ida, idb)).toSet
    val got = out.map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    // soundness: every emitted pair IS a true threshold pair (the
    // verification step is exact, so this must be an exact subset)
    assert(got.subsetOf(truth), s"false positives: ${got.diff(truth).take(5)}")
    // recall floor: 4-bit x 6-table banding catches >= 60% of true
    // pairs on this corpus (measured; collision prob for cos >= 0.4 is
    // 1-(1-(1-acos/pi)^4)^6 >= 0.63 at the threshold, higher above it)
    assert(got.size * 10 >= truth.size * 6,
      s"recall ${got.size}/${truth.size} below the 60% floor")
    // published witnesses satisfy the exact predicate
    out.foreach { r =>
      val (dot, na, nb) = (r.getAs[Long]("dot"),
        r.getAs[Long]("norm_a"), r.getAs[Long]("norm_b"))
      assert(dot > 0 && 25L * dot * dot >= 4L * na * nb, s"$r")
      val cos = r.getAs[Double]("cosine")
      assert(cos >= 0.4 - 1e-12 && cos <= 1.0 + 1e-12, s"$r")
    }
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
