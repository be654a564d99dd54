package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.Parity._
import graft.ml.ChampionModel

/** M1-M4 surfaced through the harness: the champion-classification path
  * run on the TPC-H-shaped standings (nation = team, order-year =
  * season).
  *
  * Oracle strategy: training itself isn't SQL, but everything around it
  * is — the standings, the lag/rolling feature derivation, the linear
  * form over the fitted coefficients, and the rank. The query exports
  * the ONE non-SQL artifact (5 fitted doubles) to
  * [[modelExportPath]]; the DuckDB oracle recomputes standings ->
  * features -> margin -> rank from the sfDir tables plus those
  * coefficients, so the entire serving path is verified independently.
  * LBFGS is deterministic, so the coefficients are stable per SF.
  */
object MlQueries {

  /** Cross-process export dir for the fitted coefficient row, suffixed
    * by the sfDir basename: Verify (sf0.01) and Bench (sf0.1) train on
    * different data and must not clobber each other's export before the
    * driver's DuckDB pass reads it. The oracle text pins the sf0.01
    * path — the driver's correctness contract runs at sf0.01. */
  def modelExportPath(dir: String): String =
    s"/tmp/graft_q37_model_${dir.stripSuffix("/").split('/').last}"

  /** Q37: train on all seasons but the last, predict the last season's
    * champion; emit per-team probability rank.
    *
    * Serving is a codegen'd Column expression over the fitted
    * coefficients (sigmoid of the linear form) — the production serving
    * pattern: `model.transform` drags the whole PipelineModel (and a
    * vector UDF) into every task closure, while the coefficient vector
    * is a handful of driver-side doubles. Training itself is the real
    * spark.ml path (M1); MlSpec exercises the full transform/evaluate
    * surface. */
  def championPrediction(spark: SparkSession, dir: String): DataFrame = {
    val standings = Relational.standings(spark, dir)
      .select(
        lit("tpch").as("league"),
        col("season").cast("string").as("season"),
        col("team"),
        col("points").cast("double").as("points"),
        col("goal_value").cast("double").as("goal_diff"),
        col("rank"),
        (col("rank") === 1).as("is_champion"))
    // standings output is cardinality-BOUNDED at teams x seasons (~175
    // rows at sf0.1, and still bounded at any corpus scale — league size
    // doesn't grow with fact volume), so everything downstream of the
    // standings aggregate runs single-task: the feature windows, every
    // LBFGS pass, and the serving rank become 1-task jobs instead of
    // 32-task jobs whose scheduling dominates at this cardinality
    val featured = ChampionModel.features(standings.coalesce(1)).cache()
    // one action: last season + distinct-season count (train is nonempty
    // iff featured spans >= 2 seasons)
    val stats = featured
      .agg(max(col("season")).as("mx"), countDistinct(col("season")).as("ns")).head()
    val lastSeason = stats.getString(0)
    def emptyResult() = {
      featured.unpersist()
      featured.select(col("season"), col("team"),
        lit(0L).as("pred_rank"), lit(0L).as("actual_champion")).limit(0)
    }
    // degenerate inputs: no featured rows at all, or featured rows in
    // only one season (no training data) — empty contract-schema frame,
    // not a fit crash
    if (lastSeason == null || stats.getLong(1) < 2) return emptyResult()
    val train = featured.filter(col("season") < lastSeason)
    val test = featured.filter(col("season") === lastSeason)
    val fitted = ChampionModel.pipeline().fit(train)
    // the cache existed for LBFGS's repeated passes over train; the
    // returned frame recomputes test once without it
    featured.unpersist()
    val lr = fitted.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    // export the fitted coefficients (the only non-SQL artifact) for the
    // DuckDB oracle; parquet holds the exact double bits
    locally {
      import spark.implicits._
      val coefs = Seq((lr.coefficients(0), lr.coefficients(1), lr.coefficients(2),
        lr.coefficients(3), lr.intercept))
        .toDF("w_prev_points", "w_prev_rank", "w_prev_goal_diff",
          "w_roll_points", "intercept")
      // staged publish: the fixed per-sf path is read by the oracle
      graft.Scratch.publishStaged(modelExportPath(dir))(stage =>
        coefs.coalesce(1).write.mode("overwrite").parquet(stage))
    }
    // features order matches ChampionModel.featureCols; VectorAssembler
    // with handleInvalid=keep maps null -> NaN, mirrored via coalesce
    val margin = ChampionModel.featureColumns.zipWithIndex.map { case (c, i) =>
      coalesce(col(c), lit(Double.NaN)) * lr.coefficients(i)
    }.reduce(_ + _) + lr.intercept
    // rank by the raw margin, not sigmoid(margin): sigmoid is strictly
    // monotone so the order is identical, but exp() ulp differences
    // between the JVM and the oracle engine's libm could flip
    // near-equal probabilities, and saturated probabilities (exp
    // underflow -> exactly 1.0) would collapse distinct margins into
    // ties — margins stay exact IEEE arithmetic on both engines
    val w = Window.partitionBy(col("league"), col("season")).orderBy(margin.desc, col("team"))
    test
      .withColumn("pred_rank", row_number().over(w).cast("bigint"))
      .select(col("season"), col("team"), col("pred_rank"),
        col("label").cast("bigint").as("actual_champion"))
      .orderBy(col("pred_rank"))
  }

  /** DuckDB twin of the full q37 serving path: standings (q2's oracle
    * CTE) -> lag/rolling features (ChampionModel.features) -> linear
    * form over the exported coefficients, summed in the same
    * left-to-right order as the Spark Column chain (IEEE double ops in
    * identical order are bit-deterministic) -> margin rank. league is
    * the constant 'tpch', so team-only window partitions match Spark's
    * (league, team) ones. */
  val championPredictionSql: String = {
    val model = modelExportPath("sf0.01")
    s"""WITH per AS (
      |  SELECT n_name AS team, CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS season,
      |    CAST(SUM(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS BIGINT) AS wins,
      |    CAST(SUM(CASE WHEN o_orderstatus='O' THEN 1 ELSE 0 END) AS BIGINT) AS draws,
      |    CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS goal_value
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  GROUP BY 1, 2),
      |st AS (
      |  SELECT CAST(season AS VARCHAR) AS season, team,
      |    CAST(wins*3 + draws AS DOUBLE) AS points,
      |    goal_value AS goal_diff,
      |    CAST(RANK() OVER (PARTITION BY season
      |      ORDER BY wins*3 + draws DESC, goal_value DESC, team) AS BIGINT) AS rank
      |  FROM per),
      |feat AS (
      |  SELECT season, team,
      |    LAG(points) OVER w AS prev_points,
      |    LAG(rank) OVER w AS prev_rank,
      |    LAG(goal_diff) OVER w AS prev_goal_diff,
      |    AVG(points) OVER (PARTITION BY team ORDER BY season
      |      ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS roll_points,
      |    CASE WHEN rank = 1 THEN 1.0 ELSE 0.0 END AS label
      |  FROM st WINDOW w AS (PARTITION BY team ORDER BY season)),
      |f AS (SELECT * FROM feat WHERE prev_points IS NOT NULL),
      |m AS (SELECT * FROM read_parquet('$model/*.parquet')),
      |scored AS (
      |  SELECT season, team, label,
      |    COALESCE(prev_points, 'NaN'::DOUBLE) * w_prev_points
      |      + COALESCE(CAST(prev_rank AS DOUBLE), 'NaN'::DOUBLE) * w_prev_rank
      |      + COALESCE(prev_goal_diff, 'NaN'::DOUBLE) * w_prev_goal_diff
      |      + COALESCE(roll_points, 'NaN'::DOUBLE) * w_roll_points
      |      + intercept AS margin
      |  FROM f CROSS JOIN m
      |  WHERE season = (SELECT MAX(season) FROM f))
      |SELECT season, team,
      |  CAST(ROW_NUMBER() OVER (ORDER BY margin DESC, team) AS BIGINT) AS pred_rank,
      |  CAST(label AS BIGINT) AS actual_champion
      |FROM scored ORDER BY pred_rank""".stripMargin
  }

  /** Q135: GROUPED CLOSED-FORM OLS — exact per-group least-squares fit
    * of line price on quantity via the normal equations, the closed-form
    * complement to q37's iterative LBFGS path (and the in-SQL
    * `regr_slope`/`regr_intercept` surface both BigQuery and DuckDB
    * expose; the reference plans "modeling" over aggregated facts at
    * README.md:132-136). All five moments (n, Σx, Σy, Σxy, Σx², Σy²) are
    * accumulated as exact integers — price in cents, quantity integral
    * in this data — so the fit is order-independent and bit-identical at
    * any parallelism; `regr_*` over doubles would be neither. slope,
    * intercept and R² each come from ONE division of exact integer
    * polynomials (dec6 discipline), guarded against degenerate groups
    * (zero x- or y-variance → NULL, mirrored CASE in the oracle).
    *
    * Magnitude headroom (ANSI mode: decimal overflow would THROW, not
    * corrupt): the widest term is num² ≈ 9e36 < 1e38 at sf0.1; the
    * tight (19,0) casts hold to ~sf1. A 100 TB deployment keeps the
    * same exact integer SUFFICIENT-STATISTICS aggregation (one map-side
    * combining shuffle of 6 numbers per group — the whole point of the
    * closed form at scale) and widens the final driver-side polynomial
    * arithmetic to 256-bit or double; only the last mile changes.
    *
    * Scale shape: one shuffle (the grouped moment aggregation, map-side
    * combined) + the bounded output sort. */
  def groupedOls(spark: SparkSession, dir: String): DataFrame = {
    // round-13: per-row moments in exact LONG (domain-bounded — y*y
    // <= ~1e18 cents² stays inside long; ANSI throws on violation),
    // cast to decimal per row for the row-count-scaled SUMS, which stay
    // decimal exactly as before (identical integer values => identical
    // sums; oracle unchanged). See kfoldOls for the full argument.
    val li = Tables.lineitem(spark, dir).select(
      col("l_returnflag"),
      col("l_quantity").cast("long").as("x"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long").as("y"))
    val s = li.groupBy(col("l_returnflag")).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(19,0)")).cast("decimal(19,0)").as("sx"),
      sum(col("y").cast("decimal(19,0)")).cast("decimal(19,0)").as("sy"),
      sum((col("x") * col("x")).cast("decimal(19,0)")).cast("decimal(19,0)").as("sxx"),
      sum((col("x") * col("y")).cast("decimal(19,0)")).cast("decimal(19,0)").as("sxy"),
      sum((col("y") * col("y")).cast("decimal(28,0)")).cast("decimal(28,0)").as("syy"))
    val nD = col("n").cast("decimal(10,0)")
    val num = (nD * col("sxy") - col("sx") * col("sy")).cast("decimal(19,0)")
    val dx = (nD * col("sxx") - col("sx") * col("sx")).cast("decimal(19,0)")
    val dy = (nD * col("syy") - col("sy") * col("sy")).cast("decimal(24,0)")
    val numI = col("sy") * col("sxx") - col("sx") * col("sxy")
    s.select(
        col("l_returnflag"), col("n"),
        dec6(col("sx") / col("n")).as("mean_qty"),
        dec2(col("sy") / (nD * 100)).as("mean_price"),
        when(dx =!= 0, dec6(num / dx)).as("slope_cents_per_unit"),
        when(dx =!= 0, dec6(numI / (dx * 100))).as("intercept_dollars"),
        when(dx =!= 0 && dy =!= 0, dec6((num * num) / (dx * dy))).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** DuckDB twin: the same sufficient statistics in HUGEINT (SUM(BIGINT)
    * widens to 128-bit, so no precision dance). Means, slope and
    * intercept use the sign-aware (2N+D)//(2D) integer micro-unit
    * half-up — exact, no float division anywhere. r2 alone keeps the
    * double quotient: its exact form needs 2·num²·10⁶ ≤ 1.7e38, and on
    * correlated groups (TPC-H price ∝ quantity) num ≈ n²·cov reaches
    * ~2e18 at sf0.1, so num²·2e6 ≈ 7e42 overflows HUGEINT; the
    * flip-risk is a ~1e-17-relative tie crossing, accepted and
    * documented (NOTES 'oracle rounding discipline'). */
  val groupedOlsSql: String =
    """WITH m AS (
      |  SELECT l_returnflag,
      |    CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |s AS (
      |  SELECT l_returnflag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |    SUM(x*x) AS sxx, SUM(x*y) AS sxy, SUM(y*y) AS syy
      |  FROM m GROUP BY 1),
      |d AS (
      |  SELECT l_returnflag, n, sx, sy,
      |    n*sxy - sx*sy AS num, n*sxx - sx*sx AS dx,
      |    n*syy - sy*sy AS dy, sy*sxx - sx*sxy AS numi
      |  FROM s)
      |SELECT l_returnflag, n,
      |  CAST((2 * sx * 1000000 + n) // (2 * n) AS DOUBLE) / 1000000 AS mean_qty,
      |  CAST((2 * sy + n) // (2 * n) AS DOUBLE) / 100 AS mean_price,
      |  CASE WHEN dx <> 0 THEN
      |    CAST(CASE WHEN num < 0
      |      THEN -((2 * (-num) * 1000000 + dx) // (2 * dx))
      |      ELSE (2 * num * 1000000 + dx) // (2 * dx) END AS DOUBLE) / 1000000
      |  END AS slope_cents_per_unit,
      |  CASE WHEN dx <> 0 THEN
      |    CAST(CASE WHEN numi < 0
      |      THEN -((2 * (-numi) * 10000 + dx) // (2 * dx))
      |      ELSE (2 * numi * 10000 + dx) // (2 * dx) END AS DOUBLE) / 1000000
      |  END AS intercept_dollars,
      |  CASE WHEN dx <> 0 AND dy <> 0 THEN
      |    CAST(CAST(ROUND(num * num / (dx * dy), 6)
      |      AS DECIMAL(38,6)) AS DOUBLE) END AS r2
      |FROM d ORDER BY l_returnflag""".stripMargin

  /** Q161: K-FOLD CROSS-VALIDATED OLS — the evaluation harness q135's
    * fit was missing: 5 deterministic folds (l_orderkey mod 5), and
    * for each fold an OLS of price-cents on quantity trained on the
    * OTHER four folds and scored on the held-out fold by mean absolute
    * error.
    *
    * Aggregate-once discipline: sufficient statistics are computed
    * per fold in ONE pass; each fold's TRAINING stats are the window
    * totals minus its own row — never five training passes. The
    * evaluation convention is pinned and realistic: coefficients are
    * "published" at micro-cent precision (round-half-away integer
    * micro-units, the q151 integer formula on BOTH engines — never a
    * scale-6 decimal re-rounded to integer, which double-rounds), and
    * residuals are exact BIGINT micro-cents from those published
    * coefficients, so MAE is one single-rounded division of exact
    * integers ((38,0)/(38,0) → scale-6 HALF_UP on the Spark side, the
    * (2N+D)//(2D) micro formula in DuckDB).
    *
    * Scale shape: two row-scale passes (fold stats; residual scoring
    * against the broadcast 5-row coefficient frame) — everything else
    * moves the 5-row frame. */
  def kfoldOls(spark: SparkSession, dir: String): DataFrame = {
    // round-13 (guide §4 / §2.3 narrower types): the per-ROW arithmetic
    // is exact LONG — the old decimal(18,0) x/y made every product a
    // BigDecimal multiply per row (decimal(18,0)² exceeds the compact-
    // long precision), twice over since the frame feeds two passes.
    // Values are DOMAIN-bounded, not row-count-bounded, so this is safe
    // at any corpus size: quantity is integral (both engines' oracles
    // already assume it — DuckDB casts it straight to BIGINT), cents
    // <= ~1e9, so x*y <= ~5e10 and y*1e6 <= ~1e15 sit far inside long
    // range (ANSI throws on a domain violation, never corrupts). The
    // SUMS stay DECIMAL — those grow with row count and would overflow
    // long at 100 TB (the round-12 note) — each product is cast to
    // decimal per row (compact, long-backed) before aggregation;
    // identical integer values, identical sums, oracle unchanged.
    val li = Tables.lineitem(spark, dir).select(
      expr("l_orderkey % 5").as("fold"),
      col("l_quantity").cast("long").as("x"),
      (col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long").as("y"))
    val perFold = li.groupBy(col("fold")).agg(
      count(lit(1)).as("n"),
      sum(col("x").cast("decimal(19,0)")).cast("decimal(19,0)").as("sx"),
      sum(col("y").cast("decimal(19,0)")).cast("decimal(19,0)").as("sy"),
      sum((col("x") * col("x")).cast("decimal(19,0)")).cast("decimal(19,0)").as("sxx"),
      sum((col("x") * col("y")).cast("decimal(28,0)")).cast("decimal(28,0)").as("sxy"))
    val all = Window.partitionBy()
    def tr(c: String) = (sum(col(c)).over(all) - col(c)).as(s"t_$c")
    val d38 = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val train = perFold
      .select(col("fold"), col("n"),
        (sum(col("n")).over(all) - col("n")).as("t_n"),
        tr("sx"), tr("sy"), tr("sxx"), tr("sxy"))
      .withColumn("num",
        d38(col("t_n")) * col("t_sxy") - d38(col("t_sx")) * col("t_sy"))
      .withColumn("dx",
        d38(col("t_n")) * col("t_sxx") - d38(col("t_sx")) * col("t_sx"))
      .withColumn("numi",
        d38(col("t_sy")) * col("t_sxx") - d38(col("t_sx")) * col("t_sxy"))
      // published micro-cent coefficients: round-half-away-from-zero,
      // computed as ONE integer division (never decimal re-rounding)
      .withColumn("b6", expr(
        """case when dx = 0 then null else
          |cast(sign(num) as decimal(2,0)) * ((2 * abs(num) * 1000000 + dx) div (2 * dx))
          |end""".stripMargin))
      .withColumn("a6", expr(
        """case when dx = 0 then null else
          |cast(sign(numi) as decimal(2,0)) * ((2 * abs(numi) * 1000000 + dx) div (2 * dx))
          |end""".stripMargin))
      .select(col("fold").as("tfold"), col("t_n"), col("b6"), col("a6"),
        // published coefficients re-read as exact longs for the row-scale
        // residual pass: micro-cent magnitudes are domain-bounded
        // (|a6| <= ~1e13, |b6*x| <= ~5e9, y*1e6 <= ~1e15), so the
        // decimal(38,0) -> long casts are exact and the per-row residual
        // is pure long arithmetic (ANSI throws on a domain violation)
        col("b6").cast("long").as("b6l"), col("a6").cast("long").as("a6l"))
    val scored = li.join(broadcast(train), col("fold") === col("tfold"))
      .select(col("fold"),
        abs(col("y") * 1000000L - col("a6l") - col("b6l") * col("x"))
          .as("abs_e"),
        col("t_n"), col("b6"), col("a6"))
    scored.groupBy(col("fold"), col("t_n"), col("b6"), col("a6"))
      .agg(count(lit(1)).as("n_test"),
        sum(col("abs_e").cast("decimal(38,0)")).as("sae"))
      .select(col("fold").cast("int").as("fold"),
        col("t_n").cast("bigint").as("n_train"),
        col("n_test").cast("bigint").as("n_test"),
        dec6(d38(col("b6")) / 1000000).as("slope_cents_per_unit"),
        dec6(d38(col("a6")) / 100000000).as("intercept_dollars"),
        dec6(d38(col("sae")) / d38(col("n_test") * 100000000L))
          .as("mae_dollars"))
      .orderBy(col("fold"))
  }

  val kfoldOlsSql: String =
    """WITH m AS (
      |  SELECT l_orderkey % 5 AS fold, CAST(l_quantity AS BIGINT) AS x,
      |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      |  FROM lineitem),
      |s AS (SELECT fold, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
      |        SUM(x*x) AS sxx, SUM(x*y) AS sxy
      |      FROM m GROUP BY 1),
      |t AS (SELECT fold, n,
      |        SUM(n) OVER () - n AS t_n, SUM(sx) OVER () - sx AS t_sx,
      |        SUM(sy) OVER () - sy AS t_sy, SUM(sxx) OVER () - sxx AS t_sxx,
      |        SUM(sxy) OVER () - sxy AS t_sxy
      |      FROM s),
      |coef AS (SELECT fold, t_n,
      |           t_n * t_sxy - t_sx * t_sy AS num,
      |           t_n * t_sxx - t_sx * t_sx AS dx,
      |           t_sy * t_sxx - t_sx * t_sxy AS numi
      |         FROM t),
      |pub AS (SELECT fold, t_n,
      |          CASE WHEN dx = 0 THEN NULL
      |               WHEN num < 0 THEN -((2 * (-num) * 1000000 + dx) // (2 * dx))
      |               ELSE (2 * num * 1000000 + dx) // (2 * dx) END AS b6,
      |          CASE WHEN dx = 0 THEN NULL
      |               WHEN numi < 0 THEN -((2 * (-numi) * 1000000 + dx) // (2 * dx))
      |               ELSE (2 * numi * 1000000 + dx) // (2 * dx) END AS a6
      |        FROM coef),
      |sc AS (SELECT m.fold, p.t_n, p.b6, p.a6,
      |         ABS(m.y * 1000000 - p.a6 - p.b6 * m.x) AS abs_e
      |       FROM m JOIN pub p ON m.fold = p.fold),
      |ev AS (SELECT fold, t_n, b6, a6, COUNT(*) AS n_test, SUM(abs_e) AS sae
      |       FROM sc GROUP BY 1, 2, 3, 4)
      |SELECT CAST(fold AS INT) AS fold, CAST(t_n AS BIGINT) AS n_train,
      |  CAST(n_test AS BIGINT) AS n_test,
      |  CAST(b6 AS DOUBLE) / 1000000 AS slope_cents_per_unit,
      |  CAST(CASE WHEN a6 < 0 THEN -((2 * (-a6) + 100) // 200)
      |            ELSE (2 * a6 + 100) // 200 END AS DOUBLE) / 1000000
      |    AS intercept_dollars,
      |  CAST((2 * sae + n_test * 100) // (2 * n_test * 100) AS DOUBLE) / 1000000
      |    AS mae_dollars
      |FROM ev ORDER BY fold""".stripMargin

  /** Cross-process export dir for q182's fitted coefficient row —
    * same per-SF convention (and staleness argument) as
    * [[modelExportPath]]. */
  def qualityModelExportPath(dir: String): String =
    s"/tmp/graft_q182_model_${dir.stripSuffix("/").split('/').last}"

  /** Assembler input order for q182 — serving and the DuckDB oracle
    * must evaluate the linear form in exactly this feature order. */
  val qualityFeatureColumns: Array[String] =
    Array("f_n", "f_mwl", "f_ttr", "f_srat")

  /** Q182: TRAINED DOCUMENT-QUALITY CLASSIFIER — the fastText/CCNet-
    * class model-based filter stage (the one standard LLM-curation pass
    * the rule batteries q112/q116 are not): train logistic regression
    * on per-document shape features against a deterministic weak-label
    * rule, export the fitted coefficients, score the WHOLE corpus with
    * the linear form, and report the per-source keep funnel.
    *
    * Features (fixed [[qualityFeatureColumns]] order, all exact-count
    * ratios both engines derive identically): token count, mean token
    * length, type-token ratio, stopword ratio. Weak label = the
    * q112 stopword-ratio AND type-token rules (nstop·20 ≥ n ∧ nd·2 ≥ n
    * — ~25% positive on this corpus); distilling a cheap rule into a
    * smooth scorer is exactly the production pattern (rules label a
    * seed set, the classifier generalizes the boundary).
    *
    * Oracle discipline = q37's: training is the ONE non-SQL step, so
    * the query exports the 5 fitted doubles to
    * [[qualityModelExportPath]] and the DuckDB oracle recomputes
    * features → margin (same left-to-right IEEE evaluation order —
    * bit-deterministic on both engines) → keep decision (margin > 0,
    * i.e. p > 0.5) → per-source counts, so the entire serving path is
    * independently verified. No sigmoid anywhere (q37's libm-ulp
    * argument).
    *
    * Scale shape: the TRAINING set is a deterministic bounded
    * subsample (sampleBucket < 50 here; a 100 TB deployment caps it at
    * ~10⁵-10⁶ docs — quality classifiers train on a seed sample
    * regardless of corpus size, exactly like fastText/CCNet), and
    * coalesce(1) on that bounded frame pins LBFGS's gradient-sum order
    * so the fitted coefficients are bit-reproducible at any
    * parallelism. SCORING is the distributed pass: one linear scan,
    * margin as a codegen'd Column over broadcast coefficient literals,
    * one map-side-combined aggregate keyed by the tiny source
    * dimension. Nothing shuffles the corpus payload. */
  def qualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{tokenCount, distinctTokens, stopwordCount}
    val d = Tables.documents(spark, dir).filter(col("text").isNotNull)
    val m = d.select(col("doc_id"), col("source"),
      tokenCount(col("text")).as("n"),
      (length(col("text")) - tokenCount(col("text")) + 1).as("tokchars"),
      size(distinctTokens(col("text"))).cast("bigint").as("nd"),
      stopwordCount(col("text")).as("nstop"))
    val featured = m
      .withColumn("f_n", col("n").cast("double"))
      .withColumn("f_mwl", col("tokchars").cast("double") / col("n").cast("double"))
      .withColumn("f_ttr", col("nd").cast("double") / col("n").cast("double"))
      .withColumn("f_srat", col("nstop").cast("double") / col("n").cast("double"))
      .withColumn("label",
        when(col("nstop") * 20 >= col("n") && col("nd") * 2 >= col("n"), 1.0)
          .otherwise(0.0))
    val train = featured
      .filter(Curation.sampleBucket(col("doc_id")) < 50).coalesce(1)
    val assembler = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(qualityFeatureColumns).setOutputCol("features")
    val lr = new org.apache.spark.ml.classification.LogisticRegression()
      .setMaxIter(25).setTol(1e-5).setRegParam(0.01).setLabelCol("label")
    val fitted = new org.apache.spark.ml.Pipeline()
      .setStages(Array(assembler, lr)).fit(train)
    val lrm = fitted.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    locally {
      import spark.implicits._
      val coefs = Seq((lrm.coefficients(0), lrm.coefficients(1),
        lrm.coefficients(2), lrm.coefficients(3), lrm.intercept))
        .toDF("w_n", "w_mwl", "w_ttr", "w_srat", "intercept")
      graft.Scratch.publishStaged(qualityModelExportPath(dir))(stage =>
        coefs.coalesce(1).write.mode("overwrite").parquet(stage))
    }
    // left-to-right fold — the oracle's SQL `+` chain is the same tree
    val margin = qualityFeatureColumns.zipWithIndex.map { case (c, i) =>
      col(c) * lit(lrm.coefficients(i))
    }.reduce(_ + _) + lit(lrm.intercept)
    featured
      .withColumn("keep", margin > 0)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("label").cast("bigint")).cast("bigint").as("n_label_pos"),
        sum(when(col("keep"), 1L).otherwise(0L)).cast("bigint").as("n_pred_keep"),
        sum(when(col("keep") === (col("label") === 1.0), 1L).otherwise(0L))
          .cast("bigint").as("n_agree"))
      .orderBy(col("source"))
  }

  /** DuckDB twin of the q182 serving path: identical feature counts
    * (the q112 oracle's expressions), the exported coefficients read
    * from parquet, the margin summed in the same left-to-right order
    * (IEEE doubles in identical order are bit-deterministic), the same
    * margin > 0 keep rule. */
  val qualityClassifierSql: String = {
    val stopList = graft.functions.TextFunctions.EnglishStopwords
      .map(s => s"'$s'").mkString(", ")
    val model = qualityModelExportPath("sf0.01")
    s"""WITH d AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS t, len(text) AS L
       |  FROM documents WHERE text IS NOT NULL),
       |m AS (
       |  SELECT doc_id, source, len(t) AS n, L - len(t) + 1 AS tokchars,
       |    len(list_distinct(t)) AS nd,
       |    len(list_filter(t, x -> x IN ($stopList))) AS nstop
       |  FROM d),
       |c AS (SELECT * FROM read_parquet('$model/*.parquet')),
       |s AS (
       |  SELECT source,
       |    CASE WHEN nstop*20 >= n AND nd*2 >= n THEN 1 ELSE 0 END AS lab,
       |    CAST(n AS DOUBLE) * w_n
       |      + CAST(tokchars AS DOUBLE) / CAST(n AS DOUBLE) * w_mwl
       |      + CAST(nd AS DOUBLE) / CAST(n AS DOUBLE) * w_ttr
       |      + CAST(nstop AS DOUBLE) / CAST(n AS DOUBLE) * w_srat
       |      + intercept AS margin
       |  FROM m CROSS JOIN c)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(lab) AS BIGINT) AS n_label_pos,
       |  CAST(SUM(CASE WHEN margin > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_keep,
       |  CAST(SUM(CASE WHEN (margin > 0) = (lab = 1) THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_agree
       |FROM s GROUP BY source ORDER BY source""".stripMargin
  }

  /** Q235: LEAVE-ONE-OUT TARGET ENCODING — the leakage-free
    * categorical feature transform: each order's market-segment
    * feature is the segment's mean order value EXCLUDING the order
    * itself, enc_i = (S_seg − y_i) / (n_seg − 1). Plain target
    * encoding leaks the row's own label into its feature (the classic
    * silent overfit q161's k-fold machinery exists to catch); LOO is
    * the exact closed-form fix — the k-fold limit at k = n, for free,
    * because the sufficient statistics subtract per row.
    *
    * Exactness: S and n are exact BIGINT cents/counts; each encoding
    * is ONE integer micro-unit division of (S − y_i) by (n − 1);
    * singleton segments emit NULL (no leakage-free estimate exists),
    * never a 0/0.
    *
    * Scale shape: one map-side-combined aggregation to the
    * |segments| frame, broadcast back onto the fact scan — the
    * encoding is a per-row expression, no window, no second shuffle
    * beyond the output sort. The 100 TB story is unchanged for any
    * bounded-cardinality categorical; a high-cardinality category
    * flips the broadcast to a shuffle join and nothing else moves. */
  def looTargetEncoding(spark: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("decimal(18,0)").cast("long")
    val j = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_mktsegment").as("segment"),
        cents.as("y_cents"))
    val stats = j.groupBy(col("segment"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("y_cents")).cast("long").as("s"))
    j.join(broadcast(stats), Seq("segment"))
      .select(col("o_orderkey"), col("segment"), col("y_cents"),
        when(col("n") > 1,
          expr("""(2 * CAST(s - y_cents AS DECIMAL(38,0)) * 1000000 + (n - 1))
                 div (2 * (n - 1))""").cast("double") / 1000000)
          .as("loo_mean_cents"))
      .orderBy(col("o_orderkey"))
  }

  val looTargetEncodingSql: String =
    """WITH j AS (
      |  SELECT o_orderkey, c_mktsegment AS segment,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y_cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |st AS (SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(y_cents) AS BIGINT) AS s
      |       FROM j GROUP BY 1)
      |SELECT o_orderkey, segment, y_cents,
      |  CASE WHEN n > 1 THEN
      |    CAST((2 * CAST(s - y_cents AS HUGEINT) * 1000000 + (n - 1))
      |      // (2 * (n - 1)) AS DOUBLE) / 1000000 END AS loo_mean_cents
      |FROM j JOIN st USING (segment)
      |ORDER BY o_orderkey""".stripMargin

  /** Q238: CONFORMAL PREDICTION INTERVAL — the distribution-free
    * uncertainty quantification modern ML serving wraps around ANY
    * point forecast: per nation, fit q135/q221's exact-OLS trend on
    * the 1996–97 monthly revenue, then take the ⌈(n+1)·0.9⌉-th
    * smallest ABSOLUTE RESIDUAL as the 90% conformal radius and emit
    * the next-month forecast with its interval. No normality
    * assumption, no libm — the radius is an order statistic, which is
    * exactly why this operator fits the engine's exactness discipline
    * where a Gaussian interval (needs Φ⁻¹) cannot. (Honest scoping:
    * this is the in-sample "naive conformal" variant — a production
    * split-conformal would calibrate on held-out months; same
    * machinery, different slice.)
    *
    * Exactness: slope/intercept are single IEEE divisions of exact
    * DECIMAL(38) sufficient statistics (q199 rule, q221's closed
    * form); each residual is a fixed dag on those doubles; the radius
    * rank ⌈9(n+1)/10⌉ is exact integer arithmetic and the pick an
    * order statistic (NULL when the rank exceeds n — fewer than 9
    * months cannot support a 90% naive-conformal interval);
    * forecast/lo/hi are three more pinned IEEE ops.
    *
    * Scale shape: q213/q219's chain — row-scale monthly rollup, ONE
    * nation-keyed aggregation carrying both the exact stats and the
    * calendar-bounded ≤24-struct array, residuals + order statistic
    * in-expression. Three exchanges, no joins. */
  def conformalInterval(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Tables.orders(spark, dir)
      .join(broadcast(Tables.customer(spark, dir)
          .select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("n_name").as("nation"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(18,0)").cast("long")).cast("long").as("y"))
      .withColumn("k", row_number().over(
        Window.partitionBy(col("nation")).orderBy(col("m"))).cast("long"))
    val s = monthly.groupBy(col("nation"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("k")).cast("long").as("sk"),
        sum(col("k") * col("k")).cast("long").as("skk"),
        sum(col("y").cast("decimal(38,0)")).cast("decimal(38,0)").as("sy"),
        sum((col("k") * col("y")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").as("sky"),
        sort_array(collect_list(struct(col("k"), col("y")))).as("xs"))
      .withColumn("den", (col("n").cast("decimal(38,0)") * col("skk")
        - col("sk").cast("decimal(38,0)") * col("sk")).cast("decimal(38,0)"))
      .filter(col("den") > 0)
      .withColumn("slope",
        (col("n").cast("decimal(38,0)") * col("sky")
          - col("sk").cast("decimal(38,0)") * col("sy")).cast("double")
          / col("den").cast("double"))
      .withColumn("icept",
        (col("sy") * col("skk") - col("sk").cast("decimal(38,0)") * col("sky"))
          .cast("double") / col("den").cast("double"))
    val withQ = s
      .withColumn("absr", expr(
        """sort_array(transform(xs, e ->
          |  abs(CAST(e.y AS DOUBLE) - (icept + slope * CAST(e.k AS DOUBLE)))))"""
          .stripMargin))
      .withColumn("qrank", expr("(9 * (n + 1) + 9) div 10"))
      .withColumn("radius",
        when(col("qrank") <= col("n"),
          element_at(col("absr"), col("qrank").cast("int"))))
      .withColumn("yhat",
        col("icept") + col("slope") * (col("n") + lit(1L)).cast("double"))
    withQ.select(col("nation"), col("n").as("n_months"),
        col("slope").as("slope_cents_per_month"),
        col("icept").as("intercept_cents"),
        col("radius").as("conformal_radius"),
        col("yhat").as("yhat_next_cents"),
        (col("yhat") - col("radius")).as("pi_lo"),
        (col("yhat") + col("radius")).as("pi_hi"))
      .orderBy(col("nation"))
  }

  val conformalIntervalSql: String =
    """WITH monthly AS (
      |  SELECT n_name AS nation,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS y
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE year(o_orderdate) IN (1996, 1997)
      |  GROUP BY 1, 2),
      |idx AS (SELECT nation, y,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY nation ORDER BY m) AS BIGINT)
      |      AS k
      |  FROM monthly),
      |s AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(k) AS HUGEINT) AS sk, CAST(SUM(k*k) AS HUGEINT) AS skk,
      |    CAST(SUM(y) AS HUGEINT) AS sy,
      |    CAST(SUM(CAST(k AS HUGEINT) * y) AS HUGEINT) AS sky
      |  FROM idx GROUP BY 1),
      |fit AS (SELECT nation, n, sk, skk, sy, sky,
      |    n * skk - sk * sk AS den,
      |    CAST(n * sky - sk * sy AS DOUBLE)
      |      / CAST(n * skk - sk * sk AS DOUBLE) AS slope,
      |    CAST(sy * skk - sk * sky AS DOUBLE)
      |      / CAST(n * skk - sk * sk AS DOUBLE) AS icept
      |  FROM s WHERE n * skk - sk * sk > 0),
      |resid AS (SELECT f.nation, f.n, f.slope, f.icept,
      |    ABS(CAST(i.y AS DOUBLE) - (f.icept + f.slope * CAST(i.k AS DOUBLE)))
      |      AS ar
      |  FROM fit f JOIN idx i ON f.nation = i.nation),
      |ranked AS (SELECT nation, n, slope, icept, ar,
      |    ROW_NUMBER() OVER (PARTITION BY nation ORDER BY ar) AS rn
      |  FROM resid),
      |pick AS (SELECT nation, n, slope, icept,
      |    MAX(CASE WHEN rn = (9 * (n + 1) + 9) // 10 THEN ar END) AS radius
      |  FROM ranked GROUP BY 1, 2, 3, 4)
      |SELECT nation, n AS n_months, slope AS slope_cents_per_month,
      |  icept AS intercept_cents, radius AS conformal_radius,
      |  icept + slope * CAST(n + 1 AS DOUBLE) AS yhat_next_cents,
      |  (icept + slope * CAST(n + 1 AS DOUBLE)) - radius AS pi_lo,
      |  (icept + slope * CAST(n + 1 AS DOUBLE)) + radius AS pi_hi
      |FROM pick ORDER BY nation""".stripMargin

  /** Q252: DECISION STUMP (exact-Gini CART split) — the one-node
    * interpretable classifier between q112's hand-written rule gate
    * and q182's trained logistic model: find the single threshold on
    * document length that best separates lang='en' by Gini impurity
    * reduction. The depth-1 special case of tree training, and the
    * building block a distributed GBDT layer evaluates millions of
    * times — worth having as a first-class exact operator.
    *
    * Exactness: candidate thresholds are the n_chars VALUE HISTOGRAM
    * (bounded domain, the q212 argument); per split the weighted Gini
    * is ONE exact rational — 2·(e_L(n_L−e_L)n_R + e_R(n_R−e_R)n_L)
    * over N·n_L·n_R (binary Gini g = 2e(n−e)/n²) — accumulated in
    * DECIMAL(38)/HUGEINT and compared at half-up micro-units (the
    * q240 div discipline), ties to the smallest threshold. Headroom:
    * the micro numerator is ~N³·10⁶ — inside DECIMAL(38) to N ≈ 10⁹
    * docs; beyond that, drop to coarser units (documented, not
    * silent).
    *
    * Scale shape: ONE row-scale map-side-combined histogram
    * aggregation; cumulative sums + scoring run on the bounded
    * value frame (single-task by design, the q240 pattern); the
    * argmin is a 1-row TakeOrdered. */
  def decisionStump(spark: SparkSession, dir: String): DataFrame = {
    val hist = Tables.documents(spark, dir)
      .groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("long").as("e"))
    val wV = Window.partitionBy().orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    hist
      .withColumn("nl", sum(col("n")).over(wV))
      .withColumn("el", sum(col("e")).over(wV))
      .withColumn("nt", sum(col("n")).over(wAll))
      .withColumn("et", sum(col("e")).over(wAll))
      .filter(col("nl") < col("nt"))
      .withColumn("gini6", expr(
        """(2 * (2 * (CAST(el AS DECIMAL(38,0)) * (nl - el) * (nt - nl)
          |           + CAST(et - el AS DECIMAL(38,0)) * ((nt - nl) - (et - el)) * nl))
          |     * 1000000
          |   + CAST(nt AS DECIMAL(38,0)) * nl * (nt - nl))
          |div (2 * CAST(nt AS DECIMAL(38,0)) * nl * (nt - nl))""".stripMargin))
      .withColumn("root6", expr(
        """(2 * (2 * CAST(et AS DECIMAL(38,0)) * (nt - et)) * 1000000
          |   + CAST(nt AS DECIMAL(38,0)) * nt)
          |div (2 * CAST(nt AS DECIMAL(38,0)) * nt)""".stripMargin))
      .orderBy(col("gini6"), col("v"))
      .limit(1)
      .select(col("v").as("split_value"),
        col("nl").cast("bigint").as("n_left"),
        col("el").cast("bigint").as("en_left"),
        (col("nt") - col("nl")).cast("bigint").as("n_right"),
        (col("et") - col("el")).cast("bigint").as("en_right"),
        col("nt").cast("bigint").as("n_total"),
        col("et").cast("bigint").as("n_en"),
        (col("gini6").cast("double") / 1000000).as("gini_split"),
        (col("root6").cast("double") / 1000000).as("gini_root"))
  }

  val decisionStumpSql: String =
    """WITH hist AS (
      |  SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS e
      |  FROM documents GROUP BY 1),
      |cum AS (
      |  SELECT v, n, e,
      |    CAST(SUM(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS nl,
      |    CAST(SUM(e) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT) AS el,
      |    CAST(SUM(n) OVER () AS BIGINT) AS nt,
      |    CAST(SUM(e) OVER () AS BIGINT) AS et
      |  FROM hist),
      |scored AS (
      |  SELECT *,
      |    (2 * (2 * (CAST(el AS HUGEINT) * (nl - el) * (nt - nl)
      |               + CAST(et - el AS HUGEINT) * ((nt - nl) - (et - el)) * nl))
      |         * 1000000
      |       + CAST(nt AS HUGEINT) * nl * (nt - nl))
      |    // (2 * CAST(nt AS HUGEINT) * nl * (nt - nl)) AS gini6,
      |    (2 * (2 * CAST(et AS HUGEINT) * (nt - et)) * 1000000
      |       + CAST(nt AS HUGEINT) * nt)
      |    // (2 * CAST(nt AS HUGEINT) * nt) AS root6
      |  FROM cum WHERE nl < nt)
      |SELECT v AS split_value, nl AS n_left, el AS en_left,
      |  CAST(nt - nl AS BIGINT) AS n_right, CAST(et - el AS BIGINT) AS en_right,
      |  nt AS n_total, et AS n_en,
      |  CAST(gini6 AS DOUBLE) / 1000000 AS gini_split,
      |  CAST(root6 AS DOUBLE) / 1000000 AS gini_root
      |FROM scored ORDER BY gini6, v LIMIT 1""".stripMargin

  def queries: Map[String, Relational.Q] = Map(
    "q252_decision_stump" -> (decisionStump _),
    "q238_conformal_interval" -> (conformalInterval _),
    "q235_loo_target_encoding" -> (looTargetEncoding _),
    "q37_ml_champion" -> (championPrediction _),
    "q135_grouped_ols" -> (groupedOls _),
    "q161_kfold_ols" -> (kfoldOls _),
    "q182_quality_classifier" -> (qualityClassifier _),
  )

  def oracles: Map[String, String] = Map(
    "q252_decision_stump" -> decisionStumpSql,
    "q238_conformal_interval" -> conformalIntervalSql,
    "q235_loo_target_encoding" -> looTargetEncodingSql,
    "q37_ml_champion" -> championPredictionSql,
    "q135_grouped_ols" -> groupedOlsSql,
    "q161_kfold_ols" -> kfoldOlsSql,
    "q182_quality_classifier" -> qualityClassifierSql,
  )
}
