package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** [EXT] Pipeline-integrity operators: declarative data-quality
  * constraint checking (the Deequ/expectations shape) and snapshot
  * change-data capture — the audit stages a warehouse load or a
  * training-corpus refresh runs before promoting data.
  */
object Quality {

  /** Q79: constraint suite — each rule is (name, n_checked,
    * n_violations), evaluated in one scan per source table plus one
    * key join for referential integrity; results union into the
    * familiar expectations report. A clean corpus reports 0
    * violations on every rule — the point is the operator shape: at
    * 100 TB each rule is a map-side conditional count (no shuffle
    * beyond the final 5-row union) and the FK probe joins against
    * the distinct key set, so adding rules adds scans, never
    * quadratic work. */
  def constraintSuite(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val customer = Tables.customer(spark, dir)

    val pkUnique = orders.agg(
      lit("orders_pk_unique").as("rule"),
      count(lit(1)).as("n_checked"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))

    val statusDomain = orders.agg(
      lit("orders_status_domain").as("rule"),
      count(lit(1)).as("n_checked"),
      sum(when(!col("o_orderstatus").isInCollection(Seq("O", "F", "P")), 1L)
        .otherwise(0L)).cast("bigint").as("n_violations"))

    val qtyRange = lineitem.agg(
      lit("lineitem_qty_range").as("rule"),
      count(lit(1)).as("n_checked"),
      sum(when(col("l_quantity") <= 0 || col("l_quantity") > 50, 1L)
        .otherwise(0L)).cast("bigint").as("n_violations"))

    val fk = lineitem
      .join(orders.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        lit("lineitem_fk_orders").as("rule"),
        count(lit(1)).as("n_checked"),
        sum(when(col("o_orderkey").isNull, 1L).otherwise(0L))
          .cast("bigint").as("n_violations"))

    val nonNull = customer.agg(
      lit("customer_acctbal_nonnull").as("rule"),
      count(lit(1)).as("n_checked"),
      sum(when(col("c_acctbal").isNull, 1L).otherwise(0L))
        .cast("bigint").as("n_violations"))

    pkUnique.unionByName(statusDomain).unionByName(qtyRange)
      .unionByName(fk).unionByName(nonNull)
      .orderBy(col("rule"))
  }

  val constraintSuiteSql: String =
    """SELECT * FROM (
      |  SELECT 'orders_pk_unique' AS rule, COUNT(*) AS n_checked,
      |    COUNT(*) - COUNT(DISTINCT o_orderkey) AS n_violations FROM orders
      |  UNION ALL
      |  SELECT 'orders_status_domain', COUNT(*),
      |    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) FROM orders
      |  UNION ALL
      |  SELECT 'lineitem_qty_range', COUNT(*),
      |    CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT) FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem_fk_orders', COUNT(*),
      |    CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
      |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      |    ON l.l_orderkey = o.o_orderkey
      |  UNION ALL
      |  SELECT 'customer_acctbal_nonnull', COUNT(*),
      |    CAST(SUM(CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END) AS BIGINT) FROM customer)
      |ORDER BY rule""".stripMargin

  /** Q80: snapshot diff (CDC audit) — classify every key across two
    * corpus snapshots as added / removed / changed / unchanged via a
    * full outer join on the key with null-safe content-hash compare.
    * The snapshots are deterministic derivations of the documents
    * table (old = doc_id % 3 != 0; new = doc_id % 5 != 0 with the
    * % 7 == 0 slice rewritten), so the oracle can classify
    * independently per row without any join. Presence travels as an
    * explicit marker column: a NULL content hash means null text,
    * not absence, and conflating the two would misclassify null-text
    * docs as added/removed.
    *
    * Scale: one key-partitioned full outer join (SMJ) over (key,
    * 16-byte hash, marker) — content never shuffles; the classify-
    * and-count is map-side after the join. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val vOld = d.filter(col("doc_id") % 3 =!= 0)
      .select(col("doc_id"), md5(col("text")).as("h_old"), lit(1).as("in_old"))
    val vNew = d.filter(col("doc_id") % 5 =!= 0)
      .withColumn("text2",
        when(col("doc_id") % 7 === 0, upper(col("text"))).otherwise(col("text")))
      .select(col("doc_id"), md5(col("text2")).as("h_new"), lit(1).as("in_new"))
    vOld.join(vNew, Seq("doc_id"), "full_outer")
      .withColumn("change_type",
        when(col("in_old").isNull, "added")
          .when(col("in_new").isNull, "removed")
          .when(!(col("h_old") <=> col("h_new")), "changed")
          .otherwise("unchanged"))
      .groupBy(col("change_type"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("change_type"))
  }

  val snapshotDiffSql: String =
    """SELECT change_type, COUNT(*) AS n_docs FROM (
      |  SELECT CASE
      |    WHEN doc_id % 3 = 0 AND doc_id % 5 != 0 THEN 'added'
      |    WHEN doc_id % 3 != 0 AND doc_id % 5 = 0 THEN 'removed'
      |    WHEN doc_id % 3 != 0 AND doc_id % 5 != 0
      |         AND doc_id % 7 = 0 AND upper(text) IS DISTINCT FROM text THEN 'changed'
      |    WHEN doc_id % 3 != 0 AND doc_id % 5 != 0 THEN 'unchanged'
      |    END AS change_type
      |  FROM documents)
      |WHERE change_type IS NOT NULL
      |GROUP BY change_type ORDER BY change_type""".stripMargin

  def queries: Map[String, Relational.Q] = Map(
    "q79_constraint_suite" -> (constraintSuite _),
    "q80_snapshot_diff" -> (snapshotDiff _),
  )

  def oracles: Map[String, String] = Map(
    "q79_constraint_suite" -> constraintSuiteSql,
    "q80_snapshot_diff" -> snapshotDiffSql,
  )
}
