package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Parity._

/** Sink/source operators (SURVEY §2.1): partitioned+clustered parquet
  * layout with partition-pruned readback (S5/S7, README.md:86-87), and
  * the SQL entry surface (S8 CTAS-style views, README.md:253).
  */
object Storage {

  /** Q47: partitioned write + pruned read. Writes orders partitioned by
    * year with within-partition clustering on custkey (the BigQuery
    * partition+cluster layout, README.md:86-87), reads back ONE
    * partition, and aggregates. The readback scan must show
    * PartitionFilters (pruning) — asserted by StorageSpec; values are
    * oracle-checked against the unpartitioned source. */
  /** Per-process scratch path, removed on JVM exit: a fixed name would
    * let a concurrent Verify/Bench JVM overwrite partitions mid-read,
    * and a pid-suffixed path without cleanup would accumulate a full
    * orders copy per driver round. */
  private[graft] lazy val scratchDir: String = {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_orders_partitioned_" +
      ProcessHandle.current().pid()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import scala.jdk.CollectionConverters._
      val p = java.nio.file.Paths.get(path)
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
          .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }))
    path
  }

  def partitionedPrune(spark: SparkSession, dir: String): DataFrame = {
    val out = scratchDir
    Tables.orders(spark, dir)
      .withColumn("order_year", year(col("o_orderdate")))
      .repartition(col("order_year"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite")
      .partitionBy("order_year")
      .parquet(out)
    spark.read.parquet(out)
      .filter(col("order_year") === 1995)
      .groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n_orders"),
        dec2(sum(money(col("o_totalprice")))).as("total"))
      .orderBy(col("o_orderstatus"))
  }

  val partitionedPruneSql: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS total
      |FROM orders
      |WHERE EXTRACT(year FROM o_orderdate) = 1995
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Q48: the SQL entry surface — temp views + a multi-join analytic
    * statement run wholly through spark.sql (the engine's BigQuery-SQL
    * equivalent, README.md:251-266). Same text runs on DuckDB. */
  val revenueByNationSql: String =
    """SELECT n_name, COUNT(DISTINCT c_custkey) AS n_customers,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS DOUBLE) AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderstatus <> 'P'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  def sqlSurface(spark: SparkSession, dir: String): DataFrame = {
    Tables.orders(spark, dir).createOrReplaceTempView("orders")
    Tables.customer(spark, dir).createOrReplaceTempView("customer")
    Tables.nation(spark, dir).createOrReplaceTempView("nation")
    spark.sql(revenueByNationSql)
  }

  def queries: Map[String, Relational.Q] = Map(
    "q47_partitioned_prune" -> (partitionedPrune _),
    "q48_sql_surface" -> (sqlSurface _),
  )

  def oracles: Map[String, String] = Map(
    "q47_partitioned_prune" -> partitionedPruneSql,
    "q48_sql_surface" -> revenueByNationSql,
  )
}
