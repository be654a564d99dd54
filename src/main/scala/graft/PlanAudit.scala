package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Dev tool: per-query physical-plan diagnostics for the 100 TB design
  * review — shuffle count, join strategies, codegen spans, scan pushdown.
  * Usage: sbt "runMain graft.PlanAudit [sfDir]". Not part of the driver
  * contract; used each round to catch plans that won't survive scale-up.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def collectAll(p: SparkPlan): Seq[SparkPlan] = {
      val self = p match {
        case a: AdaptiveSparkPlanExec => collectAll(a.executedPlan)
        // AQE wraps materialized stages in QueryStageExec whose inner
        // plan hangs off a field, not children — without unwrapping,
        // codegen spans and stage-local operators are invisible
        case q: QueryStageExec => q +: collectAll(q.plan)
        case _ => Seq(p)
      }
      self ++ p.children.flatMap(collectAll) ++
        p.subqueries.flatMap(collectAll)
    }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // materialize THIS DataFrame's own plan instance: under AQE,
        // join picks and codegen insertion happen per stage during
        // execution, and a write would execute a cloned QueryExecution,
        // leaving this instance's adaptive plan in its un-executed
        // initial state (codegen spans invisible). collect() is safe —
        // PlanAudit runs at sf0.001 where every result is tiny.
        df.collect()
        val plan = df.queryExecution.executedPlan
        val nodes = collectAll(plan)
        val names = nodes.map(_.nodeName)
        val shuffles = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
        val joins = names.filter(_.contains("Join")).groupBy(identity)
          .map { case (k, v) => s"$k x${v.size}" }.mkString(", ")
        val codegen = names.count(_.startsWith("WholeStageCodegen"))
        val scans = nodes.filter(_.nodeName.contains("Scan"))
          .map(_.toString.linesIterator.next().take(120)).distinct
        println(f"$name%-24s shuffles=$shuffles%-3d codegen=$codegen%-3d joins=[$joins]")
        scans.foreach(s => println(s"    scan: $s"))
      } catch {
        case e: Throwable => println(s"$name AUDIT FAILED: ${e.getMessage.take(100)}")
      }
    }
    spark.stop()
  }
}
