package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
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
        case _ => Seq(p)
      }
      self ++ p.children.flatMap(collectAll) ++
        p.subqueries.flatMap(collectAll)
    }

    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan
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
