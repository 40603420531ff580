package graft

import org.apache.spark.sql.SparkSession

/** Plan-inspection tool: prints a query's STATIC physical plan (and the
  * optimizer's size estimates) for any registered query over any sf dir
  * — the `.explain`-and-iterate loop the scale work runs on, runnable as
  * `sbt "runMain graft.Explain q_triangles /tmp/graft_scale_x10"`.
  * Static only: the plan is built (which executes eager checkpoints in
  * the lineage) but the query itself never runs. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, dir)
    println(s"==== $name @ $dir: optimized plan with stats ====")
    println(df.queryExecution.optimizedPlan.treeString(
      verbose = false, addSuffix = true))
    println(s"==== $name @ $dir: static physical plan ====")
    println(df.queryExecution.sparkPlan.treeString)
    spark.stop()
  }
}
