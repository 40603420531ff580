package graft
import org.apache.spark.sql.SparkSession
/** Dev tool: dump formatted plans for the scale audit (not part of the
  * driver contract). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.01"
    // --exec: run the query first and dump the AQE-final plan (stage reuse,
    // runtime join switches, codegen collapse only appear post-execution)
    val exec = args.contains("--exec")
    args.filterNot(_ == "--exec").foreach { name =>
      println(s"==== $name ====")
      val df = SparkEntry.queries(name)(spark, sf)
      if (exec) {
        df.collect()
        println(df.queryExecution.executedPlan.toString)
      } else
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
