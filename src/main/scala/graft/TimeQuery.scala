package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (not part of the driver contract): run ONE registered query
  * through the noop sink and print a per-Spark-job time breakdown — the
  * "where do the seconds go" view the optimization loop needs when a
  * query is many small jobs (lake commits, iterative rounds, in-query
  * requires) rather than one big one. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.TimeQuery q_sql_dedup [runs]"
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new TrieMap[Int, (Long, String)]
    val jobs = new java.util.concurrent.CopyOnWriteArrayList[(Int, Double, String)]
    val stageTasks = new TrieMap[Int, (Int, Long)] // stage -> (tasks, ms sum)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        starts.put(e.jobId, (System.nanoTime(), {
          val p = Option(e.properties)
          p.flatMap(x => Option(x.getProperty("spark.job.description")))
            .orElse(p.flatMap(x => Option(x.getProperty("callSite.short"))))
            .getOrElse(e.stageInfos.lastOption.map(_.name).getOrElse("?"))
            .take(110)
        }))
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, site) =>
          jobs.add((e.jobId, (System.nanoTime() - t0) / 1e9, site))
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        stageTasks.put(i.stageId, (i.numTasks,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)))
      }
    })
    spark.read.parquet(s"$sfDir/region.parquet").count()
    (1 to runs).foreach { r =>
      jobs.clear(); stageTasks.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      import scala.jdk.CollectionConverters._
      val js = jobs.asScala.toSeq.sortBy(_._1)
      val jsum = js.map(_._2).sum
      println(f"== $name run $r: total $total%.2f s, ${js.size} jobs " +
        f"(sum $jsum%.2f s, gap ${total - jsum}%.2f s driver-side)")
      js.sortBy(-_._2).take(18).foreach { case (id, sec, site) =>
        println(f"  job $id%4d  $sec%6.3f s  $site")
      }
    }
    spark.stop()
  }
}
