package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graft.GraftExpressions

/** SQL-surface entry point: register every test table as a temp view and the
  * native functions, so `spark.sql("SELECT cosine_sim(...) FROM embeddings
  * JOIN documents ...")` works out of the box — the full ad-hoc query
  * surface a user of the reference's MySQL tables would expect
  * (README.md:539–547 manual SQL verification path).
  */
object Catalog {
  def registerAll(spark: SparkSession, sfDir: String): Unit = {
    Tables.names.foreach { t =>
      // events goes through its ns-timestamp normalizing loader, not a raw
      // parquet read (which Spark 4 rejects for TIMESTAMP(NANOS))
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      df.createOrReplaceTempView(t)
    }
    GraftExpressions.register(spark)
  }
}
