package graft.sources

import graft.SparkSpec

class CatalogSpec extends SparkSpec {

  test("ad-hoc SQL over registered tables + native functions") {
    Catalog.registerAll(spark, sf)
    val row = spark.sql(
      """SELECT COUNT(*) AS n,
        |  ROUND(AVG(cosine_sim(embedding, embedding)), 4) AS self_cos,
        |  COUNT(DISTINCT rolling_hash(CAST(vec_id AS STRING))) AS n_fp,
        |  COUNT(DISTINCT simhash64(array(CAST(vec_id AS STRING)))) AS n_sh
        |FROM embeddings""".stripMargin).collect().head
    assert(row.getAs[Long]("n") == 500L)
    assert(row.getAs[Double]("self_cos") == 1.0)
    assert(row.getAs[Long]("n_fp") == 500L)
    assert(row.getAs[Long]("n_sh") > 1L) // registered + computing
    // events view went through the ns-normalizing loader
    val ev = spark.sql("SELECT MIN(ts) FROM events").collect().head
    assert(!ev.isNullAt(0))
  }
}
