package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The metadata views maintenance tooling reads: file inventory with
  * delete-vector debt, and the stats sidecar as a queryable table. */
class FilesMetaSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  test("filesMeta: one row per file, sizes real, delete debt per file") {
    val dir = tmpDir("fm-files")
    ops.commit(spark.range(0, 1000).toDF("id").repartition(4), dir)
    val clean = ops.filesMeta(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(clean.length == 4)
    assert(clean.forall(r => backend.size(r._1) == r._2 && r._2 > 0))
    assert(clean.forall(_._3 == 0L))
    // delete a slice: debt shows up against exactly the holding files
    ops.deleteWhere(spark, dir, col("id") % 5 === 0)
    val after = ops.filesMeta(spark, dir)
      .as[(String, Long, Long)].collect()
    assert(after.map(_._3).sum == 200L)
    assert(after.forall(_._3 > 0L)) // repartition spreads multiples of 5
    // a pinned pre-delete version reports zero debt
    assert(ops.filesMeta(spark, dir, Some(1))
      .as[(String, Long, Long)].collect().forall(_._3 == 0L))
  }

  test("fileStatsMeta: bounds decoded and typed, bloom coverage flagged") {
    val dir = tmpDir("fm-stats")
    val df = spark.range(0, 1000)
      .select(col("id"), concat(lit("k"), col("id")).as("name"))
    val v = ops.commitClustered(df, dir, zCols = Seq("id"),
      statCols = Seq("id", "name"), numFiles = 2)
    ops.writeBlooms(spark, dir, v, Seq("id"), mBits = 1 << 12)
    val rows = ops.fileStatsMeta(spark, dir)
      .as[(String, String, String, Option[String], Option[String], Boolean)]
      .collect().toSeq
    // 2 files x 2 columns of range stats
    assert(rows.count(_._3 != "bloom") == 4)
    val idRows = rows.filter(r => r._2 == "id" && r._3 == "num")
    assert(idRows.size == 2 && idRows.forall(_._6), "id rows carry bloom")
    assert(idRows.flatMap(_._4).map(BigDecimal(_)).min == BigDecimal(0))
    assert(idRows.flatMap(_._5).map(BigDecimal(_)).max == BigDecimal(999))
    val nameRows = rows.filter(_._2 == "name")
    assert(nameRows.forall(r => r._3 == "str" && !r._6))
    assert(nameRows.flatMap(_._4).forall(_.startsWith("k")), "str decoded")
    // bloom-only coverage still surfaces as a row
    val dir2 = tmpDir("fm-bloomonly")
    val v2 = ops.commit(df.repartition(2), dir2)
    ops.writeBlooms(spark, dir2, v2, Seq("name"), mBits = 1 << 12)
    val only = ops.fileStatsMeta(spark, dir2).collect()
    assert(only.length == 2 &&
      only.forall(r => r.getString(2) == "bloom" && r.getBoolean(5)))
  }
}
