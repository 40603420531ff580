package graft.sinks

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions._

/** Z-order layout: kernel semantics, row preservation, and the point of it
  * all — parquet row-group stats actually skipping data for 2-D box
  * predicates that a single-column sort layout cannot prune. */
class LayoutSpec extends SparkSpec {

  /** Rows a min/max-pruning reader must decode for a box predicate:
    * the summed row count of row groups whose footer stats intersect
    * every dimension's [lo, hi]. Computed straight from the parquet
    * footers — the canonical row-group-skipping semantics — so the
    * number is a pure function of the files on disk: no scan metrics,
    * no listener bus, no load-dependent flake (the 2x-margin assertion
    * here failed under full-suite load twice before this). */
  private def footerSurvivingRows(path: String,
                                  box: Map[String, (Int, Int)]): Long = {
    val conf = spark.sessionState.newHadoopConf()
    new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map { f =>
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new HPath(f.getAbsolutePath), conf))
        try {
          reader.getFooter.getBlocks.asScala.map { b =>
            val overlaps = box.forall { case (dim, (lo, hi)) =>
              b.getColumns.asScala
                .find(_.getPath.toDotString == dim)
                .forall { cc =>
                  val st = cc.getStatistics
                  // missing/empty stats -> must read (superset guarantee)
                  st == null || !st.hasNonNullValue || {
                    val mn = st.genericGetMin.asInstanceOf[Number].intValue()
                    val mx = st.genericGetMax.asInstanceOf[Number].intValue()
                    mx >= lo && mn <= hi
                  }
                }
            }
            if (overlaps) b.getRowCount else 0L
          }.sum
        } finally reader.close()
      }.sum
  }

  private lazy val points = {
    // 120k rows, two INDEPENDENT uniform dims in [0, 1000) — the layout
    // has to earn locality on both at once, not ride a correlation
    spark.range(120000)
      .select(col("id"),
        pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("int").as("x"),
        pmod(xxhash64(col("id"), lit(2)), lit(1000)).cast("int").as("y"))
  }

  test("rank_bucket: boundary counts, NULL and NaN contracts") {
    val bs = Array(10.0, 20.0, 30.0)
    val df = Seq[Option[Double]](Some(5.0), Some(10.0), Some(15.0),
      Some(30.0), Some(35.0), None, Some(Double.NaN))
      .zipWithIndex
      .map { case (v, i) => (i, v) }
    val out = spark.createDataFrame(df).toDF("i", "v")
      .select(col("i"), rank_bucket(col("v"), bs).as("b"))
      .orderBy(col("i")).collect()
      .map(r => if (r.isNullAt(1)) null else r.getInt(1))
    assert(out.toSeq === Seq(0, 1, 1, 3, 3, null, 0))
  }

  test("interleave_bits: known codes, null element, width guard") {
    val df = spark.sql("SELECT array(3, 1) a, array(CAST(NULL AS INT), 3) b")
    val r = df.select(
      interleave_bits(col("a"), 2).as("ab"),
      interleave_bits(col("b"), 2).as("nb")).collect().head
    // x=3,y=1, dim0-msb per group: bits 0b1011 = 11; null dim -> bucket 0
    assert(r.getLong(0) === 11L)
    assert(r.getLong(1) === 5L)
    val wide = df.select(interleave_bits(col("a"), 32))
    val e = intercept[Exception](wide.collect())
    assert(e.getMessage != null)
  }

  test("z-order write preserves the row set exactly") {
    val dir = tmpDir("zorder-rows")
    Layout.writeZordered(points, Seq("x", "y"), dir, numFiles = 8,
      bitsPerDim = 6)
    val back = spark.read.parquet(dir)
    assert(back.count() === 120000L)
    // content, not just count: symmetric difference is empty
    assert(back.exceptAll(points).count() === 0L)
    assert(points.exceptAll(back).count() === 0L)
  }

  test("z-order layout skips row groups a linear sort cannot") {
    val zDir = tmpDir("zorder-z")
    val linDir = tmpDir("zorder-lin")
    val rndDir = tmpDir("zorder-rnd")
    Layout.writeZordered(points, Seq("x", "y"), zDir, numFiles = 48,
      bitsPerDim = 6)
    points.repartitionByRange(48, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linDir)
    points.repartition(48).write.mode("overwrite").parquet(rndDir)

    // asymmetric box: wide on x (40%) so the linear x-sort's pruning is
    // mediocre, narrow on y (10%) where only z-order has locality
    val box = Map("x" -> (300, 699), "y" -> (500, 599))
    val yOnly = Map("y" -> (500, 599))
    val total = 120000L

    // random layout: every file spans the full range -> nothing prunes
    assert(footerSurvivingRows(rndDir, box) > (total * 0.9).toLong)

    // 2-D box: linear prunes to the x-slice (~40%); z-order prunes BOTH
    // dims (~4% of cells, a few files after block-alignment blowup).
    // Margin 1.6x: the 6-bit layout measures ~2x here, but quantile
    // boundaries (approxQuantile merge order) wobble run to run — assert
    // the minimum the layout construction actually guarantees.
    val linBox = footerSurvivingRows(linDir, box)
    val zBox = footerSurvivingRows(zDir, box)
    assert(linBox < (total * 0.55).toLong, s"linear box read $linBox")
    assert(zBox * 5 < linBox * 3, s"z-order $zBox vs linear $linBox")

    // y-only filter: x-sorted layout reads everything; z-order keeps
    // partial locality on y too
    val linY = footerSurvivingRows(linDir, yOnly)
    val zY = footerSurvivingRows(zDir, yOnly)
    assert(linY > (total * 0.9).toLong, s"linear y-only read $linY")
    assert(zY * 5 < linY * 3, s"z-order y-only $zY vs linear $linY")
  }
}
