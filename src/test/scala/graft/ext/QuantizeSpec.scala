package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ByteType

import graft.SparkSpec
import graft.sources.Tables

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf)

  test("codes are genuine int8: tinyint element type, values in [-127, 127], max code = ±127") {
    val q = Quantize.quantize(emb)
    val elem = q.schema("codes").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType
    assert(elem == ByteType)
    // symmetric quantization: for every NON-DEGENERATE vector (un-floored
    // scale) the largest |component| maps to exactly ±127; zero/denormal
    // vectors legitimately produce all-zero codes (scaleOf's floor contract)
    val stats = q
      .join(emb.select(col("vec_id"),
        array_max(transform(col("embedding"), x => abs(x))).as("amax")), "vec_id")
      .filter(col("amax") > 1e-20)
      .select(
        min(array_min(col("codes"))).as("lo"),
        max(array_max(col("codes"))).as("hi"),
        min(array_max(transform(col("codes"), c => abs(c)))).as("minmax"))
      .collect().head
    assert(stats.getAs[Byte]("lo") >= -127 && stats.getAs[Byte]("hi") <= 127)
    assert(stats.getAs[Byte]("minmax") == 127)
  }

  test("dequantization error is bounded by half a step PER ROW, with the stored float scale") {
    // per-row bound (err/scale <= 0.5 for that row's own scale) — a global
    // bound could not catch a quantizer using someone else's scale; the
    // stored float scale is what a reader would dequantize with
    val q = Quantize.quantize(emb)
      .join(emb, "vec_id")
    val worst = q.select(max(
      array_max(zip_with(col("embedding"), col("codes"),
        (x, c) => abs(x - c.cast("double") * col("scale"))))
        / col("scale")).as("worst_ratio"))
      .collect().head.getDouble(0)
    // + float-rounding slack: scale is stored as float, embedding is float
    assert(worst <= 0.5 + 1e-3, s"worst err/scale=$worst")
  }

  test("zero vectors quantize to all-zero codes without dividing by zero") {
    val z = Seq((0L, Seq.fill(8)(0f))).toDF("vec_id", "embedding")
    val codes = Quantize.quantize(z).select("codes")
      .collect().head.getSeq[Byte](0)
    assert(codes.forall(_ == 0))
  }

  test("q_quant_recall: int8 search preserves recall@5 >= 0.8 vs float ground truth") {
    val r = Quantize.qQuantRecall(spark, sf).collect().head
    assert(r.getAs[Long]("n_pairs") == 50)
    val recall = r.getAs[Double]("recall")
    assert(recall >= 0.8, s"recall=$recall")
  }
}
