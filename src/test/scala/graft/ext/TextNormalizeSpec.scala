package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions.nfc_normalize

/** The native NFC kernel + the strip/collapse/compose pipeline. */
class TextNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm1(s: String): String =
    Seq(s).toDF("t").select(TextNormalize.normalized(col("t"))).head().getString(0)

  test("NFC kernel composes decomposed sequences (e + U+0301 -> U+00E9)") {
    val out = Seq("Café", "Café", "plain")
      .toDF("t").select(nfc_normalize(col("t"))).as[String].collect()
    assert(out(0) == "Café")
    assert(out(0) == out(1), "decomposed and composed must normalize equal")
    assert(out(2) == "plain")
  }

  test("NFC kernel is codegen-resident (expression, not UDF)") {
    val plan = Seq("x").toDF("t").select(nfc_normalize(col("t")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      plan)
  }

  test("normalized(): strips markup, collapses whitespace, trims, composes") {
    assert(norm1("<p>a  b</p>\n\tc") == "a b c")
    assert(norm1("  x <br/> y  ") == "x y")
    assert(norm1("Café <i>ok</i>") == "Café ok")
  }

  test("normalization is idempotent") {
    val once = norm1("<b>Café</b>   x")
    assert(norm1(once) == once)
  }

  test("null text stays null (no crash, no empty-string coercion)") {
    val out = Seq[(java.lang.Long, String)]((1L, null))
      .toDF("id", "t").select(TextNormalize.normalized(col("t"))).head()
    assert(out.isNullAt(0))
  }
}
