package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", PAMI 2011 — the FAISS IVF-PQ design): an
  * embedding is split into `m` subvectors of `dsub = dim/m` dims, each
  * quantized independently against a `ksub`-entry per-subspace codebook.
  * A vector becomes `m` small codes (1 byte each at ksub ≤ 256) — 32×
  * smaller than 64 float dims — and approximate scores are computed from
  * codes alone via per-query lookup tables, never touching the original
  * vectors. At 100 TB that is the difference between scanning a 3 TB code
  * table and scanning the full vector store.
  *
  * All three kernels carry the flattened codebook matrix
  * (`[subspace j][code c][dim d]`, length m·ksub·dsub) as a single
  * reference object, so plans stay O(1) in ksub — same addReferenceObj
  * discipline as [[CentroidArgmax]].
  */

/** pq_encode: array<float>(dim) → array<int>(m) of per-subspace code ids —
  * argmin-L2 over the subspace codebook, computed as
  * argmax(dot − ½‖c‖²); ties go to the SMALLER code. Wrong-length input
  * throws (a truncated embedding is a data bug, not a quantizable row). */
case class PqEncode(child: Expression, codebooks: Array[Float],
                    m: Int, ksub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(m > 0 && ksub > 0 && codebooks.length % (m * ksub) == 0,
    s"codebook length ${codebooks.length} not divisible by m*ksub=${m * ksub}")
  private val dsub = codebooks.length / (m * ksub)
  private val dim = m * dsub
  /** halfNorms(j*ksub + c) = ½‖codebook[j][c]‖² */
  @transient private lazy val halfNorms: Array[Double] = {
    val out = new Array[Double](m * ksub)
    var jc = 0
    while (jc < m * ksub) {
      var s = 0.0; var d = 0; val base = jc * dsub
      while (d < dsub) {
        val x = codebooks(base + d).toDouble; s += x * x; d += 1
      }
      out(jc) = 0.5 * s; jc += 1
    }
    out
  }

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) throw new IllegalArgumentException(
      s"pq dim=$dim but embedding has length ${a.numElements()}")
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = Double.NegativeInfinity; var bestC = 0; var c = 0
      while (c < ksub) {
        var dot = 0.0; val base = (j * ksub + c) * dsub; var d = 0
        while (d < dsub) {
          dot += codebooks(base + d).toDouble * a.getFloat(j * dsub + d)
          d += 1
        }
        val score = dot - halfNorms(j * ksub + c)
        if (score > best) { best = score; bestC = c }
        c += 1
      }
      codes(j) = bestC; j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("codebooks", codebooks, "float[]")
      val hn = ctx.addReferenceObj("halfNorms", halfNorms, "double[]")
      val codes = ctx.freshName("codes"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val d = ctx.freshName("d")
      val dot = ctx.freshName("dot"); val score = ctx.freshName("score")
      val best = ctx.freshName("best"); val bestC = ctx.freshName("bestC")
      val base = ctx.freshName("base")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "pq dim=$dim but embedding has length " + $a.numElements());
         |}
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  double $best = Double.NEGATIVE_INFINITY;
         |  int $bestC = 0;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    double $dot = 0.0;
         |    int $base = ($j * $ksub + $c) * $dsub;
         |    for (int $d = 0; $d < $dsub; $d++) {
         |      $dot += ((double) $cb[$base + $d]) * $a.getFloat($j * $dsub + $d);
         |    }
         |    double $score = $dot - $hn[$j * $ksub + $c];
         |    if ($score > $best) { $best = $score; $bestC = $c; }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_lut: array<float>(dim) query → array<float>(m·ksub) of
  * `lut[j·ksub + c] = dot(q_j, codebook[j][c])` — the per-query ADC lookup
  * table, computed ONCE per query map-side so scoring a candidate is m
  * table lookups instead of a dim-length dot product. */
case class PqLut(child: Expression, codebooks: Array[Float],
                 m: Int, ksub: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(m > 0 && ksub > 0 && codebooks.length % (m * ksub) == 0,
    s"codebook length ${codebooks.length} not divisible by m*ksub=${m * ksub}")
  private val dsub = codebooks.length / (m * ksub)
  private val dim = m * dsub

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) throw new IllegalArgumentException(
      s"pq dim=$dim but query has length ${a.numElements()}")
    val lut = new Array[Float](m * ksub)
    var jc = 0
    while (jc < m * ksub) {
      val j = jc / ksub
      var dot = 0.0; val base = jc * dsub; var d = 0
      while (d < dsub) {
        dot += codebooks(base + d).toDouble * a.getFloat(j * dsub + d)
        d += 1
      }
      lut(jc) = dot.toFloat; jc += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("codebooks", codebooks, "float[]")
      val lut = ctx.freshName("lut"); val jc = ctx.freshName("jc")
      val j = ctx.freshName("j"); val d = ctx.freshName("d")
      val dot = ctx.freshName("dot"); val base = ctx.freshName("base")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "pq dim=$dim but query has length " + $a.numElements());
         |}
         |float[] $lut = new float[${m * ksub}];
         |for (int $jc = 0; $jc < ${m * ksub}; $jc++) {
         |  int $j = $jc / $ksub;
         |  double $dot = 0.0;
         |  int $base = $jc * $dsub;
         |  for (int $d = 0; $d < $dsub; $d++) {
         |    $dot += ((double) $cb[$base + $d]) * $a.getFloat($j * $dsub + $d);
         |  }
         |  $lut[$jc] = (float) $dot;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** pq_adc(codes, lut): asymmetric-distance score of a coded candidate
  * against a query's lookup table — `Σ_j lut[j·ksub + codes[j]]` ≈
  * dot(query, candidate). O(m) per pair; the hot loop of PQ serving.
  * Mismatched table size (lut length ≠ codes length · ksub) yields NULL —
  * codes from one codebook scored against another's table is a wiring bug
  * that must surface. */
case class PqAdc(left: Expression, right: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {
  require(ksub > 0, s"ksub must be positive: $ksub")
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(IntegerType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (lut.numElements() != m * ksub) return null
    var s = 0.0; var j = 0
    while (j < m) { s += lut.getFloat(j * ksub + codes.getInt(j)); j += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m"); val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |int $m = $codes.numElements();
         |if ($lut.numElements() != $m * $ksub) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    $s += $lut.getFloat($j * $ksub + $codes.getInt($j));
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
