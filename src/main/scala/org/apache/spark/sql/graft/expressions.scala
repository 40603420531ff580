package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the similarity / fingerprint surface
  * (SURVEY.md §2 north-star ops). A Scala UDF here would box two Float
  * arrays per row; at 100 TB × k-NN these are the hot loops, so they are
  * `Expression`s with `doGenCode` — they stay inside whole-stage codegen and
  * read packed `ArrayData`/`UTF8String` without materializing JVM objects.
  *
  * Lives under `org.apache.spark.sql` because `AbstractDataType` /
  * `ExpressionUtils` are `private[sql]`; [[graft.functions.VectorFunctions]]
  * is the public facade.
  */

/** Cosine similarity of two float vectors, accumulated in double.
  * Zero-norm inputs yield 0.0 (not NaN) so downstream top-k ordering is
  * total. Mismatched lengths yield NULL — a truncated embedding is a data
  * bug that must surface, not silently score its prefix (and DuckDB's
  * list_cosine_similarity oracle errors on mismatch, so prefix-scoring
  * would also diverge from the oracle). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      // double locals: a float×float product would round to float before
      // widening, losing ~1e-8 relative — enough to flip a 6-decimal
      // rounding boundary against an oracle replaying in double
      val x = a.getFloat(i).toDouble; val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double x = $a.getFloat($i); double y = $b.getFloat($i);
         |    $dot += x * y; $na += x * x; $nb += y * y;
         |  }
         |  ${ev.value} = ($na == 0.0 || $nb == 0.0)
         |    ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two float vectors (double accumulation) — the kernel for
  * pre-normalized embeddings, where cosine reduces to a dot. Mismatched
  * lengths yield NULL (see [[CosineSimilarity]]). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i); i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $a.getFloat($i)) * $b.getFloat($i);
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Document fingerprinting: polynomial rolling hash of the UTF-8 bytes
  * (Rabin–Karp), order-sensitive — reordered documents fingerprint
  * differently, unlike a bag-of-words hash. Base 257 (prime > byte range);
  * overflow wraps mod 2^64, identical in eval and codegen paths; the sign
  * bit is cleared so fingerprints compare as positives. */
case class RollingHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = h * GraftExpressions.RollingBase + (bytes(i) & 0xffL)
      i += 1
    }
    h & GraftExpressions.SignMask
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h"); val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $s.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${GraftExpressions.RollingBase}L + ($bytes[$i] & 0xffL);
         |}
         |${ev.value} = $h & ${GraftExpressions.SignMask}L;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash of a token array in ONE row-level kernel: per-token
  * xxhash64 (bit-identical to Spark's `xxhash64(token)` — same
  * `XXH64.hashUTF8String(s, 42)`) feeding a 64-bit majority vote, packed.
  * Replaces the explode → 64 conditional-sum aggregates → repack pipeline:
  * documents are one row each, so there is nothing to aggregate ACROSS
  * rows — the whole computation is map-side, zero shuffle, and the plan is
  * one expression instead of a 64-column aggregate. Null tokens are
  * skipped. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L; var j = 0
    while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All LSH table buckets of a float vector in ONE kernel: `planes` is the
  * flattened (nTables·bitsPerTable) × dim hyperplane matrix, carried as a
  * plain reference object — NOT as literal-array child expressions. The
  * composed form (nTables·bitsPerTable `dot_product(emb, typedlit(...))`
  * nodes wrapped in when/shiftleft) builds an expression tree whose
  * analysis + optimization + codegen cost ~2 s per query at 64 planes,
  * dwarfing execution; this node is O(1) to plan and one fused loop to run.
  *
  * A vector whose length ≠ dim throws (with both lengths in the message)
  * rather than silently landing in bucket 0 — see
  * [[graft.ext.Similarity.bucketExpr]]'s scale rationale. */
case class HyperplaneBuckets(child: Expression, planes: Array[Float],
                             nTables: Int, bitsPerTable: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(planes.length % (nTables * bitsPerTable) == 0,
    s"planes length ${planes.length} not divisible by ${nTables * bitsPerTable}")
  private val dim = planes.length / (nTables * bitsPerTable)
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_buckets"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != dim) throw new IllegalArgumentException(
      s"LSH hyperplane dim=$dim but embedding has length $n")
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L; var j = 0
      while (j < bitsPerTable) {
        val base = (t * bitsPerTable + j) * dim
        var dot = 0.0; var i = 0
        while (i < dim) {
          dot += planes(base + i).toDouble * a.getFloat(i); i += 1
        }
        if (dot > 0.0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket; t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ps = ctx.addReferenceObj("planes", planes, "float[]")
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val j = ctx.freshName("j")
      val i = ctx.freshName("i"); val dot = ctx.freshName("dot")
      val bucket = ctx.freshName("bucket"); val base = ctx.freshName("base")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim) {
         |  throw new IllegalArgumentException(
         |    "LSH hyperplane dim=$dim but embedding has length " + $n);
         |}
         |long[] $out = new long[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bitsPerTable; $j++) {
         |    int $base = ($t * $bitsPerTable + $j) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $dot += ((double) $ps[$base + $i]) * $a.getFloat($i);
         |    }
         |    if ($dot > 0.0) $bucket |= (1L << $j);
         |  }
         |  $out[$t] = $bucket;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Nearest-centroid assignment in ONE kernel: `centroids` is the flattened
  * nList × dim centroid matrix and `ids` the parallel list-id array (ids may
  * have gaps — Lloyd iterations can empty a list), both carried as plain
  * reference objects. The composed form (nList separate
  * `cosine_sim(emb, typedlit(centroid))` struct nodes under array_max) is the
  * same plan-overhead trap [[HyperplaneBuckets]] kills: at the nList a 100 TB
  * corpus needs (10³–10⁵ lists ≈ √n) those literal nodes cost seconds of
  * analysis/codegen per query. This node is O(1) to plan regardless of nList.
  *
  * Returns the id of the max-cosine centroid; ties go to the LARGER id
  * (ids are sorted ascending — same tie rule as `array_max` over
  * struct(sim, id), which the composed form used). Zero-norm inputs or
  * centroids score 0.0. An embedding whose length ≠ dim throws. */
case class CentroidArgmax(child: Expression, centroids: Array[Float],
                          ids: Array[Int])
    extends UnaryExpression with ExpectsInputTypes {
  require(ids.length > 0 && centroids.length % ids.length == 0,
    s"centroid matrix length ${centroids.length} not divisible by nList ${ids.length}")
  // the documented id tie rules resolve by scan index — they only mean
  // what they say if ids ascend with the scan
  require(GraftExpressions.strictlyAscending(ids),
    "centroid ids must be strictly ascending (sorted, distinct) " +
      "so index-order tie-breaking matches the id tie rule")
  private val nList = ids.length
  private val dim = centroids.length / nList
  @transient private lazy val cNorms: Array[Double] =
    GraftExpressions.centroidNorms(centroids, nList, dim)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "centroid_argmax"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) throw new IllegalArgumentException(
      s"centroid dim=$dim but embedding has length ${a.numElements()}")
    var en = 0.0; var i = 0
    while (i < dim) { val x = a.getFloat(i).toDouble; en += x * x; i += 1 }
    en = math.sqrt(en)
    var best = Double.NegativeInfinity; var bestIdx = 0; var c = 0
    while (c < nList) {
      var dot = 0.0; val base = c * dim; i = 0
      while (i < dim) {
        dot += centroids(base + i).toDouble * a.getFloat(i); i += 1
      }
      val sim = if (cNorms(c) == 0.0 || en == 0.0) 0.0 else dot / (cNorms(c) * en)
      if (sim >= best) { best = sim; bestIdx = c }
      c += 1
    }
    ids(bestIdx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs = ctx.addReferenceObj("centroids", centroids, "float[]")
      val ns = ctx.addReferenceObj("cNorms", cNorms, "double[]")
      val is = ctx.addReferenceObj("ids", ids, "int[]")
      val en = ctx.freshName("en"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim"); val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx"); val base = ctx.freshName("base")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "centroid dim=$dim but embedding has length " + $a.numElements());
         |}
         |double $en = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  double x = $a.getFloat($i); $en += x * x;
         |}
         |$en = java.lang.Math.sqrt($en);
         |double $best = Double.NEGATIVE_INFINITY;
         |int $bestIdx = 0;
         |for (int $c = 0; $c < $nList; $c++) {
         |  double $dot = 0.0;
         |  int $base = $c * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += ((double) $cs[$base + $i]) * $a.getFloat($i);
         |  }
         |  double $sim = ($ns[$c] == 0.0 || $en == 0.0)
         |    ? 0.0 : $dot / ($ns[$c] * $en);
         |  if ($sim >= $best) { $best = $sim; $bestIdx = $c; }
         |}
         |${ev.value} = $is[$bestIdx];
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-N nearest centroids in ONE kernel (the IVF probe step): same matrix
  * and contract as [[CentroidArgmax]], returning
  * array<struct<csim double, centroid_id int>> ordered by cosine DESC, ties
  * to the SMALLER id — the exact row_number(csim desc, id asc) contract the
  * composed explode-over-literals probe used, so nProbe selection happens
  * inside the kernel and the per-query ranking window (a shuffle) disappears
  * from the plan entirely. */
case class CentroidTopN(child: Expression, centroids: Array[Float],
                        ids: Array[Int], topN: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(ids.length > 0 && centroids.length % ids.length == 0,
    s"centroid matrix length ${centroids.length} not divisible by nList ${ids.length}")
  require(GraftExpressions.strictlyAscending(ids),
    "centroid ids must be strictly ascending (sorted, distinct) " +
      "so index-order tie-breaking matches the id tie rule")
  require(topN > 0, s"topN must be positive, got $topN")
  private val nList = ids.length
  private val dim = centroids.length / nList
  private val m = math.min(topN, nList)
  @transient private lazy val cNorms: Array[Double] =
    GraftExpressions.centroidNorms(centroids, nList, dim)

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("csim", DoubleType, nullable = false),
    StructField("centroid_id", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "centroid_topn"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) throw new IllegalArgumentException(
      s"centroid dim=$dim but embedding has length ${a.numElements()}")
    var en = 0.0; var i = 0
    while (i < dim) { val x = a.getFloat(i).toDouble; en += x * x; i += 1 }
    en = math.sqrt(en)
    val sims = new Array[Double](m); val idx = new Array[Int](m)
    var filled = 0; var c = 0
    while (c < nList) {
      var dot = 0.0; val base = c * dim; i = 0
      while (i < dim) {
        dot += centroids(base + i).toDouble * a.getFloat(i); i += 1
      }
      val sim = if (cNorms(c) == 0.0 || en == 0.0) 0.0 else dot / (cNorms(c) * en)
      // Insertion keeps sims desc; strict > means equal sims keep scan
      // (= ascending id) order, i.e. ties to the smaller id.
      var pos = filled
      while (pos > 0 && sim > sims(pos - 1)) pos -= 1
      if (pos < m) {
        val last = math.min(filled, m - 1)
        var k = last
        while (k > pos) { sims(k) = sims(k - 1); idx(k) = idx(k - 1); k -= 1 }
        sims(pos) = sim; idx(pos) = c
        if (filled < m) filled += 1
      }
      c += 1
    }
    val rows = new Array[Any](filled)
    var k = 0
    while (k < filled) {
      rows(k) = org.apache.spark.sql.catalyst.InternalRow(sims(k), ids(idx(k)))
      k += 1
    }
    new GenericArrayData(rows)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cs = ctx.addReferenceObj("centroids", centroids, "float[]")
      val ns = ctx.addReferenceObj("cNorms", cNorms, "double[]")
      val is = ctx.addReferenceObj("ids", ids, "int[]")
      val en = ctx.freshName("en"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val dot = ctx.freshName("dot")
      val sim = ctx.freshName("sim"); val base = ctx.freshName("base")
      val sims = ctx.freshName("sims"); val idx = ctx.freshName("idx")
      val filled = ctx.freshName("filled"); val pos = ctx.freshName("pos")
      val k = ctx.freshName("k"); val last = ctx.freshName("last")
      val rows = ctx.freshName("rows")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "centroid dim=$dim but embedding has length " + $a.numElements());
         |}
         |double $en = 0.0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  double x = $a.getFloat($i); $en += x * x;
         |}
         |$en = java.lang.Math.sqrt($en);
         |double[] $sims = new double[$m];
         |int[] $idx = new int[$m];
         |int $filled = 0;
         |for (int $c = 0; $c < $nList; $c++) {
         |  double $dot = 0.0;
         |  int $base = $c * $dim;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $dot += ((double) $cs[$base + $i]) * $a.getFloat($i);
         |  }
         |  double $sim = ($ns[$c] == 0.0 || $en == 0.0)
         |    ? 0.0 : $dot / ($ns[$c] * $en);
         |  int $pos = $filled;
         |  while ($pos > 0 && $sim > $sims[$pos - 1]) $pos--;
         |  if ($pos < $m) {
         |    int $last = java.lang.Math.min($filled, $m - 1);
         |    for (int $k = $last; $k > $pos; $k--) {
         |      $sims[$k] = $sims[$k - 1]; $idx[$k] = $idx[$k - 1];
         |    }
         |    $sims[$pos] = $sim; $idx[$pos] = $c;
         |    if ($filled < $m) $filled++;
         |  }
         |}
         |Object[] $rows = new Object[$filled];
         |for (int $k = 0; $k < $filled; $k++) {
         |  $rows[$k] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $sims[$k], $is[$idx[$k]] });
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($rows);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Equi-depth bucket index of a double: the count of sorted `boundaries`
  * that are <= the value, via binary search — an int in
  * [0, boundaries.length]. `boundaries` (the (2^bits − 1) approximate
  * quantiles of the column) is carried as ONE reference object, not as
  * literal children — the same plan-overhead rule as [[HyperplaneBuckets]]:
  * a 12-bit dim means 4095 boundary doubles, which as literals would bloat
  * analysis/codegen; here the plan stays O(1) in bucket count.
  *
  * Quantile (rank) normalization rather than min/max scaling makes the
  * z-order layout skew-robust: heavy values spread over many buckets
  * instead of collapsing the curve onto a few codes. NULL in → NULL out;
  * NaN compares below every boundary and lands in bucket 0. */
case class RankBucket(child: Expression, boundaries: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(boundaries.nonEmpty, "rank_bucket needs at least one boundary " +
    "(empty quantile array — is the column all NULL?)")
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "rank_bucket"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[Double]
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bs = ctx.addReferenceObj("boundaries", boundaries, "double[]")
      val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      s"""
         |int $lo = 0;
         |int $hi = ${boundaries.length};
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($bs[$mid] <= $v) { $lo = $mid + 1; } else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Morton (z-order) code: interleaves the low `bitsPerDim` bits of the int
  * bucket ids in `child` (an array<int>, dim 0 most significant within each
  * bit group) into one non-negative long. Sorting by this code makes rows
  * close in EVERY dimension land in the same parquet file/row group, so
  * min/max stats prune multi-dimensional box predicates — the data-skipping
  * layout a 100 TB table needs when queries filter on more than the single
  * partition column.
  *
  * NULL array → NULL; a NULL element maps to bucket 0 (NULL-filtering
  * predicates can't use stats anyway, so placement is free); values are
  * masked to bitsPerDim bits. n·bitsPerDim must fit in 63 bits — checked
  * per row because the array length is only known at runtime (the
  * [[graft.sinks.Layout]] entry points check it at plan time). */
case class InterleaveBits(child: Expression, bitsPerDim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(bitsPerDim > 0 && bitsPerDim <= 63,
    s"bitsPerDim must be in [1, 63], got $bitsPerDim")
  private val mask = (1 << math.min(bitsPerDim, 30)) - 1
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(IntegerType))
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n * bitsPerDim > 63) throw new IllegalArgumentException(
      s"interleave_bits: $n dims x $bitsPerDim bits exceeds 63")
    var out = 0L
    var d = 0
    while (d < n) {
      val x = (if (a.isNullAt(d)) 0 else a.getInt(d)) & mask
      var b = 0
      while (b < bitsPerDim) {
        out |= ((x >> b) & 1).toLong << (b * n + (n - 1 - d))
        b += 1
      }
      d += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("zout")
      val d = ctx.freshName("d"); val b = ctx.freshName("b")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |if ($n * $bitsPerDim > 63) {
         |  throw new IllegalArgumentException(
         |    "interleave_bits: " + $n + " dims x $bitsPerDim bits exceeds 63");
         |}
         |long $out = 0L;
         |for (int $d = 0; $d < $n; $d++) {
         |  int $x = ($a.isNullAt($d) ? 0 : $a.getInt($d)) & $mask;
         |  for (int $b = 0; $b < $bitsPerDim; $b++) {
         |    $out |= ((long) (($x >> $b) & 1)) << ($b * $n + ($n - 1 - $d));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Unicode NFC normalization of a string column — the canonical-composition
  * pass every text-cleaning pipeline runs before hashing/dedup (the same
  * visible text can arrive composed or decomposed from different crawls and
  * would otherwise fingerprint differently). Spark has no built-in; a native
  * expression keeps it inside whole-stage codegen. Fast path: the JDK's
  * `isNormalized` quick check (true for all-ASCII and most already-composed
  * text) returns the input UTF8String untouched — no allocation on the
  * overwhelmingly common case, which is what makes a 100 TB normalization
  * pass scan-bound instead of allocation-bound. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val str = ctx.freshName("str")
      s"""
         |String $str = $s.toString();
         |if (java.text.Normalizer.isNormalized($str,
         |    java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $s;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($str,
         |      java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GraftExpressions {
  val RollingBase = 257L
  val SignMask = 0x7fffffffffffffffL

  /** ids sorted strictly ascending — the centroid kernels' precondition for
    * their index-order tie-breaking to equal the documented id tie rules. */
  private[graft] def strictlyAscending(ids: Array[Int]): Boolean = {
    var i = 1
    while (i < ids.length) { if (ids(i) <= ids(i - 1)) return false; i += 1 }
    true
  }

  /** Per-centroid L2 norms of a flattened nList × dim matrix (computed once,
    * driver-side, shared by the centroid kernels). */
  private[graft] def centroidNorms(cents: Array[Float], nList: Int,
                                   dim: Int): Array[Double] = {
    val out = new Array[Double](nList)
    var c = 0
    while (c < nList) {
      var s = 0.0; var i = 0; val base = c * dim
      while (i < dim) { val x = cents(base + i).toDouble; s += x * x; i += 1 }
      out(c) = math.sqrt(s); c += 1
    }
    out
  }

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** SQL registration: cosine_sim / dot_product / rolling_hash. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("rolling_hash",
      exprs => RollingHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("nfc_normalize",
      exprs => NfcNormalize(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("interleave_bits",
      exprs => interleaveBitsFn(exprs), "built-in")
    reg.createOrReplaceTempFunction("hyperplane_buckets",
      exprs => hyperplaneBucketsFn(exprs), "built-in")
    reg.createOrReplaceTempFunction("centroid_argmax",
      exprs => centroidArgmaxFn(exprs), "built-in")
    reg.createOrReplaceTempFunction("centroid_topn",
      exprs => centroidTopNFn(exprs), "built-in")
    reg.createOrReplaceTempFunction("rank_bucket",
      exprs => rankBucketFn(exprs), "built-in")
    reg.createOrReplaceTempFunction("pq_encode",
      exprs => pqEncodeFn(exprs), "built-in")
    reg.createOrReplaceTempFunction("pq_lut",
      exprs => pqLutFn(exprs), "built-in")
    reg.createOrReplaceTempFunction("pq_adc",
      exprs => pqAdcFn(exprs), "built-in")
    // the one TABLE-valued function rides along: inline as-of join
    AsOfJoinTvf.register(spark)
  }

  // ---- the ANN-kernel surface as SQL functions ------------------------
  // The kernels carry their model parameters (planes / centroids /
  // codebooks) as plan-time REFERENCE OBJECTS — a literal-array argument
  // of 64k floats would cost seconds of analysis per query, which is the
  // exact anti-pattern the native nodes exist to kill. So the SQL forms
  // take the model as either (a) the deterministic generator's scalars
  // (hyperplane seed) or (b) the NAME of a registered view/table holding
  // the trained model in the engine's own persisted-index schema
  // ([[graft.ext.SimilarityIvf.writeIndex]] / SimilarityPq.writeIndex) —
  // the builder collects it ONCE at analysis, driver-side, exactly the
  // collect the Scala path pays. Model sizes are bounded (√n centroids,
  // m·ksub codes), never table-sized.

  private def fold(e: Expression, fn: String, what: String): Any = {
    require(e.foldable, s"$fn: $what must be a literal (it parameterizes " +
      "the kernel and cannot vary per row)")
    e.eval()
  }
  private def foldInt(e: Expression, fn: String, what: String): Int =
    fold(e, fn, what).asInstanceOf[Number].intValue()
  private def foldStr(e: Expression, fn: String, what: String): String =
    String.valueOf(fold(e, fn, what))

  /** Deterministic gaussian hyperplanes (the LSH model is its seed —
    * same generator the Scala path uses, so SQL and Scala bucket ids
    * agree bit-for-bit). */
  def gaussianPlanes(nPlanes: Int, dim: Int, seed: Long): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes * dim)(rnd.nextGaussian().toFloat)
  }

  /** `hyperplane_buckets(emb, n_tables, bits_per_table, dim, seed)`. */
  private[graft] def hyperplaneBucketsFn(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 5, "hyperplane_buckets(emb array<float>, " +
      "n_tables int, bits_per_table int, dim int, seed bigint) takes 5 " +
      "arguments")
    val f = "hyperplane_buckets"
    val (nT, bits, dim) = (foldInt(exprs(1), f, "n_tables"),
      foldInt(exprs(2), f, "bits_per_table"), foldInt(exprs(3), f, "dim"))
    val seed = fold(exprs(4), f, "seed").asInstanceOf[Number].longValue()
    HyperplaneBuckets(exprs.head, gaussianPlanes(nT * bits, dim, seed),
      nT, bits)
  }

  /** `(centroid_id int, centroid array<float>)` rows of a registered
    * view, collected ascending — the persisted-index schema of
    * [[graft.ext.SimilarityIvf.writeIndex]]. */
  private def centroidsOf(fn: String, view: String): (Array[Int], Array[Float]) = {
    import org.apache.spark.sql.functions.col
    val rows = SparkSession.active.table(view)
      .select(col("centroid_id").cast("int"), col("centroid"))
      .orderBy(col("centroid_id")).collect()
    require(rows.nonEmpty, s"$fn: centroid view '$view' is empty")
    (rows.map(_.getInt(0)),
      rows.flatMap(_.getSeq[Float](1)).toArray)
  }

  /** `centroid_argmax(emb, 'centroids_view')`. */
  private[graft] def centroidArgmaxFn(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "centroid_argmax(emb array<float>, " +
      "centroids_view string) takes 2 arguments")
    val (ids, flat) = centroidsOf("centroid_argmax",
      foldStr(exprs(1), "centroid_argmax", "centroids_view"))
    CentroidArgmax(exprs.head, flat, ids)
  }

  /** `centroid_topn(emb, 'centroids_view', n)`. */
  private[graft] def centroidTopNFn(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "centroid_topn(emb array<float>, " +
      "centroids_view string, n int) takes 3 arguments")
    val (ids, flat) = centroidsOf("centroid_topn",
      foldStr(exprs(1), "centroid_topn", "centroids_view"))
    CentroidTopN(exprs.head, flat, ids,
      foldInt(exprs(2), "centroid_topn", "n"))
  }

  /** `rank_bucket(x, array(q1, q2, …))` — boundaries are a small
    * (≤ hundreds) quantile array, cheap as a foldable literal. */
  private[graft] def rankBucketFn(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "rank_bucket(x double, boundaries " +
      "array<double>) takes 2 arguments")
    require(exprs(1).foldable, "rank_bucket: boundaries must be a " +
      "literal array (it parameterizes the kernel and cannot vary per row)")
    // SQL numeric literals arrive as int/decimal/double arrays — one
    // cast normalizes them all; anything uncastable refuses here
    val target = ArrayType(DoubleType)
    require(org.apache.spark.sql.catalyst.expressions.Cast
      .canCast(exprs(1).dataType, target),
      s"rank_bucket: boundaries must be a numeric array, " +
        s"got ${exprs(1).dataType}")
    val v = org.apache.spark.sql.catalyst.expressions
      .Cast(exprs(1), target).eval().asInstanceOf[ArrayData]
    val bs = new Array[Double](v.numElements())
    var i = 0
    while (i < bs.length) {
      require(!v.isNullAt(i), "rank_bucket: boundaries must not be NULL")
      bs(i) = v.getDouble(i); i += 1
    }
    RankBucket(exprs.head, bs)
  }

  /** `(j int, code int, vec array<float>)` rows of a registered view —
    * the persisted-index schema of [[graft.ext.SimilarityPq.writeIndex]];
    * returns the flattened codebook with its (m, ksub) shape. */
  private def codebookOf(fn: String, view: String)
      : (Array[Float], Int, Int) = {
    import org.apache.spark.sql.functions.col
    val rows = SparkSession.active.table(view)
      .select(col("j").cast("int"), col("code").cast("int"), col("vec"))
      .orderBy(col("j"), col("code")).collect()
    require(rows.nonEmpty, s"$fn: codebook view '$view' is empty")
    val m = rows.map(_.getInt(0)).max + 1
    val ksub = rows.map(_.getInt(1)).max + 1
    require(rows.length == m * ksub, s"$fn: codebook view '$view' has " +
      s"${rows.length} rows; the (j, code) grid needs ${m * ksub}")
    (rows.flatMap(_.getSeq[Float](2)).toArray, m, ksub)
  }

  /** `pq_encode(vec, 'codebook_view')` — (m, ksub) derive from the grid. */
  private[graft] def pqEncodeFn(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "pq_encode(vec array<float>, " +
      "codebook_view string) takes 2 arguments")
    val (flat, m, ksub) = codebookOf("pq_encode",
      foldStr(exprs(1), "pq_encode", "codebook_view"))
    PqEncode(exprs.head, flat, m, ksub)
  }

  /** `pq_lut(query_vec, 'codebook_view')`. */
  private[graft] def pqLutFn(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "pq_lut(vec array<float>, " +
      "codebook_view string) takes 2 arguments")
    val (flat, m, ksub) = codebookOf("pq_lut",
      foldStr(exprs(1), "pq_lut", "codebook_view"))
    PqLut(exprs.head, flat, m, ksub)
  }

  /** `pq_adc(codes, lut, ksub)` — pure column kernel. */
  private[graft] def pqAdcFn(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "pq_adc(codes array<int>, lut " +
      "array<float>, ksub int) takes 3 arguments")
    PqAdc(exprs(0), exprs(1), foldInt(exprs(2), "pq_adc", "ksub"))
  }

  /** `interleave_bits(array<int>, bitsPerDim)` — the Morton/z-value
    * kernel with its bit width supplied as a foldable SQL literal (it
    * parameterizes codegen, so it cannot vary per row). */
  private[graft] def interleaveBitsFn(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2,
      "interleave_bits(dims array<int>, bitsPerDim int) takes 2 arguments")
    require(exprs(1).foldable,
      "interleave_bits: bitsPerDim must be a literal (it parameterizes " +
        "codegen and cannot vary per row)")
    InterleaveBits(exprs(0),
      exprs(1).eval().asInstanceOf[Number].intValue())
  }
}
