package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{CentroidArgmax, CentroidTopN}
import org.apache.spark.sql.Row

import graft.SparkSpec
import graft.functions.VectorFunctions.{centroid_argmax, centroid_topn}

/** The fused centroid kernels (IVF assign + probe). Correctness is pinned
  * against plain-Scala cosine with the documented tie rules; the plan-
  * flatness tests pin the property the kernels exist for — plan size and
  * analysis time do NOT grow with nList (the composed typedlit form grows
  * linearly and costs seconds at the nList a 100 TB corpus needs). */
class CentroidKernelSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val rnd = new scala.util.Random(11)

  private def randVec(): Seq[Float] = Seq.fill(dim)(rnd.nextGaussian().toFloat)

  /** ids with gaps (Lloyd can empty a list) and one duplicated centroid
    * (ids 3 and 7 identical) to pin the tie rules. */
  private val ids = Array(0, 1, 3, 7, 9)
  private val centVecs: Seq[Seq[Float]] = {
    val base = Seq.fill(4)(randVec())
    Seq(base(0), base(1), base(2), base(2), base(3))
  }
  private val matrix: Array[Float] = centVecs.flatten.toArray

  private def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    // double products, matching the kernels (a float×float product would
    // round to float first and sit ~2e-9 off the kernel's value)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    a.indices.foreach { i =>
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Reference: cosine desc; argmax ties -> larger id; topN ties -> smaller. */
  private def refRanked(v: Seq[Float]): Seq[(Double, Int)] =
    centVecs.zip(ids).map { case (c, id) => (cosine(v, c), id) }
      .sortBy { case (s, id) => (-s, id) }

  private val vecs: Seq[Seq[Float]] =
    Seq.fill(30)(randVec()) ++ centVecs ++ Seq(Seq.fill(dim)(0f))
  /** index in `vecs` of the duplicated centroid (ids 3 and 7). */
  private val dupPos = 30 + 2

  test("centroid_argmax matches scalar cosine argmax (ties to larger id)") {
    val got = vecs.toDF("emb")
      .select(centroid_argmax(col("emb"), matrix, ids).as("cid"))
      .collect().map(_.getInt(0))
    vecs.zip(got).foreach { case (v, cid) =>
      val ranked = refRanked(v)
      val best = ranked.head._1
      val expected = ranked.takeWhile(_._1 == best).map(_._2).max
      assert(cid == expected, s"vec=$v got=$cid expected=$expected")
    }
    // querying with the duplicated centroid itself ties at cosine 1.0
    // between ids 3 and 7 -> the larger id wins
    assert(got(dupPos) == 7)
  }

  test("centroid_topn matches scalar cosine ranking (ties to smaller id)") {
    val n = 3
    val got = vecs.toDF("emb")
      .select(centroid_topn(col("emb"), matrix, ids, n).as("top"))
      .collect().map(_.getSeq[Row](0).map(r => (r.getDouble(0), r.getInt(1))))
    vecs.zip(got).foreach { case (v, topn) =>
      val expected = refRanked(v).take(n)
      assert(topn.size == n)
      topn.zip(expected).foreach { case ((gs, gid), (es, eid)) =>
        assert(math.abs(gs - es) < 1e-9 && gid == eid,
          s"vec=$v got=$topn expected=$expected")
      }
    }
    // exact-duplicate centroid pair: tie must list id 3 before id 7
    assert(got(dupPos).take(2).map(_._2) == Seq(3, 7))
  }

  test("topN > nList returns all lists; zero vector scores 0 everywhere") {
    val zero = Seq(Seq.fill(dim)(0f)).toDF("emb")
      .select(centroid_topn(col("emb"), matrix, ids, 100).as("top"))
      .collect().head.getSeq[Row](0)
    assert(zero.size == ids.length)
    assert(zero.forall(_.getDouble(0) == 0.0))
    // all-ties at 0.0 -> ascending id order
    assert(zero.map(_.getInt(1)) == ids.toSeq)
  }

  test("dimension mismatch throws rather than silently scoring a prefix") {
    val bad = Seq(Seq.fill(dim + 1)(1f)).toDF("emb")
    val ex = intercept[Exception] {
      bad.select(centroid_argmax(col("emb"), matrix, ids)).collect()
    }
    assert(ex.getMessage.contains("centroid dim") ||
      ex.getCause != null && ex.getCause.getMessage.contains("centroid dim"))
  }

  test("interpreted eval path agrees with codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, FloatType}
    val nullVec = Literal.create(null, ArrayType(FloatType))
    val v = vecs.head
    val arr = new GenericArrayData(v.toArray)
    val argmax = CentroidArgmax(nullVec, matrix, ids)
    assert(argmax.nullSafeEval(arr) == refRanked(v).head._2)
    val topn = CentroidTopN(nullVec, matrix, ids, 2)
      .nullSafeEval(arr).asInstanceOf[GenericArrayData]
    assert(topn.numElements() == 2)
  }

  test("plan size and analysis time are flat in nList (the kernel's reason to exist)") {
    def planFor(nList: Int): (Int, Long) = {
      val m = Array.fill(nList * dim)(rnd.nextGaussian().toFloat)
      val cids = Array.range(0, nList)
      val df = vecs.toDF("emb").select(
        centroid_argmax(col("emb"), m, cids).as("cid"),
        explode(centroid_topn(col("emb"), m, cids, 4)).as("sc"))
      val t0 = System.nanoTime()
      val plan = df.queryExecution.executedPlan // analyze + optimize + plan
      val nodes = plan.collect { case p => p.expressions.map(_.collect { case e => e }.size).sum }.sum
      (nodes, (System.nanoTime() - t0) / 1000000L)
    }
    val (nodes16, t16) = planFor(16)
    val (nodes1024, t1024) = planFor(1024)
    assert(nodes16 == nodes1024,
      s"plan grew with nList: $nodes16 -> $nodes1024 expression nodes")
    // node-count equality above is the deterministic pin; the time bound is
    // a loose canary (generous floor so a cold/loaded host can't flake it)
    assert(t1024 < math.max(5 * t16, 3000),
      s"planning at nList=1024 took ${t1024}ms (nList=16: ${t16}ms)")
  }

  test("unsorted or duplicate centroid ids are rejected (tie rules depend on order)") {
    intercept[IllegalArgumentException] {
      CentroidArgmax(org.apache.spark.sql.catalyst.expressions.Literal
        .create(null, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType)),
        Array.fill(2 * dim)(0f), Array(7, 3))
    }
  }
}
