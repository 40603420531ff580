package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, JoinedRow, SortOrder, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.classic.Dataset
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, ShortType, TimestampNTZType, TimestampType}

/** As-of join — the time-series operator Spark lacks (SURVEY.md §2 joins
  * note): for every left row (key, ts), attach the right row with the same
  * key and the greatest right-ts ≤ left-ts (left-outer semantics; nulls when
  * no prior right row exists).
  *
  * Built as the full custom-operator stack (preference (c) of the build
  * guide): logical [[AsOfJoinPlan]] → [[AsOfJoinStrategy]] →
  * [[AsOfJoinExec]], registered per-session via
  * `spark.experimental.extraStrategies` (see [[AsOfJoin.install]]) or
  * globally via [[GraftExtensions]].
  *
  * Scale shape — this is the entire point versus composing built-ins: the
  * exec declares ClusteredDistribution on the key for both children and
  * (key, ts) intra-partition ordering, so Catalyst plans exactly one hash
  * shuffle per side and one sort, then the join itself is a linear
  * two-pointer merge per partition: O(n log n) total, zero row
  * amplification. The window-function equivalent (union + lag + filter)
  * pays the same shuffle but materializes the union; a join+argmax pays a
  * many-to-many join explosion before aggregating it back down.
  *
  * Constraints: key columns are integral (short/int/long — compared widened
  * to long), ts columns are timestamp-like (timestamp/timestamp_ntz/long
  * micros, or date/int days — both sides must come from the same family so
  * the comparison units agree); anything else is rejected at planning time
  * with a clear error rather than miscast at runtime. Ties on right ts
  * resolve to the last row in (key, ts) sort order — callers wanting
  * determinism under ts ties should pre-dedup the right side (as
  * q_asof_join does).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: String, leftTs: String,
                        rightKey: String, rightTs: String)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  /** Key/ts are held by name, not as expressions, so ColumnPruning can't see
    * them — declare them or the optimizer prunes the join keys away. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => a.name == leftKey || a.name == leftTs) ++
      right.output.filter(a => a.name == rightKey || a.name == rightTs))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lts, rk, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: String, leftTs: String,
                        rightKey: String, rightTs: String)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  private def attr(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column $name not in [${side.output.map(_.name).mkString(",")}]"))

  /** Type-dispatched long getter — getLong on an IntegerType column would
    * throw ClassCastException (generic rows) or read wrong bytes (unsafe
    * rows) at runtime; unsupported types must fail at planning, not there. */
  private def longGetter(a: Attribute, role: String): (InternalRow, Int) => Long =
    a.dataType match {
      case LongType | TimestampType | TimestampNTZType => (r, i) => r.getLong(i)
      case IntegerType | DateType => (r, i) => r.getInt(i).toLong
      case ShortType => (r, i) => r.getShort(i).toLong
      case other => throw new IllegalArgumentException(
        s"as-of join $role column ${a.name} has unsupported type $other " +
          "(need short/int/long, timestamp/timestamp_ntz, or date)")
    }

  /** Days (date/int) and micros (timestamp/long) must not be compared to
    * each other — same family on both sides or planning fails. */
  private def tsFamily(t: DataType): String = t match {
    case LongType | TimestampType | TimestampNTZType => "micros-like"
    case IntegerType | DateType | ShortType => "days-like"
    case other => other.sql
  }

  /** Planning-time validation — lazy (not constructor-time) because Catalyst
    * copies nodes with placeholder children during canonicalization, where
    * attributes have no usable names/types. Forced from
    * requiredChildDistribution (EnsureRequirements, i.e. planning of the
    * real tree) and again from doExecute, so a misuse surfaces with column
    * names and types instead of as a ClassCastException deep in the merge. */
  private lazy val validated: Unit = {
    val lk = attr(left, leftKey); val rk = attr(right, rightKey)
    longGetter(lk, "left key")
    longGetter(rk, "right key")
    // Key hash-families must also agree: ClusteredDistribution is satisfied
    // with HashPartitioning over the RAW attribute, and Spark hashes
    // int-width and long-width values differently (hashInt vs hashLong) —
    // a mixed int/long key pair would co-partition WRONG and null-extend
    // every left row silently.
    require(tsFamily(lk.dataType) == tsFamily(rk.dataType),
      s"as-of join key columns disagree on width family: ${lk.name}: " +
        s"${lk.dataType.sql} vs ${rk.name}: ${rk.dataType.sql} — " +
        "cast one side so both partition identically")
    val lt = attr(left, leftTs); val rt = attr(right, rightTs)
    longGetter(lt, "left ts"); longGetter(rt, "right ts")
    require(tsFamily(lt.dataType) == tsFamily(rt.dataType),
      s"as-of join ts columns disagree on time unit: ${lt.name}: ${lt.dataType.sql} " +
        s"(${tsFamily(lt.dataType)}) vs ${rt.name}: ${rt.dataType.sql} " +
        s"(${tsFamily(rt.dataType)})")
  }

  /** One hash shuffle per side, co-partitioned on the key. */
  override def requiredChildDistribution: Seq[Distribution] = {
    validated
    ClusteredDistribution(attr(left, leftKey) :: Nil) ::
    ClusteredDistribution(attr(right, rightKey) :: Nil) :: Nil
  }

  /** Intra-partition (key, ts) sort — the merge's only requirement. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(attr(left, leftKey), org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(attr(left, leftTs), org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(attr(right, rightKey), org.apache.spark.sql.catalyst.expressions.Ascending),
        SortOrder(attr(right, rightTs), org.apache.spark.sql.catalyst.expressions.Ascending)))

  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def doExecute(): RDD[InternalRow] = {
    validated
    val lkOrd = left.output.indexWhere(_.name == leftKey)
    val ltsOrd = left.output.indexWhere(_.name == leftTs)
    val rkOrd = right.output.indexWhere(_.name == rightKey)
    val rtsOrd = right.output.indexWhere(_.name == rightTs)
    val lkGet = longGetter(attr(left, leftKey), "left key")
    val ltsGet = longGetter(attr(left, leftTs), "left ts")
    val rkGet = longGetter(attr(right, rightKey), "right key")
    val rtsGet = longGetter(attr(right, rightTs), "right ts")
    val rightWidth = right.output.size
    left.execute().zipPartitions(right.execute()) { (li, ri) =>
      // the merge emits JoinedRow views; project to UnsafeRow before
      // handing rows upstream — SparkPlan's exchange/collect/write paths
      // cast to UnsafeRow (getByteArrayRdd), so a plan where this exec
      // feeds them DIRECTLY (no intervening shuffle re-encoding) would
      // ClassCastException. Codegen'd projection, one per partition.
      val toUnsafe = org.apache.spark.sql.catalyst.expressions
        .UnsafeProjection.create(output, output)
      val it = new Iterator[InternalRow] {
        private val nullRight = new GenericInternalRow(rightWidth)
        private val joined = new JoinedRow
        private val rBuf = ri.buffered
        // last right row consumed with (rKey, rTs) ≤ current left (key, ts);
        // copied because unsafe rows are reused by the child iterator.
        private var lastRight: InternalRow = _
        private var lastRightKey = 0L

        override def hasNext: Boolean = li.hasNext
        override def next(): InternalRow = {
          val l = li.next()
          // SQL semantics: a NULL key or ts matches nothing. NULLs sort
          // first (ascending), so null left rows precede every valid key and
          // emitting without advancing the right side keeps the merge
          // monotone; null right rows are consumed and never retained.
          if (l.isNullAt(lkOrd) || l.isNullAt(ltsOrd))
            return joined(l, nullRight)
          val lk = lkGet(l, lkOrd)
          val lts = ltsGet(l, ltsOrd)
          while (rBuf.hasNext && {
            val r = rBuf.head
            r.isNullAt(rkOrd) || r.isNullAt(rtsOrd) || {
              val rk = rkGet(r, rkOrd)
              rk < lk || (rk == lk && rtsGet(r, rtsOrd) <= lts)
            }
          }) {
            val r = rBuf.next()
            if (!r.isNullAt(rkOrd) && !r.isNullAt(rtsOrd)) {
              lastRight = r.copy()
              lastRightKey = rkGet(r, rkOrd)
            }
          }
          if (lastRight != null && lastRightKey == lk &&
              rtsGet(lastRight, rtsOrd) <= lts)
            joined(l, lastRight)
          else
            joined(l, nullRight)
        }
      }
      it.map(toUnsafe)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Idempotently add the planner strategy to this session. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** `asofJoin(left, right)`: every left row gains the latest right row with
    * the same key and right.ts ≤ left.ts. */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, leftTs: String,
           rightKey: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      AsOfJoinPlan(left.queryExecution.analyzed, right.queryExecution.analyzed,
        leftKey, leftTs, rightKey, rightTs))
  }
}

/** `asof_join(...)` as a TABLE-VALUED function, so the as-of composes
  * INLINE in a larger SELECT (join it, aggregate it, subquery it) without
  * materializing — the landing twin is `CALL graft.asof_join` (same name,
  * same argument order minus `out_dir`; the CALL lands a table through the
  * protocol, the TVF returns the relation). Expands at analysis time to
  * the same [[AsOfJoinPlan]] the Scala DSL builds, so the planner pins and
  * the sorted-merge exec are shared, not reimplemented.
  *
  * `asof_join(left_view, right_view, left_key, left_ts, right_key,
  * right_ts [, direction])` — each side is a view NAME (temp views and
  * catalog tables alike) or an INLINE RELATION via the standard
  * `TABLE(SELECT …)` argument syntax, so the as-of composes over a
  * filtered/derived relation with no temp-view hop; direction defaults
  * to 'backward', 'forward' reuses [[graft.operators.AsOf.joinForward]]'s
  * order-reversal reduction. Scalar arguments must be string LITERALS:
  * the expansion happens at analysis time, before any row exists to
  * evaluate a non-literal against. */
object AsOfJoinTvf {
  import org.apache.spark.sql.catalyst.expressions.{Expression, FunctionTableSubqueryArgumentExpression, Literal}
  import org.apache.spark.sql.types.StringType

  private def str(e: Expression, pos: String): String = e match {
    case Literal(v, StringType) if v != null => v.toString
    case other => throw new IllegalArgumentException(
      s"asof_join: $pos must be a string literal, got ${other.sql}")
  }

  /** A side argument as a DataFrame: a string literal resolves as a view
    * or catalog table name; a `TABLE(…)` argument contributes its plan
    * directly (re-analyzed through Dataset.ofRows — the expansion runs
    * inside analysis, exactly like the `spark.table` path). PARTITION
    * BY / ORDER BY decoration on the TABLE argument refuses: the as-of
    * defines its own per-key ordering, and silently ignoring a
    * user-declared one would lie. */
  private def side(spark: SparkSession, e: Expression,
                   pos: String): org.apache.spark.sql.DataFrame = e match {
    case t: FunctionTableSubqueryArgumentExpression =>
      require(t.partitionByExpressions.isEmpty && t.orderByExpressions.isEmpty
          && !t.withSinglePartition,
        s"asof_join: $pos TABLE(...) argument must not declare PARTITION " +
          "BY / ORDER BY / WITH SINGLE PARTITION — the as-of defines its " +
          "own per-key ordering")
      Dataset.ofRows(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        t.plan)
    case other => spark.table(str(other, pos))
  }

  def plan(exprs: Seq[Expression]): LogicalPlan = {
    require(exprs.length == 6 || exprs.length == 7,
      "asof_join(left_view, right_view, left_key, left_ts, right_key, " +
        s"right_ts [, direction]) takes 6 or 7 arguments, got ${exprs.length}")
    val names = Seq("left_key", "left_ts", "right_key", "right_ts")
    val Seq(lk, lts, rk, rts) =
      exprs.slice(2, 6).zip(names).map { case (e, n) => str(e, n) }
    val dir = if (exprs.length == 7) str(exprs(6), "direction") else "backward"
    val spark = SparkSession.active
    AsOfJoin.install(spark)
    val (left, right) = (side(spark, exprs(0), "left_view"),
      side(spark, exprs(1), "right_view"))
    val df = dir.toLowerCase(java.util.Locale.ROOT) match {
      case "backward" => AsOfJoin.join(left, right, lk, lts, rk, rts)
      case "forward" =>
        graft.operators.AsOf.joinForward(left, right, lk, lts, rk, rts)
      case other => throw new IllegalArgumentException(
        s"asof_join direction must be 'backward' or 'forward': '$other'")
    }
    df.queryExecution.analyzed
  }

  /** Idempotently register the TVF (and the planner strategy its expansion
    * needs) in this session's table-function registry. */
  def register(spark: SparkSession): Unit = {
    AsOfJoin.install(spark)
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      "asof_join", plan, "built-in")
  }
}

/** Global registration (`--conf spark.sql.extensions=
  * org.apache.spark.sql.graft.GraftExtensions`): planner strategy + the
  * native function kernels. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectPlannerStrategy(_ => graft.sql.GraftDmlStrategy)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((FunctionIdentifier("rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "rolling_hash"),
      (exprs: Seq[Expression]) => RollingHash(exprs.head)))
    e.injectFunction((FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)))
    e.injectFunction((FunctionIdentifier("interleave_bits"),
      new ExpressionInfo(classOf[InterleaveBits].getName, "interleave_bits"),
      (exprs: Seq[Expression]) => GraftExpressions.interleaveBitsFn(exprs)))
    e.injectFunction((FunctionIdentifier("hyperplane_buckets"),
      new ExpressionInfo(classOf[HyperplaneBuckets].getName,
        "hyperplane_buckets"),
      (exprs: Seq[Expression]) => GraftExpressions.hyperplaneBucketsFn(exprs)))
    e.injectFunction((FunctionIdentifier("centroid_argmax"),
      new ExpressionInfo(classOf[CentroidArgmax].getName, "centroid_argmax"),
      (exprs: Seq[Expression]) => GraftExpressions.centroidArgmaxFn(exprs)))
    e.injectFunction((FunctionIdentifier("centroid_topn"),
      new ExpressionInfo(classOf[CentroidTopN].getName, "centroid_topn"),
      (exprs: Seq[Expression]) => GraftExpressions.centroidTopNFn(exprs)))
    e.injectFunction((FunctionIdentifier("rank_bucket"),
      new ExpressionInfo(classOf[RankBucket].getName, "rank_bucket"),
      (exprs: Seq[Expression]) => GraftExpressions.rankBucketFn(exprs)))
    e.injectFunction((FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (exprs: Seq[Expression]) => GraftExpressions.pqEncodeFn(exprs)))
    e.injectFunction((FunctionIdentifier("pq_lut"),
      new ExpressionInfo(classOf[PqLut].getName, "pq_lut"),
      (exprs: Seq[Expression]) => GraftExpressions.pqLutFn(exprs)))
    e.injectFunction((FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (exprs: Seq[Expression]) => GraftExpressions.pqAdcFn(exprs)))
    e.injectTableFunction((FunctionIdentifier("asof_join"),
      new ExpressionInfo(AsOfJoinTvf.getClass.getName, "asof_join"),
      (exprs: Seq[Expression]) => AsOfJoinTvf.plan(exprs)))
  }
}
