package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.PlanDf

import graft.sinks.{MergeClause, MergeDelete, MergeInsert, MergeUpdate, VersionedTable}

/** Native SQL DML statements on graft tables — the planner strategy that
  * routes `UPDATE`, `MERGE INTO`, and expression-predicate `DELETE FROM`
  * to the engine's own row-level operators instead of Spark's
  * `SupportsRowLevelOperations` rewrite (whose group-based path rewrites
  * whole tables; the engine's operators are merge-on-read / file-scoped):
  *
  *  - `UPDATE graft.`dir` SET c = expr, … [WHERE p]` →
  *    [[VersionedTable.updateWhere]] — ONE commit landing a positional
  *    delete vector plus the updated copies; untouched rows never
  *    rewrite.
  *  - `DELETE FROM graft.`dir` WHERE p` with a predicate Spark cannot
  *    translate to source filters (arithmetic, functions) →
  *    [[VersionedTable.deleteWhere]], which resolves arbitrary
  *    predicates by scanning. Translatable predicates never reach this
  *    strategy — the optimizer rewrites them to the
  *    [[GraftTable.deleteWhere SupportsDelete]] metadata path first; the
  *    two compose into full DELETE coverage.
  *  - `MERGE INTO graft.`dir` t USING s ON t.k = s.k WHEN MATCHED THEN
  *    UPDATE SET * WHEN NOT MATCHED THEN INSERT *` (the upsert shape,
  *    star or fully column-aligned) → [[VersionedTable.merge]] — the
  *    file-scoped copy-on-write merge. Other clause combinations don't
  *    match and fall through to Spark's loud "not supported" error; their
  *    semantics have no engine equivalent and a silent approximation
  *    would corrupt.
  *
  * The statements are `Command`s, so Spark executes the strategy's exec
  * nodes eagerly at `sql()` time, like every other DML. Conditions or
  * values carrying subqueries don't match (the re-anchored expression
  * could not bind them) and fall through to Spark's error. Tag-pinned
  * handles (`#tag=`) never match — mutating "a tag" would land on the
  * head while readers keep the pin. */
object GraftDmlStrategy extends SparkStrategy {

  /** The graft table a DML statement targets, looking through the alias
    * Spark leaves on a named target and through the pushed scan relation
    * the optimizer substitutes before planning. Read-only handles don't
    * match. */
  private def graftTarget(p: LogicalPlan): Option[GraftTable] = p match {
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable if !g.isReadOnly => Some(g)
      case _ => None
    }
    case r: DataSourceV2ScanRelation => graftTarget(r.relation)
    case SubqueryAlias(_, child) => graftTarget(child)
    case _ => None
  }

  /** Re-anchor a resolved expression by NAME so the engine can apply it
    * over its own scan of the same table (fresh attribute ids). The
    * engine scans raw files, which carry PHYSICAL names — `ren` is the
    * target table's logical→physical column mapping (identity for tables
    * that never renamed). */
  private def byName(e: Expression,
                     ren: Map[String, String] = Map.empty): Column =
    PlanDf.toColumn(e.transform {
      case a: AttributeReference =>
        UnresolvedAttribute.quoted(ren.getOrElse(a.name, a.name))
    })

  private def clean(e: Expression): Boolean =
    e.resolved && e.deterministic && !SubqueryExpression.hasSubquery(e)

  /** The single-key upsert shape [[VersionedTable.merge]] implements:
    * `ON t.k = s.k`, one WHEN MATCHED UPDATE covering the row, one WHEN
    * NOT MATCHED INSERT covering the row (star, or explicit assignments
    * that are exactly name-aligned column copies). */
  private def upsertKey(m: MergeIntoTable): Option[String] = {
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    def colToCol(as: Seq[Assignment]): Boolean = as.nonEmpty && as.forall {
      case Assignment(k: AttributeReference, v: AttributeReference) =>
        k.name.equalsIgnoreCase(v.name) && tOut.contains(k) && sOut.contains(v)
      case _ => false
    }
    val okMatched = m.matchedActions match {
      case Seq(UpdateStarAction(None)) => true
      case Seq(UpdateAction(None, as, _)) => colToCol(as)
      case _ => false
    }
    val okNotMatched = m.notMatchedActions match {
      case Seq(InsertStarAction(None)) => true
      case Seq(InsertAction(None, as)) => colToCol(as)
      case _ => false
    }
    if (!okMatched || !okNotMatched) None
    else m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if a.name.equalsIgnoreCase(b.name) &&
            ((tOut.contains(a) && sOut.contains(b)) ||
              (tOut.contains(b) && sOut.contains(a))) =>
        Some(a.name)
      case _ => None
    }
  }

  /** Translate a full-clause MERGE into the engine's [[MergeClause]]
    * alphabet: target attribute references become `__t_<physical>`,
    * source references `__s_<name>` — the spelling
    * [[VersionedTable.mergeInto]] evaluates over its joined frame.
    * None for any shape without a sound engine mapping (untranslatable
    * expressions, non-equality or multi-key ON, exotic actions): the
    * statement then falls through to Spark's loud error rather than a
    * silent approximation. */
  private def translateMerge(m: MergeIntoTable, g: GraftTable)
      : Option[(String, String, Seq[MergeClause], Seq[MergeClause],
        Seq[MergeClause])] = {
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    def ph(n: String): String = g.renames.getOrElse(n, n)
    def trans(e: Expression): Option[Column] =
      if (!clean(e)) None
      else {
        var ok = true
        val t = e.transform {
          case a: AttributeReference =>
            if (tOut.contains(a))
              UnresolvedAttribute.quoted(s"__t_${ph(a.name)}")
            else if (sOut.contains(a))
              UnresolvedAttribute.quoted(s"__s_${a.name}")
            else { ok = false; a }
        }
        if (ok) Some(PlanDf.toColumn(t)) else None
      }
    def cond(c: Option[Expression]): Option[Option[Column]] = c match {
      case None => Some(None)
      case Some(e) => trans(e).map(Some(_))
    }
    val tcols = g.schema.fields.map(_.name).toSeq // logical order
    // SET * / INSERT *: target.c := source.c by LOGICAL name
    def starSet: Map[String, Column] =
      tcols.map(c => ph(c) ->
        org.apache.spark.sql.functions.col(s"__s_$c")).toMap
    def assigns(as: Seq[Assignment]): Option[Map[String, Column]] = {
      val out = as.map {
        case Assignment(k: AttributeReference, v) if tOut.contains(k) =>
          trans(v).map(ph(k.name) -> _)
        case _ => None
      }
      if (out.forall(_.isDefined)) Some(out.flatten.toMap) else None
    }
    // a partial INSERT fills unassigned columns with typed NULLs (the
    // engine requires full coverage; NULL is the SQL semantics)
    def insertFull(set: Map[String, Column]): Map[String, Column] =
      tcols.map { c =>
        val p = ph(c)
        p -> set.getOrElse(p, lit(null))
      }.toMap
    def updClause(a: MergeAction): Option[MergeClause] = a match {
      case UpdateStarAction(c) =>
        cond(c).map(MergeClause(_, MergeUpdate(starSet)))
      case UpdateAction(c, as, _) =>
        for (cc <- cond(c); s <- assigns(as))
          yield MergeClause(cc, MergeUpdate(s))
      case DeleteAction(c) => cond(c).map(MergeClause(_, MergeDelete))
      case _ => None
    }
    def insClause(a: MergeAction): Option[MergeClause] = a match {
      case InsertStarAction(c) =>
        cond(c).map(MergeClause(_, MergeInsert(starSet)))
      case InsertAction(c, as) =>
        for (cc <- cond(c); s <- assigns(as))
          yield MergeClause(cc, MergeInsert(insertFull(s)))
      case _ => None
    }
    def all[T](xs: Seq[Option[T]]): Option[Seq[T]] =
      if (xs.forall(_.isDefined)) Some(xs.flatten) else None
    m.mergeCondition match {
      case EqualTo(a: AttributeReference, b: AttributeReference) =>
        val tk = Seq(a, b).find(tOut.contains)
        val sk = Seq(a, b).find(sOut.contains)
        for {
          t <- tk; s <- sk
          mc <- all(m.matchedActions.map(updClause))
          nc <- all(m.notMatchedActions.map(insClause))
          bc <- all(m.notMatchedBySourceActions.map(updClause))
        } yield (ph(t.name), s.name, mc, nc, bc)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case u @ UpdateTable(t, assignments, condition)
        if u.childrenResolved && graftTarget(t).isDefined &&
          condition.forall(clean) && assignments.nonEmpty &&
          assignments.forall(a =>
            a.key.isInstanceOf[AttributeReference] && clean(a.value)) =>
      val g = graftTarget(t).get
      GraftUpdateExec(g.tableDir,
        condition.map(byName(_, g.renames)),
        assignments.map { a =>
          val k = a.key.asInstanceOf[AttributeReference].name
          g.renames.getOrElse(k, k) -> byName(a.value, g.renames)
        }) :: Nil

    case DeleteFromTable(t, condition)
        if graftTarget(t).isDefined && clean(condition) =>
      val g = graftTarget(t).get
      GraftDeleteExec(g.tableDir, byName(condition, g.renames)) :: Nil

    case m: MergeIntoTable
        if m.childrenResolved && !m.withSchemaEvolution &&
          m.notMatchedBySourceActions.isEmpty &&
          clean(m.mergeCondition) &&
          graftTarget(m.targetTable).isDefined && upsertKey(m).isDefined =>
      val g = graftTarget(m.targetTable).get
      // the relabel needs the declared schema only when some depth
      // actually renames — identity tables hand the source over as-is
      val decl =
        if (g.renames.isEmpty && !ColumnMapping.hasNestedRenames(g.schema))
          None
        else Some(g.schema)
      GraftMergeExec(g.tableDir, m.sourceTable,
        upsertKey(m).get, decl) :: Nil

    // full clause coverage: conditional WHEN MATCHED UPDATE/DELETE,
    // conditional NOT MATCHED INSERT, NOT MATCHED BY SOURCE — routed to
    // the engine's general merge when every clause translates; anything
    // else falls through to Spark's loud "not supported"
    case m: MergeIntoTable
        if m.childrenResolved && !m.withSchemaEvolution &&
          clean(m.mergeCondition) &&
          graftTarget(m.targetTable).isDefined =>
      val g = graftTarget(m.targetTable).get
      translateMerge(m, g).map { case (tKey, sKey, mc, nc, bc) =>
        GraftMergeFullExec(g.tableDir, m.sourceTable,
          tKey, sKey, mc, nc, bc): SparkPlan
      }.toSeq

    case _ => Nil
  }
}

private[sql] trait GraftDmlExec extends LeafExecNode {
  override def output: Seq[Attribute] = Nil
  protected def run(spark: SparkSession): Unit
  override protected def doExecute(): RDD[InternalRow] = {
    run(SparkSession.active)
    sparkContext.emptyRDD[InternalRow]
  }
}

private[sql] case class GraftUpdateExec(dir: String, cond: Option[Column],
    assigns: Seq[(String, Column)]) extends GraftDmlExec {
  override protected def run(spark: SparkSession): Unit = {
    VersionedTable.updateWhere(spark, dir,
      cond.getOrElse(lit(true)), assigns.toMap)
    ()
  }
}

private[sql] case class GraftDeleteExec(dir: String, cond: Column)
    extends GraftDmlExec {
  override protected def run(spark: SparkSession): Unit = {
    VersionedTable.deleteWhere(spark, dir, cond)
    ()
  }
}

private[sql] case class GraftMergeExec(dir: String, source: LogicalPlan,
    key: String, declared: Option[org.apache.spark.sql.types.StructType] =
      None)
    extends GraftDmlExec {
  override protected def run(spark: SparkSession): Unit = {
    // the engine merges against raw files (physical names); a renamed
    // table's source arrives with LOGICAL names — relabel at EVERY
    // depth (array element / map value struct members included; a
    // top-level toDF relabel once left element members logical, and the
    // engine's by-name union against physical files failed on them).
    // physicalNamesFor preserves the source's own member order, so the
    // conforming cast is a pure positional rename — values never move.
    val src0 = PlanDf.ofPlan(spark, source)
    val src = declared match {
      case None => src0
      case Some(decl) =>
        import org.apache.spark.sql.functions.col
        def q(n: String) = "`" + n.replace("`", "``") + "`"
        src0.select(src0.schema.fields.map { f =>
          decl.fields.find(_.name.equalsIgnoreCase(f.name)) match {
            case Some(d) =>
              val pt = ColumnMapping.physicalNamesFor(f.dataType, d.dataType)
              val base = col(q(f.name))
              (if (pt == f.dataType) base else base.cast(pt))
                .as(ColumnMapping.physOf(d))
            case None => col(q(f.name))
          }
        }.toIndexedSeq: _*)
    }
    val keyPhys = declared
      .flatMap(_.fields.find(_.name.equalsIgnoreCase(key)))
      .map(ColumnMapping.physOf).getOrElse(key)
    VersionedTable.merge(spark, dir, src, keyPhys)
    ()
  }
}

private[sql] case class GraftMergeFullExec(dir: String,
    source: LogicalPlan, targetKey: String, sourceKey: String,
    matched: Seq[MergeClause], notMatched: Seq[MergeClause],
    bySource: Seq[MergeClause]) extends GraftDmlExec {
  override protected def run(spark: SparkSession): Unit = {
    VersionedTable.mergeInto(spark, dir, PlanDf.ofPlan(spark, source),
      targetKey, sourceKey, matched, notMatched, bySource)
    ()
  }
}

/** Per-session installation (idempotent, the [[graft.operators.AsOf]]
  * pattern); [[GraftCatalog.initialize]] installs it automatically, so
  * configuring the catalog is enough to get the DML statements. */
object GraftDml {
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(GraftDmlStrategy))
      exp.extraStrategies = exp.extraStrategies :+ GraftDmlStrategy
  }
}
