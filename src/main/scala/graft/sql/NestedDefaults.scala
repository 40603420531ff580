package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Coalesce, CreateNamedStruct, Expression, GetStructField, If, IsNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types._

/** NESTED existence defaults — `ALTER TABLE t ADD COLUMNS (main.rh BIGINT
  * DEFAULT 50)` — substituted by the ENGINE's own read path where Spark's
  * EXISTS_DEFAULT machinery cannot reach (Spark's substitution is a
  * top-level-column mechanism: the parquet readers fill missing TOP-LEVEL
  * columns from the read schema's metadata, but a missing STRUCT MEMBER is
  * assembled as a plain null at any depth).
  *
  * Semantics — an existence default with COALESCE reads, declared rather
  * than approximated:
  *
  *   - Rows landed BEFORE the ADD serve the default wherever their parent
  *     struct is non-null (a NULL parent stays NULL: the member only
  *     "exists" where the parent does). Zero files rewrite.
  *   - Rows landed AFTER the ADD serve their stored value. The append
  *     doors REFUSE a batch storing NULL in a defaulted member under a
  *     non-null parent ([[graft.sinks.VersionedTable]] commit validation)
  *     — with a per-file reader there is no way to tell a stored NULL
  *     from an absent member, so the engine refuses the write that would
  *     read back as the default rather than serving the lie. Engine
  *     rewrite paths (compaction, COW DML carrying pre-evolution rows
  *     forward under a pinned schema) are exempt: a rewritten
  *     pre-evolution row MAY store NULL, and the coalesce read serves the
  *     default for it — value-identical to reading the original file.
  *   - The ANALYZE scan substitutes too ([[graft.sinks.VersionedTable]]
  *     statsLines), so every sidecar line (range bounds, null counts,
  *     NDV/KLL sketches) describes SERVED values — manifest pruning,
  *     sidecar MIN/MAX serving, TopN admission and CBO estimates stay
  *     coherent with what the scan returns. Parquet row-group pruning,
  *     by contrast, sees only STORED values, so filters referencing a
  *     defaulted member are withheld from the inner parquet builder
  *     (manifest-level pruning keeps working) — see PruningScanBuilder.
  *
  * The substitution itself is [[NestedDefaultRewrite]]: a post-pushdown
  * optimizer rule (the [[Mview]] installation pattern) wrapping the
  * catalog scan in a Project that rebuilds only the struct columns that
  * carry defaulted members in their PRUNED shape — aliases keep the scan
  * attributes' exprIds, so the surrounding plan binds unchanged, and
  * column pruning has already happened when the rule runs, so the rebuild
  * touches exactly the members the query reads. Time travel is immune by
  * construction: a pre-ADD vintage's declared schema carries no default,
  * so its scans build no rebuild — history is immutable.
  *
  * Scope: atomic-typed members of structs at any depth — array ELEMENT
  * and map VALUE structs included (the substitution rebuilds elements
  * through a `transform`/`transform_values` lambda, [[rebuildAny]]; a
  * NULL element is a NULL parent and stays NULL; the append-door gate
  * enforces per element through the same forall predicates nested NOT
  * NULL uses). Struct-typed defaults refuse; map KEY structs never
  * declare. Nested NOT NULL is a sibling concern with its own
  * commit-enforced machinery — see [[NestedNotNull]]; a member may
  * declare both (ADD … NOT NULL DEFAULT d), where the default covers
  * history and the NOT NULL governs new writes.
  *
  * Door map: the CATALOG scan substitutes (SELECT, `@v` time travel —
  * which follows the engine's top-level convention: schema and its
  * declared defaults travel with the HEAD, data with the version — and
  * `#changes=` slices, which plan through the same scan builder). The
  * CHANGE FEEDS (`#cdf=`, the streaming reader) and the Scala raw door
  * ([[graft.sinks.VersionedTable]] read) serve STORED values — a change
  * feed is a physical log and the Scala door is declaredly physical;
  * both already serve stored values for top-level defaults, so the
  * nested behavior matches the existing convention rather than forking
  * it.
  */
private[graft] object NestedDefaults {
  /** Spark's own metadata key — reused so one convention names the
    * "value already-landed rows serve" on top-level AND nested fields. */
  val ExistsKey = "EXISTS_DEFAULT"

  /** Dotted LOGICAL paths (depth >= 2, literal `element`/`value` segments
    * for collection hops) of members carrying an existence default, with
    * the member's declared type and the default's SQL. Map KEY structs
    * are not walked — identity-bearing, they never declare. */
  def paths(schema: StructType): Seq[(Seq[String], DataType, String)] = {
    def walk(s: StructType, prefix: Seq[String])
        : Seq[(Seq[String], DataType, String)] =
      s.fields.toSeq.flatMap { f =>
        val here =
          if (prefix.nonEmpty && f.metadata.contains(ExistsKey))
            Seq((prefix :+ f.name, f.dataType,
              f.metadata.getString(ExistsKey)))
          else Seq.empty
        here ++ (f.dataType match {
          case st: StructType => walk(st, prefix :+ f.name)
          case ArrayType(st: StructType, _) =>
            walk(st, prefix :+ f.name :+ "element")
          case MapType(_, st: StructType, _) =>
            walk(st, prefix :+ f.name :+ "value")
          case _ => Seq.empty
        })
      }
    walk(schema, Seq.empty)
  }

  def hasAny(schema: StructType): Boolean = paths(schema).nonEmpty

  /** Render a member path as the `graft.nested.default.<path>` property
    * suffix: a segment whose NAME contains a literal dot (or backtick)
    * is backtick-quoted with `` ` `` doubled inside — the same
    * multipart-identifier convention set_not_null parses — so a dotted
    * member name round-trips through SHOW CREATE instead of mis-splitting
    * on reconstruction. [[parsePropertyPath]] is the exact inverse. */
  def renderPropertyPath(path: Seq[String]): String = path.map { s =>
    if (s.contains('.') || s.contains('`'))
      "`" + s.replace("`", "``") + "`"
    else s
  }.mkString(".")

  /** Split a `graft.nested.default.<path>` suffix into segments: dots
    * split OUTSIDE backtick quotes; inside them `` `` `` unescapes to a
    * literal backtick. Inverse of [[renderPropertyPath]]. */
  def parsePropertyPath(dotted: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var quoted = false
    var i = 0
    while (i < dotted.length) {
      val c = dotted.charAt(i)
      if (quoted) {
        if (c == '`') {
          if (i + 1 < dotted.length && dotted.charAt(i + 1) == '`') {
            cur += '`'; i += 1
          } else quoted = false
        } else cur += c
      } else c match {
        case '`' => quoted = true
        case '.' => out += cur.result(); cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    require(!quoted,
      s"graft.nested.default.$dotted: unbalanced backtick quote")
    out += cur.result()
    out.toSeq
  }

  /** Top-level column names (lowercase) owning at least one defaulted
    * member — the conservative unit for filter-pushdown withholding. */
  def defaultedRoots(schema: StructType): Set[String] =
    paths(schema).map(_._1.head.toLowerCase).toSet

  /** The default as a folded literal of the member's CURRENT declared
    * type — parsed from the stored SQL and cast at use time, so a later
    * type widening of the member needs no metadata rewrite. Memoized per
    * (sql, type, SESSION TIMEZONE): the parse-and-fold is constant per
    * defaulted member but this runs inside an optimizer rule, so a cold
    * re-parse per query was pure planning overhead. The timezone is part
    * of the key because the fold casts with the active session's zone —
    * a string default cast to a TIMESTAMP member folds to a different
    * instant under a different spark.sql.session.timeZone, and a memo
    * keyed only on (sql, type) would serve the first session's literal
    * to every later one. */
  private val foldMemo = new java.util.concurrent.ConcurrentHashMap[
    (String, DataType, String), Literal]()
  private def foldedDefault(sql: String, dt: DataType): Literal = {
    val tz = SparkSession.active.sessionState.conf.sessionLocalTimeZone
    foldMemo.computeIfAbsent((sql, dt, tz), { case (s, t, zone) =>
      val spark = SparkSession.active
      val parsed = spark.sessionState.sqlParser.parseExpression(s)
      require(parsed.foldable,
        s"nested DEFAULT must be a constant-foldable expression: $s")
      val cast = Cast(parsed, t, Some(zone))
      Literal(cast.eval(null), t)
    })
  }

  /** Rebuild `schema` with an existence default declared on the member
    * at dotted logical `path` — the CREATE-TABLE half of the SHOW CREATE
    * round-trip: nested member defaults are not expressible in CREATE's
    * STRUCT<> syntax, so [[graft.sql.GraftCatalog]] reports each as a
    * `graft.nested.default.<path>` TBLPROPERTY (derived from this
    * metadata, never stored) and reconstructs it here when a CREATE
    * carries the property. Same storage discipline as ALTER ADD COLUMNS
    * … DEFAULT: the SQL folds once against the member's declared type
    * and the FOLDED literal's SQL is what the metadata carries. */
  def withDefault(schema: StructType, path: Seq[String],
                  sql: String): StructType = {
    val dotted = path.mkString(".")
    require(path.length >= 2,
      s"graft.nested.default.$dotted: top-level defaults belong in the " +
        "column definition (c T DEFAULT d), not a property")
    def set(dt: DataType, ps: List[String]): DataType = (dt, ps) match {
      case (s: StructType, h :: t) =>
        val i = s.fields.indexWhere(_.name.equalsIgnoreCase(h))
        require(i >= 0, s"graft.nested.default.$dotted: no member '$h'")
        val f = s.fields(i)
        val updated = t match {
          case Nil =>
            require(!(f.dataType.isInstanceOf[StructType] ||
                f.dataType.isInstanceOf[ArrayType] ||
                f.dataType.isInstanceOf[MapType]),
              s"graft.nested.default.$dotted needs an atomic-typed " +
                s"member, got ${f.dataType.simpleString}")
            val lit = foldedDefault(sql, f.dataType)
            require(lit.value != null,
              s"graft.nested.default.$dotted must fold to a non-null " +
                "constant (it is the value already-landed rows serve)")
            f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
              .withMetadata(f.metadata).putString(ExistsKey, lit.sql)
              .build())
          case "element" :: rest if f.dataType.isInstanceOf[ArrayType] =>
            val a = f.dataType.asInstanceOf[ArrayType]
            f.copy(dataType = a.copy(elementType = set(a.elementType, rest)))
          case "value" :: rest if f.dataType.isInstanceOf[MapType] =>
            val m = f.dataType.asInstanceOf[MapType]
            f.copy(dataType = m.copy(valueType = set(m.valueType, rest)))
          case rest => f.copy(dataType = set(f.dataType, rest))
        }
        StructType(s.fields.updated(i, updated))
      case (other, ps2) => throw new IllegalArgumentException(
        s"graft.nested.default.$dotted: '${ps2.headOption.getOrElse("")}'" +
          s" does not resolve inside ${other.simpleString} (arrays via " +
          "`.element.`, map values via `.value.`)")
    }
    set(schema, path.toList).asInstanceOf[StructType]
  }

  /** Rebuild `input` (whose type is `actual`, a by-name subset of the
    * declared `decl` — the pruned read shape) substituting defaults into
    * its defaulted members, parent-null-guarded at every level. Structs
    * rebuild member-wise; an ARRAY's element structs (and a MAP's value
    * structs) rebuild through a `transform`/`transform_values` lambda —
    * a NULL element is a NULL parent and stays NULL, exactly like a NULL
    * struct. None when nothing under `actual` carries a default (the
    * rebuild would be the identity). */
  def rebuildAny(input: Expression, decl: DataType,
                 actual: DataType): Option[Expression] = {
    import org.apache.spark.sql.catalyst.expressions.{ArrayTransform, LambdaFunction, NamedLambdaVariable, TransformValues}
    (actual, decl) match {
      case (as: StructType, ds: StructType) => rebuild(input, ds, as)
      case (ArrayType(as: StructType, cn), ArrayType(ds: StructType, _)) =>
        val lv = NamedLambdaVariable("el", as, cn)
        rebuild(lv, ds, as).map(body =>
          ArrayTransform(input, LambdaFunction(body, Seq(lv))))
      case (MapType(kt, as: StructType, vcn),
            MapType(_, ds: StructType, _)) =>
        val kv = NamedLambdaVariable("k", kt, nullable = false)
        val vv = NamedLambdaVariable("v", as, vcn)
        rebuild(vv, ds, as).map(body =>
          TransformValues(input, LambdaFunction(body, Seq(kv, vv))))
      case _ => None
    }
  }

  def rebuild(input: Expression, decl: StructType,
              actual: StructType): Option[Expression] = {
    var changed = false
    val members = actual.fields.toSeq.zipWithIndex.map { case (f, i) =>
      val child = GetStructField(input, i, Some(f.name))
      val d = decl.fields.find(_.name.equalsIgnoreCase(f.name))
      val value: Expression = d match {
        case Some(df) if df.metadata.contains(ExistsKey) =>
          changed = true
          Coalesce(Seq(child,
            foldedDefault(df.metadata.getString(ExistsKey), f.dataType)))
        case Some(df) =>
          rebuildAny(child, df.dataType, f.dataType) match {
            case Some(r) => changed = true; r
            case None => child
          }
        case None => child
      }
      (f.name, value)
    }
    if (!changed) return None
    val struct = CreateNamedStruct(members.flatMap { case (n, v) =>
      Seq(Literal(n), v) })
    Some(If(IsNull(input), Literal(null, struct.dataType), struct))
  }

  /** Project list over `output` substituting defaults per `decl` (the
    * declared schema in the SAME naming as the attributes — logical for
    * the SQL scan, physical for engine-internal frames). Rebuilt columns
    * get FRESH exprIds — reusing the scan attribute's id would make the
    * Project look identity-shaped and the physical planner would remove
    * it as redundant; [[NestedDefaultRewrite]] rewrites upstream
    * references through transformUpWithNewOutput instead. None = no
    * attribute needs a rebuild. */
  def projectList(output: Seq[Attribute],
                  decl: StructType): Option[Seq[NamedExpression]] = {
    var changed = false
    val list: Seq[NamedExpression] = output.map { a =>
      val rebuilt = for {
        d <- decl.fields.find(_.name.equalsIgnoreCase(a.name))
        r <- rebuildAny(a, d.dataType, a.dataType)
      } yield Alias(r, a.name)()
      rebuilt match {
        case Some(al) => changed = true; al
        case None => a
      }
    }
    if (changed) Some(list) else None
  }

  /** DataFrame door ([[graft.sinks.VersionedTable]] statsLines): the same
    * substitution as Columns over a frame carrying PHYSICAL names —
    * presence-guarded, so a frame of pre-evolution files (member column
    * absent from the read schema entirely) passes through untouched; the
    * absent member serves its default at read, not at stats time. */
  def substitute(df: DataFrame, declPhysical: StructType): DataFrame = {
    def asCol(e: Expression): Column =
      org.apache.spark.sql.graft.GraftExpressions.column(e)
    val exprs = df.queryExecution.analyzed.output.map { a =>
      val rebuilt = for {
        d <- declPhysical.fields.find(_.name.equalsIgnoreCase(a.name))
        r <- rebuildAny(a, d.dataType, a.dataType)
      } yield asCol(Alias(r, a.name)())
      rebuilt.getOrElse(asCol(a))
    }
    if (exprs.isEmpty) df else df.select(exprs: _*)
  }
}

/** NESTED `NOT NULL` — declared on a struct member (any depth, array
  * ELEMENT / map VALUE structs included) and commit-ENFORCED through the
  * same one-pass batch aggregate as user CHECK constraints and top-level
  * NOT NULL ([[graft.sinks.VersionedTable]] validateConstraints).
  *
  * Semantics — parent-null-guarded, matching the nested-defaults
  * convention: the member constraint applies exactly where its enclosing
  * parent EXISTS. A NULL parent struct (or a NULL array element / map
  * value) satisfies every member declaration vacuously; a non-null
  * parent whose declared-NOT-NULL member is NULL refuses the commit.
  * Declarations arrive via CREATE TABLE, `ALTER COLUMN p.m SET NOT
  * NULL` (born-valid or refused: one raw scan over SERVED values — the
  * nested-defaults substitution applies first, so a faithful stored
  * NULL under a defaulted member doesn't misfire), or `ADD COLUMNS
  * (p.m T NOT NULL DEFAULT d)` (legal exactly when the non-null default
  * covers already-landed history, the top-level convention).
  *
  * Members that ALSO carry an existence default are skipped here: for
  * user batches [[graft.sinks.VersionedTable]] nestedDefaultChecks
  * already refuses the only observable violation (a stored NULL under a
  * non-null parent), and engine rewrites carrying pre-evolution rows
  * forward legitimately STORE NULL there (the coalesce read serves the
  * non-null default) — enforcing the raw predicate would refuse a
  * faithful carry. Un-defaulted members enforce on every commit, engine
  * rewrites included: born-valid proved the live table reads non-null,
  * so a rewrite's stored values satisfy the predicate by construction.
  *
  * What the declaration buys at plan time: the whole-chain case (every
  * field on the dotted path declared NOT NULL) is a ZERO-NULL PROOF for
  * the dotted path — TopN pushdown accepts it with no ANALYZE, exactly
  * like a top-level NOT NULL (PruningScanBuilder.pushTopN). */
private[graft] object NestedNotNull {
  import org.apache.spark.sql.types.{ArrayType, MapType}

  /** Dotted LOGICAL paths (depth >= 2, literal `element`/`value`
    * segments included) of nested members declared NOT NULL. Map KEY
    * structs are not walked — they never evolve and never declare. */
  def paths(schema: StructType): Seq[Seq[String]] = {
    def walk(dt: DataType, prefix: Seq[String]): Seq[Seq[String]] =
      dt match {
        case s: StructType => s.fields.toSeq.flatMap { f =>
          val p = prefix :+ f.name
          (if (!f.nullable && prefix.nonEmpty) Seq(p) else Seq.empty) ++
            walk(f.dataType, p)
        }
        case ArrayType(s: StructType, _) => walk(s, prefix :+ "element")
        case MapType(_, s: StructType, _) => walk(s, prefix :+ "value")
        case _ => Seq.empty
      }
    walk(schema, Seq.empty)
  }

  def hasAny(schema: StructType): Boolean = paths(schema).nonEmpty

  /** True iff the member at `path` (and every member on the way) is free
    * of an existence default — the gate for raw (stored-value)
    * enforcement; see the class doc. */
  def undefaulted(schema: StructType, path: Seq[String]): Boolean = {
    def walk(dt: DataType, ps: List[String]): Boolean = (dt, ps) match {
      case (_, Nil) => true
      case (s: StructType, h :: t) =>
        s.fields.find(_.name.equalsIgnoreCase(h)).forall(f =>
          !f.metadata.contains(NestedDefaults.ExistsKey) &&
            walk(f.dataType, t))
      case (ArrayType(s: StructType, _), "element" :: t) => walk(s, t)
      case (MapType(_, s: StructType, _), "value" :: t) => walk(s, t)
      case _ => true
    }
    walk(schema, path.toList)
  }

  /** The enforcement predicate for one declared path, over PHYSICAL
    * names (what batch files carry), parent-null-guarded at every level.
    * Plain chains render as `a IS NULL OR a.b IS NULL OR a.b.c IS NOT
    * NULL`; collection hops render as `forall` lambdas whose NULL
    * elements pass (a null element is a null parent). The predicate
    * never evaluates to NULL, so the commit aggregate's
    * NULL-passes-CHECK convention cannot mask a violation. */
  def predicate(schema: StructType, path: Seq[String]): String = {
    def q(s: String) = "`" + s.replace("`", "``") + "`"
    def okIn(sql: String, st: StructType, ps: List[String],
             depth: Int): String = {
      val f = st.fields.find(_.name.equalsIgnoreCase(ps.head)).getOrElse(
        throw new IllegalArgumentException(
          s"nested NOT NULL: no member '${ps.head}' on path " +
            path.mkString(".")))
      val child =
        if (sql.isEmpty) q(ColumnMapping.physOf(f))
        else s"$sql.${q(ColumnMapping.physOf(f))}"
      (f.dataType, ps.tail) match {
        case (_, Nil) => s"$child IS NOT NULL"
        case (cs: StructType, rest) =>
          s"($child IS NULL OR ${okIn(child, cs, rest, depth)})"
        case (ArrayType(cs: StructType, _), "element" :: rest) =>
          val v = s"_e$depth"
          s"($child IS NULL OR forall($child, $v -> $v IS NULL OR " +
            okIn(v, cs, rest, depth + 1) + "))"
        case (MapType(_, cs: StructType, _), "value" :: rest) =>
          val v = s"_e$depth"
          s"($child IS NULL OR forall(map_values($child), $v -> " +
            s"$v IS NULL OR " + okIn(v, cs, rest, depth + 1) + "))"
        case (other, _) => throw new IllegalArgumentException(
          s"nested NOT NULL path ${path.mkString(".")}: '${ps.head}' is " +
            s"${other.simpleString}, which has no members at this path")
      }
    }
    okIn("", schema, path.toList, 0)
  }

  /** (label, physical predicate SQL) for every UN-DEFAULTED nested NOT
    * NULL declaration — what [[graft.sinks.VersionedTable]] folds into
    * the one-pass commit aggregate. */
  def checks(schema: StructType): Seq[(String, String)] =
    paths(schema).filter(undefaulted(schema, _)).map { p =>
      (s"nested NOT NULL ${p.mkString(".")}", predicate(schema, p))
    }

  /** True iff `batch` (a frame under PHYSICAL names) carries the member
    * at declared logical `path` — resolved structurally: each declared
    * segment maps to its physical name, matched in the batch's shape at
    * the same depth. An absent member cannot be predicate-checked (the
    * SQL would not resolve); the caller decides refuse-vs-skip via
    * [[firstAbsentSegment]]. */
  def presentIn(batch: StructType, decl: StructType,
                path: Seq[String]): Boolean =
    firstAbsentSegment(batch, decl, path).isEmpty

  /** Where the declared `path` breaks off in `batch`: `Some(i)` is the
    * 0-based index of the first segment that breaks; `None` means fully
    * present. The absent-vs-leaf distinction matters for the commit
    * gate: a batch missing only the LEAF under a fully-present parent
    * chain would read NULL into every row whose parents are non-null
    * (refuse), while a batch missing an ANCESTOR reads a NULL parent on
    * every row — which satisfies the member declaration vacuously,
    * exactly as a carried NULL parent does (skip). Callers that must
    * also tell ABSENT apart from TYPE-INCOMPATIBLE use [[firstBreak]]. */
  def firstAbsentSegment(batch: StructType, decl: StructType,
                         path: Seq[String]): Option[Int] =
    firstBreak(batch, decl, path).map(_._1)

  /** [[firstAbsentSegment]] with the WHY: `Some((i, false))` — segment i
    * is ABSENT from the batch (the vacuous-NULL-parent reading is
    * sound); `Some((i, true))` — the batch CARRIES a value at segment i
    * of a structurally INCOMPATIBLE kind (not a struct where the
    * declaration descends one, array vs map, …). A mismatch is NOT a
    * vacuous parent: treating it as one would silently skip the commit
    * gate on a batch the table can't serve — the caller refuses user
    * batches on it instead. */
  def firstBreak(batch: StructType, decl: StructType,
                 path: Seq[String]): Option[(Int, Boolean)] = {
    def walk(b: DataType, d: DataType, ps: List[String],
             idx: Int): Option[(Int, Boolean)] =
      (b, d, ps) match {
        case (_, _, Nil) => None
        case (bs: StructType, ds: StructType, h :: t) =>
          ds.fields.find(_.name.equalsIgnoreCase(h)) match {
            case None => Some((idx, false))
            case Some(df) =>
              bs.fields.find(_.name.equalsIgnoreCase(
                ColumnMapping.physOf(df))) match {
                case None => Some((idx, false))
                case Some(bf) => walk(bf.dataType, df.dataType, t, idx + 1)
              }
          }
        case (ArrayType(be, _), ArrayType(de, _), "element" :: t) =>
          walk(be, de, t, idx + 1)
        case (MapType(_, bv, _), MapType(_, dv, _), "value" :: t) =>
          walk(bv, dv, t, idx + 1)
        // the batch carries SOMETHING at this segment, of the wrong
        // structural kind for the declaration to descend — a mismatch,
        // not an absence
        case _ => Some((idx, true))
      }
    walk(batch, decl, path.toList, 0)
  }
}

/** Post-pushdown substitution rule (see [[NestedDefaults]]): wraps each
  * catalog scan whose table declares nested defaults in a Project
  * rebuilding the defaulted struct columns. Runs in the "User Provided
  * Optimizers" batch (a fixed point), so the wrap is guarded by a node
  * tag to stay idempotent. Installed per-session like [[MviewRewrite]]
  * ([[GraftCatalog]] loadTable installs it on every table load, so any
  * session that can reach a defaulted table has it). */
object NestedDefaultRewrite extends Rule[LogicalPlan] {
  private val Done = TreeNodeTag[Boolean]("graft.nestedDefaults.done")

  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(NestedDefaultRewrite))
      spark.experimental.extraOptimizations = cur :+ NestedDefaultRewrite
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // The TARGET relation of a row-level command must stay bare: the
    // DML planner strategies pattern-match the relation directly (a
    // Project wrapped around it planned as an internal error), and the
    // engine's own doors substitute served values themselves
    // (deleteWhere/updateWhere filter over the substituted frame), so
    // excluding the target loses no semantics. Source-side scans (a
    // MERGE's source, an INSERT's SELECT) still substitute.
    import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, MergeIntoTable, UpdateTable}
    def exclude(target: LogicalPlan): Unit = target.foreach {
      case r: DataSourceV2ScanRelation => r.setTagValue(Done, true)
      case _ => ()
    }
    plan.foreach {
      case d: DeleteFromTable => exclude(d.table)
      case u: UpdateTable => exclude(u.table)
      case m: MergeIntoTable => exclude(m.targetTable)
      case _ => ()
    }
    plan.transformUpWithNewOutput {
      case r: DataSourceV2ScanRelation
          if r.getTagValue(Done).isEmpty &&
            r.scan.isInstanceOf[PruningScanBuilder#GraftScan] =>
        r.setTagValue(Done, true)
        r.scan.asInstanceOf[PruningScanBuilder#GraftScan].nestedDefaultDecl
          .flatMap(NestedDefaults.projectList(r.output, _)) match {
          case Some(list) =>
            val proj = Project(list, r)
            (proj, r.output.zip(proj.output)
              .filter { case (a, b) => a.exprId != b.exprId })
          case None => (r, Seq.empty)
        }
    }
  }
}
