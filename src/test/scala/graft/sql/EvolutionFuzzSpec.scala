package graft.sql

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Randomized schema-evolution fuzzer.
  *
  * The hand-authored interplay probes (rounds 12–14) found seven real
  * cross-feature defects in hand-reachable corners; this spec GENERATES
  * the corners instead: each sequence interleaves random LEGAL ALTERs
  * (ADD/RENAME/DROP/widen/reposition/comment, top-level AND nested
  * struct / array-element members, with and without existence defaults)
  * with appends, SQL DELETEs and SQL UPDATEs, and after every step
  * checks the engine against an in-memory MODEL:
  *
  *  - the declared schema (names, order, types, comments) at every step;
  *  - the SERVED rows (defaults substituted over pre-evolution files,
  *    renames/repositions applied, DML applied) after every data-changing
  *    step and at the end;
  *  - at the end, the SHOW CREATE round-trip: the emitted DDL re-creates
  *    a table with the identical declared surface, nested existence
  *    defaults included.
  *
  * Every sequence is replayable from its printed seed; a find's assert
  * message carries the full action ledger.
  */
class EvolutionFuzzSpec extends SparkSpec {

  private def register(): Unit =
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)

  // ---- model ----

  private sealed trait MType
  private case object MInt extends MType
  private case object MLong extends MType
  private case object MFloat extends MType
  private case object MDouble extends MType
  private case object MString extends MType
  private case class MStruct(ms: Vector[MField]) extends MType
  private case class MArray(elem: MStruct) extends MType

  /** default: the canonical VALUE historical rows serve (nested
    * existence default / top-level column default). */
  private case class MField(name: String, t: MType,
                            comment: Option[String] = None,
                            default: Option[Any] = None)

  private def sqlType(t: MType): String = t match {
    case MInt => "INT"
    case MLong => "BIGINT"
    case MFloat => "FLOAT"
    case MDouble => "DOUBLE"
    case MString => "STRING"
    case MStruct(ms) =>
      ms.map(f => s"${f.name}: ${sqlType(f.t)}").mkString("STRUCT<", ", ", ">")
    case MArray(e) => s"ARRAY<${sqlType(e)}>"
  }

  private def sparkType(t: MType): DataType = t match {
    case MInt => IntegerType
    case MLong => LongType
    case MFloat => FloatType
    case MDouble => DoubleType
    case MString => StringType
    case MStruct(ms) => sparkSchema(ms)
    case MArray(e) => ArrayType(sparkSchema(e.ms))
  }

  private def sparkSchema(fs: Vector[MField]): StructType =
    StructType(fs.map(f => StructField(f.name, sparkType(f.t))))

  private def litSql(t: MType, v: Any): String = (t, v) match {
    case (MInt, l: Long) => l.toString
    case (MLong, l: Long) => s"CAST($l AS BIGINT)"
    case (MFloat, d: Double) => s"CAST($d AS FLOAT)"
    case (MDouble, d: Double) => d.toString
    case (MString, s: String) => s"'$s'"
    case other => sys.error(s"no literal for $other")
  }

  // ---- canonical values: Long / Double / String / Map / Vector / null --

  private def toSpark(v: Any, t: MType): Any = (v, t) match {
    case (null, _) => null
    case (l: Long, MInt) => l.toInt
    case (l: Long, MLong) => l
    case (d: Double, MFloat) => d.toFloat
    case (d: Double, MDouble) => d
    case (s: String, MString) => s
    case (m: Map[_, _], MStruct(ms)) =>
      toRow(m.asInstanceOf[Map[String, Any]], ms)
    case (xs: Vector[_], MArray(e)) => xs.map {
      case null => null
      case m: Map[_, _] => toRow(m.asInstanceOf[Map[String, Any]], e.ms)
    }
    case other => sys.error(s"bad model value $other")
  }

  private def toRow(m: Map[String, Any], fs: Vector[MField]): Row =
    Row(fs.map(f => toSpark(m(f.name), f.t)): _*)

  private def canon(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (r: Row, st: StructType) =>
      st.fields.zipWithIndex.map { case (f, i) =>
        f.name -> canon(r.get(i), f.dataType) }.toMap
    case (s: scala.collection.Seq[_], at: ArrayType) =>
      s.map(canon(_, at.elementType)).toVector
    case (i: Int, _) => i.toLong
    case (l: Long, _) => l
    case (f: Float, _) => f.toDouble
    case (d: Double, _) => d
    case (s: String, _) => s
    case other => sys.error(s"unexpected actual value $other")
  }

  // ---- model navigation (path segments; "element" hops into arrays) --

  private def membersAt(fs: Vector[MField], path: Seq[String])
      : Vector[MField] =
    path.toList match {
      case Nil => fs
      case h :: t =>
        fs.find(_.name == h).get.t match {
          case MStruct(ms) => membersAt(ms, t)
          case MArray(e) =>
            require(t.headOption.contains("element"))
            membersAt(e.ms, t.tail)
          case other => sys.error(s"no members under $other")
        }
    }

  private def updateAt(fs: Vector[MField], path: Seq[String],
                       f: Vector[MField] => Vector[MField]): Vector[MField] =
    path.toList match {
      case Nil => f(fs)
      case h :: t => fs.map { fld =>
        if (fld.name != h) fld
        else fld.t match {
          case MStruct(ms) => fld.copy(t = MStruct(updateAt(ms, t, f)))
          case MArray(e) =>
            require(t.headOption.contains("element"))
            fld.copy(t = MArray(MStruct(updateAt(e.ms, t.tail, f))))
          case other => sys.error(s"no members under $other")
        }
      }
    }

  /** Apply `f` to every (possibly null-skipped) struct value at `path`
    * inside one canonical row. */
  private def mapRowAt(row: Map[String, Any], path: Seq[String],
                       f: Map[String, Any] => Map[String, Any])
      : Map[String, Any] =
    path.toList match {
      case Nil => f(row)
      case h :: t => row.get(h) match {
        case None | Some(null) => row
        case Some(m: Map[_, _]) if t.isEmpty || t.head != "element" =>
          row + (h -> mapRowAt(m.asInstanceOf[Map[String, Any]], t, f))
        case Some(xs: Vector[_]) =>
          require(t.headOption.contains("element"))
          row + (h -> xs.map {
            case null => null
            case m: Map[_, _] =>
              mapRowAt(m.asInstanceOf[Map[String, Any]], t.tail, f)
          })
        case other => sys.error(s"bad row value at $h: $other")
      }
    }

  /** Every struct point new members can be added at (path prefix). */
  private def structPoints(fs: Vector[MField]): Vector[Seq[String]] =
    fs.flatMap { f =>
      f.t match {
        case MStruct(_) => Vector(Seq(f.name))
        case MArray(_) => Vector(Seq(f.name, "element"))
        case _ => Vector.empty
      }
    }

  /** Every addressable field as (enclosing-path, field). */
  private def allFields(fs: Vector[MField]): Vector[(Seq[String], MField)] =
    fs.flatMap { f =>
      (Seq.empty[String], f) +: (f.t match {
        case MStruct(ms) => ms.map(m => (Seq(f.name), m))
        case MArray(e) => e.ms.map(m => (Seq(f.name, "element"), m))
        case _ => Vector.empty
      })
    }

  // ---- the fuzz state machine ----

  private class Fuzz(seed: Long) {
    val rnd = new scala.util.Random(seed)
    var model: Vector[MField] = Vector(
      MField("id", MLong),
      MField("v", MDouble),
      MField("main", MStruct(Vector(
        MField("temp", MDouble), MField("kind", MString)))),
      MField("tags", MArray(MStruct(Vector(MField("k", MString))))))
    var rows: Vector[Map[String, Any]] = Vector.empty
    var nextId = 0L
    var nameCounter = 0
    val ledger = scala.collection.mutable.ArrayBuffer.empty[String]
    val dir: String = tmpDir(s"fuzz") + "/t"

    // ---- lineage state (round-16: branch / tag / time travel /
    //      rollback / promote enter the fuzz alphabet) ----
    /** A live branch: fork-time declaration (the branch keeps it no
      * matter what the parent ALTERs), the parent ids it forked over,
      * and the rows landed on the branch since. */
    case class BranchSt(name: String, forkModel: Vector[MField],
                        forkFp: String, forkVersion: Int,
                        forkIds: Vector[Long],
                        added: Vector[Map[String, Any]])
    /** A pinned snapshot for time-travel / tag / rollback checks. Ids
      * verify across ANY later evolution (id never renames or drops);
      * full rows verify only fingerprint-equal rollbacks. */
    case class Snap(version: Int, ids: Vector[Long],
                    snapRows: Vector[Map[String, Any]], fp: String)
    var branch: Option[BranchSt] = None
    var parentAdvancedSinceFork = false
    val snaps = scala.collection.mutable.ArrayBuffer.empty[Snap]
    val taggedSnaps = scala.collection.mutable.Map.empty[String, Snap]
    var tagCounter = 0
    var branchCounter = 0
    var renamedEver = false

    private def ops = graft.sinks.VersionedTable
    /** Declared-surface fingerprint (names + order + types at every
      * depth): the guard that keeps full-row snapshot checks inside the
      * model's depth (fresh generated names are unique, so an equal
      * fingerprint means the row-shaping declaration is unchanged). */
    def fingerprint: String =
      model.map(f => s"${f.name}:${sqlType(f.t)}:${f.default}")
        .mkString("|")
    private def idsOf(rs: Vector[Map[String, Any]]): Vector[Long] =
      rs.map(_("id").asInstanceOf[Long]).sorted

    def fresh(prefix: String): String = { nameCounter += 1
      s"$prefix$nameCounter" }

    def atomValue(t: MType): Any = t match {
      case MInt | MLong => rnd.nextInt(1000).toLong
      case MFloat | MDouble => rnd.nextInt(100) + 0.5
      case MString => s"s${rnd.nextInt(1000)}"
      case other => sys.error(s"not atomic: $other")
    }

    def genStruct(ms: Vector[MField]): Map[String, Any] =
      ms.map { m =>
        // the append gate refuses a stored NULL in a DEFAULTED member
        // under a non-null parent — defaulted members always carry
        val v =
          if (m.default.isEmpty && rnd.nextInt(6) == 0) null
          else atomValue(m.t)
        m.name -> v
      }.toMap

    def genRow(m: Vector[MField] = model): Map[String, Any] = {
      nextId += 1
      m.map { f =>
        val v = f.name match {
          case "id" => nextId
          case _ => f.t match {
            case MStruct(ms) =>
              if (rnd.nextInt(5) == 0) null else genStruct(ms)
            case MArray(e) => Vector.fill(rnd.nextInt(3)) {
              if (rnd.nextInt(8) == 0) null else genStruct(e.ms)
            }
            case atomic =>
              if (f.default.isEmpty && rnd.nextInt(6) == 0) null
              else atomValue(atomic)
          }
        }
        f.name -> v
      }.toMap
    }

    def dotted(path: Seq[String], name: String): String =
      (path :+ name).mkString(".")

    // -- actions: each mutates BOTH the engine (SQL) and the model --

    def create(): Unit = {
      val cols = model.map(f => s"${f.name} ${sqlType(f.t)}")
        .mkString(", ")
      spark.sql(s"CREATE TABLE graft.`$dir` ($cols)")
      ledger += s"CREATE ($cols)"
    }

    def insert(n: Int): Unit = {
      val newRows = Vector.fill(n)(genRow())
      val df = spark.createDataFrame(
        java.util.Arrays.asList(newRows.map(toRow(_, model)): _*),
        sparkSchema(model))
      df.writeTo(s"graft.`$dir`").append()
      parentAdvancedSinceFork = true
      rows ++= newRows
      ledger += s"INSERT $n rows (ids ${newRows.map(_("id")).mkString(",")})"
    }

    def addTop(): Unit = {
      val name = fresh("c")
      val t = Vector(MInt, MLong, MDouble, MString)(rnd.nextInt(4))
      val dflt = if (rnd.nextInt(10) < 4) Some(atomValue(t)) else None
      val pos = rnd.nextInt(10) match {
        case 0 => " FIRST"
        case 1 => s" AFTER ${model(rnd.nextInt(model.size)).name}"
        case _ => ""
      }
      val d = dflt.map(v => s" DEFAULT ${litSql(t, v)}").getOrElse("")
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
        s"($name ${sqlType(t)}$d$pos)")
      val fld = MField(name, t, default = dflt)
      model =
        if (pos == " FIRST") fld +: model
        else if (pos.startsWith(" AFTER ")) {
          val after = pos.stripPrefix(" AFTER ")
          model.flatMap(f =>
            if (f.name == after) Vector(f, fld) else Vector(f))
        } else model :+ fld
      rows = rows.map(_ + (name -> dflt.orNull))
      ledger += s"ADD TOP $name ${sqlType(t)}$d$pos"
    }

    def addNested(): Unit = {
      val pts = structPoints(model)
      if (pts.isEmpty) return
      val path = pts(rnd.nextInt(pts.size))
      val name = fresh("m")
      val t = Vector(MInt, MLong, MDouble, MString)(rnd.nextInt(4))
      val dflt = if (rnd.nextBoolean()) Some(atomValue(t)) else None
      val d = dflt.map(v => s" DEFAULT ${litSql(t, v)}").getOrElse("")
      spark.sql(s"ALTER TABLE graft.`$dir` ADD COLUMNS " +
        s"(${dotted(path, name)} ${sqlType(t)}$d)")
      model = updateAt(model, path, _ :+ MField(name, t, default = dflt))
      rows = rows.map(mapRowAt(_, path, m => m + (name -> dflt.orNull)))
      ledger += s"ADD NESTED ${dotted(path, name)} ${sqlType(t)}$d"
    }

    def rename(): Unit = {
      val cands = allFields(model).filter(_._2.name != "id")
      if (cands.isEmpty) return
      val (path, f) = cands(rnd.nextInt(cands.size))
      val nn = fresh("r")
      spark.sql(s"ALTER TABLE graft.`$dir` RENAME COLUMN " +
        s"${dotted(path, f.name)} TO $nn")
      renamedEver = true
      model = updateAt(model, path,
        _.map(x => if (x.name == f.name) x.copy(name = nn) else x))
      rows =
        if (path.isEmpty)
          rows.map(r => (r - f.name) + (nn -> r(f.name)))
        else rows.map(mapRowAt(_, path,
          m => (m - f.name) + (nn -> m(f.name))))
      ledger += s"RENAME ${dotted(path, f.name)} -> $nn"
    }

    def drop(): Unit = {
      // keep id, keep >=2 top-level columns, keep >=2 members per struct
      val cands = allFields(model).filter { case (p, f) =>
        f.name != "id" &&
          (if (p.isEmpty) model.size > 2 else membersAt(model, p).size > 1)
      }
      if (cands.isEmpty) return
      val (path, f) = cands(rnd.nextInt(cands.size))
      spark.sql(s"ALTER TABLE graft.`$dir` DROP COLUMN " +
        dotted(path, f.name))
      model = updateAt(model, path, _.filterNot(_.name == f.name))
      rows =
        if (path.isEmpty) rows.map(_ - f.name)
        else rows.map(mapRowAt(_, path, _ - f.name))
      ledger += s"DROP ${dotted(path, f.name)}"
    }

    def widen(): Unit = {
      val cands = allFields(model).filter { case (_, f) =>
        f.t == MInt || f.t == MFloat }
      if (cands.isEmpty) return
      val (path, f) = cands(rnd.nextInt(cands.size))
      val to = if (f.t == MInt) MLong else MDouble
      spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN " +
        s"${dotted(path, f.name)} TYPE ${sqlType(to)}")
      model = updateAt(model, path,
        _.map(x => if (x.name == f.name) x.copy(t = to) else x))
      ledger += s"WIDEN ${dotted(path, f.name)} -> ${sqlType(to)}"
    }

    def reposition(): Unit = {
      // top-level and direct struct members (the probed surfaces)
      val pts = Seq.empty[String] +: model.collect {
        case f if f.t.isInstanceOf[MStruct] => Seq(f.name) }
      val path = pts(rnd.nextInt(pts.size))
      val ms = membersAt(model, path)
      if (ms.size < 2) return
      val f = ms(rnd.nextInt(ms.size))
      val others = ms.filterNot(_.name == f.name)
      val (clause, reorder) =
        if (rnd.nextBoolean()) (" FIRST",
          (v: Vector[MField]) => f +: v.filterNot(_.name == f.name))
        else {
          val a = others(rnd.nextInt(others.size))
          (s" AFTER ${a.name}", (v: Vector[MField]) =>
            v.filterNot(_.name == f.name).flatMap(x =>
              if (x.name == a.name) Vector(x, f) else Vector(x)))
        }
      spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN " +
        s"${dotted(path, f.name)}$clause")
      model = updateAt(model, path, reorder)
      ledger += s"REPOSITION ${dotted(path, f.name)}$clause"
    }

    def comment(): Unit = {
      val cands = allFields(model)
      val (path, f) = cands(rnd.nextInt(cands.size))
      val txt = s"note${rnd.nextInt(100)}"
      spark.sql(s"ALTER TABLE graft.`$dir` ALTER COLUMN " +
        s"${dotted(path, f.name)} COMMENT '$txt'")
      model = updateAt(model, path,
        _.map(x => if (x.name == f.name) x.copy(comment = Some(txt)) else x))
      ledger += s"COMMENT ${dotted(path, f.name)} '$txt'"
    }

    def sqlDelete(): Unit = {
      val m = rnd.nextInt(3) + 2
      val r = rnd.nextInt(m)
      spark.sql(s"DELETE FROM graft.`$dir` WHERE id % $m = $r")
      // the documented contract: a catalog read refuses merge-on-read
      // delete debt until compaction materializes it — and compacting
      // HERE folds a pinned-schema rewrite of pre-evolution rows into
      // the fuzz mix, exactly the interplay this spec exists to reach
      spark.sql(s"CALL graft.compact('$dir', ${128L * 1024 * 1024})")
      parentAdvancedSinceFork = true
      rows = rows.filterNot(row =>
        row("id").asInstanceOf[Long] % m == r)
      ledger += s"DELETE WHERE id % $m = $r; compact"
    }

    def sqlUpdate(): Unit = {
      val cands = model.filter(f => f.name != "id" && (f.t match {
        case MStruct(_) | MArray(_) => false
        case _ => true
      }))
      if (cands.isEmpty) return
      val f = cands(rnd.nextInt(cands.size))
      val v = atomValue(f.t)
      val m = rnd.nextInt(3) + 2
      val r = rnd.nextInt(m)
      spark.sql(s"UPDATE graft.`$dir` SET ${f.name} = " +
        s"${litSql(f.t, v)} WHERE id % $m = $r")
      // UPDATE is merge-on-read too (delete vector + updated copies) —
      // same contract as DELETE: compact materializes before reads
      spark.sql(s"CALL graft.compact('$dir', ${128L * 1024 * 1024})")
      parentAdvancedSinceFork = true
      rows = rows.map { row =>
        if (row("id").asInstanceOf[Long] % m == r) row + (f.name -> v)
        else row
      }
      ledger += s"UPDATE SET ${f.name} = $v WHERE id % $m = $r; compact"
    }

    // -- lineage actions (round 16) --

    def snapshot(): Unit = {
      ops.versions(dir).lastOption.foreach { v =>
        snaps += Snap(v, idsOf(rows), rows, fingerprint)
        ledger += s"SNAPSHOT v$v (${rows.size} rows)"
      }
    }

    /** A pinned read (VERSION AS OF through the catalog door) serves
      * the pinned file set under the CURRENT declaration — ids verify
      * across any later evolution. */
    def timeTravelRead(): Unit = {
      if (snaps.isEmpty) return
      val s = snaps(rnd.nextInt(snaps.size))
      val got = spark.sql(
        s"SELECT id FROM graft.`$dir` VERSION AS OF ${s.version}")
        .collect().map(_.getLong(0)).toVector.sorted
      assert(got == s.ids,
        ctx(s"time travel v${s.version} id set diverged: " +
          s"engine=${got.take(20)} model=${s.ids.take(20)}"))
      ledger += s"TIME TRAVEL v${s.version} ok"
    }

    def tagStep(): Unit = {
      ops.versions(dir).lastOption.foreach { v =>
        tagCounter += 1
        val name = s"fz$tagCounter"
        ops.tag(dir, name, v)
        taggedSnaps(name) = Snap(v, idsOf(rows), rows, fingerprint)
        ledger += s"TAG $name = v$v"
      }
    }

    def tagRead(): Unit = {
      if (taggedSnaps.isEmpty) return
      val (name, s) = taggedSnaps.toSeq(rnd.nextInt(taggedSnaps.size))
      val got = spark.sql(s"SELECT id FROM graft.`$dir#tag=$name`")
        .collect().map(_.getLong(0)).toVector.sorted
      assert(got == s.ids,
        ctx(s"tag read '$name' (v${s.version}) id set diverged: " +
          s"engine=${got.take(20)} model=${s.ids.take(20)}"))
      ledger += s"TAG READ $name ok"
    }

    /** Roll back to a FINGERPRINT-EQUAL snapshot (same declared
      * row-shaping surface), which lets the model assert FULL rows —
      * the realistic shape anyway: "a bad batch landed, restore". DML
      * and inserts between snapshot and rollback are exactly what the
      * restore must undo. */
    def rollbackStep(): Unit = {
      val fp = fingerprint
      val cands = snaps.filter(_.fp == fp)
      if (cands.isEmpty) return
      val s = cands(rnd.nextInt(cands.size))
      ops.rollback(dir, s.version)
      rows = s.snapRows
      parentAdvancedSinceFork = true
      ledger += s"ROLLBACK to v${s.version}"
    }

    def branchStep(): Unit = branch match {
      case None =>
        if (ops.versions(dir).isEmpty) return
        branchCounter += 1
        val name = s"exp$branchCounter"
        val forkV = ops.versions(dir).last
        spark.sql(s"CALL graft.create_branch('$dir', '$name', 'head')")
        branch = Some(BranchSt(name, model, fingerprint, forkV,
          idsOf(rows), Vector.empty))
        parentAdvancedSinceFork = false
        ledger += s"CREATE BRANCH $name"
      case Some(b) =>
        // branch landings bind to the FORK-TIME declaration no matter
        // what the parent ALTERed since
        val newRows = Vector.fill(1 + rnd.nextInt(2))(genRow(b.forkModel))
        val df = spark.createDataFrame(
          java.util.Arrays.asList(newRows.map(toRow(_, b.forkModel)): _*),
          sparkSchema(b.forkModel))
        df.writeTo(s"graft.`$dir#branch=${b.name}`").append()
        val nb = b.copy(added = b.added ++ newRows)
        branch = Some(nb)
        val got = spark.sql(s"SELECT id FROM graft.`$dir#branch=${b.name}`")
          .collect().map(_.getLong(0)).toVector.sorted
        val expect = (nb.forkIds ++ idsOf(nb.added)).sorted
        assert(got == expect,
          ctx(s"branch '${b.name}' id set diverged: engine=${got.take(20)}" +
            s" model=${expect.take(20)}"))
        ledger += s"BRANCH INSERT ${newRows.size}"
    }

    /** Fast-forward: succeeds only when the parent head still sits at
      * the fork — a parent that advanced must REFUSE (the documented
      * re-fork contract), and the refusal must leave both lineages
      * intact. Declaration drift since the fork is skipped (the
      * interplay specs pin those crossings; the model tracks rows by
      * current names only). */
    def fastForwardStep(): Boolean = branch match {
      case None => false
      case Some(b) =>
        // a zero-match DELETE publishes nothing, so the coarse flag can
        // overstate advancement — the fork check is the actual head
        if (ops.versions(dir).last != b.forkVersion) {
          val preIds = idsOf(rows)
          val e = intercept[Exception] {
            spark.sql(s"CALL graft.fast_forward('$dir', '${b.name}')")
          }
          assert(e.getMessage.contains("advanced past the fork") ||
            Option(e.getCause).exists(
              _.getMessage.contains("advanced past the fork")),
            ctx(s"ff after parent advance must refuse with the re-fork " +
              s"message, got: ${e.getMessage}"))
          val nowIds = spark.sql(s"SELECT id FROM graft.`$dir`")
            .collect().map(_.getLong(0)).toVector.sorted
          assert(nowIds == preIds,
            ctx("a refused fast-forward changed the parent's rows"))
          ledger += s"FF ${b.name} refused (parent advanced) ok"
          false
        } else if (fingerprint != b.forkFp) {
          ledger += s"FF ${b.name} skipped (declaration drifted)"
          false
        } else {
          spark.sql(s"CALL graft.fast_forward('$dir', '${b.name}')")
          rows ++= b.added
          branch = None
          parentAdvancedSinceFork = true
          ledger += s"FAST FORWARD ${b.name} (+${b.added.size} rows)"
          true
        }
    }

    /** WAP promote from a fresh staging lineage shaped by the CURRENT
      * declaration. Skipped once any rename happened: promote is a
      * pointer carry, so staged files must carry the parent's PHYSICAL
      * names — the documented physical-names protocol door. */
    def promoteStep(): Boolean = {
      if (renamedEver) return false
      val newRows = Vector.fill(1 + rnd.nextInt(2))(genRow())
      val df = spark.createDataFrame(
        java.util.Arrays.asList(newRows.map(toRow(_, model)): _*),
        sparkSchema(model))
      val staging = tmpDir("fz-stage") + "/s"
      ops.commit(df, staging)
      ops.promote(spark, staging, dir)
      rows ++= newRows
      parentAdvancedSinceFork = true
      ledger += s"PROMOTE ${newRows.size} rows"
      true
    }

    /** One random step; returns true when it changed DATA (not just
      * metadata), i.e. a row re-verify is warranted. */
    def step(): Boolean = rnd.nextInt(18) match {
      case 0 | 1 | 2 => insert(1 + rnd.nextInt(2)); true
      case 3 => addTop(); true // historical rows serve the default
      case 4 => addNested(); true
      case 5 => rename(); true
      case 6 => drop(); true
      case 7 => widen(); false
      case 8 => reposition(); false
      case 9 => comment(); false
      case 10 => sqlDelete(); true
      case 11 => sqlUpdate(); true
      case 12 => snapshot(); false
      case 13 => if (rnd.nextBoolean()) timeTravelRead() else tagRead()
        false
      case 14 => tagStep(); false
      case 15 => rollbackStep(); true
      case 16 => branchStep(); false
      case 17 => if (rnd.nextBoolean()) fastForwardStep() else promoteStep()
    }

    // -- verification --

    def ctx(what: String): String =
      s"seed=$seed $what\n  ledger:\n    ${ledger.mkString("\n    ")}"

    def verifySchema(): Unit = {
      def check(ms: Vector[MField], st: StructType, where: String): Unit = {
        assert(st.fields.map(_.name).toVector == ms.map(_.name),
          ctx(s"schema names/order diverged at <$where>: " +
            s"engine=${st.fields.map(_.name).toSeq} model=${ms.map(_.name)}"))
        ms.zip(st.fields.toVector).foreach { case (m, f) =>
          assert(f.dataType == sparkType(m.t) ||
            (m.t.isInstanceOf[MStruct] || m.t.isInstanceOf[MArray]),
            ctx(s"type diverged at <$where.${m.name}>: " +
              s"engine=${f.dataType} model=${sparkType(m.t)}"))
          assert(f.getComment() == m.comment,
            ctx(s"comment diverged at <$where.${m.name}>: " +
              s"engine=${f.getComment()} model=${m.comment}"))
          (m.t, f.dataType) match {
            case (MStruct(mm), ss: StructType) =>
              check(mm, ss, s"$where.${m.name}")
            case (MArray(e), ArrayType(ss: StructType, _)) =>
              check(e.ms, ss, s"$where.${m.name}.element")
            case _ => ()
          }
        }
      }
      check(model, spark.table(s"graft.`$dir`").schema, "top")
    }

    /** Canonical rendering — map keys sorted at every level, so two
      * equal values render identically regardless of insertion order. */
    private def render(v: Any): String = v match {
      case null => "null"
      case m: Map[_, _] => m.asInstanceOf[Map[String, Any]].toSeq
        .sortBy(_._1).map { case (k, x) => s"$k=${render(x)}" }
        .mkString("{", ",", "}")
      case xs: Vector[_] => xs.map(render).mkString("[", ",", "]")
      case other => other.toString
    }

    def verifyRows(): Unit = {
      val df = spark.table(s"graft.`$dir`")
      val actual = df.collect().toVector
        .map(canon(_, df.schema).asInstanceOf[Map[String, Any]])
      val exp = rows
      assert(actual.size == exp.size,
        ctx(s"row count diverged: engine=${actual.size} model=${exp.size}"))
      val (a, e) = (actual.map(render).sorted, exp.map(render).sorted)
      a.zip(e).zipWithIndex.foreach { case ((av, ev), i) =>
        assert(av == ev, ctx(s"row $i diverged:\n  engine=$av\n  model=$ev"))
      }
    }

    /** The DECLARED surface of a schema: everything SHOW CREATE must
      * round-trip (names, order, types, nullability, comments,
      * defaults) — WITHOUT the engine-internal column-mapping metadata
      * (graft.id / graft.physical), which a re-created table mints
      * fresh by design (physical names equal logical names at birth). */
    private def declaredSurface(dt: DataType): DataType = dt match {
      case st: StructType => StructType(st.fields.map { f =>
        val keep = new MetadataBuilder()
        if (f.metadata.contains("comment"))
          keep.putString("comment", f.metadata.getString("comment"))
        // defaults compare by FOLDED VALUE at the member's declared
        // type, not by SQL text: a member widened AFTER its default was
        // declared keeps the original rendering by design (re-cast at
        // read time, no metadata rewrite), while a re-created table
        // stores the literal normalized at the current type — same
        // served value, different string
        Seq("EXISTS_DEFAULT", "CURRENT_DEFAULT").foreach { k =>
          if (f.metadata.contains(k))
            keep.putString(k, foldedValue(f.metadata.getString(k),
              f.dataType))
        }
        StructField(f.name, declaredSurface(f.dataType), f.nullable,
          keep.build())
      })
      case at: ArrayType => at.copy(elementType =
        declaredSurface(at.elementType))
      case mt: MapType => mt.copy(valueType = declaredSurface(mt.valueType))
      case other => other
    }

    private def foldedValue(sql: String, dt: DataType): String = {
      import org.apache.spark.sql.catalyst.expressions.Cast
      val parsed = spark.sessionState.sqlParser.parseExpression(sql)
      String.valueOf(Cast(parsed, dt,
        Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null))
    }

    def verifyRoundTrip(): Unit = {
      val ddl = spark.sql(s"SHOW CREATE TABLE graft.`$dir`")
        .collect().head.getString(0)
      val dir2 = tmpDir("fuzz-rt") + "/t"
      spark.sql(ddl.replace(dir, dir2))
      val (s1, s2) = (spark.table(s"graft.`$dir`").schema,
        spark.table(s"graft.`$dir2`").schema)
      assert(declaredSurface(s2) == declaredSurface(s1),
        ctx(s"SHOW CREATE round-trip diverged:\n  emitted: $ddl\n  " +
          s"orig: $s1\n  re-created: $s2"))
      def foldedPaths(s: StructType) = NestedDefaults.paths(s)
        .map { case (p, t, sql) => (p, t, foldedValue(sql, t)) }
      val (d1, d2) = (foldedPaths(s1), foldedPaths(s2))
      assert(d1 == d2,
        ctx(s"nested defaults lost in round-trip: $d1 vs $d2\n  $ddl"))
    }

    def run(steps: Int, deep: Boolean): Unit = {
      create()
      insert(3)
      verifySchema(); verifyRows()
      (1 to steps).foreach { _ =>
        val dataChanged = step()
        verifySchema()
        if (deep || dataChanged) verifyRows()
      }
      verifyRows()
      verifyRoundTrip()
    }
  }

  // 60 fresh sequences per CI run (~6 min); the round-15 certification
  // ran the full 200 (GRAFT_FUZZ_SEQS=200, seeds 38..6207 via 31i+7) —
  // see docs/PLANS.md. Bump the env var to re-certify.
  private val Sequences =
    sys.env.get("GRAFT_FUZZ_SEQS").map(_.toInt).getOrElse(60)

  test(s"randomized evolution sequences hold the model ($Sequences seqs)") {
    register()
    (1 to Sequences).foreach { i =>
      new Fuzz(seed = 31L * i + 7).run(steps = 8, deep = i % 7 == 0)
    }
  }
}
