package graft.sql

import org.apache.spark.sql.types._

/** Column-id indirection for the declared table schema — the mapping
  * layer that makes `ALTER TABLE RENAME COLUMN` and safe type widening
  * METADATA-ONLY operations (Iceberg field IDs / Delta column mapping,
  * reduced to the engine's name-addressed manifest protocol).
  *
  * Every declared field carries two metadata keys:
  *
  *  - `graft.id` — a stable integer assigned once (CREATE TABLE or the
  *    column's ADD) and never reused, including across DROP;
  *  - `graft.physical` — the name the column's bytes carry in EVERY data
  *    file. Fixed at assignment: writers rename logical → physical before
  *    landing, readers rename physical → logical after scanning, and the
  *    stats/bloom sidecars are keyed physically, so a RENAME touches one
  *    JSON line and nothing else.
  *
  * The indirection is RECURSIVE: fields nested inside struct columns
  * (the reference's raw weather document shape — `main.temp`,
  * weather_etl.py:124–125) carry their own ids and physical names, so
  * ADD/RENAME/DROP of a struct field is metadata-only too. Collision
  * scope for a nested physical name is its ENCLOSING struct (parquet
  * group members are namespaced per group), and the retired ledger
  * records nested entries under their full dotted PHYSICAL path — which
  * is rename-stable, because physical names never change.
  *
  * Because an ADDed column's physical name is chosen to avoid every
  * physical name its scope has EVER used (live or dropped — the retired
  * ledger), `DROP COLUMN c` followed by `ADD COLUMNS (c T)` cannot
  * resurrect the dropped bytes: the new column addresses a fresh
  * physical name that no landed file carries, so old files serve the
  * typed nulls a fresh column promises. The same holds one level down:
  * drop-then-re-add of `main.temp` re-adds under `main.temp_<id>`.
  *
  * Structs inside ARRAY/MAP types evolve the same way: ADD of an
  * element-struct member and safe TYPE widening ride the stock parquet
  * reader exactly like plain struct members (probed: missing members of
  * a repeated group serve typed nulls and narrow members promote per
  * file, vectorized included — the reference's own raw document carries
  * `weather: array<struct<...>>`, weather_etl.py:125), and RENAME/DROP
  * are metadata-only relabels there too: element rows are POSITIONAL at
  * every depth (an ArrayData holds InternalRows, which carry no names),
  * so the scan-seam name translation and the write path's physicalType
  * cast recurse through collections without ever rebuilding an array's
  * values. Map KEY structs are the one frozen shape — keys are
  * identity-bearing, so key structs never evolve.
  *
  * The identity mapping (logical == physical everywhere, the state of
  * every table that never renamed) short-circuits to zero translation on
  * all paths.
  */
private[graft] object ColumnMapping {
  val IdKey = "graft.id"
  val PhysKey = "graft.physical"

  def idOf(f: StructField): Option[Long] =
    if (f.metadata.contains(IdKey)) Some(f.metadata.getLong(IdKey)) else None

  def physOf(f: StructField): String =
    if (f.metadata.contains(PhysKey)) f.metadata.getString(PhysKey) else f.name

  private def withKeys(f: StructField, id: Long, phys: String): StructField =
    f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putLong(IdKey, id).putString(PhysKey, phys).build())

  /** Struct types reachable one level below `dt` for evolution purposes:
    * the struct itself, an array's element struct, a map's value struct
    * (map KEYS are identity-bearing — key structs do not evolve). */
  private def childStructs(dt: DataType): Seq[StructType] = dt match {
    case s: StructType => Seq(s)
    case ArrayType(s: StructType, _) => Seq(s)
    case MapType(_, s: StructType, _) => Seq(s)
    case _ => Seq.empty
  }

  /** Rebuild `dt` with its evolution-reachable child struct (see
    * [[childStructs]]) replaced by `f(struct)`; identity otherwise. */
  private def mapChildStruct(dt: DataType)(f: StructType => StructType)
      : DataType = dt match {
    case s: StructType => f(s)
    case a @ ArrayType(s: StructType, _) => a.copy(elementType = f(s))
    case m @ MapType(_, s: StructType, _) => m.copy(valueType = f(s))
    case other => other
  }

  /** Every id any field of the schema carries — struct members AND
    * array/map element-struct members — the enumeration every fresh-id
    * computation must fold, or a nested id could be silently recycled. */
  def allIds(schema: StructType): Seq[Long] = schema.fields.toSeq.flatMap {
    f => idOf(f).toSeq ++ childStructs(f.dataType).flatMap(allIds)
  }

  /** Every dotted PHYSICAL path the schema addresses (`main`,
    * `main.temp`, `weather.description` through the array, …) — the
    * live half of the collision set fresh physical names must avoid. */
  def allPhysicalPaths(schema: StructType): Seq[String] =
    schema.fields.toSeq.flatMap { f =>
      val p = physOf(f)
      p +: childStructs(f.dataType)
        .flatMap(allPhysicalPaths).map(n => s"$p.$n")
    }

  /** Assign ids + physical names to any field lacking them (CREATE TABLE,
    * or the first ALTER of a Scala-created table), recursing into struct
    * members (array/map element structs included). Fresh fields default
    * to physical == name; ids continue above every id ever used (live or
    * retired, any depth) so they are never recycled. */
  def assign(schema: StructType, retiredIds: Seq[Long]): StructType = {
    var next = (allIds(schema) ++ retiredIds).foldLeft(0L)(math.max) + 1
    def walk(s: StructType): StructType = StructType(s.fields.map { f0 =>
      val f = f0.copy(dataType = mapChildStruct(f0.dataType)(walk))
      if (idOf(f).isDefined) f
      else { val id = next; next += 1; withKeys(f, id, physOf(f)) }
    })
    walk(schema)
  }

  /** A physical name for a NEW column named `logical`, avoiding every
    * physical name its scope has ever addressed (case-insensitive): the
    * bare name when free, else `name_<id>` — which no landed file can
    * carry, making drop-then-re-add resurrection structurally
    * impossible. */
  def freshPhysical(logical: String, id: Long,
                    usedPhysicals: Set[String]): String =
    if (!usedPhysicals.contains(logical.toLowerCase)) logical
    else s"${logical}_$id"

  /** Add one field — top-level (`path = Seq(name)`) or inside nested
    * structs (`Seq("main", "humidity")`) — with a fresh id and a
    * collision-free physical name scoped to the enclosing struct.
    * `retired` entries are (id, dotted physical path). Parents may be
    * plain structs, array ELEMENT structs (via a literal `element`
    * segment) or map VALUE structs (via `value`) — the traversal below
    * descends all three; map KEY structs alone refuse (keys never
    * evolve). */
  def addField(schema: StructType, path: Seq[String], dt: DataType,
               retired: Seq[(Long, String)]): StructType = {
    require(path.nonEmpty, "empty column path")
    val s = assign(schema, retired.map(_._1))
    val id = (allIds(s) ++ retired.map(_._1)).max + 1
    val name = path.last
    def add(cur: StructType, parents: Seq[String],
            physPrefix: String): StructType = parents match {
      case Seq() =>
        // drop BEFORE lowercasing: toLowerCase can change string length
        // (e.g. İ → i̇), which would corrupt the prefix strip
        val retiredHere = retired.map(_._2).collect {
          case p if p.length > physPrefix.length &&
              p.substring(0, physPrefix.length)
                .equalsIgnoreCase(physPrefix) &&
              !p.substring(physPrefix.length).contains('.') =>
            p.substring(physPrefix.length)
        }
        val used = (cur.fields.map(physOf).toSeq ++ retiredHere)
          .map(_.toLowerCase).toSet
        StructType(cur.fields :+ withKeys(
          StructField(name, dt, nullable = true), id,
          freshPhysical(name, id, used)))
      case head +: rest =>
        val i = cur.fields.indexWhere(_.name.equalsIgnoreCase(head))
        require(i >= 0, s"no column '$head'")
        val f = cur.fields(i)
        val pfx = s"$physPrefix${physOf(f)}."
        // traversal descends plain structs, and — through the literal
        // `element`/`value` path segment Spark's
        // findNestedField(includeCollections = true) convention uses —
        // array ELEMENT / map VALUE structs (ADD is additive, see the
        // element evolution note in the header). The segment is
        // structural: it consumes no physical-path part, so ledger
        // paths stay `tags.x`, matching allPhysicalPaths/retireEntries.
        def seg(s: String) = rest.headOption.exists(_.equalsIgnoreCase(s))
        val updated = f.dataType match {
          case t: StructType => f.copy(dataType = add(t, rest, pfx))
          case a @ ArrayType(t: StructType, _) if seg("element") =>
            f.copy(dataType = a.copy(elementType = add(t, rest.tail, pfx)))
          case m @ MapType(_, t: StructType, _) if seg("value") =>
            f.copy(dataType = m.copy(valueType = add(t, rest.tail, pfx)))
          case other => throw new IllegalArgumentException(
            s"ADD COLUMN ${path.mkString(".")}: '$head' is " +
              s"${other.simpleString}, which has no evolvable struct " +
              "at this path (arrays via `.element.`, map values via " +
              "`.value.`; map keys do not evolve)")
        }
        StructType(cur.fields.updated(i, updated))
    }
    add(s, path.init, "")
  }

  /** Backward-compatible top-level add. */
  def addField(schema: StructType, name: String, dt: DataType,
               retired: Seq[(Long, String)]): StructType =
    addField(schema, Seq(name), dt, retired)

  /** All (id, dotted physical path) entries a field retires when dropped
    * — a struct retires its members too, so a whole-struct drop keeps
    * every nested physical path in the ledger. */
  def retireEntries(f: StructField, physPrefix: String = "")
      : Seq[(Long, String)] = {
    val p = s"$physPrefix${physOf(f)}"
    val own = idOf(f).map(id => (id, p)).toSeq
    own ++ childStructs(f.dataType)
      .flatMap(_.fields.toSeq.flatMap(retireEntries(_, s"$p.")))
  }

  /** Strip the mapping metadata (any depth) — the shape comparison
    * REPLACE TABLE uses to decide whether a column "survives". */
  private def stripKeys(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map { f =>
      val mb = new MetadataBuilder().withMetadata(f.metadata)
      mb.remove(IdKey); mb.remove(PhysKey)
      f.copy(dataType = stripKeys(f.dataType), metadata = mb.build())
    })
    case a: ArrayType => a.copy(elementType = stripKeys(a.elementType))
    case m: MapType => m.copy(keyType = stripKeys(m.keyType),
      valueType = stripKeys(m.valueType))
    case other => other
  }

  /** REPLACE TABLE's schema assignment: a column whose (name, type)
    * survives from `cur` keeps its id + physical name — retained
    * snapshots keep serving it through time travel — while everything
    * else is a NEW column with a fresh id and a physical name avoiding
    * every name the table has ever addressed (the DROP discipline:
    * same-name-different-type can never resurrect old bytes). Type
    * comparison ignores the mapping metadata itself, so a struct that
    * merely carries nested ids still survives a same-shape REPLACE.
    * Returns (declared, retiredNow) where retiredNow are the `cur`
    * fields the new schema dropped or re-typed — the caller records
    * them in the retired ledger. */
  def replaceAssign(cur0: StructType, retired: Seq[(Long, String)],
                    newSchema: StructType)
      : (StructType, Seq[(Long, String)]) = {
    // ids first (Scala-created tables may predate the mapping) so every
    // dropped field can enter the retired ledger
    val cur = assign(cur0, retired.map(_._1))
    val byName = cur.fields.map(f => f.name.toLowerCase -> f).toMap
    var next = (allIds(cur) ++ retired.map(_._1)).foldLeft(0L)(math.max)
    val used = scala.collection.mutable.Set(
      (allPhysicalPaths(cur) ++ retired.map(_._2)).map(_.toLowerCase): _*)
    val declared = StructType(newSchema.fields.map { f =>
      byName.get(f.name.toLowerCase) match {
        case Some(old)
            if stripKeys(old.dataType) == stripKeys(f.dataType) =>
          // survives WITH its nested mapping: the old dataType carries
          // the member ids/physicals the new (plain) declaration lacks
          old.copy(name = f.name, nullable = f.nullable,
            metadata = new MetadataBuilder().withMetadata(f.metadata)
              .putLong(IdKey, idOf(old).getOrElse { next += 1; next })
              .putString(PhysKey, physOf(old)).build())
        case _ =>
          next += 1
          val id = next
          val phys = freshPhysical(f.name, id, used.toSet)
          used += phys.toLowerCase
          // a fresh struct column's members get fresh ids in the same
          // pass (assign below would also do it, but do it here so
          // `next` stays the single id source)
          val dt = f.dataType match {
            case st: StructType =>
              def fresh(s: StructType): StructType =
                StructType(s.fields.map { g =>
                  next += 1
                  val g2 = g.dataType match {
                    case gs: StructType => g.copy(dataType = fresh(gs))
                    case _ => g
                  }
                  withKeys(g2, next, g2.name)
                })
              fresh(st)
            case other => other
          }
          withKeys(f.copy(dataType = dt), id, phys)
      }
    })
    val keptIds = allIds(declared).toSet
    val retiredNow = cur.fields.toSeq
      .flatMap(retireEntries(_))
      .filterNot { case (id, _) => keptIds(id) }
    (declared, retiredNow)
  }

  /** logical → physical for TOP-LEVEL fields where the two differ (empty
    * = identity mapping; every flat translation path short-circuits on
    * empty). Nested renames do not enter this map — they translate
    * structurally through [[physicalType]] / the scan's schema mapping. */
  def renames(schema: StructType): Map[String, String] =
    schema.fields.iterator
      .filter(f => physOf(f) != f.name)
      .map(f => f.name -> physOf(f)).toMap

  /** True iff any field BELOW the top level addresses a physical name
    * different from its logical one — the write path's trigger for the
    * struct-rebuilding cast (a pure positional relabel otherwise). */
  def hasNestedRenames(schema: StructType): Boolean = {
    def inner(dt: DataType): Boolean = childStructs(dt).exists(
      _.fields.exists(f => physOf(f) != f.name || inner(f.dataType)))
    schema.fields.exists(f => inner(f.dataType))
  }

  /** The dataType as data files carry it: nested fields renamed to their
    * physical names, recursively (array/map element structs included —
    * their members carry the same per-field mapping plain struct
    * members do). */
  def physicalType(dt: DataType): DataType = mapChildStruct(dt) { s =>
    StructType(s.fields.map(f =>
      f.copy(name = physOf(f), dataType = physicalType(f.dataType))))
  }

  /** The schema as data files and stats sidecars see it: physical names
    * at every depth, declared (possibly widened) types — the parquet
    * reader upcasts narrower old files per SPARK-40876 type promotion. */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(name = physOf(f),
        dataType = physicalType(f.dataType))))

  /** `dt` with nested members RENAMED to their physical names by
    * matching the DECLARED type's members by LOGICAL name — preserving
    * `dt`'s OWN member order (unlike [[physicalType]], which renders
    * the declared order). A cast to the result is a pure positional
    * relabel over an identical layout, so values never move — the seam
    * the SQL DML doors use to conform a LOGICAL-named source frame to
    * the raw (physical) files the engine merges against, at every depth
    * (array element / map value structs included). Members the
    * declaration doesn't know keep their names: the engine's own
    * schema checks refuse them loudly downstream. */
  def physicalNamesFor(dt: DataType, decl: DataType): DataType =
    (dt, decl) match {
      case (ss: StructType, ds: StructType) =>
        StructType(ss.fields.map { f =>
          ds.fields.find(_.name.equalsIgnoreCase(f.name)) match {
            case Some(d) => f.copy(name = physOf(d),
              dataType = physicalNamesFor(f.dataType, d.dataType))
            case None => f
          }
        })
      case (sa: ArrayType, ArrayType(de, _)) =>
        sa.copy(elementType = physicalNamesFor(sa.elementType, de))
      case (sm: MapType, MapType(_, dv, _)) =>
        sm.copy(valueType = physicalNamesFor(sm.valueType, dv))
      case _ => dt
    }
}
