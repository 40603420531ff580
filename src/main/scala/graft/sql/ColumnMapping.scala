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
  * Because an ADDed column's physical name is chosen to avoid every
  * physical name the table has EVER used (live or dropped — the retired
  * ledger), `DROP COLUMN c` followed by `ADD COLUMNS (c T)` cannot
  * resurrect the dropped bytes: the new column addresses a fresh
  * physical name that no landed file carries, so old files serve the
  * typed nulls a fresh column promises.
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

  /** Assign ids + physical names to any field lacking them (CREATE TABLE,
    * or the first ALTER of a Scala-created table). Fresh fields default to
    * physical == name; ids continue above every id ever used (live or
    * retired) so they are never recycled. */
  def assign(schema: StructType, retiredIds: Seq[Long]): StructType = {
    var next = (schema.fields.flatMap(idOf) ++ retiredIds).foldLeft(0L)(math.max) + 1
    StructType(schema.fields.map { f =>
      if (idOf(f).isDefined) f
      else { val id = next; next += 1; withKeys(f, id, physOf(f)) }
    })
  }

  /** A physical name for a NEW column named `logical`, avoiding every
    * physical name the table has ever addressed (case-insensitive): the
    * bare name when free, else `name_<id>` — which no landed file can
    * carry, making drop-then-re-add resurrection structurally impossible. */
  def freshPhysical(logical: String, id: Long,
                    usedPhysicals: Set[String]): String =
    if (!usedPhysicals.contains(logical.toLowerCase)) logical
    else s"${logical}_$id"

  /** Add one field with a fresh id + collision-free physical name. */
  def addField(schema: StructType, name: String, dt: DataType,
               retired: Seq[(Long, String)]): StructType = {
    val s = assign(schema, retired.map(_._1))
    val id = (s.fields.flatMap(idOf) ++ retired.map(_._1)).max + 1
    val used = (s.fields.map(physOf) ++ retired.map(_._2))
      .map(_.toLowerCase).toSet
    StructType(s.fields :+ withKeys(
      StructField(name, dt, nullable = true), id, freshPhysical(name, id, used)))
  }

  /** REPLACE TABLE's schema assignment: a column whose (name, type)
    * survives from `cur` keeps its id + physical name — retained
    * snapshots keep serving it through time travel — while everything
    * else is a NEW column with a fresh id and a physical name avoiding
    * every name the table has ever addressed (the DROP discipline:
    * same-name-different-type can never resurrect old bytes). Returns
    * (declared, retiredNow) where retiredNow are the `cur` fields the
    * new schema dropped or re-typed — the caller records them in the
    * retired ledger. */
  def replaceAssign(cur0: StructType, retired: Seq[(Long, String)],
                    newSchema: StructType)
      : (StructType, Seq[(Long, String)]) = {
    // ids first (Scala-created tables may predate the mapping) so every
    // dropped field can enter the retired ledger
    val cur = assign(cur0, retired.map(_._1))
    val byName = cur.fields.map(f => f.name.toLowerCase -> f).toMap
    var next =
      (cur.fields.flatMap(idOf) ++ retired.map(_._1)).foldLeft(0L)(math.max)
    val used = scala.collection.mutable.Set(
      (cur.fields.map(physOf) ++ retired.map(_._2)).map(_.toLowerCase): _*)
    val declared = StructType(newSchema.fields.map { f =>
      byName.get(f.name.toLowerCase) match {
        case Some(old) if old.dataType == f.dataType =>
          withKeys(f, idOf(old).getOrElse { next += 1; next }, physOf(old))
        case _ =>
          next += 1
          val phys = freshPhysical(f.name, next, used.toSet)
          used += phys.toLowerCase
          withKeys(f, next, phys)
      }
    })
    val keptIds = declared.fields.flatMap(idOf).toSet
    val retiredNow = cur.fields.flatMap(f =>
      idOf(f).filterNot(keptIds).map(id => (id, physOf(f))))
    (declared, retiredNow.toSeq)
  }

  /** logical → physical for fields where the two differ (empty = identity
    * mapping; every translation path short-circuits on empty). */
  def renames(schema: StructType): Map[String, String] =
    schema.fields.iterator
      .filter(f => physOf(f) != f.name)
      .map(f => f.name -> physOf(f)).toMap

  /** The schema as data files and stats sidecars see it: physical names,
    * declared (possibly widened) types — the parquet reader upcasts
    * narrower old files per SPARK-40876 type promotion. */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f => f.copy(name = physOf(f))))
}
