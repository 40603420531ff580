package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multi-table transactions as '''snapshot groups''' — the atomicity
  * the single-table manifest protocol cannot give across tables, built
  * from the engine's own primitives instead of a lock service:
  *
  * A group is its own tiny manifest log (`<groupDir>/manifests/vN`)
  * whose every version pins one `(alias, tableDir, tableVersion)` row
  * per member. Readers that go THROUGH the group (`read(alias)`, SQL
  * `graft.`/lake/grp#table=alias``) see the members at the pinned
  * versions — so a group version is a CROSS-TABLE snapshot, and
  * advancing it is one atomic file create. A multi-table transaction is
  * therefore:
  *
  *  1. land each table's mutation through the NORMAL commit paths
  *     (append / merge / delete — full landing discipline, each
  *     returning its new version). These commits are invisible to group
  *     readers: the group still pins the old versions.
  *  2. publish ONE new group manifest carrying all the new pins —
  *     all-or-nothing by the same `createExclusive` CAS every table
  *     commit uses. A crash before (2) leaves group readers untouched
  *     (the landed table versions are unreferenced history that expire
  *     GCs); there is no partial-transaction state to observe.
  *
  * Direct table readers still see individual commits as they land —
  * the group is the TRANSACTIONAL view, not a lock on the tables
  * (exactly Iceberg's catalog-level multi-table commit semantics).
  *
  * '''Concurrency''': [[commit]] CASes the next group version against
  * the head it read. A losing writer gets [[SnapshotShapeConflict]]
  * LOUDLY — its table mutations already landed, and blindly re-running
  * a transaction body that read group state would double-apply them;
  * the caller owns the retry (idempotent bodies via `commitOnce` txn
  * ids make that safe), matching the engine's loud-OCC discipline for
  * semantic conflicts (auto-retry stays reserved for shape-preserving
  * maintenance).
  *
  * '''GC safety''': every group version TAGS each member at its pinned
  * version (`grp.<groupId>.<gv>`), so a member table's own
  * [[VersionedTableOps.expire]] — manual or `retention.keep.last`
  * auto-expire — refuses to drop history a group still serves, through
  * the tag-pin machinery that already exists. [[expire]] on the group
  * drops old group manifests AND their member tags, releasing that
  * history for table GC. Tags land after the CAS (a loser never leaks
  * pins); the publish→tag window is benign for the fresh versions a
  * transaction pins and is closed for any read that resolves through
  * the group manifest itself.
  *
  * Scale shape: a group manifest is O(members) lines; commit cost is
  * the member commits (unchanged) + one file create + |changed| tag
  * creates. Nothing here scans a table. */
class SnapshotGroupOps(io: TableIO, ops: VersionedTableOps) {

  final case class Member(alias: String, dir: String, version: Int)

  private def manifestDir(g: String) = s"$g/manifests"
  private def manifestPath(g: String, v: Int) = s"${manifestDir(g)}/v$v"
  private def markerPath(g: String) = s"$g/GROUP"

  /** Short stable group id for member tag names (tag charset forbids
    * path characters). */
  private def groupId(g: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
  private def tagName(g: String, gv: Int) = s"grp.${groupId(g)}.$gv"

  def isGroup(g: String): Boolean = io.exists(markerPath(g))

  def versions(g: String): Seq[Int] =
    io.list(manifestDir(g))
      .collect { case n if n.startsWith("v") => n.drop(1).toInt }.sorted

  /** The pinned members of a group version (head when unpinned). */
  def members(g: String, version: Option[Int] = None): Seq[Member] = {
    val vs = versions(g)
    require(vs.nonEmpty, s"no group committed at $g")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"group version $v not in $vs at $g")
    io.readLines(manifestPath(g, v)).filterNot(_.startsWith("#")).map { l =>
      val a = l.split('\t')
      Member(a(0), a(1), a(2).toInt)
    }
  }

  /** Declare a group over committed tables, pinning their current heads
    * as group v1. Aliases are the group-local names SQL addresses
    * (`#table=<alias>`). */
  def create(g: String, tables: Map[String, String]): Int = {
    require(tables.nonEmpty, "a snapshot group needs at least one member")
    require(versions(g).isEmpty, s"$g already has group versions")
    tables.keys.foreach(a => require(a.matches("[A-Za-z0-9][A-Za-z0-9._-]*"),
      s"group alias must be [A-Za-z0-9][A-Za-z0-9._-]*: '$a'"))
    val pins = tables.toSeq.sortBy(_._1).map { case (alias, dir) =>
      val vs = ops.versions(dir)
      require(vs.nonEmpty, s"group member '$alias' ($dir) has no " +
        "committed version")
      Member(alias, dir, vs.last)
    }
    io.mkdirs(manifestDir(g))
    io.writeLines(markerPath(g), Seq("snapshot-group"))
    publishPins(g, 1, pins)
  }

  private def publishPins(g: String, gv: Int, pins: Seq[Member]): Int = {
    val lines = s"#ts=${System.currentTimeMillis()}" +:
      pins.map(m => s"${m.alias}\t${m.dir}\t${m.version}")
    if (!io.createExclusive(manifestPath(g, gv), lines))
      throw new SnapshotShapeConflict(
        s"group $g advanced past v${gv - 1} during this transaction; " +
          "its table mutations are landed but unreferenced — retry the " +
          "transaction against the new group head (idempotent bodies " +
          "via commitOnce txn ids re-land safely)")
    // pin member history AFTER the CAS (a losing writer must not leak
    // tags); delete-then-tag never races another group writer here
    // because only the CAS winner for gv runs this block
    pins.foreach(m => ops.tag(m.dir, tagName(g, gv), m.version))
    gv
  }

  /** One multi-table transaction: `body` receives alias→dir, performs
    * its mutations through the normal table APIs, and returns the new
    * version per CHANGED alias (absent aliases keep their pins). The
    * group advances atomically to pin exactly those versions. */
  def commit(g: String)(body: Map[String, String] => Map[String, Int]): Int = {
    val head = versions(g).lastOption.getOrElse(
      throw new IllegalArgumentException(s"no group committed at $g"))
    val cur = members(g, Some(head))
    val dirs = cur.map(m => m.alias -> m.dir).toMap
    val updates = body(dirs)
    val unknown = updates.keySet -- dirs.keySet
    require(unknown.isEmpty,
      s"transaction returned versions for non-member aliases $unknown")
    updates.foreach { case (alias, v) =>
      require(ops.versions(dirs(alias)).contains(v),
        s"transaction claims $alias@v$v but ${dirs(alias)} has no such " +
          "committed version")
    }
    val pins = cur.map(m =>
      m.copy(version = updates.getOrElse(m.alias, m.version)))
    publishPins(g, head + 1, pins)
  }

  /** The member snapshot a group version pins, as a DataFrame. */
  def read(spark: SparkSession, g: String, alias: String,
           version: Option[Int] = None): DataFrame = {
    val m = memberOf(g, alias, version)
    ops.read(spark, m.dir, Some(m.version))
  }

  def memberOf(g: String, alias: String,
               version: Option[Int] = None): Member =
    members(g, version).find(_.alias == alias).getOrElse(
      throw new IllegalArgumentException(s"no member '$alias' in group " +
        s"$g (have: ${members(g, version).map(_.alias).mkString(", ")})"))

  /** Drop the whole group: release EVERY retained version's member tags
    * (so member-table GC can reclaim the history the group pinned — a
    * bare directory delete would leak the `grp.*` tags and block member
    * expire forever) and delete the group's log and marker. The member
    * tables themselves are untouched. */
  def drop(g: String): Unit = {
    versions(g).foreach { gv =>
      members(g, Some(gv)).foreach(m => releaseTag(m, tagName(g, gv)))
      io.delete(manifestPath(g, gv))
    }
    io.delete(markerPath(g))
  }

  /** Release one member pin, tolerating ONLY the already-released case.
    * Any other failure (transient IO) must abort BEFORE the group
    * manifest is deleted — swallowing it and then deleting the manifest
    * would leak a `grp.*` tag that blocks member-table expire forever,
    * with the record of which tags to release already gone. Aborting
    * leaves the manifest in place, so the drop/expire can be retried. */
  private def releaseTag(m: Member, tag: String): Unit =
    if (ops.tags(m.dir).contains(tag)) ops.deleteTag(m.dir, tag)

  /** Drop group history beyond `keepLast`, releasing the dropped
    * versions' member tags so table-level GC can reclaim that history. */
  def expire(g: String, keepLast: Int): Unit = {
    require(keepLast >= 1, s"keepLast must be >= 1: $keepLast")
    val vs = versions(g)
    val dead = vs.dropRight(keepLast)
    dead.foreach { gv =>
      members(g, Some(gv)).foreach(m => releaseTag(m, tagName(g, gv)))
      io.delete(manifestPath(g, gv))
    }
  }
}

/** Default local-IO instance. */
object SnapshotGroup extends SnapshotGroupOps(TableIO.local, VersionedTable)
