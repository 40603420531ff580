package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Named refs on the versioned table: tags (immutable pointers that also
  * pin GC) and branches (forked manifest lineages sharing the parent's
  * data files zero-copy, with fast-forward publish back). The ownership
  * rules are the substance under test: a branch must never GC parent
  * files, the parent must never GC branch-referenced files, and every
  * ambiguous exit (re-tag, non-fast-forward, expire-on-branch) refuses
  * loudly. */
class BranchTagSpec extends SparkSpec {
  import spark.implicits._

  private val backend: TableIO = TableIO.local
  private lazy val ops = new VersionedTableOps(backend)

  private def ids(lo: Long, hi: Long) = spark.range(lo, hi)
    .select(col("id"), (col("id") % 10).as("k"))

  test("tags pin versions immutably and block their expiration") {
    val dir = tmpDir("ref-tag")
    val v1 = ops.commit(ids(0, 100), dir)
    ops.commit(ids(100, 200), dir)
    ops.commit(ids(200, 300), dir)
    ops.tag(dir, "train-2026-08", v1)
    assert(ops.tags(dir) == Map("train-2026-08" -> v1))
    assert(ops.readTagged(spark, dir, "train-2026-08").count() == 100)
    // immutable: re-tagging refuses
    val e = intercept[IllegalArgumentException] {
      ops.tag(dir, "train-2026-08", v1 + 1)
    }
    assert(e.getMessage.contains("immutable"))
    // the tag is a GC pin: expiring past it refuses
    val x = intercept[IllegalArgumentException] { ops.expire(dir, 1) }
    assert(x.getMessage.contains("tagged"))
    // delete the tag and the same expire goes through
    ops.deleteTag(dir, "train-2026-08")
    ops.expire(dir, 1)
    assert(ops.read(spark, dir).count() == 300)
  }

  test("branch forks zero-copy, diverges, and fast-forwards back") {
    val dir = tmpDir("ref-branch")
    ops.commit(ids(0, 100), dir)
    val vFork = ops.commit(ids(100, 200), dir)
    val bd = ops.createBranch(dir, "audit")
    assert(ops.branches(dir) == Seq("audit"))
    // zero-copy: the branch's data area is empty, its read sees the fork
    assert(backend.list(s"$bd/data").isEmpty)
    assert(ops.read(spark, bd).count() == 200)
    // diverge: branch-only mutation is invisible to the parent
    ops.deleteWhere(spark, bd, col("id") < 50)
    ops.commit(ids(200, 250), bd)
    assert(ops.read(spark, bd).count() == 200)
    assert(ops.read(spark, dir).count() == 200)
    assert(ops.read(spark, dir).filter(col("id") < 50).count() == 50)
    // fast-forward: the parent jumps to the branch head, zero bytes moved
    val branchState = ops.read(spark, bd).collect().toSet
    val vNew = ops.fastForward(spark, dir, "audit")
    assert(vNew == vFork + 1)
    assert(ops.read(spark, dir).collect().toSet == branchState)
    // the branch is promoted now: its expire refuses; retire ends it
    val e = intercept[IllegalArgumentException] { ops.expire(bd, 1) }
    assert(e.getMessage.toLowerCase.contains("branch"))
    ops.retireBranch(dir, "audit")
    assert(ops.branches(dir).isEmpty)
    assert(ops.read(spark, dir).collect().toSet == branchState)
  }

  test("readBranch serves the branch lineage; resolveBranch rejects " +
    "misspelled and retired names loudly") {
    val dir = tmpDir("ref-bread")
    ops.commit(ids(0, 100), dir)
    val bd = ops.createBranch(dir, "exp")
    ops.commit(ids(100, 150), bd)
    // the convenience read is exactly the branch-directory read
    assert(ops.readBranch(spark, dir, "exp").count() == 150)
    assert(ops.readBranch(spark, dir, "exp").as[(Long, Long)]
      .collect().toSet == ops.read(spark, bd).as[(Long, Long)]
      .collect().toSet)
    // pinned branch version
    assert(ops.readBranch(spark, dir, "exp", Some(1)).count() == 100)
    // a name that never existed, or a retired one, fails loudly — an
    // empty silent read would masquerade as a valid empty branch
    val e1 = intercept[IllegalArgumentException] {
      ops.readBranch(spark, dir, "nope")
    }
    assert(e1.getMessage.contains("no live branch"))
    ops.retireBranch(dir, "exp")
    val e2 = intercept[IllegalArgumentException] {
      ops.readBranch(spark, dir, "exp")
    }
    assert(e2.getMessage.contains("no live branch"))
  }

  test("fast-forward refuses when the parent advanced past the fork") {
    val dir = tmpDir("ref-ff")
    ops.commit(ids(0, 100), dir)
    ops.createBranch(dir, "exp")
    ops.commit(ids(100, 150), ops.branchDir(dir, "exp"))
    ops.commit(ids(150, 160), dir) // parent moves: no longer fast-forward
    val e = intercept[IllegalArgumentException] {
      ops.fastForward(spark, dir, "exp")
    }
    assert(e.getMessage.contains("fast-forward"))
    // abandoned branch: dropBranch reclaims its local files entirely
    ops.dropBranch(dir, "exp")
    assert(!backend.exists(ops.branchDir(dir, "exp")))
    assert(ops.read(spark, dir).count() == 110)
  }

  test("parent expire keeps branch-referenced files alive") {
    val dir = tmpDir("ref-pin")
    ops.commit(ids(0, 100), dir)
    ops.createBranch(dir, "longrun")
    // parent rewrites everything: old files leave the parent's lineage
    ops.commit(ids(500, 600), dir, append = false)
    ops.commit(ids(600, 700), dir)
    ops.expire(dir, keepLast = 1)
    // the branch still reads its fork snapshot — expire saw the fork's
    // files referenced by the live branch and kept them
    assert(ops.read(spark, dir, None).count() == 200)
    assert(ops.read(spark, ops.branchDir(dir, "longrun")).count() == 100)
    // retire the branch; the fork's batch dir loses its last reference
    // and the orphan sweep reclaims it
    ops.retireBranch(dir, "longrun")
    val n = ops.vacuumOrphans(dir, graceMs = 0L)
    assert(n > 0, "vacuum reclaimed nothing after the branch retired")
    assert(ops.read(spark, dir).count() == 200)
  }

  test("branching refuses over unmaterialized equality deletes") {
    val dir = tmpDir("ref-eq")
    ops.commit(ids(0, 100), dir)
    ops.deleteByKeys(spark, dir, "id", Seq(7L).toDF("id"))
    val e = intercept[IllegalArgumentException] {
      ops.createBranch(dir, "b")
    }
    assert(e.getMessage.contains("equality"))
  }
}
