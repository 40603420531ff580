package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedTableSpec extends SparkSpec {
  import spark.implicits._

  test("append commits build a version history; time travel reads each") {
    val dir = tmpDir("vt-hist")
    val v1 = VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"),
      dir)
    val v2 = VersionedTable.commit(Seq((3L, "c")).toDF("id", "k"), dir)
    assert(VersionedTable.versions(dir) == Seq(v1, v2))
    assert(VersionedTable.read(spark, dir, Some(v1)).count() == 2)
    assert(VersionedTable.read(spark, dir, Some(v2)).count() == 3)
    assert(VersionedTable.read(spark, dir).count() == 3) // head
  }

  test("snapshot isolation: a resolved reader is immune to later commits") {
    val dir = tmpDir("vt-iso")
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "k"), dir)
    val pinned = VersionedTable.read(spark, dir) // resolved at v1
    VersionedTable.commit(Seq((2L, "b")).toDF("id", "k"), dir)
    VersionedTable.commit(Seq((3L, "c")).toDF("id", "k"), dir,
      append = false) // logical overwrite
    assert(pinned.count() == 1) // still exactly the v1 snapshot
  }

  test("logical overwrite replaces content; history keeps the old files") {
    val dir = tmpDir("vt-ovw")
    val v1 = VersionedTable.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"),
      dir)
    val v2 = VersionedTable.commit(Seq((9L, "z")).toDF("id", "k"), dir,
      append = false)
    assert(VersionedTable.read(spark, dir, Some(v2))
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(VersionedTable.read(spark, dir, Some(v1)).count() == 2)
  }

  test("rollback restores an old file set as a NEW inspectable version") {
    val dir = tmpDir("vt-rb")
    val v1 = VersionedTable.commit(Seq((1L, "a")).toDF("id", "k"), dir)
    val v2 = VersionedTable.commit(Seq((2L, "BAD")).toDF("id", "k"), dir)
    val v3 = VersionedTable.rollback(dir, v1)
    assert(v3 > v2)
    assert(VersionedTable.read(spark, dir).count() == 1) // head == v1 content
    assert(VersionedTable.read(spark, dir, Some(v2)).count() == 2) // bad kept
  }

  test("expire drops old manifests and unreferenced files, keeps live reads") {
    val dir = tmpDir("vt-gc")
    val v1 = VersionedTable.commit(Seq((1L, "a")).toDF("id", "k"), dir)
    val v2 = VersionedTable.commit(Seq((2L, "b")).toDF("id", "k"), dir)
    val v3 = VersionedTable.commit(Seq((9L, "z")).toDF("id", "k"), dir,
      append = false) // v3 drops v1/v2's files from the live set
    val deleted = VersionedTable.expire(dir, keepLast = 1)
    assert(deleted > 0) // v1/v2's data files were referenced only by them
    assert(VersionedTable.versions(dir) == Seq(v3))
    assert(VersionedTable.read(spark, dir).count() == 1) // head intact
    intercept[IllegalArgumentException] {
      VersionedTable.read(spark, dir, Some(v1)) // expired → loud
    }
  }

  test("expire keeps files still referenced by a retained manifest") {
    val dir = tmpDir("vt-gc2")
    VersionedTable.commit(Seq((1L, "a")).toDF("id", "k"), dir)
    val v2 = VersionedTable.commit(Seq((2L, "b")).toDF("id", "k"), dir)
    // v2 (append) references v1's files too — expiring v1 must delete NO
    // data files, only the manifest
    val deleted = VersionedTable.expire(dir, keepLast = 1)
    assert(deleted == 0)
    assert(VersionedTable.read(spark, dir, Some(v2)).count() == 2)
  }

  test("optimistic concurrency: a colliding publish retries above the winner") {
    val dir = tmpDir("vt-occ")
    val v1 = VersionedTable.commit(Seq((1L, "a")).toDF("id", "k"), dir)
    // a publish that targets the ALREADY-TAKEN v1 (the concurrent-loser
    // shape: it resolved the head before the winner committed) must land
    // above it without touching the winner's manifest
    val winnerBytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "manifests", s"v$v1"))
    val v = VersionedTable.publish(dir, v1, Seq.empty)
    assert(v == v1 + 1)
    assert(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "manifests", s"v$v1"))
      .sameElements(winnerBytes)) // winner untouched
    assert(VersionedTable.versions(dir) == Seq(v1, v))
  }
}
