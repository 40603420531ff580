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

  test("manifest stats prune files; results equal the unpruned read") {
    val dir = tmpDir("vt-stats")
    // three commits with DISJOINT value ranges — each lands its own files
    VersionedTable.commit((1 to 100).map(i => (i.toLong, i.toDouble))
      .toDF("id", "v"), dir)
    VersionedTable.commit((101 to 200).map(i => (i.toLong, i.toDouble))
      .toDF("id", "v"), dir)
    val head = VersionedTable.commit(
      (201 to 300).map(i => (i.toLong, i.toDouble)).toDF("id", "v"), dir)
    VersionedTable.writeStats(spark, dir, head, Seq("v"))
    val all = VersionedTable.prunedFiles(dir, head, "v", 0.0, 1e9)
    val narrow = VersionedTable.prunedFiles(dir, head, "v", 150.0, 160.0)
    assert(narrow.nonEmpty && narrow.size < all.size,
      s"no pruning: ${narrow.size} of ${all.size}")
    // correctness: pruned read + exact predicate == full read + predicate
    val pruned = VersionedTable.prunedRead(spark, dir, "v", 150.0, 160.0)
      .filter($"v".between(150.0, 160.0))
    val full = VersionedTable.read(spark, dir)
      .filter($"v".between(150.0, 160.0))
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    assert(pruned.count() == 11)
  }

  test("a version without stats degrades to no pruning, never to loss") {
    val dir = tmpDir("vt-nostats")
    VersionedTable.commit((1 to 50).map(i => (i.toLong, i.toDouble))
      .toDF("id", "v"), dir)
    // no writeStats call — prunedRead must keep every file
    val r = VersionedTable.prunedRead(spark, dir, "v", 10.0, 20.0)
    assert(r.count() == 50)
  }

  test("expire removes dead versions' stats files too") {
    val dir = tmpDir("vt-gc-stats")
    val v1 = VersionedTable.commit(Seq((1L, 1.0)).toDF("id", "v"), dir)
    VersionedTable.writeStats(spark, dir, v1, Seq("v"))
    VersionedTable.commit(Seq((2L, 2.0)).toDF("id", "v"), dir,
      append = false)
    VersionedTable.expire(dir, keepLast = 1)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir, "manifests", s"s$v1")))
  }

  test("clustered commit: z-order + stats makes pruning bite; carry-forward") {
    val dir = tmpDir("vt-clustered")
    def batch(lo: Int, hi: Int) = spark.range(lo, hi)
      .select(col("id"),
        pmod(xxhash64(col("id"), lit(1)), lit(1000)).cast("double").as("x"),
        pmod(xxhash64(col("id"), lit(2)), lit(1000)).cast("double").as("y"))
    val v1 = VersionedTable.commitClustered(batch(0, 30000), dir,
      zCols = Seq("x", "y"), statCols = Seq("x", "y"), numFiles = 16)
    // pruning bites on BOTH z-dims thanks to the layout
    val all = VersionedTable.prunedFiles(dir, v1, "x", -1e9, 1e9)
    val nx = VersionedTable.prunedFiles(dir, v1, "x", 100.0, 199.0)
    val ny = VersionedTable.prunedFiles(dir, v1, "y", 100.0, 199.0)
    assert(all.size == 16)
    assert(nx.size < all.size / 2, s"x pruning weak: ${nx.size}/${all.size}")
    assert(ny.size < all.size / 2, s"y pruning weak: ${ny.size}/${all.size}")
    // pruned read correctness
    val pruned = VersionedTable.prunedRead(spark, dir, "x", 100.0, 199.0)
      .filter($"x".between(100.0, 199.0))
    val full = VersionedTable.read(spark, dir)
      .filter($"x".between(100.0, 199.0))
    assert(pruned.exceptAll(full).isEmpty && full.exceptAll(pruned).isEmpty)
    // second clustered commit: v1's stats lines carry forward verbatim
    val s1 = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "manifests", s"s$v1"))
    val v2 = VersionedTable.commitClustered(batch(30000, 40000), dir,
      zCols = Seq("x", "y"), statCols = Seq("x", "y"), numFiles = 8)
    val s2 = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "manifests", s"s$v2"))
    assert(s2.containsAll(s1), "carried stats lines missing")
    assert(s2.size() == s1.size() + 8 * 2) // + (files × cols) new lines
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
