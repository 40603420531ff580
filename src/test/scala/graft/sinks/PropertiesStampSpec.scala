package graft.sinks

import graft.SparkSpec

/** The properties-file memo stamp is (mtime, size) — cheap stat-only
  * reads — which is sound only if no (mtime, size) pair can EVER recur
  * across the file's history: a foreign instance (another process, a
  * second ops over the same backend) may have memoized any older stamp,
  * and filesystem mtime granularity can be a full second. The invariant
  * that closes every history: the file's byte size STRICTLY GROWS on
  * every rewrite, and emptying the map rewrites a header-only file
  * rather than deleting (a delete-then-recreate could revisit an old
  * size inside one mtime granule). These probes pin the invariant on
  * the exact adversarial sequences the r15 advice named. */
class PropertiesStampSpec extends SparkSpec {
  import spark.implicits._

  private val ops = VersionedTable
  private def propsFile(dir: String) = s"$dir/manifests/properties"
  private def sz(dir: String): Long = TableIO.local.size(propsFile(dir))

  test("size strictly grows across every rewrite — including a " +
      "size-revisiting body sequence (A at size S, B, C back to S)") {
    val dir = tmpDir("props-grow") + "/t"
    ops.commit(Seq((1L, 1.0)).toDF("id", "v"), dir)
    ops.setTableProperty(dir, "k", "aaaa") // body A
    val s1 = sz(dir)
    ops.setTableProperty(dir, "k", "bb") // body B: naturally smaller
    val s2 = sz(dir)
    assert(s2 > s1, s"rewrite to a smaller body must still grow: $s1 -> $s2")
    ops.setTableProperty(dir, "k", "aaaa") // body C == body A
    val s3 = sz(dir)
    assert(s3 > s2 && s3 != s1,
      s"a size-revisiting body must not revisit any older size: " +
        s"$s1, $s2 -> $s3")
    assert(ops.tableProperties(dir) == Map("k" -> "aaaa"))
  }

  test("remove-to-empty keeps the file (header-only) and the next set " +
      "cannot land on any historical size") {
    val dir = tmpDir("props-empty") + "/t"
    ops.commit(Seq((1L, 1.0)).toDF("id", "v"), dir)
    ops.setTableProperty(dir, "k", "v1")
    val s1 = sz(dir)
    ops.removeTableProperty(dir, "k")
    assert(TableIO.local.exists(propsFile(dir)),
      "emptying the map must rewrite, not delete — deletion resets the " +
        "size history")
    val s2 = sz(dir)
    assert(s2 > s1, s"the emptying rewrite must grow too: $s1 -> $s2")
    assert(ops.tableProperties(dir).isEmpty)
    ops.setTableProperty(dir, "k", "v1") // the before=None trap: same body
    val s3 = sz(dir)
    assert(s3 > s2 && s3 != s1,
      s"re-setting the original body must not revisit its size: " +
        s"$s1, $s2 -> $s3")
    assert(ops.tableProperties(dir) == Map("k" -> "v1"))
    // removing an absent key is a no-op: no rewrite, no stamp change
    ops.removeTableProperty(dir, "missing")
    assert(sz(dir) == s3)
  }

  test("a foreign instance's stamp memo can never serve stale: a fresh " +
      "ops over the same table reads current values after any rewrite " +
      "sequence") {
    val dir = tmpDir("props-foreign") + "/t"
    ops.commit(Seq((1L, 1.0)).toDF("id", "v"), dir)
    val foreign = new VersionedTableOps(TableIO.local)
    ops.setTableProperty(dir, "k", "xxxx")
    assert(foreign.tableProperties(dir) == Map("k" -> "xxxx")) // memoized
    // rapid same-granule rewrites that historically revisited sizes
    ops.setTableProperty(dir, "k", "yy")
    ops.setTableProperty(dir, "k", "xxxx")
    ops.removeTableProperty(dir, "k")
    ops.setTableProperty(dir, "k", "zzzz")
    // the foreign instance has no in-process invalidation — only the
    // (mtime, size) stamp protects it; strict size growth makes every
    // write a fresh stamp even inside one mtime granule
    assert(foreign.tableProperties(dir) == Map("k" -> "zzzz"),
      "the foreign reader served a stale memoized properties map")
  }
}
