package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the README front-matter counts to the real `SparkEntry` maps —
  * the numbers drifted twice when maintained by hand (rounds 2 and 4).
  * If this fails, update the "(N named queries)" / "(N DuckDB oracles" /
  * "the N omissions" sentence in README.md.
  */
class ReadmeCountsSpec extends AnyFunSuite {

  private val readme = new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("README.md")),
    "UTF-8")

  private def pinned(pattern: String): Int = {
    val m = pattern.r.findFirstMatchIn(readme)
    assert(m.isDefined, s"README.md no longer contains /$pattern/")
    m.get.group(1).toInt
  }

  test("README query count equals SparkEntry.queries.size") {
    assert(pinned("""\((\d+) named queries\)""") == SparkEntry.queries.size)
  }

  test("README oracle count equals SparkEntry.oracleSql.size") {
    assert(pinned("""\((\d+) DuckDB oracles""") == SparkEntry.oracleSql.size)
  }

  test("README rows-only count equals the queries-minus-oracles gap") {
    assert(pinned("""the (\d+) omissions?""") ==
      SparkEntry.queries.size - SparkEntry.oracleSql.size)
  }
}
