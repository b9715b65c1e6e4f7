package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins `tools/registry.txt` (the checked-in query-name registry
  * `tools/parity.py` uses to fail a typo'd `--subset` BEFORE launching
  * sbt) to the live `SparkEntry.queries` map, so the fast-fail list can
  * never drift from the engine. Also pins the queries↔oracle contract:
  * every oracle SQL names a registered query.
  */
class RegistrySpec extends AnyFunSuite {

  test("tools/registry.txt matches SparkEntry.queries exactly") {
    val file = java.nio.file.Paths.get("tools/registry.txt")
    assert(java.nio.file.Files.exists(file),
      "tools/registry.txt missing — regenerate it from SparkEntry.queries")
    val onDisk = java.nio.file.Files.readString(file)
      .split("\\s+").filter(_.nonEmpty).toSet
    val live = SparkEntry.queries.keySet
    assert(onDisk == live,
      s"registry drift — stale: ${(onDisk -- live).toSeq.sorted}; " +
        s"missing: ${(live -- onDisk).toSeq.sorted}. Regenerate " +
        "tools/registry.txt (one query name per line, sorted).")
  }

  test("every oracle SQL entry names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty,
      s"oracleSql entries without a queries entry: ${orphans.toSeq.sorted}")
  }
}
