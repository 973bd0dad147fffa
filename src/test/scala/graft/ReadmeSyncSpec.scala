package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Keeps hand-written docs honest against the code (round-7 verdict:
  * README said 124 queries while 126 were registered). The counts in
  * README.md must equal `SparkEntry.queries.size`, and every query must
  * have either an oracle or a documented rows-only waiver.
  */
class ReadmeSyncSpec extends AnyFunSuite {

  private lazy val readme =
    new String(Files.readAllBytes(Paths.get("README.md")), "UTF-8")

  test("README query counts match the registered query map") {
    val n = SparkEntry.queries.size
    val claimed = raw"the (\d+) gated operator queries \(q1-q(\d+)\)".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README no longer states the gated query count"))
    assert(claimed.group(1).toInt == n,
      s"README claims ${claimed.group(1)} queries; SparkEntry registers $n")
    assert(claimed.group(2).toInt == n,
      s"README claims range q1-q${claimed.group(2)}; SparkEntry registers $n")
  }

  test("every query has an oracle except the documented rows-only set") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // q32 writes a store, not a relation — the one sanctioned waiver
    assert(rowsOnly == Set("q32_index_e2e"), s"rows-only drifted: $rowsOnly")
  }

  test("query names are contiguous q1..qN with no gaps or dupes") {
    val nums = SparkEntry.queries.keySet.map(_.drop(1).takeWhile(_.isDigit).toInt)
    assert(nums == (1 to SparkEntry.queries.size).toSet,
      s"missing: ${(1 to SparkEntry.queries.size).toSet -- nums}; extra: ${nums -- (1 to SparkEntry.queries.size).toSet}")
  }
}
