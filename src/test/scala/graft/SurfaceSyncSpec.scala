package graft

import org.scalatest.matchers.should.Matchers

/** Keeps the README headline in sync with the actual query surface — the
  * count drifted twice across rounds when queries were added without the
  * doc update; now the build fails instead.
  */
class SurfaceSyncSpec extends SparkSpec with Matchers {

  test("README query-count headline matches SparkEntry") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val n = SparkEntry.allQueries.size
    readme should include(s"**$n driver-checkable queries**")
  }

  test("every query carries a DuckDB oracle (strict gate has no gaps)") {
    val missing = SparkEntry.allQueries.filter(_.oracle.isEmpty).map(_.name)
    missing shouldBe empty
    SparkEntry.queries.keySet shouldBe SparkEntry.oracleSql.keySet
  }
}
