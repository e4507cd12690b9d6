package graft.testkit

import org.apache.spark.sql.DataFrame

/** Order-insensitive DataFrame equality — the Scala twin of the reference's
  * test helper (ref: tests/assertions.py:6-13: orderBy all columns +
  * collect + compare).
  */
object TestAssertions {
  def dataFrameEqual(a: DataFrame, b: DataFrame): Boolean = {
    if (a.columns.toSeq.sorted != b.columns.toSeq.sorted) return false
    val cols = a.columns.toSeq.sorted
    val l = a.selectExpr(cols.map(c => s"`$c`"): _*).orderBy(cols.head, cols.tail: _*).collect()
    val r = b.selectExpr(cols.map(c => s"`$c`"): _*).orderBy(cols.head, cols.tail: _*).collect()
    l.sameElements(r)
  }

  def assertDataFrameEqual(a: DataFrame, b: DataFrame): Unit =
    require(dataFrameEqual(a, b), "DataFrames differ")
}
