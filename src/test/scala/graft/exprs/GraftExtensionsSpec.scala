package graft.exprs

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** `spark.sql.extensions=graft.GraftExtensions` installs the native
  * functions at session build time — the cluster deployment path (vs the
  * programmatic NativeExpressions.register used elsewhere in tests). */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-built session resolves the functions in plain SQL") {
    SparkSpec.spark // ensure the shared context exists
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      val row = s.sql(
        """SELECT fnv_hash64('a') AS h,
          |       simhash64(array('a','b')) AS sh,
          |       cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cs
          |""".stripMargin).head()
      assert(row.getLong(0) == 0xaf63dc4c8601ec8cL)
      assert(row.getLong(1) != 0L)
      assert(math.abs(row.getDouble(2) - 1.0) < 1e-12)
      // catalog carries the injected usage string
      assert(s.catalog.functionExists("fnv_hash64"))
    } finally {
      prior.foreach(SparkSession.setActiveSession)
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
