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
  test("levenshtein comparisons rewrite to the banded threshold form") {
    SparkSpec.spark
    val prior = SparkSession.getActiveSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.GraftExtensions)
        .getOrCreate()
      import s.implicits._
      // parquet-backed so the filter survives optimization (a local
      // relation would be constant-folded away, hiding the rewrite)
      val dir = java.nio.file.Files.createTempDirectory("lev").toString
      Seq(("kitten", "sitten"), ("kitten", "sitting"),
        ("abc", "abc"), ("abc", "xyzabc"), (null, "abc"))
        .toDF("a", "b").write.mode("overwrite").parquet(dir)
      s.read.parquet(dir).createOrReplaceTempView("lev_t")
      val q = s.sql("SELECT a, b FROM lev_t WHERE levenshtein(a, b) <= 2")
      // the optimized plan must carry the three-argument threshold form
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("levenshtein(a#") && opt.contains("Some(2)"), opt)
      // and the rewrite is semantics-preserving (boundary, miss, null)
      val got = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got == Set(("kitten", "sitten"), ("abc", "abc")))
      // reversed orientation and strict form rewrite too
      val q2 = s.sql(
        "SELECT count(*) FROM lev_t WHERE 3 > levenshtein(a, b)")
      assert(q2.queryExecution.optimizedPlan.toString.contains("Some(2)"))
      assert(q2.head.getLong(0) == 2L) // sitten (1) and abc (0)
    } finally {
      prior.foreach(SparkSession.setActiveSession)
      prior.foreach(SparkSession.setDefaultSession)
    }
  }
}
