package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.exprs.{CosineSim, FnvHash64, HeavyHitters, InterleaveBits, SimHash64Expr, SortedIntersect, TopKBy}

/** Cluster-wide installation point for graft's native Catalyst expressions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects `fnv_hash64`, `simhash64`, and `cosine_sim` into every session's
  * function registry at build time — the idiomatic deployment path for a
  * library's expressions (vs [[graft.exprs.NativeExpressions.register]],
  * which installs them on one live session and remains for programmatic
  * use/tests). Catalog-level injection means the functions resolve in plain
  * SQL (`spark.sql("SELECT fnv_hash64(url) ...")`) on every session of the
  * cluster, including ones the library never sees (notebooks, JDBC
  * gateways).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("fnv_hash64"),
      info("fnv_hash64", "fnv_hash64(str) - stable FNV-1a 64-bit hash of the string's UTF-8 bytes"),
      (children: Seq[Expression]) => FnvHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash sketch of the token array"),
      (children: Seq[Expression]) => SimHash64Expr(children.head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim", "cosine_sim(array<float|double>, array<float|double>) - cosine similarity"),
      (children: Seq[Expression]) => CosineSim(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("top_k_by"),
      info("top_k_by", "top_k_by(sort_key, payload, k) - payloads of the k largest sort keys, largest first"),
      (children: Seq[Expression]) => TopKBy(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("bottom_k_by"),
      info("bottom_k_by", "bottom_k_by(sort_key, payload, k) - payloads of the k smallest sort keys, smallest first"),
      (children: Seq[Expression]) => TopKBy(children.head, children(1), children(2), reverse = true)))
    ext.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      info("heavy_hitters", "heavy_hitters(item, k, capacity) - SpaceSaving frequent items; exact when distinct(item) <= capacity"),
      (children: Seq[Expression]) => HeavyHitters(children.head, children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("interleave_bits"),
      info("interleave_bits", "interleave_bits(x, y) - Morton/Z-order key over the low 31 bits of each input"),
      (children: Seq[Expression]) => InterleaveBits(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect"),
      info("sorted_intersect", "sorted_intersect(array<long>, array<long>) - two-pointer intersection of ascending-sorted null-free arrays"),
      (children: Seq[Expression]) => SortedIntersect(children.head, children(1))))
    // optimizer rule: `levenshtein(a, b) <= k` → the Ukkonen-banded
    // threshold form (O(k·n) with early exit instead of the full O(n²)
    // table) — see graft.plans.RewriteBandedLevenshtein
    ext.injectOptimizerRule(_ => graft.plans.RewriteBandedLevenshtein)
  }
}
