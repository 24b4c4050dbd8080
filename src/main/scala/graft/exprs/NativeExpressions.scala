package graft.exprs

import org.apache.spark.sql.{Column, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (tier (b) of the custom-operator ladder:
  * compose built-ins < custom Expression < custom plan < mapPartitions).
  * Both participate in whole-stage codegen via `doGenCode` — the generated
  * code calls the static JVM implementations below directly on UTF8String /
  * ArrayData, with none of a UDF's encoder round-trip or closure dispatch.
  */
object NativeFunctions {

  /** FNV-1a 64-bit over the string's UTF-8 bytes. */
  def fnv64(s: UTF8String): Long = {
    var h = 0xcbf29ce484222325L
    val n = s.numBytes()
    var i = 0
    while (i < n) { h ^= (s.getByte(i) & 0xff); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Cosine similarity over two numeric arrays (float or double elements,
    * flagged per side so mixed column/literal types stay codegen-friendly).
    * One fused ascending pass accumulating dot and both norms in double —
    * the SAME add sequence as the HOF formulation
    * `dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))`, so results are
    * bit-identical to it (and to the DuckDB oracle's arithmetic); the win
    * is pure dispatch: no per-element interpreted lambdas, three array
    * walks fused into one. */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }

  /** Collapse every maximal run of Java-regex `\s` characters
    * ([ \t\n\x0B\f\r] — all single-byte, so a bytewise scan is UTF-8-safe;
    * continuation bytes are ≥ 0x80 and never match) into one space:
    * bit-identical to `regexp_replace(s, "\\s+", " ")` without the regex
    * engine walking every document. */
  def collapseWs(s: UTF8String): UTF8String = {
    val in = s.getBytes
    val out = new Array[Byte](in.length)
    var o = 0
    var inRun = false
    var i = 0
    while (i < in.length) {
      val b = in(i)
      val ws = b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D
      if (ws) {
        if (!inRun) { out(o) = 0x20; o += 1; inRun = true }
      } else { out(o) = b; o += 1; inRun = false }
      i += 1
    }
    UTF8String.fromBytes(out, 0, o)
  }

  /** Unicode NFC normalization (canonical composition — `e`+U+0301 → `é`).
    * Web-scraped corpora mix composed and decomposed forms of the same text,
    * which defeats exact dedup and token matching; NFC-first is the standard
    * first stage of a text-cleaning pipeline. Bytewise ASCII fast path: NFC
    * is the identity on ASCII, and real corpora are dominantly ASCII, so the
    * common row never allocates a java.lang.String. */
  def nfcNormalize(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) { if ((s.getByte(i) & 0x80) != 0) ascii = false; i += 1 }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Intersection of two ASCENDING-SORTED long arrays (null-free, as
    * `sort_array(collect_list(...))` produces) by two-pointer merge —
    * O(|a|+|b|) with zero hashing and one primitive-array allocation,
    * where `array_intersect` builds a hash set per ROW. This is the inner
    * loop of edge-iterator triangle counting (every edge intersects two
    * adjacency lists), so per-call constants multiply by |E|. Duplicate
    * values contribute min-multiplicity; on distinct inputs (the adjacency
    * case) the result is the plain set intersection, identical to
    * `array_intersect`. */
  def sortedIntersectLong(a: ArrayData, b: ArrayData): ArrayData = {
    val na = a.numElements()
    val nb = b.numElements()
    val out = new Array[Long](math.min(na, nb))
    var i = 0; var j = 0; var o = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { out(o) = x; o += 1; i += 1; j += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, o))
  }

  /** 64-bit SimHash over an array of strings (per-bit vote accumulation of
    * each element's fnv64). Null elements are skipped. */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = fnv64(arr.getUTF8String(i))
        var b = 0
        while (b < 64) { if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** `fnv_hash64(str)` — stable 64-bit content hash (unlike String.hashCode,
  * identical across JVMs/partitions; unlike xxhash64, matchable by external
  * systems that speak FNV). */
case class FnvHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"fnv_hash64 requires string, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "fnv_hash64"
  override protected def nullSafeEval(input: Any): Any =
    NativeFunctions.fnv64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.NativeFunctions.fnv64($c)")
  override protected def withNewChildInternal(newChild: Expression): FnvHash64 =
    copy(child = newChild)
}

/** `collapse_ws(str)` — codegen'd whitespace-run collapse, semantically
  * identical to `regexp_replace(str, '\s+', ' ')` (one bytewise pass vs a
  * regex engine walk — fingerprint normalization is a scan-stage hot path
  * over full document texts). */
case class CollapseWs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"collapse_ws requires string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "collapse_ws"
  override protected def nullSafeEval(input: Any): Any =
    NativeFunctions.collapseWs(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.NativeFunctions.collapseWs($c)")
  override protected def withNewChildInternal(newChild: Expression): CollapseWs =
    copy(child = newChild)
}

/** `nfc_normalize(str)` — codegen'd Unicode NFC canonical composition with a
  * bytewise ASCII fast path (identical to DuckDB's `nfc_normalize` and
  * ICU/java.text.Normalizer NFC). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"nfc_normalize requires string, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    NativeFunctions.nfcNormalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.NativeFunctions.nfcNormalize($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** `simhash64(array<string>)` — codegen'd SimHash (replaces the UDF form:
  * no Seq[String] materialization per row). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"simhash64 requires array<string>, got $other")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    NativeFunctions.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.exprs.NativeFunctions.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** `cosine_sim(array<float|double>, array<float|double>)` — codegen'd
  * cosine similarity; element types may differ per side (a float corpus
  * column against a double literal query vector is the common ANN shape). */
case class CosineSim(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def elemFloat(t: DataType): Option[Boolean] = t match {
    case ArrayType(FloatType, _) => Some(true)
    case ArrayType(DoubleType, _) => Some(false)
    case _ => None
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemFloat(left.dataType).isDefined && elemFloat(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float|double>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  private lazy val lf = elemFloat(left.dataType).get
  private lazy val rf = elemFloat(right.dataType).get
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeFunctions.cosine(a.asInstanceOf[ArrayData], lf, b.asInstanceOf[ArrayData], rf)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.exprs.NativeFunctions.cosine($a, $lf, $b, $rf)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** `sorted_intersect(array<long>, array<long>)` — codegen'd two-pointer
  * intersection of ascending-sorted null-free long arrays (the adjacency
  * arrays of [[graft.operators.Graph.triangleCounts]]); set-identical to
  * `array_intersect` on distinct sorted inputs at a fraction of the
  * per-row cost (no hash set build per row). */
case class SortedIntersect(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def ok(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sorted_intersect requires array<long>, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sorted_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    NativeFunctions.sortedIntersectLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.exprs.NativeFunctions.sortedIntersectLong($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersect =
    copy(left = newLeft, right = newRight)
}

object NativeExpressions {

  def fnvHash64(c: Column): Column =
    GraftColumnBridge.column(FnvHash64(GraftColumnBridge.expression(c)))

  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(tokens)))

  def collapseWs(c: Column): Column =
    GraftColumnBridge.column(CollapseWs(GraftColumnBridge.expression(c)))

  def nfcNormalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))

  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSim(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def sortedIntersect(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersect(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Register all for SQL use (`SELECT fnv_hash64(col) ...`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_hash64", exprs => FnvHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSim(exprs.head, exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "top_k_by", exprs => TopKBy(exprs.head, exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottom_k_by", exprs => TopKBy(exprs.head, exprs(1), exprs(2), reverse = true), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "collapse_ws", exprs => CollapseWs(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", exprs => NfcNormalize(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters", exprs => HeavyHitters(exprs.head, exprs(1), exprs(2)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect", exprs => SortedIntersect(exprs.head, exprs(1)), "built-in")
  }
}
