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

object NativeExpressions {

  def fnvHash64(c: Column): Column =
    GraftColumnBridge.column(FnvHash64(GraftColumnBridge.expression(c)))

  def simhash64(tokens: Column): Column =
    GraftColumnBridge.column(SimHash64Expr(GraftColumnBridge.expression(tokens)))

  /** Register both for SQL use (`SELECT fnv_hash64(col) ...`). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "fnv_hash64", exprs => FnvHash64(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64Expr(exprs.head), "built-in")
  }
}
