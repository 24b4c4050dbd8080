package graft.exprs

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NativeExprSpec extends SparkSpec {
  import spark.implicits._

  test("fnv_hash64 matches the reference FNV-1a test vectors") {
    // public FNV-1a 64 vectors: fnv1a64("") = 0xcbf29ce484222325,
    // fnv1a64("a") = 0xaf63dc4c8601ec8c
    val df = Seq("", "a", "hello").toDF("s")
    val out = df.select(NativeExpressions.fnvHash64(col("s"))).collect().map(_.getLong(0))
    assert(out(0) == 0xcbf29ce484222325L)
    assert(out(1) == 0xaf63dc4c8601ec8cL)
    // deterministic across evaluations
    val again = df.select(NativeExpressions.fnvHash64(col("s")))
      .collect().map(_.getLong(0))
    assert(out(2) == again(2))
  }

  test("nfc_normalize composes decomposed forms; ASCII fast path is identity") {
    val decomposed = "Cafe\u0301 A\u030Aa"
    val df = Seq(decomposed, "plain ascii", "d\u00e9j\u00e0 vu").toDF("s")
    val out = df.select(NativeExpressions.nfcNormalize(col("s"))).collect().map(_.getString(0))
    assert(out(0) == "Caf\u00e9 \u00c5a")
    assert(out(0) == java.text.Normalizer.normalize(decomposed, java.text.Normalizer.Form.NFC))
    assert(out(1) == "plain ascii")        // ASCII: untouched
    assert(out(2) == "d\u00e9j\u00e0 vu") // already-NFC non-ASCII: untouched
  }

  test("cleanText: NFC + control strip + whitespace collapse + trim") {
    import graft.data.TextFunctions
    val df = Seq("  a\u0007b\tc   d\u030A  ", "x").toDF("s")
    val out = df.select(TextFunctions.cleanText(col("s"))).collect().map(_.getString(0))
    assert(out(0) == "a b c d\u030A") // lone combining mark survives NFC (no base)
    assert(out(1) == "x")
  }

  test("curationGatesUdf equals the composed Catalyst helpers on real + adversarial text") {
    import graft.data.TextFunctions
    val docs = graft.Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (100001L, "  the of\u0007and  to\tin Cafe\u0301 !!!??  "),
        (100002L, "el la de que y en un los"),
        (100003L, ""),
        (100004L, "der die und das le les des une du")
      ).toDF("doc_id", "text"))
    val viaUdf = docs.select(col("doc_id"),
        TextFunctions.curationGatesUdf(col("text")).as("g"))
      .select(col("doc_id"), col("g._1"), col("g._2"), col("g._3"), col("g._4"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    val viaCatalyst = docs.select(col("doc_id"),
        TextFunctions.cleanText(col("text")).as("cl"))
      .select(col("doc_id"), col("cl"),
        TextFunctions.languageId(col("cl")).as("lang"),
        TextFunctions.qualityMilli(col("cl")).as("q"),
        TextFunctions.tokenCount(col("cl")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(viaUdf.size == viaCatalyst.size)
    viaCatalyst.foreach { case (id, exp) => assert(viaUdf(id) == exp, s"doc $id") }
  }

  test("cosine_sim is bit-identical to the HOF formulation, mixed element types") {
    import graft.data.EmbeddingOps
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 3)
      .head.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq
    val qc = array(q.map(lit): _*)
    val both = emb.select(
      NativeExpressions.cosineSim(col("embedding"), qc).as("native"),
      EmbeddingOps.cosine(EmbeddingOps.toDouble(col("embedding")), qc).as("hof"))
      .collect()
    both.foreach { r =>
      // EXACT equality: same ascending add sequence, same division tree —
      // the oracle's hash comparison tolerates zero divergence
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    // registered for SQL
    NativeExpressions.register(spark)
    val s = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").head.getDouble(0)
    assert(s == 1.0)
  }

  test("expressions run inside whole-stage codegen") {
    // a parquet-backed source: a local Seq would be constant-folded into a
    // LocalTableScan before codegen ever runs
    val df = graft.Tables.documents(spark, sf)
      .select(NativeExpressions.simhash64(split(col("text"), " ")).as("sh"),
        NativeExpressions.fnvHash64(col("text")).as("h"))
    // compact plan strings render WholeStageCodegen as a `*(n)` prefix —
    // check the physical node type, not the string
    val hasCodegen = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasCodegen, s"no codegen in:\n${df.queryExecution.executedPlan}")
    val r = df.head
    assert(r.getLong(0) != 0L && r.getLong(1) != 0L)
  }

  test("SQL registration") {
    NativeExpressions.register(spark)
    val out = spark.sql("SELECT fnv_hash64('a') AS h, simhash64(array('x','y')) AS s").head
    assert(out.getLong(0) == 0xaf63dc4c8601ec8cL)
    val direct = Seq(Seq("x", "y")).toDF("a")
      .select(NativeExpressions.simhash64(col("a"))).head.getLong(0)
    assert(out.getLong(1) == direct)
  }

  test("type checking rejects wrong inputs at analysis") {
    val df = Seq(1L).toDF("n")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(NativeExpressions.fnvHash64(col("n"))).collect()
    }
  }

  test("collapse_ws is bit-identical to regexp_replace \\s+ on randomized strings") {
    val rnd = new scala.util.Random(7)
    val alphabet = "ab \t\n\f\r€日x.  "
    val cases = Seq("", " ", "a", "  a  b  ", "\t\r\n", "a b" /* nbsp is NOT \s */) ++
      (1 to 300).map(_ => (0 until rnd.nextInt(40)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = cases.toDF("s")
    val out = df.select(
      NativeExpressions.collapseWs(col("s")).as("fast"),
      regexp_replace(col("s"), "\\s+", " ").as("re")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1), s"on ${r}"))
    // codegen path too (parquet scan; compact plan strings render codegen
    // as a `*(n)` prefix, so check the physical node type)
    val cg = spark.read.parquet(s"$sf/documents.parquet")
      .select(NativeExpressions.collapseWs(col("text")))
      .queryExecution.executedPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }
    assert(cg.nonEmpty)
  }

  test("sorted_intersect equals array_intersect on sorted distinct arrays") {
    val rnd = new scala.util.Random(7)
    val cases = (0 until 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(20))(rnd.nextInt(30).toLong)
        .distinct.sorted
      (arr(), arr())
    } :+ ((Seq.empty[Long], Seq(1L, 2L))) :+ ((Seq(5L), Seq(5L)))
    val df = cases.toDF("a", "b")
    val out = df.select(
      NativeExpressions.sortedIntersect(col("a"), col("b")).as("fast"),
      array_intersect(col("a"), col("b")).as("ref")).collect()
    out.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"on $r")
    }
    // stays inside whole-stage codegen (range scan — LocalTableScan of the
    // toDF frame above never wraps in codegen regardless of expression)
    val cgDf = spark.range(10)
      .select(sequence(lit(0L), col("id")).as("a"),
        sequence(lit(2L), lit(8L)).as("b"))
      .select(NativeExpressions.sortedIntersect(col("a"), col("b")).as("x"))
    val cg = cgDf.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(cg.nonEmpty)
    assert(cgDf.collect().last.getSeq[Long](0) == (2L to 8L))
  }

  test("null safety: null input yields null, null array elements skipped") {
    val df = Seq((null.asInstanceOf[String], Seq("a", null, "b"))).toDF("s", "arr")
    val r = df.select(NativeExpressions.fnvHash64(col("s")).as("h"),
      NativeExpressions.simhash64(col("arr")).as("sh")).head
    assert(r.isNullAt(0))
    val noNulls = Seq(Seq("a", "b")).toDF("arr")
      .select(NativeExpressions.simhash64(col("arr"))).head.getLong(0)
    assert(r.getLong(1) == noNulls)
  }
}
