package graft.data

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (1 to n).map(_.toLong).toDF("id")

  test("mixWeights reshapes the stratum distribution into the target mix") {
    import org.apache.spark.sql.functions.col
    // 8 en, 2 es docs; target 50/50 -> en weight 0.5/0.8, es 0.5/0.2
    val df = ((1 to 8).map(i => (i.toLong, "en")) ++ Seq((9L, "es"), (10L, "es")))
      .toDF("doc_id", "lang")
    val out = Sampling.mixWeights(df, "lang", Map("en" -> 0.5, "es" -> 0.5))
      .select(col("lang"), col("weight_micro")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("en") == 625000L) // 0.5 / 0.8
    assert(out("es") == 2500000L) // 0.5 / 0.2
    // a stratum missing from the target gets weight 0
    val out2 = Sampling.mixWeights(df, "lang", Map("en" -> 1.0))
      .select(col("lang"), col("weight_micro")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out2("es") == 0L)
  }

  test("bernoulli sample is deterministic and partitioning-invariant") {
    val df = ids(4000)
    val a = Sampling.bernoulli(df, "id", 0.25, "s").select("id").as[Long].collect().sorted
    val b = Sampling.bernoulli(df.repartition(13), "id", 0.25, "s")
      .select("id").as[Long].collect().sorted
    assert(a.sameElements(b), "membership must not depend on partitioning")
    // uniform hash: observed fraction within a loose binomial bound
    assert(math.abs(a.length / 4000.0 - 0.25) < 0.03, s"got ${a.length}/4000")
    // a different salt draws a different sample
    val c = Sampling.bernoulli(df, "id", 0.25, "other").select("id").as[Long].collect().sorted
    assert(!a.sameElements(c))
  }

  test("bernoulli edge fractions: 0 keeps nothing, 1 keeps everything") {
    val df = ids(100)
    assert(Sampling.bernoulli(df, "id", 0.0).count() == 0)
    assert(Sampling.bernoulli(df, "id", 1.0).count() == 100)
  }

  test("splitAssign is exhaustive, disjoint, and close to the weights") {
    val df = ids(4000)
    val out = df.select(col("id"),
        Sampling.splitAssign(col("id"),
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), "cut").as("split"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.keySet == Set("train", "valid", "test"))
    assert(out.values.sum == 4000L) // every row exactly one label
    assert(math.abs(out("train") / 4000.0 - 0.8) < 0.03)
    assert(math.abs(out("valid") / 4000.0 - 0.1) < 0.02)
    // deterministic: same assignment on rerun
    val again = df.select(Sampling.splitAssign(col("id"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), "cut")).collect()
    val first = df.select(Sampling.splitAssign(col("id"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), "cut")).collect()
    assert(again.map(_.getString(0)).sameElements(first.map(_.getString(0))))
  }

  test("splitAssign with a single label assigns it to every row") {
    val df = ids(10)
    val labels = df.select(Sampling.splitAssign(col("id"), Seq("all" -> 1.0)))
      .as[String].collect()
    assert(labels.forall(_ == "all"))
  }

  test("stratifiedQuota takes exactly min(quota, |stratum|) per stratum, deterministically") {
    val df = (1 to 300).map(i => (i.toLong, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "lang")
      .union(Seq((1000L, "rare")).toDF("id", "lang"))
    val out = Sampling.stratifiedQuota(df, "lang", "id", 20, "q")
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 20 && counts("b") == 20 && counts("c") == 20)
    assert(counts("rare") == 1) // stratum smaller than quota: keep all
    val rerun = Sampling.stratifiedQuota(df.repartition(7), "lang", "id", 20, "q")
      .select("id").as[Long].collect().sorted
    assert(rerun.sameElements(out.select("id").as[Long].collect().sorted))
  }

  test("stratifiedQuota (bottom_k_by heaps) equals the window row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 500).map(i => (i.toLong, "l" + (i % 4))).toDF("id", "lang")
    val viaAgg = Sampling.stratifiedQuota(df, "lang", "id", 17, "xchk")
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy(col("lang"))
      .orderBy(Sampling.hashDraw(col("id"), "xchk"), col("id"))
    val viaWindow = df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= 17).drop("__rn")
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.size == 4 * 17)
  }

  test("thresholdHex maps fractions to 8-digit hex cut points") {
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(0.8) == "cccccccc")
    assert(Sampling.thresholdHex(0.9) == "e6666666")
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(1.0) == "ffffffff")
  }

  test("winnowPairs finds docs sharing a long substring and respects the df cap") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, s"prefix one $shared suffix alpha"),
      (2L, s"totally different beginning $shared and another ending"),
      (3L, "no overlap at all here just plain unrelated words nothing shared"),
      (4L, "another unrelated document with its own content entirely distinct")
    ).toDF("doc_id", "text")
    val pairs = TextFunctions.winnowPairs(docs, "doc_id", "text",
      k = 8, w = 4, minShared = 5, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "docs sharing a 60-char substring must pair")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L || p._2 == 4L))
    // df cap 1 drops every posting list (each fp appears in >= 2 docs to pair)
    val capped = TextFunctions.winnowPairs(docs, "doc_id", "text", 8, 4, 1, maxDf = 1)
    assert(capped.count() == 0)
  }

  test("winnowPairs shared-count matches a direct fingerprint intersection") {
    val docs = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj"),
      (2L, "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj"),
      (3L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq")
    ).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        TextFunctions.winnowUdf(8, 4)(TextFunctions.normalize(col("text"))).as("fps"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("fps").toSet).toMap
    val expected = (fps(1L) intersect fps(2L)).size
    val got = TextFunctions.winnowPairs(docs, "doc_id", "text", 8, 4, 1, maxDf = 10)
      .filter(col("id_a") === 1L && col("id_b") === 2L)
      .head.getAs[Long]("shared")
    assert(got == expected.toLong)
  }

  test("tokenBudgetSample: offsets equal a single-partition global scan, any partitioning") {
    val rnd = new scala.util.Random(3)
    val rows = (0L until 300L).map(i => (i, 1L + rnd.nextInt(50)))
    def run(parts: Int) = Sampling.tokenBudgetSample(
        rows.toDF("id", "n").repartition(parts), "id", "n", budget = 3000L, salt = "s")
      .select("id", "token_offset", "kept")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    val a = run(1); val b = run(11)
    assert(a == b && a.size == 300)
    // reference: in-memory global scan over the same md5 order
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(id: Long) = md.digest(("s" + id).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    var cum = 0L
    val expect = rows.sortBy(r => (h(r._1), r._1.toString)).map { case (id, n) =>
      cum += n; (id, cum - n, cum <= 3000L)
    }.toSet
    assert(a == expect)
    // the kept set is a prefix: every kept offset is below every cut offset
    val keptMax = a.filter(_._3).map(_._2).max
    assert(a.filter(!_._3).forall(_._2 > keptMax))
  }

  test("temperatureWeights: downsample-only, flattens the head, partition-invariant") {
    import spark.implicits._
    val rows = (1L to 400L).map(d => (d, if (d <= 280) "en" else if (d <= 360) "de" else "fr"))
    for (parts <- Seq(1, 7)) {
      val w = Sampling.temperatureWeights(
          rows.toDF("doc_id", "lang").repartition(parts), "lang")
        .select("lang", "keep_prob_micro").distinct()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // every weight is a probability; the most-upweighted stratum keeps all
      assert(w.values.forall(v => v >= 0 && v <= 1000000L))
      assert(w.values.max == 1000000L)
      // α=1/2 flattening: the head stratum keeps the smallest fraction
      assert(w("en") < w("de") && w("de") <= w("fr"))
      // expected fixed-point replay for the head stratum
      def sm(n: Long) = math.floor(math.sqrt(n.toDouble) * 1000).toLong
      val (nn, ss) = (400L, sm(280) + sm(80) + sm(40))
      def f(n: Long) = (sm(n) * 1000000L / ss) * 1000000L / (n * 1000000L / nn)
      val maxf = Seq(280L, 80L, 40L).map(f).max
      assert(w("en") == f(280) * 1000000L / maxf)
    }
  }
}
