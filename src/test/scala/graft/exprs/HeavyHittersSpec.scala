package graft.exprs

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: equals GROUP BY counts when distinct fits the capacity") {
    val events = Tables.events(spark, sf)
    val viaSketch = events.repartition(7) // force a multi-partial merge
      .agg(HeavyHitters.heavyHitters($"user_id", 10, 4096).as("top"))
      .select(explode($"top").as("h"))
      .select($"h.item".as("user_id"), $"h.count".as("n"), $"h.error".as("e"))
      .collect()
    val exact = events.groupBy($"user_id").count()
      .orderBy($"count".desc, $"user_id").limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaSketch.map(r => (r.getLong(0), r.getLong(1))).toSeq == exact.toSeq)
    assert(viaSketch.forall(_.getLong(2) == 0L), "exact regime must report zero error")
  }

  test("approximate regime: majority item survives eviction with a bounded overestimate") {
    // 60 of 'hot', 40 singletons, capacity 4: hot's true count is 60; the
    // sketch may overestimate by at most the evicted minimum mass
    val data = Seq.fill(60)("hot") ++ (1 to 40).map(i => s"cold$i")
    val out = scala.util.Random.shuffle(data).toDF("item")
      .agg(HeavyHitters.heavyHitters($"item", 1, 4).as("top"))
      .select(explode($"top").as("h")).select($"h.*").head()
    assert(out.getString(0) == "hot")
    val (count, err) = (out.getLong(1), out.getLong(2))
    assert(count >= 60, s"SpaceSaving never undercounts a kept item: $count")
    assert(count - err <= 60, s"count - error is a lower bound: $count - $err")
  }

  test("SQL registration and struct output shape") {
    NativeExpressions.register(spark)
    Seq("a", "a", "b").toDF("x").createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      "SELECT explode(heavy_hitters(x, 2, 16)) AS h FROM hh_in")
      .select("h.item", "h.count").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L), ("b", 1L)))
  }

  test("high-eviction stream: lazy-heap eviction keeps bounds over many distinct items") {
    // 20k distinct singletons + a 2k-count hot item through capacity 128:
    // ~20k evictions exercise the lazy heap + rebuild; the hot item must
    // surface with count >= true and count - error <= true
    val rnd = new scala.util.Random(11)
    val data = rnd.shuffle(Seq.fill(2000)("hot") ++ (1 to 20000).map(i => s"c$i"))
    val out = data.toDF("item").coalesce(2)
      .agg(HeavyHitters.heavyHitters($"item", 1, 128).as("top"))
      .select(explode($"top").as("h")).select($"h.*").head()
    assert(out.getString(0) == "hot")
    assert(out.getLong(1) >= 2000L)
    assert(out.getLong(1) - out.getLong(2) <= 2000L)
  }

  test("floor-carrying merge keeps count >= true for an item evicted in one partial") {
    val ord = Ordering.fromLessThan[Any]((a, b) =>
      a.asInstanceOf[String] < b.asInstanceOf[String])
    // partial A at capacity 2: x enters, then singletons bury and evict it
    val a = new SSBuffer(2, ord)
    Seq("x", "c1", "c2", "c3").foreach(a.add(_))
    assert(!a.counts.contains("x") && a.floorSum >= 1,
      "precondition: x evicted from A with a recorded floor")
    // partial B: x is hot
    val b = new SSBuffer(2, ord)
    Seq("x", "x", "x").foreach(b.add(_))
    b.merge(a)
    val Some((_, count, err)) = b.top(2).find(_._1 == "x")
    // true count of x across both streams = 1 (A, evicted) + 3 (B) = 4;
    // the pre-floor merge would have reported 3 here
    assert(count >= 4L, s"merged estimate must cover the evicted-side mass: $count")
    assert(count - err <= 4L, s"count - error stays a lower bound: $count - $err")
  }

  test("randomized multi-partial merges keep the oracle's guarantees") {
    // the q_heavy_hitters_approx oracle asserts: count >= true,
    // count - error <= true, error <= 8N/capacity, and every item with
    // true > 4N/capacity present. Stress those bounds across random skewed
    // streams split into random partials merged in random order.
    val rnd = new scala.util.Random(7)
    val ord = Ordering.fromLessThan[Any]((a, b) =>
      a.asInstanceOf[String] < b.asInstanceOf[String])
    (1 to 20).foreach { trial =>
      val capacity = 16 + rnd.nextInt(49) // 16..64
      val nHot = 1 + rnd.nextInt(5)
      val stream = scala.collection.mutable.ArrayBuffer.empty[String]
      (0 until nHot).foreach { h =>
        stream ++= Seq.fill(200 + rnd.nextInt(400))(s"hot$h")
      }
      stream ++= (1 to 500 + rnd.nextInt(2000)).map(i => s"c${rnd.nextInt(100000)}_$i")
      val shuffled = rnd.shuffle(stream.toSeq)
      val n = shuffled.length.toLong
      val nPartials = 2 + rnd.nextInt(15)
      val buffers = Array.fill(nPartials)(new SSBuffer(capacity, ord))
      shuffled.foreach(item => buffers(rnd.nextInt(nPartials)).add(item))
      val merged = rnd.shuffle(buffers.toSeq).reduce { (a, b) => a.merge(b); a }
      val truth = shuffled.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val top = merged.top(capacity)
      top.foreach { case (item, count, err) =>
        val t = truth(item.asInstanceOf[String])
        assert(count >= t, s"trial $trial: undercount $item: $count < $t")
        assert(count - err <= t, s"trial $trial: lower bound broken for $item")
        assert(err <= 8.0 * n / capacity,
          s"trial $trial: error $err above 8N/cap=${8.0 * n / capacity}")
      }
      val present = top.map(_._1.asInstanceOf[String]).toSet
      truth.filter(_._2 > 4.0 * n / capacity).keys.foreach { hh =>
        assert(present.contains(hh), s"trial $trial: true heavy hitter $hh lost")
      }
    }
  }

  test("k must not exceed capacity") {
    assertThrows[org.apache.spark.sql.AnalysisException] {
      Seq("a").toDF("x").agg(HeavyHitters.heavyHitters($"x", 10, 4)).collect()
    }
  }
}
