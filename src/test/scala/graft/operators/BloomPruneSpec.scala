package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("never a false negative: every build key passes the probe") {
    val rnd = new Random(7)
    val keys = Seq.fill(5000)(rnd.nextLong()).distinct
    val build = keys.toDF("k")
    val bf = BloomPrune.buildLong(build, "k", keys.size.toLong, 0.01)
    val missed = build
      .filter(!BloomPrune.mightContainLong(bf, "k")).count()
    assert(missed == 0L)
  }

  test("false-positive rate stays near the configured fpp") {
    val rnd = new Random(11)
    // disjoint domains: members even, probes odd — every probe hit is a fp
    val members = Seq.fill(20000)(rnd.nextLong() & ~1L).distinct
    val probes = Seq.fill(40000)(rnd.nextLong() | 1L).distinct
    val bf = BloomPrune.buildLong(members.toDF("k"), "k", members.size.toLong, 0.01)
    val pdf = probes.toDF("k")
    val fp = pdf.filter(BloomPrune.mightContainLong(bf, "k")).count()
    assert(fp.toDouble / probes.size < 0.05, s"fp rate ${fp.toDouble / probes.size}")
  }

  test("pruned join equals the plain join, null probe keys never match") {
    val rnd = new Random(23)
    val build = (0 until 500).map(i => (i.toLong, s"d$i")).toDF("bk", "dim")
    val probe = (0 until 8000)
      .map(i => (if (i % 13 == 0) null else java.lang.Long.valueOf(rnd.nextLong(2000L)),
        i.toLong))
      .toDF("pk", "row_id")
    val plain = probe.join(build, col("pk") === col("bk"))
      .select(col("row_id"), col("bk")).as[(Long, Long)].collect().toSet
    val pruned = BloomPrune.prunedJoin(probe, build, "pk", "bk", 500L)
      .select(col("row_id"), col("bk")).as[(Long, Long)].collect().toSet
    assert(pruned == plain)
  }
}
