package graft.data

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard set-similarity self-join via prefix filtering —
  * the deterministic counterpart to [[MinHashDedup]]: no sketch recall
  * contract; every pair with Jaccard ≥ t is returned (PPJoin-family prefix
  * filtering: a pair at Jaccard ≥ t must share at least one gram inside
  * both docs' rare-first prefixes of length |G| − ceil(t·|G|) + 1).
  *
  * Scale shape (100 TB):
  *  - Exact duplicates (identical gram sets — viral copies at web scale)
  *    collapse to one representative before indexing, so a cluster of f
  *    identical docs costs the index and sweep 1 entry, not one O(f²)
  *    task; the cluster's pairs reappear only in the output, where the
  *    quadratic size is inherent to the pair contract.
  *  - The inverted index holds PREFIX grams only, ordered globally by
  *    ascending document frequency, so the indexed grams are the rarest.
  *  - On template-clustered corpora prefix filtering alone degenerates —
  *    same-template docs share exactly their rarest grams (measured at
  *    sf0.1: 7.0M of 12.5M possible pairs survive the prefix+length
  *    filters). A per-pair join at that volume is the scale killer, so
  *    pairs never leave the posting list: each gram's list carries the
  *    member docs' sorted gram-hash arrays, and a primitive merge-intersect
  *    applies the EXACT rational threshold inline. Work is distributed by
  *    gram, bounded per list (df-ordering keeps lists short), with no
  *    driver collect and no broadcast cap.
  *  - Survivors (the true near-dups, orders of magnitude fewer) are then
  *    re-verified on RAW TEXT for the output values, so emitted
  *    inter/uni are exact string-gram counts. The only approximation in
  *    the whole path is 64-bit gram hashing in the inline filter
  *    (cross-gram collision odds ~|vocab|²/2⁶⁵; a miss further needs ~15
  *    simultaneous collisions to bridge the similarity gap).
  *  - The threshold is the exact rational num/den; every comparison is
  *    integer arithmetic — no floating-point boundary anywhere.
  *
  * Complements the reference's keyed dedup (glassflow-api
  * internal/processor/deduplicate.go operates on exact keys); this is the
  * corpus-level fuzzy variant a training-data pipeline needs.
  */
object NgramJaccard {

  /** Jaccard threshold is the exact rational thresholdNum/thresholdDen. */
  final case class Config(n: Int = 2, thresholdNum: Int = 3, thresholdDen: Int = 5)

  /** Distinct word n-gram set (JVM-side; same definition as
    * [[TextFunctions.shingles]]: whitespace tokens of trimmed text). */
  private def gramSet(text: String, n: Int): Set[String] = {
    val toks = if (text == null || text.trim.isEmpty) Array.empty[String]
    else text.trim.split("\\s+")
    if (toks.length < n) Set.empty
    else toks.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Near-duplicate pairs (id_a < id_b) with exact word-n-gram Jaccard ≥
    * num/den; output carries the exact intersection and union sizes. */
  def duplicatePairs(df: DataFrame, idCol: String, textCol: String,
                     cfg: Config = Config()): DataFrame = {
    val tn = cfg.thresholdNum
    val td = cfg.thresholdDen
    // spread before the gram-hash UDF: single-row-group inputs floor the
    // scan at one task (guide §2.5; no-op when the scan is already wide)
    val base = Spread.byKey(
      df.select(col(idCol).as("id"), col(textCol).as("text")), col("id"))
    // Sorted 64-bit gram hashes per doc: the merge-intersect
    // representation, built in one tight primitive loop per doc (Catalyst
    // cannot hoist shared subexpressions out of HOF lambdas, so the
    // declarative shingle→hash→sort chain is interpreted per element and
    // dominates the whole pipeline — same lesson as MinHash signatures).
    val hashSet = udf { text: String =>
      val toks = if (text == null || text.trim.isEmpty) Array.empty[String]
      else text.trim.split("\\s+")
      if (toks.length < cfg.n) Array.empty[Long]
      else {
        val hs = toks.sliding(cfg.n).map { w =>
          val g = w.mkString(" ")
          var h = 0xcbf29ce484222325L
          var i = 0
          while (i < g.length) { h ^= g.charAt(i); h *= 0x100000001b3L; i += 1 }
          h
        }.toArray
        java.util.Arrays.sort(hs)
        // dedupe in place (sorted)
        var (r, w) = (1, 1)
        while (r < hs.length) {
          if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
          r += 1
        }
        java.util.Arrays.copyOf(hs, w)
      }
    }
    val allDocs = base.select(col("id"), hashSet(col("text")).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("sz", size(col("hs")))

    // Collapse exact duplicates (identical gram sets) to one representative
    // BEFORE indexing: a viral duplicate cluster of f docs would otherwise
    // put f entries in one posting list and cost O(f²) in a single task.
    // After the sweep, representative pairs expand back to member pairs,
    // and within-group pairs are emitted directly (identical sets are at
    // Jaccard 1 ≥ any threshold) — the quadratic blow-up survives only in
    // the OUTPUT, which is inherent to the pair contract.
    // checkpointed: `groups` feeds the representative index below AND the
    // member-expansion at the end, and `hashed` feeds both the gram
    // explode and the posting-list rejoin — under lazy lineage each
    // consumer re-ran the tokenize+hash UDF over the raw text
    val groups = allDocs.groupBy(col("hs"), col("sz"))
      .agg(min(col("id")).as("id"), collect_list(col("id")).as("members"))
      .localCheckpoint()
    val hashed = groups.select(col("id"), col("hs"), col("sz"))
    val exploded = hashed.select(col("id"), col("sz"),
      explode(col("hs")).as("h"))

    // Global document frequency per gram — the rare-first canonical order.
    val dfreq = exploded.groupBy("h").agg(count(lit(1)).as("df"))

    // Rank each doc's grams rare-first; keep the prefix of length
    // sz − ceil(t·sz) + 1 (integer ceil via (sz·num + den − 1) div den).
    val postings = exploded.join(dfreq, "h")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("h"))))
      .filter(col("rk") <= col("sz") - expr(s"(sz * $tn + $td - 1) div $td") + 1)
      // df-prune (r17): a df=1 gram's posting list holds one doc and can
      // never produce a pair — the size(ids)>1 filter below would drop it
      // anyway, but only AFTER the list groupBy and the hash-array rejoin
      // shuffled it. Prefix grams are each doc's RAREST, so most of them
      // are df=1 and the prune removes the bulk of the posting volume.
      // Ranks are computed over the FULL gram set first, so the kept
      // prefix is byte-identical to before minus the sterile entries.
      .filter(col("df") >= 2)
      .select(col("h"), col("id"))

    // Posting lists that can produce a pair, rejoined to the members'
    // hash arrays (fetched only for docs inside shared lists).
    // The final groupBy's exchange is PINNED at the session shuffle width
    // (r17; the IntervalJoin lesson): the stage reading it runs the
    // bitset pair sweep — quadratic CPU per list over linear bytes — and
    // AQE's byte model coalesced it to 1-3 tasks at sf0.1.
    val width = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val lists = postings.groupBy("h")
      .agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(col("h"), explode(col("ids")).as("id"))
      .join(hashed.select(col("id"), col("hs")), "id")
      .repartition(width, col("h"))
      .groupBy("h")
      .agg(collect_list(struct(col("id"), col("hs"))).as("docs"))
      .select(transform(col("docs"), d => d.getField("id")).as("ids"),
        transform(col("docs"), d => d.getField("hs")).as("sets"))

    // Inline pair sweep: every i<j pair in the list passes the length
    // filter then an exact-rational-threshold intersection test. Dense
    // template clusters make per-pair sorted merges the bottleneck
    // (~100 branchy steps/pair over millions of pairs), so each list
    // builds a LOCAL dictionary over its members' gram union and
    // intersects fixed-width bitsets instead — branchless AND+popcount,
    // ~|union|/64 words per pair. The dictionary is per-list, so nothing
    // global is built and the width adapts to the list's own vocabulary.
    val sweep = udf { (ids: scala.collection.Seq[Long],
                       sets: scala.collection.Seq[scala.collection.Seq[Long]]) =>
      val n = ids.length
      val local = new java.util.HashMap[Long, Integer]()
      val arrs = sets.iterator.map(_.toArray).toArray
      arrs.foreach(_.foreach { h =>
        if (!local.containsKey(h)) local.put(h, local.size())
      })
      val words = (local.size() + 63) >>> 6
      val bits = Array.ofDim[Long](n, words)
      val szs = new Array[Int](n)
      var i = 0
      while (i < n) {
        val sa = arrs(i)
        szs(i) = sa.length
        var k = 0
        while (k < sa.length) {
          val idx = local.get(sa(k)).intValue()
          bits(i)(idx >>> 6) |= 1L << (idx & 63)
          k += 1
        }
        i += 1
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val (la, lb) = (szs(i), szs(j))
          if (math.min(la, lb) * td >= math.max(la, lb) * tn) {
            val (ba, bb) = (bits(i), bits(j))
            var (w, inter) = (0, 0)
            while (w < words) {
              inter += java.lang.Long.bitCount(ba(w) & bb(w))
              w += 1
            }
            if (inter * td >= (la + lb - inter) * tn) {
              val (a, b) = (ids(i), ids(j))
              out += (if (a < b) (a, b) else (b, a))
            }
          }
          j += 1
        }
        i += 1
      }
      out.toSeq
    }

    // Pinned dedup exchange (r17; same argument as containmentPairs): the
    // stage reading it fuses the raw-text re-verify UDF, which AQE's byte
    // model otherwise squeezes onto 1-2 tasks.
    val repPairs = lists
      .select(explode(sweep(col("ids"), col("sets"))).as("p"))
      .select(col("p._1").as("ra"), col("p._2").as("rb"))
      .repartition(width, col("ra"), col("rb"))
      .distinct()

    // Exact re-verification on raw text at the REPRESENTATIVE level —
    // O(rep pairs + groups), not O(output pairs): members of a group
    // share their rep's gram set, so the verified counts propagate
    // through the expansion below.
    val interUni = udf { (a: String, b: String) =>
      val (sa, sb) = (gramSet(a, cfg.n), gramSet(b, cfg.n))
      val inter = (sa & sb).size
      (inter, sa.size + sb.size - inter)
    }
    val verifiedReps = repPairs
      .join(base.select(col("id").as("ra"), col("text").as("text_a")), "ra")
      .join(base.select(col("id").as("rb"), col("text").as("text_b")), "rb")
      .withColumn("iu", interUni(col("text_a"), col("text_b")))
      .select(col("ra"), col("rb"),
        col("iu._1").as("inter"), col("iu._2").as("uni"))
      .filter(col("inter") * td >= col("uni") * tn)

    // Expand representative pairs to member pairs, and emit all pairs
    // inside each exact-duplicate group (identical sets: Jaccard 1,
    // inter = uni = the group's string-gram count, verified once).
    val crossPairs = verifiedReps
      .join(groups.select(col("id").as("ra"), col("members").as("ma")), "ra")
      .join(groups.select(col("id").as("rb"), col("members").as("mb")), "rb")
      .select(explode(col("ma")).as("x"), col("mb"), col("inter"), col("uni"))
      .select(col("x"), explode(col("mb")).as("y"), col("inter"), col("uni"))
      .select(least(col("x"), col("y")).as("id_a"),
        greatest(col("x"), col("y")).as("id_b"), col("inter"), col("uni"))
    val gramCount = udf { text: String => gramSet(text, cfg.n).size }
    val withinPairs = groups.filter(size(col("members")) > 1)
      .join(base, "id")
      .withColumn("s", gramCount(col("text")))
      .select(explode(col("members")).as("x"), col("members"), col("s"))
      .select(col("x"), explode(col("members")).as("y"), col("s"))
      .filter(col("x") < col("y"))
      .select(col("x").as("id_a"), col("y").as("id_b"),
        col("s").as("inter"), col("s").as("uni"))
    crossPairs.unionByName(withinPairs)
  }

  /** Asymmetric CONTAINMENT pairs: directed (id_sub → id_super) where the
    * sub-document's gram set sits (almost) inside the super-document's —
    * `|G(sub) ∩ G(super)| · den ≥ |G(sub)| · num`, sub ≠ super. Jaccard
    * misses exactly these (a page embedded in a 10× longer page has
    * J ≈ 0.1 but containment 1.0); boilerplate-wrapped copies and
    * quote-expansions are the common web-corpus case. Broder's resemblance
    * vs containment distinction (SEQUENCES '97) is the published basis.
    *
    * Scale shape (100 TB): candidate generation is prefix-filtered on the
    * SUB side only — a pair at containment ≥ t must share a gram inside
    * the sub's rare-first prefix of length `sz − ceil(t·sz) + 1` (for
    * t = 4/5 that is ~sz/5 of its grams), while the super side indexes
    * every gram. Both sides shuffle by gram (no all-pairs stage) and
    * candidates never leave the posting lists: a per-list bitset sweep
    * applies the exact rational containment test inline (measured at
    * sf0.1: 14M prefix-filtered candidates collapse inside the lists;
    * materializing them — the first cut of this operator — took minutes,
    * the sweep takes seconds), so only true near-containments reach the
    * raw-text re-verify. Every comparison is integer arithmetic — no
    * float boundary.
    *
    * Skew guard: the prefix keeps only each doc's RAREST grams, but
    * "rarest" is relative — a short doc composed entirely of
    * corpus-common grams still puts a high-df gram in its prefix, and
    * that gram's grouped list would hold a corpus-scale slice of docs
    * WITH their full gram arrays (single-row OOM + one-task O(m²)
    * sweep). So grams with df > `hotGramDf` never enter a posting list:
    * their (sub, super) candidates are materialized as plain id pairs
    * and fed straight to the exact raw-text re-verify the cold path also
    * ends in — same output, no recall trade. The hot volume is bounded
    * by |subs whose prefix reaches into stop-grams| × df — linear, not
    * quadratic, in the corpus — and such subs are rare by construction
    * (their RAREST gram is corpus-common).
    *
    * Output is exact: `inter` and `sz_sub` are string-gram counts. */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 2, thresholdNum: Int = 4,
                       thresholdDen: Int = 5,
                       hotGramDf: Int = 1024): DataFrame = {
    val (tn, td) = (thresholdNum, thresholdDen)
    // Spread before the gram-hash UDF (single-row-group inputs plan the
    // scan as ONE task — guide §2.5), and checkpoint AFTER it: `hashed`
    // feeds five separate consumers below (dfreq, the prefix postings,
    // the hot-gram pairs, and both sides of the posting-list build), and
    // under lazy lineage each consumer re-ran the tokenize+hash UDF from
    // the raw text — measured as six ~1-2 s single-task stages at sf0.1.
    // The checkpointed frame is the lightweight proxy (id + sorted hash
    // array), so the raw text is scanned once for hashing and once for
    // the final survivor re-verify, never per consumer.
    val base = Spread.byKey(
      df.select(col(idCol).as("id"), col(textCol).as("text")), col("id"))
    val hashSet = udf { text: String =>
      val toks = if (text == null || text.trim.isEmpty) Array.empty[String]
      else text.trim.split("\\s+")
      if (toks.length < n) Array.empty[Long]
      else {
        val hs = toks.sliding(n).map { w =>
          val g = w.mkString(" ")
          var h = 0xcbf29ce484222325L
          var i = 0
          while (i < g.length) { h ^= g.charAt(i); h *= 0x100000001b3L; i += 1 }
          h
        }.toArray
        java.util.Arrays.sort(hs)
        var (r, w) = (1, 1)
        while (r < hs.length) {
          if (hs(r) != hs(w - 1)) { hs(w) = hs(r); w += 1 }
          r += 1
        }
        java.util.Arrays.copyOf(hs, w)
      }
    }
    val hashed = base.select(col("id"), hashSet(col("text")).as("hs"))
      .filter(size(col("hs")) > 0)
      .withColumn("sz", size(col("hs")))
      .localCheckpoint()
    val exploded = hashed.select(col("id"), col("sz"),
      explode(col("hs")).as("h"))
    val dfreq = exploded.groupBy("h").agg(count(lit(1)).as("df"))
    // Sub-side prefix postings (rare-first; ceil via integer arithmetic).
    val subPrefixAll = exploded.join(dfreq, "h")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("id")).orderBy(col("df"), col("h"))))
      .filter(col("rk") <= col("sz") - expr(s"(sz * $tn + $td - 1) div $td") + 1)
      .select(col("h"), col("id").as("id_sub"), col("df"))
    // df-prune (r17, same argument as duplicatePairs): a df=1 prefix gram
    // indexes only the sub itself — its list sweeps nothing — yet it rode
    // the exploded⋈subLists join, the hash-array rejoin and the final
    // groupBy. Most prefix grams are df=1 (the prefix keeps each doc's
    // rarest), so this prunes the posting build's dominant volume while
    // leaving the survivor set byte-identical.
    val subPrefix = subPrefixAll
      .filter(col("df") <= hotGramDf && col("df") >= 2)
      .select("h", "id_sub")
    // Hot grams (df above the cap) skip the posting-list sweep entirely:
    // plain candidate pairs, deduped, exact-verified below with the cold
    // survivors. Every list the sweep sees is then ≤ hotGramDf docs wide.
    // no distinct here (r17): the survivor stream's single pinned dedup
    // below collapses hot-pair duplicates map-side in the same pass
    val hotPairs = subPrefixAll.filter(col("df") > hotGramDf)
      .select(col("h"), col("id_sub"))
      .join(exploded.select(col("h"), col("id").as("id_super")), "h")
      .filter(col("id_sub") =!= col("id_super"))
      .select("id_sub", "id_super")

    // Candidate pairs NEVER materialize outside posting lists (the
    // duplicatePairs lesson: on template-clustered corpora millions of
    // candidates survive the prefix filter, and joining each back to its
    // gram set — let alone raw text — is the scale killer). Each gram's
    // list carries its sub-prefix members plus ALL members' sorted
    // gram-hash arrays; a local bitset sweep applies the exact rational
    // containment test inline, so only true near-containments (orders of
    // magnitude fewer) leave the lists.
    val subLists = subPrefix.groupBy("h")
      .agg(collect_list(col("id_sub")).as("subs"))
    // Pinned exchange before the sweep-feeding aggregate (r17; see
    // duplicatePairs): the downstream stage runs the per-list bitset
    // containment sweep — profiled at sf0.1 as ~2 s of CPU in ONE
    // AQE-coalesced task over a 235 KB shuffle.
    val width = df.sparkSession.conf
      .get("spark.sql.shuffle.partitions", "200").toInt
    val lists = exploded.select(col("h"), col("id"))
      .join(subLists, "h")
      .join(hashed.select(col("id"), col("hs")), "id")
      .repartition(width, col("h"))
      .groupBy(col("h"))
      .agg(first(col("subs")).as("subs"),
        collect_list(struct(col("id"), col("hs"))).as("docs"))
      .select(col("subs"),
        transform(col("docs"), d => d.getField("id")).as("ids"),
        transform(col("docs"), d => d.getField("hs")).as("sets"))

    val sweep = udf { (subs: scala.collection.Seq[Long],
                       ids: scala.collection.Seq[Long],
                       sets: scala.collection.Seq[scala.collection.Seq[Long]]) =>
      val m = ids.length
      val local = new java.util.HashMap[Long, Integer]()
      val arrs = sets.iterator.map(_.toArray).toArray
      arrs.foreach(_.foreach { h =>
        if (!local.containsKey(h)) local.put(h, local.size())
      })
      val words = (local.size() + 63) >>> 6
      val bits = Array.ofDim[Long](m, words)
      val szs = new Array[Int](m)
      var i = 0
      while (i < m) {
        val sa = arrs(i)
        szs(i) = sa.length
        var k = 0
        while (k < sa.length) {
          val idx = local.get(sa(k)).intValue()
          bits(i)(idx >>> 6) |= 1L << (idx & 63)
          k += 1
        }
        i += 1
      }
      val idPos = new java.util.HashMap[Long, Integer]()
      i = 0
      while (i < m) { idPos.put(ids(i), i); i += 1 }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      subs.foreach { sid =>
        val si = idPos.get(sid).intValue()
        val bs = bits(si); val szSub = szs(si)
        var j = 0
        while (j < m) {
          if (j != si) {
            val ba = bits(j)
            var (w, inter) = (0, 0)
            while (w < words) {
              inter += java.lang.Long.bitCount(bs(w) & ba(w))
              w += 1
            }
            if (inter * td >= szSub * tn) out += ((sid, ids(j)))
          }
          j += 1
        }
      }
      out.toSeq
    }

    // ONE pinned dedup for the survivor stream (r17): the sweep output,
    // the hot-pair stream and their union each carried a distinct() —
    // three exchanges where one suffices (distinct partial-aggregates
    // map-side, so early dedup bought nothing the final pass doesn't).
    // The surviving exchange is pinned at the session shuffle width
    // because the stage reading it fuses the raw-text re-verify UDF
    // below (profiled: ~1.9 s of gramSet CPU in ONE AQE-coalesced task
    // over a 235 KB shuffle).
    val survivors = lists
      .select(explode(sweep(col("subs"), col("ids"), col("sets"))).as("p"))
      .select(col("p._1").as("id_sub"), col("p._2").as("id_super"))
      .unionByName(hotPairs)
      .repartition(width, col("id_sub"), col("id_super"))
      .distinct()

    // Exact re-verify the (few) survivors on raw text: containment is
    // directional, so the emitted counts are |G(sub) ∩ G(super)| and
    // |G(sub)| as exact string-gram counts — the 64-bit hashing above is
    // only ever a filter (collision odds ~|vocab|²/2⁶⁵, as in
    // [[duplicatePairs]]).
    val interSub = udf { (a: String, b: String) =>
      val (sa, sb) = (gramSet(a, n), gramSet(b, n))
      ((sa & sb).size, sa.size)
    }
    survivors
      .join(base.select(col("id").as("id_sub"), col("text").as("text_sub")),
        "id_sub")
      .join(base.select(col("id").as("id_super"), col("text").as("text_super")),
        "id_super")
      .withColumn("is", interSub(col("text_sub"), col("text_super")))
      .select(col("id_sub"), col("id_super"),
        col("is._1").as("inter"), col("is._2").as("sz_sub"))
      .filter(col("inter") * td >= col("sz_sub") * tn)
  }
}
