package graft.data

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DataOpsSpec extends SparkSpec {
  import spark.implicits._

  test("multimodal: animated GIF frames decode with exact per-frame pixels") {
    val gif = Multimodal.syntheticGif(4, 5, Seq(10, 200, 37, 255))
    val df = Seq((1L, "image/gif", gif, 99L))
      .toDF("media_id", "mime", "content", "n_frames")
    val out = Multimodal.sampleFramesDecoded(df, 1, "n_frames")
      .select("frame_idx", "frame_w", "frame_h", "frame_mean").collect()
      .sortBy(_.getLong(0))
    // frame count comes from the container (4), NOT the metadata column (99)
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.forall(r => r.getInt(1) == 4 && r.getInt(2) == 5))
    // lossless gray palette: decoded per-frame mean is the exact fill value
    assert(out.map(_.getDouble(3)).toSeq == Seq(10.0, 200.0, 37.0, 255.0))
    // stride sampling picks indices 0 and 2
    val sampled = Multimodal.sampleFramesDecoded(df, 2, "n_frames")
      .select("frame_idx").collect().map(_.getLong(0)).sorted
    assert(sampled.toSeq == Seq(0L, 2L))
    // extracted frame bytes are themselves decodable PNGs with the right fill
    val frame0 = Multimodal.sampleFramesDecoded(df, 1, "n_frames")
      .filter(col("frame_idx") === 0).select("frame").head.getAs[Array[Byte]](0)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame0))
    assert(img.getWidth == 4 && img.getHeight == 5)
    assert((img.getRGB(0, 0) & 0xff) == 10)
    // no codec (video): stub seam — metadata count drives indices, pixels null
    val vid = Seq((2L, "video/mp4", null.asInstanceOf[Array[Byte]], 7L))
      .toDF("media_id", "mime", "content", "n_frames")
    val vout = Multimodal.sampleFramesDecoded(vid, 3, "n_frames").collect()
    assert(vout.map(_.getAs[Long]("frame_idx")).sorted.toSeq == Seq(0L, 3L, 6L))
    assert(vout.forall(r => r.isNullAt(r.fieldIndex("frame_mean"))))
  }

  test("registeredDomain: two-label baseline plus public-suffix awareness") {
    val hosts = Seq(
      "www.example.com", "example.com", "deep.sub.example.org",
      "www.example.co.uk", "example.co.uk", "shop.example.com.au",
      "a.b.example.gov.uk", "co.uk", "localhost")
    val out = hosts.toDF("host")
      .select(col("host"), TextFunctions.registeredDomain(col("host")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("www.example.com") == "example.com")
    assert(out("example.com") == "example.com")
    assert(out("deep.sub.example.org") == "example.org")
    // multi-label public suffixes: registration is one label deeper
    assert(out("www.example.co.uk") == "example.co.uk")
    assert(out("example.co.uk") == "example.co.uk")
    assert(out("shop.example.com.au") == "example.com.au")
    assert(out("a.b.example.gov.uk") == "example.gov.uk")
    // a bare suffix host falls back to the two-label rule
    assert(out("co.uk") == "co.uk")
    // single-label host: no registered domain (regex yields empty)
    assert(out("localhost") == "")
  }

  test("contamination: distinct shared trigrams against a benchmark set") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta eps"),   // contains bench trigram "alpha beta gamma"+"beta gamma delta"
      (2L, "zeta eta theta iota"),          // clean
      (3L, "xx yy")                         // too short: excluded
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val out = Contamination.ngramOverlap(corpus, bench, "doc_id", "text", 3)
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    // doc 1: trigrams {abg, bgd, gde} -> 2 hit of 3 -> 666
    assert(out(1L) == ((3, 2L, 666)))
    assert(out(2L) == ((2, 0L, 0)))
    assert(!out.contains(3L))
  }

  test("BM25: zero without query terms, grows with tf, rare terms weigh more") {
    val df = Seq(
      (1L, "spark spark spark runs fast queries"),
      (2L, "spark is here"),
      (3L, "nothing relevant at all"),
      (4L, "rareword appears once")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25(df, "doc_id", "text", Seq("spark", "rareword"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(3L) == 0L)
    assert(out(1L) > out(2L), "higher tf must score higher")
    // rareword (df=1) must outscore a single spark mention (df=2)
    assert(out(4L) > out(2L))
  }

  test("PII detection and redaction: emails, IPv4, phones") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "mail a.b+c%d@sub.example.co.uk now"),
      (2L, "host 192.168.0.1 and 10.0.0.255, not 1234.5.6.78"),
      (3L, "call 555-0142 or 555-014211 (too long)"),
      (4L, "clean text, no pii at all"),
      (5L, "x@y.io at 8.8.8.8 call 555-0100")
    ).toDF("id", "text")
    val out = df.select(col("id"),
      Pii.emailCount(col("text")).as("e"),
      Pii.ipv4Count(col("text")).as("i"),
      Pii.phoneCount(col("text")).as("p"),
      Pii.redact(col("text")).as("r"))
      .orderBy("id").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(out(0) == ((1, 0, 0, "mail <EMAIL> now")))
    assert(out(1)._2 == 2 && out(1)._4.contains("<IP> and <IP>,"))
    assert(out(2) == ((0, 0, 1, "call <PHONE> or 555-014211 (too long)")))
    assert(out(3) == ((0, 0, 0, "clean text, no pii at all")))
    assert(out(4) == ((1, 1, 1, "<EMAIL> at <IP> call <PHONE>")))
  }

  test("repetition signals: dup token/ngram fractions and top-bigram share") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "a a a a"),                      // all dup tokens: dup=750, top bigram "a a" x3 covers 6/4 -> capped 1000
      (2L, "the cat sat on the mat"),       // one dup token (the): 1000*1/6=166
      (3L, ""),                             // empty: all zeros
      (4L, "x y"),                          // no repeats, single bigram
      (5L, "go go go stop go go go stop")   // heavy bigram repetition
    ).toDF("id", "text")
    val out = df.select(col("id"),
      TextFunctions.dupTokenFracMilli(col("text")).as("dt"),
      TextFunctions.dupNgramFracMilli(col("text"), 2).as("d2"),
      TextFunctions.dupNgramFracMilli(col("text"), 5).as("d5"),
      TextFunctions.topNgramFracMilli(col("text"), 2).as("t2"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(out(0) == ((1L, 750, 666, 0, 1000)))   // "a a" appears 3x of 3 bigrams, 2 dup
    assert(out(1) == ((2L, 166, 0, 0, 333)))      // every bigram unique: top covers 2/6
    assert(out(2) == ((3L, 0, 0, 0, 0)))
    assert(out(3) == ((4L, 0, 0, 0, 1000)))       // 1 bigram covers both tokens
    // 8 tokens (go x6, stop x2): dup=(8-2)/8=750; 7 bigrams, 3 distinct ->
    // 571; all four 5-grams distinct -> 0; "go go" count 4 -> 8/8 tokens
    assert(out(4) == ((5L, 750, 571, 0, 1000)))
  }

  test("text functions: tokens, fingerprint, language id") {
    val df = Seq(
      ("the cat sat on the mat", 1L),
      ("el gato que se sienta en la alfombra", 2L),
      ("   ", 3L),
      ("xyzzy plugh", 4L)
    ).toDF("text", "id")
    val out = df.select(col("id"),
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.languageId(col("text")).as("lang"),
      TextFunctions.fingerprint(col("text")).as("fp")).orderBy("id").collect()
    assert(out(0).getAs[Int]("n") == 6 && out(0).getAs[String]("lang") == "en")
    assert(out(1).getAs[String]("lang") == "es")
    assert(out(2).getAs[Int]("n") == 0)
    assert(out(3).getAs[String]("lang") == "und")
    // fingerprint ignores case/whitespace differences
    val fps = Seq(("The  Cat sat on the mat", 1L)).toDF("text", "id")
      .select(TextFunctions.fingerprint(col("text"))).head.getString(0)
    assert(fps == out(0).getAs[String]("fp"))
  }

  test("shingles are distinct word n-grams") {
    val df = Seq("a b c a b c").toDF("text")
    val sh = df.select(TextFunctions.shingles(col("text"), 3)).head
      .getAs[scala.collection.Seq[String]](0)
    assert(sh.toSet == Set("a b c", "b c a", "c a b"))
    val short = Seq("a b").toDF("text")
      .select(TextFunctions.shingles(col("text"), 3)).head.getAs[scala.collection.Seq[String]](0)
    assert(short.isEmpty)
  }

  test("minhash LSH finds exactly the true near-duplicate pairs (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf)
    val lsh = MinHashDedup.duplicatePairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact all-pairs ground truth via shingle sets
    val sh = MinHashDedup.withShingles(docs, "doc_id", "text", 3)
    val exact = sh.alias("a").join(sh.alias("b"), col("a.id") < col("b.id"))
      .withColumn("j", MinHashDedup.jaccard(col("a.shingles"), col("b.shingles")))
      .filter(col("j") >= 0.8)
      .select(col("a.id"), col("b.id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(lsh == exact)
  }

  test("ngram-jaccard prefix filter is exact and complete vs brute force (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf)
    val pf = NgramJaccard.duplicatePairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    // brute-force ground truth on the same bigram sets, same rational test
    val g = MinHashDedup.withShingles(docs, "doc_id", "text", 2)
      .filter(size(col("shingles")) > 0)
    val exact = g.alias("a").join(g.alias("b"), col("a.id") < col("b.id"))
      .withColumn("inter", size(array_intersect(col("a.shingles"), col("b.shingles"))))
      .withColumn("uni", size(col("a.shingles")) + size(col("b.shingles")) - col("inter"))
      .filter(col("inter") * 5 >= col("uni") * 3)
      .select(col("a.id"), col("b.id"), col("inter"), col("uni"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(exact.nonEmpty, "test data should contain planted near-dups")
    assert(pf == exact)
  }

  test("winnowing guarantees a shared fingerprint for shared substrings >= k+w-1") {
    val k = 8; val w = 4
    val rnd = new scala.util.Random(11)
    def rand(n: Int) = (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val shared = rand(k + w - 1) // minimal guaranteed-shared substring
    val docs = Seq(
      (1L, rand(40) + " " + shared + " " + rand(40)),
      (2L, rand(60) + " " + shared),
      (3L, rand(80))).toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        explode(TextFunctions.winnowUdf(k, w)(TextFunctions.normalize(col("text")))).as("fp"))
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty, "docs sharing a k+w-1 substring must share a fingerprint")
    // short text yields nothing; empty result is not an error
    val short = Seq((9L, "tiny")).toDF("doc_id", "text")
      .select(explode(TextFunctions.winnowUdf(k, w)(TextFunctions.normalize(col("text")))))
    assert(short.count() == 0)
  }

  test("ngram-jaccard is exact and complete on randomized templated corpora") {
    // fuzz the completeness claim: random template corpora (the known
    // worst case for prefix filtering), several thresholds, always
    // compared against the brute-force ground truth
    val rnd = new scala.util.Random(7)
    val words = Array("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "mu", "nu", "xi", "pi", "rho")
    def doc(template: Array[String]): String = {
      val t = template.clone()
      // perturb 0-30% of tokens
      val edits = rnd.nextInt(t.length * 3 / 10 + 1)
      (0 until edits).foreach { _ => t(rnd.nextInt(t.length)) = words(rnd.nextInt(words.length)) }
      t.mkString(" ")
    }
    for ((tn, td) <- Seq((1, 2), (3, 5), (3, 4))) {
      val templates = Array.fill(4)(Array.fill(30)(words(rnd.nextInt(words.length))))
      val texts = (0 until 60).map(i => (i.toLong, doc(templates(i % 4))))
      val df = texts.toDF("doc_id", "text")
      val cfg = NgramJaccard.Config(n = 2, thresholdNum = tn, thresholdDen = td)
      val got = NgramJaccard.duplicatePairs(df, "doc_id", "text", cfg)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      val g = MinHashDedup.withShingles(df, "doc_id", "text", 2)
        .filter(size(col("shingles")) > 0)
      val exact = g.alias("a").join(g.alias("b"), col("a.id") < col("b.id"))
        .withColumn("inter", size(array_intersect(col("a.shingles"), col("b.shingles"))))
        .withColumn("uni", size(col("a.shingles")) + size(col("b.shingles")) - col("inter"))
        .filter(col("inter") * td >= col("uni") * tn)
        .select(col("a.id"), col("b.id"), col("inter"), col("uni"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      assert(got == exact, s"mismatch at threshold $tn/$td")
    }
  }

  test("ngram-jaccard handles degenerate corpora") {
    // all-identical docs: one posting list holding every doc — the skew
    // ceiling — must still emit every pair at Jaccard 1
    val same = (0L until 40L).map((_, "the quick brown fox jumps over the lazy dog"))
    val out = NgramJaccard.duplicatePairs(same.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(out.length == 40 * 39 / 2)
    assert(out.forall(r => r.getInt(2) == r.getInt(3)))
    // empty / sub-n-gram docs are excluded, not errors
    val tiny = Seq((0L, ""), (1L, "one"), (2L, "a b c"), (3L, "a b c")).toDF("doc_id", "text")
    val pairs = NgramJaccard.duplicatePairs(tiny, "doc_id", "text").collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((2L, 3L)))
  }

  test("ngram-jaccard prefix index is a small fraction of the gram index") {
    // rare-first prefixes must index strictly fewer gram postings than the
    // full inverted index would (the scale argument for prefix filtering)
    val docs = graft.Tables.documents(spark, sf)
    val g = MinHashDedup.withShingles(docs, "doc_id", "text", 2)
      .filter(size(col("shingles")) > 0)
    val fullPostings = g.select(explode(col("shingles"))).count()
    val t = NgramJaccard.Config()
    // prefix length per doc: sz - ceil(3/5*sz) + 1 ≈ 2/5 of the grams
    val prefixPostings = g
      .select((size(col("shingles")) -
        ((size(col("shingles")) * t.thresholdNum + t.thresholdDen - 1)
          .divide(t.thresholdDen)).cast("int") + 1).as("p"))
      .agg(sum(col("p"))).head.getLong(0)
    assert(prefixPostings < fullPostings / 2)
  }

  test("simhash-banded candidates + exact verify find exactly the true near-dups") {
    val docs = graft.Tables.documents(spark, sf)
    val sim = MinHashDedup.simhashPairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val mh = MinHashDedup.duplicatePairs(docs, "doc_id", "text")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // both pipelines exact-verify at jaccard ≥ 0.8, so any difference is a
    // candidate-generation miss (planted pairs sit at simhash hamming ≤ 8;
    // the 11-band / maxHamming=10 net must not lose one)
    assert(sim.nonEmpty)
    assert(sim == mh, s"simhash banding missed ${(mh -- sim).mkString(",")}; " +
      s"spurious ${(sim -- mh).mkString(",")}")
  }

  test("lshBucketPairs: exact-verified subset of brute pairs with usable recall") {
    val emb = graft.Tables.embeddings(spark, sf)
    val brute = EmbeddingOps.brutePairs(emb, "vec_id", "embedding", 0.45)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bucketed = EmbeddingOps.lshBucketPairs(emb, "vec_id", "embedding", 64,
        threshold = 0.45, probeHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact verification means NO false positives, ever
    assert(bucketed.subsetOf(brute), s"false positives: ${bucketed -- brute}")
    // multi-probe at hamming 2 catches signature distances <= 4; recall on
    // this corpus's ~60-degree "near" pairs is partial by design
    assert(brute.isEmpty || bucketed.size.toDouble / brute.size >= 0.4,
      s"recall ${bucketed.size}/${brute.size}")
  }

  test("LSH and IVF radius search match the exhaustive scan") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 169)
      .head.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq
    val exact = emb
      .select(col("vec_id"), EmbeddingOps.cosine(
        EmbeddingOps.toDouble(col("embedding")),
        array(q.map(lit): _*)).as("cosine"))
      .filter(col("cosine") >= 0.45)
      .collect().map(_.getLong(0)).toSet
    val lsh = EmbeddingOps.lshRadius(emb, "vec_id", "embedding", 64, q, 0.45)
      .collect().map(_.getLong(0)).toSet
    assert(lsh == exact, s"lshRadius=$lsh exact=$exact")
    val index = EmbeddingOps.ivfIndex(emb, "vec_id", "embedding", numCentroids = 16)
    val ivf = EmbeddingOps.ivfRadius(index, q, 0.45, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(ivf == exact, s"ivfRadius=$ivf exact=$exact")
  }

  test("brute topk is exact and LSH ann achieves high recall on its bucket") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 3)
      .head.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq
    val brute = EmbeddingOps.bruteTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(brute.head == 3L) // self is the nearest
    val ann = EmbeddingOps.annTopK(emb, "vec_id", "embedding", 64, q, 10, planes = 4)
      .collect().map(_.getLong(0)).toSeq
    // 4 planes → 16 buckets over 500 vecs; the query's own vector must be
    // found, and results must be a subset of the full ranking's top region
    assert(ann.contains(3L))
    assert(ann.nonEmpty)
  }

  test("IVF ann: nprobe cells achieve high recall vs brute force") {
    val emb = graft.Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 7)
      .head.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toSeq
    val brute = EmbeddingOps.bruteTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val index = EmbeddingOps.ivfIndex(emb, "vec_id", "embedding", numCentroids = 16)
    // probing ALL cells must recover the exact answer
    val full = EmbeddingOps.ivfTopK(index, q, 10, nprobe = 16)
      .collect().map(_.getLong(0)).toSet
    assert(full == brute)
    // probing a quarter of the cells keeps most of it
    val approx = EmbeddingOps.ivfTopK(index, q, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(approx.contains(7L))
    assert((approx & brute).size >= 5, s"recall too low: ${(approx & brute).size}/10")
  }

  test("subword count approximates tokenizer granularity") {
    val df = Seq("hello, world! a-b c_d 42x").toDF("text")
    val n = df.select(TextFunctions.subwordCount(col("text"))).head.getInt(0)
    // runs of letters/digits + punctuation marks, > whitespace token count
    val ws = df.select(TextFunctions.tokenCount(col("text"))).head.getInt(0)
    assert(n > ws && n >= 10)
  }

  test("embedding pair dedup: exact pairs above threshold") {
    val emb = graft.Tables.embeddings(spark, sf)
    val pairs = EmbeddingOps.brutePairs(emb, "vec_id", "embedding", 0.99).collect()
    assert(pairs.forall(r => r.getDouble(2) >= 0.99))
  }

  test("multimodal: stub decode plumbing end-to-end") {
    val rows = Seq(
      (1L, "image/png", "fakeimagebytes".getBytes, Map("src" -> "a")),
      (2L, "video/mp4", "fakevideobytes!!".getBytes, Map("src" -> "b")),
      (3L, "audio/wav", "fakeaudio".getBytes, Map.empty[String, String]),
      (4L, "application/pdf", "notmedia".getBytes, Map.empty[String, String]),
      (5L, "image/png", Array.empty[Byte], Map.empty[String, String]))
    val df = rows.toDF("media_id", "mime", "content", "meta")
    val out = Multimodal.extractFeatures(df).orderBy("media_id").collect()
    assert(out(0).getAs[Boolean]("decode_ok") && out(0).getAs[Int]("n_frames") == 1)
    assert(out(1).getAs[Boolean]("decode_ok") && out(1).getAs[Int]("n_frames") >= 1)
    assert(out(2).getAs[Boolean]("decode_ok") && out(2).getAs[Int]("width") == 0)
    assert(!out(3).getAs[Boolean]("decode_ok")) // unsupported mime → flagged, not failed
    assert(!out(4).getAs[Boolean]("decode_ok")) // empty content → flagged
    // determinism: same bytes → same features (deep-compare: byte arrays
    // use reference equality in Row.toSeq)
    def deep(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.map {
        case a: Array[Byte] => a.toSeq
        case x => x
      }).toSeq
    val again = Multimodal.extractFeatures(df).orderBy("media_id").collect()
    assert(deep(out) == deep(again))
  }

  test("multimodal: real PNG/JPEG decode via javax.imageio") {
    val png = Multimodal.syntheticPng(12, 9, 77)
    val df = Seq((1L, "image/png", png, Map.empty[String, String]))
      .toDF("media_id", "mime", "content", "meta")
    val r = Multimodal.extractFeatures(df).head()
    assert(r.getAs[Boolean]("decode_ok"))
    assert(r.getAs[Int]("width") == 12 && r.getAs[Int]("height") == 9)
    assert(r.getAs[Int]("channels") == 3)
    assert(r.getAs[Double]("mean_sample") == 77.0,
      "constant-gray fill must decode to an exact mean sample")
    // JPEG round-trip decodes too (lossy codec — only dimensions asserted)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos), "JRE must ship a JPEG writer")
    val j = Multimodal.extractFeatures(
      Seq((2L, "image/jpeg", bos.toByteArray, Map.empty[String, String]))
        .toDF("media_id", "mime", "content", "meta")).head()
    assert(j.getAs[Boolean]("decode_ok"))
    assert(j.getAs[Int]("width") == 12 && j.getAs[Int]("height") == 9)
    // undecodable image bytes fall back to the deterministic stub, not a failure
    val s = Multimodal.extractFeatures(
      Seq((3L, "image/png", "notapng".getBytes, Map.empty[String, String]))
        .toDF("media_id", "mime", "content", "meta")).head()
    assert(s.getAs[Boolean]("decode_ok") && s.getAs[Double]("mean_sample") == -1.0)
  }

  test("multimodal: bilinear resize fits the box, keeps constant fill, skips non-images") {
    val rows = Seq(
      (1L, "image/png", Multimodal.syntheticPng(20, 10, 42)),
      (2L, "image/png", Multimodal.syntheticPng(4, 3, 7)), // already fits
      (3L, "video/mp4", "notanimage".getBytes))
    val df = rows.toDF("media_id", "mime", "content")
    val out = Multimodal.extractFeatures(Multimodal.resizeImages(df, 10, 6))
      .orderBy("media_id").collect()
    // 20x10 → scale min(10/20, 6/10) = 0.5 → 10x5, constant gray intact
    assert(out(0).getAs[Int]("width") == 10 && out(0).getAs[Int]("height") == 5)
    assert(out(0).getAs[Double]("mean_sample") == 42.0)
    // 4x3 fits already: bytes untouched
    assert(out(1).getAs[Int]("width") == 4 && out(1).getAs[Int]("height") == 3)
    // non-image passes through to the stub decoder unchanged
    assert(new String(out(2).getAs[Array[Byte]]("content")) == "notanimage")
  }

  test("multimodal: frame sampling explodes exact indices with a stubbed frame seam") {
    val df = Seq((1L, 61), (2L, 1), (3L, 90)).toDF("media_id", "n_frames")
    val out = Multimodal.sampleFrames(df, 30, "n_frames")
      .select("media_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(out == Seq((1L, 0L), (1L, 30L), (1L, 60L), (2L, 0L), (3L, 0L), (3L, 30L), (3L, 60L)))
  }

  test("multimodal: binary parquet round-trip + metadata-only size repartition") {
    val rows = (1L to 50L).map(i =>
      (i, "image/png", Array.fill((i * 37 % 256).toInt + 1)(i.toByte), Map("i" -> i.toString)))
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString + "/media"
    rows.toDF("media_id", "mime", "content", "meta").write.parquet(dir)
    val back = spark.read.parquet(dir)
    // file-backed: sizing must come from file status, not a content scan —
    // same public behavior, so assert the partitioning outcome
    val sized = Multimodal.repartitionBySize(back, targetBytes = 2048)
    assert(sized.rdd.getNumPartitions >= 2)
    val feats = Multimodal.extractFeatures(sized)
    assert(feats.filter(col("decode_ok")).count() == 50)
    // binary content survives the parquet round-trip byte-for-byte
    val got = back.orderBy("media_id").collect()
      .map(r => r.getAs[Array[Byte]]("content").toSeq)
    assert(got.toSeq == rows.map(_._3.toSeq))
  }

  test("segment dedup: first corpus-wide occurrence wins, docs rebuilt in order") {
    val docs = Seq(
      (1L, "a b c d"),          // segs (w=2): "a b", "c d"
      (2L, "c d e f"),          // "c d" already seen in doc 1 → dropped
      (3L, "a b c d"),          // both segs seen → survives empty
      (4L, "   ")               // whitespace-only → no segments, no row
    ).toDF("doc_id", "text")
    val out = SegmentDedup.byTokenWindows(docs, "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d")))
    assert(out(2L) == ((2L, 1L, "e f")))
    assert(out(3L) == ((2L, 0L, "")))
    assert(!out.contains(4L))
  }

  test("segment dedup: kept segments are exactly the distinct input segments") {
    val docs = graft.Tables.documents(spark, sf)
    val segs = SegmentDedup.tokenWindowSegments(docs, "doc_id", "text", 20)
    val distinctIn = segs.select("seg").distinct().count()
    val keptOut = SegmentDedup.byTokenWindows(docs, "doc_id", "text", 20)
      .agg(sum("n_kept")).head().getLong(0)
    assert(keptOut == distinctIn,
      "every distinct segment must survive exactly once corpus-wide")
  }

  test("segment dedup by delimiter: repeated lines dropped, empties ignored") {
    val docs = Seq(
      (1L, "keep me\nshared line\n\nunique one"),
      (2L, "shared line\nanother")
    ).toDF("doc_id", "text")
    val out = SegmentDedup.byDelimiter(docs, "doc_id", "text", "\n")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "keep me shared line unique one")
    assert(out(2L) == "another")
  }

  test("packing: shard streams are contiguous, chunk ranges exact, repartition-stable") {
    val docs = graft.Tables.documents(spark, sf)
    val plan = Packing.packPlan(docs, "doc_id",
      TextFunctions.tokenCount(col("text")), seqLen = 128, nShards = 4)
    val rows = plan.collect().map(r => (r.getLong(1), // shard
      r.getAs[Long]("tok_start"), r.getAs[Long]("n_tokens"),
      r.getAs[Long]("seq_first"), r.getAs[Long]("seq_last")))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._2)
      // each doc starts exactly where the previous one ended: the shard is
      // one gap-free token stream
      assert(sorted.head._2 == 0L)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 == a._2 + a._3)
        case _ => ()
      }
    }
    rows.foreach { case (_, start, n, first, last) =>
      assert(first == start / 128 && last == (start + n - 1) / 128)
    }
    // determinism: the layout is a pure function of ids, not partitioning
    val again = Packing.packPlan(docs.repartition(7), "doc_id",
      TextFunctions.tokenCount(col("text")), seqLen = 128, nShards = 4)
      .collect().map(r => (r.getLong(1), r.getAs[Long]("tok_start"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("seq_first"),
        r.getAs[Long]("seq_last")))
    assert(rows.sortBy(r => (r._1, r._2)).toSeq == again.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("packing stats: tail padding accounts for every token") {
    val docs = graft.Tables.documents(spark, sf)
    val plan = Packing.packPlan(docs, "doc_id",
      TextFunctions.tokenCount(col("text")), seqLen = 128, nShards = 4)
    Packing.packStats(plan, 128).collect().foreach { r =>
      val (total, nSeq, pad) = (r.getAs[Long]("total_tokens"),
        r.getAs[Long]("n_sequences"), r.getAs[Long]("tail_pad_tokens"))
      assert(pad >= 0 && pad < 128, s"tail pad must be within one sequence, got $pad")
      assert(nSeq * 128 == total + pad)
    }
  }
  test("WavDecoder parses real RIFF/PCM bytes and rejects malformed input") {
    // round trip: header fields and frame count come from the bytes
    val wav = Multimodal.syntheticWav(nSamples = 2000, step = 1)
    val d = Multimodal.WavDecoder.decode("audio/wav", wav).get
    assert((d.width, d.height, d.channels, d.nFrames) == ((16000, 16, 1, 2000)))
    // full-period sawtooth step=1: mean |s| over -1000..999 is exactly 500.0
    assert(d.meanSample == 500.0)
    // non-audio mime, truncated header, corrupted magic -> None
    assert(Multimodal.WavDecoder.decode("image/png", wav).isEmpty)
    assert(Multimodal.WavDecoder.decode("audio/wav", wav.take(20)).isEmpty)
    val bad = wav.clone(); bad(9) = 'X'.toByte
    assert(Multimodal.WavDecoder.decode("audio/wav", bad).isEmpty)
    // non-PCM format code rejected (byte 20 = audio format LE)
    val nonPcm = wav.clone(); nonPcm(20) = 3
    assert(Multimodal.WavDecoder.decode("audio/wav", nonPcm).isEmpty)
    // the default chain now resolves audio through the REAL decoder
    assert(Multimodal.DefaultDecoder.decode("audio/wav", wav).get.nFrames == 2000)
  }

  test("containment prefix filter is exact and complete vs brute force (sf0.001)") {
    val docs = graft.Tables.documents(spark, sf)
    val got = NgramJaccard.containmentPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    // brute-force directed containment on the same bigram sets
    val g = MinHashDedup.withShingles(docs, "doc_id", "text", 2)
      .filter(size(col("shingles")) > 0)
    val exact = g.alias("a").join(g.alias("b"), col("a.id") =!= col("b.id"))
      .withColumn("inter", size(array_intersect(col("a.shingles"), col("b.shingles"))))
      .withColumn("sz_sub", size(col("a.shingles")))
      .filter(col("inter") * 5 >= col("sz_sub") * 4)
      .select(col("a.id"), col("b.id"), col("inter"), col("sz_sub"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(exact.nonEmpty, "test data should contain containment pairs")
    assert(got == exact)
    // directionality: a strict subset document must point AT its superset
    val sub = Seq((1L, "a b c d e f"), (2L, "a b c d e f g h i j k l m n o p q r s t u v w x y z"))
      .toDF("doc_id", "text")
    val dir = NgramJaccard.containmentPairs(sub, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dir == Set((1L, 2L)))
    // hot-gram fallback: with the df cap forced to 0 EVERY prefix gram
    // routes through the materialized-pair path instead of the sweep —
    // output must be identical (the exact re-verify is shared), proving
    // the skew guard trades no recall
    val hot = NgramJaccard.containmentPairs(docs, "doc_id", "text",
        hotGramDf = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(hot == exact)
    // and a mid cap exercises BOTH paths at once
    val mixed = NgramJaccard.containmentPairs(docs, "doc_id", "text",
        hotGramDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
    assert(mixed == exact)
  }

  test("knn label transfer: planted clusters classify exactly; ties break on (dot desc, id), (votes desc, label)") {
    // two orthogonal clusters -> every vector's neighbors are its own
    // cluster, so predicted == label for all rows
    val dim = 8
    def vec(hot: Int, scale: Float): Array[Float] = {
      val v = new Array[Float](dim); v(hot) = scale; v
    }
    val rows = (0 until 20).map { i =>
      (i.toLong, vec(if (i < 10) 0 else 4, 1f + (i % 5) * 0.1f), i / 10)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = EmbeddingOps.knnClassify(df, "vec_id", "embedding", "label", 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    assert(out.length == 20)
    assert(out.forall { case (_, l, p, v, c) => p == l && v == 3L && c })
    // vote tie: k=2 with one neighbor from each label -> smaller label wins
    val tri = Seq(
      (0L, Array(1f, 0f), 5), // query
      (1L, Array(1f, 0f), 9), // dot 1e12 with query
      (2L, Array(1f, 0f), 4)  // dot 1e12 with query -> tie, label 4 < 9
    ).toDF("vec_id", "embedding", "label")
    val t = EmbeddingOps.knnClassify(tri, "vec_id", "embedding", "label", 2)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toMap
    assert(t(0L) == 4) // (votes desc, label asc): 1-1 tie -> label 4
  }

  test("dHash56: brightness invariance, PNG round trip, band recall") {
    // same seed, shifted brightness -> identical hash (differences cancel)
    val h0 = Multimodal.dHash56(Multimodal.gradientPng(42L, 0))
    val h3 = Multimodal.dHash56(Multimodal.gradientPng(42L, 3))
    assert(h0 == h3)
    assert(h0 >= 0L, "56-bit hash must stay in positive int64")
    // different seeds -> far hashes (slope mixing, not phase-only)
    val pairsFar = (0L until 40L).map(s => Multimodal.dHash56(Multimodal.gradientPng(s, 0)))
    val minHam = pairsFar.combinations(2)
      .map { case Seq(a, b) => java.lang.Long.bitCount(a ^ b) }.min
    assert(minHam > 3, s"cross-seed hamming $minHam should exceed the dup radius")
    // banding finds exactly the planted (seed-equal) pairs
    val df = ((0L until 40L).map(s => (s, s, 0)) ++ Seq((1000L, 7L, 3), (1001L, 13L, 2)))
      .toDF("id", "seed", "off")
      .withColumn("content", udf { (s: Long, o: Int) => Multimodal.gradientPng(s, o) }
        .apply(col("seed"), col("off")))
    val got = Multimodal.dhashPairs(df, "id", "content")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((7L, 1000L, 0L), (13L, 1001L, 0L)))
  }
}
