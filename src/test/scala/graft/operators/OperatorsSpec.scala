package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  val docs = Seq(
    (1L, "the quick brown fox", "s1"),
    (2L, "the quick brown fox", "s1"), // exact dup of 1
    (3L, "fox brown quick the", "s1"), // canonical dup of 1 (reordered)
    (4L, "completely different text here", "s1"),
    (5L, "the quick brown fox", "s2")) // dup but other shard

  def docsDf = docs.toDF("id", "text", "src")

  test("exact vs canonical dedup keys") {
    val out = docsDf.select($"id",
      Dedup.exactKey($"text").as("ek"), Dedup.canonicalKey($"text").as("ck"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(out(1L)._1 == out(2L)._1) // exact dups share exact key
    assert(out(1L)._1 != out(3L)._1) // reorder breaks exact key
    assert(out(1L)._2 == out(3L)._2) // …but not canonical key
    assert(out(1L)._2 != out(4L)._2)
  }

  test("dropDuplicatesByKey keeps smallest id") {
    val kept = Dedup.dropDuplicatesByKey(docsDf, "id", Dedup.canonicalKey($"text"))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 4L)) // 2,3,5 all share 1's canonical key
  }

  test("lshNearDupPairs finds canonical dups, respects shards") {
    val pairs = Dedup.lshNearDupPairs(docsDf, "id", "text",
        nHashes = 8, rowsPerBand = 4, threshold = 0.9, shardCol = Some("src"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(pairs.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L))) // 5 is in shard s2
    val noShard = Dedup.lshNearDupPairs(docsDf, "id", "text",
        nHashes = 8, rowsPerBand = 4, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(noShard.toSeq.contains((1L, 5L)))
  }

  test("simhash: near-dups collide, different text differs") {
    val out = docsDf.select($"id", Dedup.simhash($"text", 16).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == out(3L)) // same token set → same simhash
    assert(out(1L) != out(4L))
  }

  test("charNgrams shingles") {
    val grams = spark.range(1).select(Dedup.charNgrams(lit("abcd"), 2).as("g"))
      .collect().head.getAs[scala.collection.Seq[String]]("g")
    assert(grams.sorted == Seq("ab", "bc", "cd"))
    // below n chars: EMPTY (the wordNgrams contract), never a
    // shorter-than-n substring masquerading as a shingle
    val short = spark.range(1)
      .select(Dedup.charNgrams(lit("ab"), 3).as("g"),
        Dedup.charNgrams(lit(""), 3).as("e"))
      .collect().head
    assert(short.getAs[scala.collection.Seq[String]]("g").isEmpty)
    assert(short.getAs[scala.collection.Seq[String]]("e").isEmpty)
  }

  val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (3L, Seq(-1.0f, 0.0f, 0.0f, 0.0f)),
    (4L, Seq(0.7f, 0.7f, 0.0f, 0.0f)))

  def vecsDf = vecs.toDF("id", "v")

  test("similarity topK exact ranking") {
    val top = Similarity.topK(vecsDf, "v", Seq(1.0, 0.0, 0.0, 0.0), 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 1L, 4L))
  }

  test("topK: zero-norm vectors (NaN cosine) never displace real neighbours") {
    import spark.implicits._
    // Spark orders NaN ABOVE every real value — an unfiltered zero
    // vector would rank FIRST
    val withZero = vecsDf.unionByName(
      Seq((99L, Seq(0.0, 0.0, 0.0, 0.0))).toDF("id", "v"))
    val top = Similarity.topK(withZero, "v", Seq(1.0, 0.0, 0.0, 0.0), 3)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(top == Seq(0L, 1L, 4L) && !top.contains(99L))
  }

  test("annSearch multiprobe recovers exact neighbors on this set") {
    val ann = Similarity.annSearch(vecsDf, "v", dim = 4,
      query = Seq(1.0, 0.0, 0.0, 0.0), k = 2, nPlanes = 4)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(ann.headOption.contains(0L))
    assert(ann.contains(1L))
  }

  test("ivf assigns to nearest centroid and probes correct lists") {
    val centroids = Seq(Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0))
    val assigned = Similarity.ivfAssign(vecsDf, "v", centroids)
      .select("id", "__ivf_list").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned(0L) == 0 && assigned(1L) == 0 && assigned(2L) == 1 && assigned(3L) == 1)
    val found = Similarity.ivfSearch(vecsDf, "v", centroids,
      query = Seq(0.95, 0.05, 0.0, 0.0), k = 2, nProbe = 1)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(found == Seq(0L, 1L))
  }

  test("text analysis: quality, language id, token estimate, fingerprints") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),
      (2L, "le chat et le chien de la maison est"),
      (3L, ""),
      (4L, "zzz qqq www")).toDF("id", "text")
    val out = TextAnalysis.analyze(df, "text").collect()
      .map(r => r.getAs[Long]("id") -> r).toMap
    assert(out(1L).getAs[String]("lang_pred") == "en")
    assert(out(2L).getAs[String]("lang_pred") == "fr")
    assert(out(3L).getAs[String]("lang_pred") == "und")
    assert(out(4L).getAs[String]("lang_pred") == "und") // no markers
    val q1 = out(1L).getAs[org.apache.spark.sql.Row]("quality")
    assert(q1.getAs[Int]("n_tokens") == 8)
    assert(q1.getAs[Double]("stopword_ratio") > 0.4)
    // rolling fingerprint is order-sensitive; canonical is not
    val fp = TextAnalysis.analyze(
      Seq((1L, "a b c"), (2L, "c b a")).toDF("id", "text"), "text")
      .select("id", "fingerprint", "rolling_fp").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(fp(1L)._1 == fp(2L)._1)
    assert(fp(1L)._2 != fp(2L)._2)
  }

  test("sorted_intersect_size matches array_intersect on random sorted sets") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{array_intersect, size => asize, col}
    val rnd = new scala.util.Random(7)
    def randSet() = (0 until rnd.nextInt(20)).map(_ => s"w${rnd.nextInt(30)}")
      .distinct.sorted
    val df = (0 until 500).map(_ => (randSet(), randSet())).toDF("a", "b")
    val both = df.select(
      graft.functions.ArrayExpressions.sorted_intersect_size(col("a"), col("b")).as("fast"),
      asize(array_intersect(col("a"), col("b"))).as("ref")).collect()
    assert(both.forall(r => r.getInt(0) == r.getInt(1)))
    // empty and null inputs
    val edge = Seq((Seq("x"), Seq.empty[String])).toDF("a", "b")
      .select(graft.functions.ArrayExpressions.sorted_intersect_size(col("a"), col("b")))
      .collect().head.getInt(0)
    assert(edge == 0)
  }

  test("wordNgrams + decontaminate: benchmark overlap flags the right docs") {
    import spark.implicits._
    val grams = Seq(("a b c d", 1)).toDF("t", "i")
      .select(Dedup.wordNgrams(col("t"), 3)).collect().head.getSeq[String](0)
    assert(grams == Seq("a b c", "b c d"))
    // shorter than n → empty, not sequence(1,0) garbage
    val short = Seq(("a b", 1)).toDF("t", "i")
      .select(Dedup.wordNgrams(col("t"), 3)).collect().head.getSeq[String](0)
    assert(short.isEmpty)

    val corpus = Seq(
      (1L, "the quick brown fox jumps"), // shares "the quick brown", "quick brown fox"
      (2L, "totally unrelated words here"),
      (3L, "quick brown fox runs")).toDF("id", "text")
    val bench = Seq((9L, "the quick brown fox")).toDF("id", "text")
    val out = Dedup.decontaminate(corpus, bench, "id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bench grams: {"the quick brown", "quick brown fox"} → doc 1 shares
    // both, doc 3 shares one, doc 2 none
    assert(out == Map(1L -> 2L, 3L -> 1L))
  }

  test("connectedComponents: chains, cliques, disjoint clusters, min representative") {
    import spark.implicits._
    // chain 1-2-3-4 (diameter 3), clique 10-11-12, pair 20-21
    val edges = Seq((2L, 1L), (2L, 3L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L), (21L, 20L)).toDF("a", "b")
    val cc = Dedup.connectedComponents(edges, "a", "b").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
    // "keep one per cluster" is an equality filter on the result
    assert(cc.count { case (id, comp) => id == comp } == 3)
  }

  test("connectedComponents: distributed propagation agrees with driver union-find") {
    import spark.implicits._
    // a 40-node path (worst-case diameter), three cliques, random extras
    val rnd = new scala.util.Random(7)
    val path = (0 until 39).map(i => (i.toLong, i.toLong + 1))
    val cliques = Seq(100L, 200L, 300L).flatMap(b =>
      (0 until 4).flatMap(i => (i + 1 until 5).map(j => (b + i, b + j))))
    val extras = (0 until 30).map(_ => (400L + rnd.nextInt(20), 400L + rnd.nextInt(20)))
    val edges = (path ++ cliques ++ extras).toDF("a", "b")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val local = asMap(Dedup.connectedComponents(edges, "a", "b"))
    val dist = asMap(Dedup.connectedComponents(edges, "a", "b",
      localEdgeThreshold = 0)) // force the scale path
    assert(dist == local)
    assert(local(39L) == 0L) // min label crossed the whole 40-node path
  }

  test("connectedComponents: no RDD blocks leaked after unpersistAll (checkpoint hygiene)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val edges = ((0 until 39).map(i => (i.toLong, i.toLong + 1)) ++
      Seq((100L, 101L), (101L, 102L))).toDF("a", "b")
    // distributed path: per-pass localCheckpoints + the returned frame
    val cc = Dedup.connectedComponents(edges, "a", "b", localEdgeThreshold = 0)
    assert(cc.count() == 43)
    // driver union-find path: the symmetrized edge checkpoint
    Dedup.connectedComponents(edges, "a", "b").count()
    graft.operators.OperatorCaches.unpersistAll()
    // every intermediate pass was released as the next materialized; the
    // final labels are released by unpersistAll — nothing NEW persists
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked RDD ids: $leaked")
  }

  test("vec_dot/vec_dist2: match the HOF fold bit-for-bit; length mismatch throws") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    import graft.functions.ArrayExpressions.{vec_dot, vec_dist2}
    val rnd = new scala.util.Random(13)
    val df = (0 until 200).map { _ =>
      (Array.fill(16)(rnd.nextFloat()), Array.fill(16)(rnd.nextFloat()))
    }.toDF("a", "b")
    val rows = df.select(
      vec_dot(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)), 0d, (acc, x) -> acc + x)").as("hof"),
      vec_dist2(col("a"), col("b")).as("fastd"),
      expr("aggregate(zip_with(a, b, (x, y) -> (double(x) - double(y)) * (double(x) - double(y))), 0d, (acc, x) -> acc + x)").as("hofd"))
      .collect()
    assert(rows.forall(r => r.getDouble(0) == r.getDouble(1))) // bit-identical
    assert(rows.forall(r => r.getDouble(2) == r.getDouble(3)))
    // a dimension mismatch is a bug, not a score: fail loudly
    val bad = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(vec_dot(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("length mismatch")), msgs(e).mkString(" | "))
  }

  test("stratified sampling: deterministic, rate-accurate, drops unlisted strata") {
    import spark.implicits._
    val df = (0 until 4000).map(i => (i.toLong, s"s${i % 4}")).toDF("id", "stratum")
    val rates = Map("s0" -> 0.25, "s1" -> 1.0, "s2" -> 0.0)
    val out = Sampling.stratified(spark, df, "id", "stratum", rates)
    val byStratum = out.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum.getOrElse("s2", 0L) == 0) // rate 0
    assert(!byStratum.contains("s3")) // unlisted stratum dropped
    assert(byStratum("s1") == 1000) // rate 1 keeps everything
    val k = byStratum("s0").toDouble / 1000
    assert(k > 0.18 && k < 0.32, s"s0 rate $k") // md5 uniformity, 1000 draws
    // deterministic: same ids on a rerun
    val again = Sampling.stratified(spark, df, "id", "stratum", rates)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == out.select("id").collect().map(_.getLong(0)).sorted.toSeq)
    // threshold edges
    assert(Sampling.rateThreshold(1.0) == "g" && Sampling.rateThreshold(0.0) == "00000000")
    assert(Sampling.rateThreshold(0.5) == "80000000")
    // sub-1/65536 rates survive the 32-bit granularity (the 16-bit form
    // floored them to zero — a 1e-5 web-scale mixing rate sampled nothing)
    assert(Sampling.rateThreshold(1e-5) == f"${(1e-5 * 4294967296.0).toLong}%08x")
    assert(Sampling.rateThreshold(1e-5) != "00000000")
  }

  test("weighted reservoir sampling (A-ES): exactly k per stratum, weight-sensitive, deterministic") {
    import spark.implicits._
    // ids 0,1,2 get weight 1e5 (one per stratum) vs 1.0 for the rest:
    // u^(1/w) ≈ 1 for them, so each must appear in its stratum's sample
    val df = (0 until 600).map { i =>
      (i.toLong, s"s${i % 3}", if (i < 3) 1e5 else 1.0)
    }.toDF("id", "stratum", "w")
    val out = Sampling.weightedTopK(df, "id", "stratum", col("w"), 5)
    val rows = out.collect()
    val byStratum = rows.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    assert(byStratum == Map("s0" -> 5, "s1" -> 5, "s2" -> 5)) // exactly k each
    val ids = rows.map(_.getLong(0)).toSet
    assert(Set(0L, 1L, 2L).subsetOf(ids), s"heavy ids missing from $ids")
    // ranks are 1..k within each stratum
    assert(rows.groupBy(_.getString(1)).values
      .forall(_.map(_.getAs[Int]("sample_rank")).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
    // no RNG state: a rerun draws the identical sample
    val again = Sampling.weightedTopK(df, "id", "stratum", col("w"), 5)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again == rows.map(_.getLong(0)).sorted.toSeq)
  }

  test("kmeans converges on separated clusters; ivfSearch finds neighbors") {
    import spark.implicits._
    // 3 well-separated 4-d clusters around (0,0,0,0), (10,...), (20,...)
    val rnd = new scala.util.Random(11)
    val pts = (0 until 90).map { i =>
      val c = i % 3 * 10.0
      (i.toLong, Seq.fill(4)(c + rnd.nextDouble() * 0.5))
    }.toDF("id", "v")
    val cachedBefore = spark.sparkContext.getPersistentRDDs.size
    val cents = Similarity.kmeans(pts, "v", "id", k = 3, iterations = 5)
    // the projected vectors are persisted ONCE across the Lloyd
    // iterations (iterations × full embedding scans otherwise) and
    // registered for caller-side release
    assert(spark.sparkContext.getPersistentRDDs.size > cachedBefore)
    graft.operators.OperatorCaches.unpersistAll()
    assert(cents.size == 3)
    // each centroid lands near one cluster center, all three covered
    val centersFound = cents.map(c => math.round(c.head / 10).toInt).sorted
    assert(centersFound == Seq(0, 1, 2), cents.toString)
    assert(cents.forall(c => (c.head - math.round(c.head / 10) * 10).abs < 0.5))
    // trained centroids drive ivfSearch: query near cluster 1 returns
    // only cluster-1 members
    val near = Similarity.ivfSearch(pts, "v", cents,
      query = Seq(10.1, 10.1, 10.1, 10.1), k = 5, nProbe = 1)
      .select("id").collect().map(_.getLong(0))
    assert(near.length == 5 && near.forall(_ % 3 == 1))
  }

  test("product quantization: train/encode/search recovers true neighbors") {
    import spark.implicits._
    // 3 separated 8-d clusters; ids interleave clusters
    val rnd = new scala.util.Random(23)
    val pts = (0 until 120).map { i =>
      val c = i % 3 * 10.0
      (i.toLong, Seq.fill(8)(c + rnd.nextDouble() * 0.5))
    }.toDF("id", "v")
    val cb = Similarity.pqTrain(pts, "v", "id", dim = 8, m = 4, k = 6)
    assert(cb.books.size == 4 && cb.books.forall(_.size == 6))
    val encoded = Similarity.pqEncode(pts, "v", cb)
    // codes are m=4 small ints — the 8-double vector compresses 16×
    val code0 = encoded.filter(col("id") === 0).select("__pq_code")
      .collect().head.getAs[scala.collection.Seq[Int]](0)
    assert(code0.size == 4 && code0.forall(c => c >= 0 && c < 6))
    // same-cluster rows share codes; different clusters never do
    val codes = encoded.select(col("id"), col("__pq_code")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]](1)).toMap
    assert(codes(0L) != codes(1L) && codes(1L) != codes(2L))
    // ADC search: query near cluster 1 → all k hits are cluster-1 members,
    // scored WITHOUT touching the vector column
    val q = Seq.fill(8)(10.1)
    val hits = Similarity.pqSearch(encoded, q, cb, k = 10)
      .select("id").collect().map(_.getLong(0))
    assert(hits.length == 10 && hits.forall(_ % 3 == 1), hits.toSeq.toString)
  }

  test("IVF-PQ: residual encode + probed ADC search stays in the probed lists") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // 3 separated 8-d clusters; coarse centroids sit near each, so
    // residuals live in [-0.25, 0.75] and the literal books cover them
    val pts = (0 until 120).map { i =>
      val c = i % 3 * 10.0
      (i.toLong, Seq.fill(8)(c + rnd.nextDouble() * 0.5))
    }.toDF("id", "v")
    val centroids = Seq(Seq.fill(8)(0.25), Seq.fill(8)(10.25), Seq.fill(8)(20.25))
    val books = Seq.fill(4)(Seq(Seq(-0.2, -0.2), Seq(0.0, 0.0),
      Seq(0.2, 0.2), Seq(0.1, -0.1)))
    val cb = Similarity.PqCodebooks(8, 4, 4, books)
    val enc = Similarity.ivfPqEncode(pts, "v", centroids, cb)
    // coarse assignment recovers the generating cluster
    val lists = enc.select(col("id"), col("__ivf_list")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert((0 until 120).forall(i => lists(i.toLong) == i % 3))
    // codes are m=4 ints in range, over RESIDUALS (so they vary within a
    // cluster but are not cluster-constant offsets)
    val codes = enc.select(col("id"), col("__pq_code")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Int]](1)).toMap
    assert(codes.values.forall(c => c.size == 4 && c.forall(x => x >= 0 && x < 4)))
    assert(codes.values.toSet.size > 3, "residual codes should vary")
    // query near cluster 1, nProbe=1: every hit comes from list 1
    val q = Seq.fill(8)(10.1)
    val hits1 = Similarity.ivfPqSearch(enc, centroids, cb, q, k = 10,
      nProbe = 1, tieBreak = Seq(col("id"))).select("id")
      .collect().map(_.getLong(0))
    assert(hits1.length == 10 && hits1.forall(_ % 3 == 1), hits1.toSeq.toString)
    // nProbe=2 widens to lists {1, 0 or 2} but cluster-1 residual scores
    // (≈0.01) still beat the other probed list's (≈97) — same top set
    val hits2 = Similarity.ivfPqSearch(enc, centroids, cb, q, k = 10,
      nProbe = 2, tieBreak = Seq(col("id"))).select("id")
      .collect().map(_.getLong(0))
    assert(hits2.length == 10 && hits2.forall(_ % 3 == 1), hits2.toSeq.toString)
  }

  test("duplicateSpans: cross-doc and within-doc repeats, overlap union") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c d e f g"),        // shares "a b c d e","b c d e f" with doc 2
      (2L, "x a b c d e f y"),
      (3L, "p q r s t p q r s t"),  // window 0 == window 5 (self-repeat)
      (4L, "unique words only here nothing repeats at all")
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // doc 1: dup windows at starts 0,1 → union covers tokens [0,6) of 7
    assert(out(1L) == ((2L, 6L, 7L, math.rint(6.0 / 7 * 1e6) / 1e6)), out(1L).toString)
    // doc 2: dup windows at starts 1,2 → 6 of 8 tokens covered
    assert(out(2L) == ((2L, 6L, 8L, 0.75)), out(2L).toString)
    // doc 3: self-repeat at starts 0 and 5 → all 10 tokens covered
    assert(out(3L) == ((2L, 10L, 10L, 1.0)), out(3L).toString)
    // doc 4: no repeated window anywhere → absent
    assert(!out.contains(4L))
  }

  test("tfidfCosine: identical docs score 1, disjoint docs score 0") {
    import spark.implicits._
    val corpus = Seq((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("doc_a", "doc_b")
    val out = TextAnalysis.tfidfCosine(corpus, pairs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) == 1.0, out.toString) // same tokens, same weights
    assert(out((1L, 3L)) == 0.0, out.toString) // no shared token
  }

  test("token count estimate adds subword tokens for long words") {
    val n = spark.range(1).select(
      TextAnalysis.tokenCountEstimate(lit("hi internationalization")).as("n"))
      .collect().head.getLong(0)
    // "hi" = 1, "internationalization" (20 chars) = ceil(20/4) = 5
    assert(n == 6L)
  }

  test("packSequences: greedy contiguous packing with overflow, per group") {
    val df = Seq(
      (1L, "g", "a b c"),   // bef 0 → seq 0 off 0
      (2L, "g", "d e"),     // bef 3 → seq 0 off 3
      (3L, "g", "f g h i"), // bef 5, cum 9 > 8 → overflow stays in seq 0
      (4L, "g", "j"),       // bef 9 → seq 1 off 1
      (5L, "h", "k l")      // fresh group restarts at seq 0 off 0
    ).toDF("doc_id", "grp", "text")
    val got = TextAnalysis.packSequences(df, "doc_id", "text", "grp", 8)
      .orderBy("doc_id")
      .select("doc_id", "grp", "n_tokens", "seq_id", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, "g", 3L, 0L, 0L), (2L, "g", 2L, 0L, 3L), (3L, "g", 4L, 0L, 5L),
      (4L, "g", 1L, 1L, 1L), (5L, "h", 2L, 0L, 0L)))
  }

  test("redactPii: placeholders emitted, audit counts match emissions") {
    def scrub(s: String): (String, Long, Long) = {
      val r = spark.range(1).select(TextAnalysis.redactPii(lit(s)).as("p"))
        .select("p.redacted", "p.n_email", "p.n_ip").collect().head
      (r.getString(0), r.getLong(1).toLong, r.getLong(2).toLong)
    }
    assert(scrub("mail a.b+c@sub.ex.org from 192.168.0.1 twice 10.0.0.7") ==
      (("mail [EMAIL] from [IP] twice [IP]", 1L, 2L)))
    // no PII → text unchanged, zero counts
    assert(scrub("plain prose, version 1.2 only") ==
      (("plain prose, version 1.2 only", 0L, 0L)))
    // dotted-quad inside an email domain is consumed by the email rule
    // (emails replace first): not double-redacted AND not counted — n_ip
    // is measured on the email-redacted intermediate, so every count
    // corresponds to an [IP] placeholder actually emitted
    assert(scrub("x u@10.0.0.7.net y") == (("x [EMAIL] y", 1L, 0L)))
  }
}
