package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float|double>`):
  * exact brute-force cosine top-k as the baseline, and three scale paths —
  * random-hyperplane LSH bucketing, IVF (inverted-file) coarse
  * quantization, and product quantization (PQ codes + asymmetric-distance
  * scan). Expression-only vector math (zip_with/aggregate — codegen'd);
  * no UDFs, no driver-side loops.
  */
object Similarity {

  /** dot(a, b) over array columns, in double — the codegen'd
    * multiply-accumulate expression (same left-to-right addition order as
    * the aggregate(zip_with) fold, no intermediate arrays). */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayExpressions.vec_dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** NULL-safe cosine: a zero-norm vector (padding row, failed embed)
    * has no direction — its cosine is NULL, which comparisons and
    * desc-ordering (nulls last) both handle, where the raw division is
    * a DIVIDE_BY_ZERO error under ANSI mode and a NaN that sorts ABOVE
    * every real value otherwise. */
  def cosine(a: Column, b: Column): Column = {
    val np = norm(a) * norm(b)
    when(np === 0, lit(null)).otherwise(dot(a, b) / np)
  }

  /** Exact top-k nearest rows to a literal query vector by cosine:
    * one codegen'd pass + TakeOrderedAndProject (no global sort).
    * `tieBreak` columns order rows of equal cosine deterministically
    * (pass the id column whenever results feed a comparison or a test). */
  def topK(df: DataFrame, vecCol: String, query: Seq[Double], k: Int,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val q = array(query.map(lit): _*)
    val v = col(vecCol).cast("array<double>")
    df.withColumn("cosine", cosine(v, q))
      .filter(col("cosine").isNotNull) // zero-norm rows are never a match
      .orderBy(col("cosine").desc +: tieBreak: _*)
      .limit(k)
  }

  /** Deterministic hyperplane weights (seeded LCG, values rounded to
    * 1e-6) — the ONE generator behind both the executor-side bucket
    * expressions and the driver-side query bucket: the LSH scheme only
    * works while the two are bit-identical, and a divergent copy would
    * silently collapse ANN recall with no error. */
  private def hyperplanes(seed: Long, dim: Int, nPlanes: Int): Seq[Seq[Double]] = {
    var state = seed
    def next(): Double = {
      state = (state * 1103515245L + 12345L) & 0x7fffffffL
      math.rint((state.toDouble / 0x7fffffffL.toDouble * 2.0 - 1.0) * 1e6) / 1e6
    }
    Seq.fill(nPlanes)(Seq.fill(dim)(next()))
  }

  /** Random-hyperplane LSH bucket id (nPlanes sign bits) with plane
    * weights derived from a seed — deterministic across runs/engines. */
  def lshBucket(vecCol: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column = {
    val v = vecCol.cast("array<double>")
    val terms = hyperplanes(seed, dim, nPlanes).zipWithIndex.map { case (plane, j) =>
      when(dot(v, array(plane.map(lit): _*)) > 0, lit(1 << j)).otherwise(lit(0))
    }
    terms.reduce(_ + _).cast("int")
  }

  /** Approximate NN via LSH: query probes its bucket (and optionally all
    * 1-bit-flip neighbor buckets), exact cosine re-rank inside. At scale
    * the bucket column is a partition/cluster key — the probe touches only
    * matching partitions. */
  def annSearch(df: DataFrame, vecCol: String, dim: Int, query: Seq[Double],
      k: Int, nPlanes: Int = 8, multiProbe: Boolean = true, seed: Long = 42L,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    val withBucket = df.withColumn("__bucket", lshBucket(col(vecCol), dim, nPlanes, seed))
    // driver-side bucket of the query — SAME planes as the data side
    val qBucket = hyperplanes(seed, dim, nPlanes).zipWithIndex.map { case (plane, j) =>
      val d = plane.zip(query).map { case (w, x) => w * x }.sum
      if (d > 0) 1 << j else 0
    }.sum
    val probes: Seq[Int] =
      if (multiProbe) qBucket +: (0 until nPlanes).map(j => qBucket ^ (1 << j))
      else Seq(qBucket)
    topK(withBucket.filter(col("__bucket").isin(probes: _*)), vecCol, query, k,
        tieBreak)
      .drop("__bucket")
  }

  /** IVF (inverted-file) index: assign each vector to its nearest of
    * `centroids`; a query scans only `nProbe` nearest lists. Centroids
    * come from a prior sample/k-means (any small driver-side list). */
  def ivfAssign(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]]): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    // squared L2 to each centroid (codegen'd loop); argmin via array_min
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      val cc = array(c.map(lit): _*)
      struct(graft.functions.ArrayExpressions.vec_dist2(v, cc).as("d"),
        lit(i).as("i"))
    }
    df.withColumn("__ivf_list", array_min(array(dists: _*)).getField("i"))
  }

  /** IVF probe: exact top-k within the nProbe nearest centroid lists. */
  def ivfSearch(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]],
      query: Seq[Double], k: Int, nProbe: Int): DataFrame = {
    val nearest = centroids.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    val assigned = ivfAssign(df, vecCol, centroids)
    topK(assigned.filter(col("__ivf_list").isin(nearest: _*)), vecCol, query, k)
      .drop("__ivf_list")
  }

  /** Element-wise vector mean as a typed Aggregator (the custom-aggregate
    * path: partial sums combine associatively, so the plan is one
    * partial-aggregatable shuffle of k groups — never a per-dimension
    * explode). */
  val vectorAvg: org.apache.spark.sql.expressions.Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] =
    new org.apache.spark.sql.expressions.Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {
      def zero: (Array[Double], Long) = (Array.empty, 0L)
      def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
        val acc = if (b._1.isEmpty) new Array[Double](v.length) else b._1
        var i = 0
        while (i < v.length) { acc(i) += v(i); i += 1 }
        (acc, b._2 + 1)
      }
      def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
        if (a._1.isEmpty) b
        else if (b._1.isEmpty) a
        else {
          var i = 0
          while (i < a._1.length) { a._1(i) += b._1(i); i += 1 }
          (a._1, a._2 + b._2)
        }
      }
      def finish(r: (Array[Double], Long)): Seq[Double] =
        if (r._2 == 0) Nil else r._1.map(_ / r._2).toSeq
      def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Double], Long)] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()
      def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
    }

  /** Product-quantization codebooks: `m` subspaces of `dim/m` dims, `k`
    * centroids each — `books(j)(c)` is centroid c of subspace j. */
  final case class PqCodebooks(dim: Int, m: Int, k: Int,
      books: Seq[Seq[Seq[Double]]])

  /** Train PQ codebooks with the in-engine [[kmeans]], one run per
    * subspace over sliced subvectors (m small k-means over the same scan —
    * training is a sample-sized job; encode/search below are the
    * at-scale passes). */
  def pqTrain(df: DataFrame, vecCol: String, idCol: String, dim: Int,
      m: Int, k: Int, iterations: Int = 5): PqCodebooks = {
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val sub = dim / m
    val books = (0 until m).map { j =>
      val sliced = df.select(col(idCol),
        slice(col(vecCol).cast("array<double>"), j * sub + 1, sub).as("__s"))
      kmeans(sliced, "__s", idCol, k, iterations)
    }
    PqCodebooks(dim, m, k, books)
  }

  /** Encode vectors to PQ codes (`__pq_code`: array<int> of length m, the
    * per-subspace nearest-centroid ids): ONE broadcast-codebook codegen'd
    * pass. The code column is m small ints instead of dim floats —
    * a 10-30× shrink that lets a 100 TB embedding corpus fit hot storage;
    * downstream ANN scans codes, not vectors. */
  def pqEncode(df: DataFrame, vecCol: String, cb: PqCodebooks): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val sub = cb.dim / cb.m
    val codes = (0 until cb.m).map { j =>
      val s = slice(v, j * sub + 1, sub)
      val dists = cb.books(j).zipWithIndex.map { case (c, i) =>
        struct(graft.functions.ArrayExpressions.vec_dist2(s, array(c.map(lit): _*)).as("d"),
          lit(i).as("i"))
      }
      array_min(array(dists: _*)).getField("i")
    }
    df.withColumn("__pq_code", array(codes: _*))
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query's per-
    * (subspace, centroid) distance table is computed driver-side (m·k
    * doubles) and inlined as a literal, so scoring a row is m codegen'd
    * table lookups — no vector column is read at all. Approximate by
    * construction; re-rank the short list against true vectors when exact
    * order matters. */
  def pqSearch(encoded: DataFrame, query: Seq[Double], cb: PqCodebooks,
      k: Int, tieBreak: Seq[Column] = Nil): DataFrame = {
    require(query.size == cb.dim, s"query dim ${query.size} != ${cb.dim}")
    val sub = cb.dim / cb.m
    val table: Seq[Seq[Double]] = (0 until cb.m).map { j =>
      val q = query.slice(j * sub, (j + 1) * sub)
      cb.books(j).map(c => q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
    }
    val t = array(table.map(row => array(row.map(lit): _*)): _*)
    val score = aggregate(
      zip_with(col("__pq_code"), sequence(lit(0), lit(cb.m - 1)),
        (c, j) => element_at(element_at(t, j + 1), c + 1)),
      lit(0.0), (acc, x) => acc + x)
    encoded.withColumn("pq_dist2", score)
      .orderBy(col("pq_dist2") +: tieBreak: _*)
      .limit(k)
  }

  /** IVF-PQ encode — the composition real ANN deployments ship: each
    * vector coarse-assigns to its nearest IVF centroid, then PQ-encodes
    * its RESIDUAL (v − centroid). Residuals are smaller than raw vectors,
    * so the same codebooks quantize them with far less error, and the
    * output row is (list id, m code ints) — what a 100 TB corpus stores
    * hot; the vector column can be dropped downstream. One
    * broadcast-literal codegen'd pass, no shuffle. */
  def ivfPqEncode(df: DataFrame, vecCol: String, centroids: Seq[Seq[Double]],
      cb: PqCodebooks): DataFrame = {
    val assigned = ivfAssign(df, vecCol, centroids)
    val cents = array(centroids.map(c => array(c.map(lit): _*)): _*)
    val resid = zip_with(col(vecCol).cast("array<double>"),
      element_at(cents, col("__ivf_list") + 1), (a, b) => a - b)
    pqEncode(assigned.withColumn("__resid", resid), "__resid", cb)
      .drop("__resid")
  }

  /** IVF-PQ search: probe the nProbe lists nearest the query; within
    * each, ADC-score codes against the distance table of the query's
    * RESIDUAL for that list (per-list tables are driver-side literals —
    * nProbe·m·k doubles). The scan reads list id + codes only; with the
    * encoded table partitioned by `__ivf_list`, the probe filter becomes
    * partition pruning and the job touches nProbe partitions of a 100 TB
    * corpus. Approximate by construction — re-rank the short list
    * against true vectors when exact order matters. */
  def ivfPqSearch(encoded: DataFrame, centroids: Seq[Seq[Double]],
      cb: PqCodebooks, query: Seq[Double], k: Int, nProbe: Int,
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(query.size == cb.dim, s"query dim ${query.size} != ${cb.dim}")
    val sub = cb.dim / cb.m
    val nearest = centroids.zipWithIndex
      .map { case (c, i) =>
        (i, c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    // one ADC table per probed list, over the query residual for that list
    val tables: Seq[Seq[Seq[Double]]] = nearest.map { l =>
      val qr = query.zip(centroids(l)).map { case (a, b) => a - b }
      (0 until cb.m).map { j =>
        val q = qr.slice(j * sub, (j + 1) * sub)
        cb.books(j).map(c => q.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum)
      }
    }
    val probedLits = array(nearest.map(lit): _*)
    val tableLit = array(tables.map(tb =>
      array(tb.map(row => array(row.map(lit): _*)): _*)): _*)
    // the row's table = the literal at its list's probe position
    val t = element_at(tableLit,
      array_position(probedLits, col("__ivf_list")).cast("int"))
    val score = aggregate(
      zip_with(col("__pq_code"), sequence(lit(0), lit(cb.m - 1)),
        (c, j) => element_at(element_at(t, j + 1), c + 1)),
      lit(0.0), (acc, x) => acc + x)
    encoded.filter(col("__ivf_list").isin(nearest: _*))
      .withColumn("pq_dist2", score)
      .orderBy(col("pq_dist2") +: tieBreak: _*)
      .limit(k)
  }

  /** Lloyd k-means over an embedding column — the IVF training step
    * (train → [[ivfAssign]] → [[ivfSearch]] completes the ANN lifecycle
    * in-engine). Deterministic seeding: the first k vectors in `idCol`
    * order. Each iteration is ONE assignment pass (broadcast centroids,
    * codegen'd argmin) + ONE k-group aggregation — no per-dimension
    * shuffles, so iteration cost is a fixed small multiple of a scan at
    * any scale. Empty clusters keep their previous centroid. */
  def kmeans(df: DataFrame, vecCol: String, idCol: String, k: Int,
      iterations: Int): Seq[Seq[Double]] = {
    import df.sparkSession.implicits._
    // persist the projected vectors ONCE: every iteration (plus the seed
    // scan) re-reads this relation, and without the cache that is
    // iterations × a full scan of the embedding table at 100 TB. The
    // cache is registered so callers release executor storage when done.
    val vecs = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    OperatorCaches.register(vecs)
    var centroids: Seq[Seq[Double]] = vecs.orderBy(col(idCol)).limit(k)
      .select("__v").as[Seq[Double]].collect().toSeq
    var it = 0
    while (it < iterations) {
      val updated = ivfAssign(vecs, "__v", centroids)
        .groupByKey(r => r.getAs[Int]("__ivf_list"))
        .mapValues(_.getAs[scala.collection.Seq[Double]]("__v").toSeq)
        .agg(vectorAvg.toColumn.name("c"))
        .collect().toMap
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i)))
      it += 1
    }
    centroids
  }
}
