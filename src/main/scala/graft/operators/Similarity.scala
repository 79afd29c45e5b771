package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float|double>`):
  * exact brute-force cosine top-k as the baseline, and two scale paths —
  * random-hyperplane LSH bucketing and IVF (inverted-file) coarse
  * quantization. Expression-only vector math (zip_with/aggregate —
  * codegen'd); no UDFs, no driver-side loops.
  */
object Similarity {

  /** dot(a, b) over array columns, in double — the codegen'd
    * multiply-accumulate expression (same left-to-right addition order as
    * the aggregate(zip_with) fold, no intermediate arrays). */
  def dot(a: Column, b: Column): Column =
    graft.functions.ArrayExpressions.vec_dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k nearest rows to a literal query vector by cosine:
    * one codegen'd pass + TakeOrderedAndProject (no global sort). */
  def topK(df: DataFrame, vecCol: String, query: Seq[Double], k: Int): DataFrame = {
    val q = array(query.map(lit): _*)
    val v = col(vecCol).cast("array<double>")
    df.withColumn("cosine", cosine(v, q))
      .orderBy(col("cosine").desc)
      .limit(k)
  }

  /** Random-hyperplane LSH bucket id (nPlanes sign bits) with plane
    * weights derived from a seed — deterministic across runs/engines. */
  def lshBucket(vecCol: Column, dim: Int, nPlanes: Int, seed: Long = 42L): Column = {
    var state = seed
    def next(): Double = {
      state = (state * 1103515245L + 12345L) & 0x7fffffffL
      math.rint((state.toDouble / 0x7fffffffL.toDouble * 2.0 - 1.0) * 1e6) / 1e6
    }
    val v = vecCol.cast("array<double>")
    val terms = (0 until nPlanes).map { j =>
      val plane = array(Seq.fill(dim)(lit(next())): _*)
      when(dot(v, plane) > 0, lit(1 << j)).otherwise(lit(0))
    }
    terms.reduce(_ + _).cast("int")
  }

  /** Approximate NN via LSH: query probes its bucket (and optionally all
    * 1-bit-flip neighbor buckets), exact cosine re-rank inside. At scale
    * the bucket column is a partition/cluster key — the probe touches only
    * matching partitions. */
  def annSearch(df: DataFrame, vecCol: String, dim: Int, query: Seq[Double],
      k: Int, nPlanes: Int = 8, multiProbe: Boolean = true, seed: Long = 42L): DataFrame = {
    val withBucket = df.withColumn("__bucket", lshBucket(col(vecCol), dim, nPlanes, seed))
    // driver-side bucket of the query (same LCG)
    var state = seed
    def next(): Double = {
      state = (state * 1103515245L + 12345L) & 0x7fffffffL
      math.rint((state.toDouble / 0x7fffffffL.toDouble * 2.0 - 1.0) * 1e6) / 1e6
    }
    val qBucket = (0 until nPlanes).map { j =>
      val plane = Seq.fill(dim)(next())
      val d = plane.zip(query).map { case (w, x) => w * x }.sum
      if (d > 0) 1 << j else 0
    }.sum
    val probes: Seq[Int] =
      if (multiProbe) qBucket +: (0 until nPlanes).map(j => qBucket ^ (1 << j))
      else Seq(qBucket)
    topK(withBucket.filter(col("__bucket").isin(probes: _*)), vecCol, query, k)
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
    val vecs = df.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
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
