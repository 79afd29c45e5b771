package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Optimization-round equivalence harness: re-runs the PRE-optimization
  * (distinct-based) forms of the restructured pair queries at a given SF
  * and asserts set identity with the shipped plans — the oracle pins
  * sf0.01/sf0.001; this pins the bench SF too.
  *
  *   sbt "Test/runMain graft.queries.AbEquivMain /root/testdata/sf0.1"
  */
object AbEquivMain {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    var bad = 0

    // ---- dedup_lsh_pairs: old distinct-based pair dedup
    locally {
      val tokensExpr = "filter(split(text, ' '), x -> x != '')"
      val tokenSetExpr = s"array_sort(array_distinct($tokensExpr))"
      val mh8 = (0 until 8).map { i =>
        s"mh$i" -> s"array_min(transform($tokenSetExpr, t -> md5(concat('$i|', t))))"
      }
      val docs = s.read.parquet(s"$dir/documents.parquet")
      val base = mh8.foldLeft(docs) { case (df, (n, e)) => df.withColumn(n, expr(e)) }
        .withColumn("toks", expr(tokenSetExpr))
        .select(col("doc_id"), col("source"), col("toks"),
          concat(col("mh0"), col("mh1"), col("mh2"), col("mh3")).as("band0"),
          concat(col("mh4"), col("mh5"), col("mh6"), col("mh7")).as("band1"))
        .cache()
      val exploded = base.select(col("doc_id"), col("source"),
          posexplode(array(col("band0"), col("band1"))))
        .withColumnRenamed("pos", "bi").withColumnRenamed("col", "bv")
      val oldPairs = exploded.as("a").join(exploded.as("b"),
          col("a.source") === col("b.source") &&
          col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .join(base.select(col("doc_id").as("doc_a"), col("toks").as("ta")), "doc_a")
        .join(base.select(col("doc_id").as("doc_b"), col("toks").as("tb")), "doc_b")
        .withColumn("inter",
          graft.functions.ArrayExpressions.sorted_intersect_size(col("ta"), col("tb")))
        .withColumn("jaccard",
          round(col("inter") / (size(col("ta")) + size(col("tb")) - col("inter")), 6))
        .filter(col("jaccard") >= 0.9)
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
      val newPairs = graft.SparkEntry.queries("dedup_lsh_pairs")(s, dir)
        .select("doc_a", "doc_b", "jaccard")
      val nOld = oldPairs.count(); val nNew = newPairs.count()
      val diff = oldPairs.exceptAll(newPairs).count() + newPairs.exceptAll(oldPairs).count()
      val ok = nOld == nNew && diff == 0
      if (!ok) bad += 1
      println(s"AB lsh_pairs old=$nOld new=$nNew diff=$diff " +
        (if (ok) "IDENTICAL" else "*** MISMATCH ***"))
      base.unpersist()
      graft.operators.OperatorCaches.unpersistAll()
    }

    // ---- dedup_embed: old distinct-based pair dedup
    locally {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("v", col("embedding").cast("array<double>"))
      val planes = SimilarityQueries.planes
      def dotp(a: org.apache.spark.sql.Column, p: Seq[Double]) =
        graft.functions.ArrayExpressions.vec_dot(a, array(p.map(lit): _*))
      def bandOf(lo: Int) = planes.slice(lo, lo + 4).zipWithIndex.map {
        case (p, j) => when(dotp(col("v"), p) > 0, lit(1 << j)).otherwise(lit(0))
      }.reduce(_ + _)
      val sig = emb.select(col("vec_id"), col("v"),
        sqrt(graft.functions.ArrayExpressions.vec_dot(col("v"), col("v"))).as("nrm"),
        bandOf(0).cast("int").as("b0"), bandOf(4).cast("int").as("b1")).cache()
      val ex2 = sig.select(col("vec_id"), posexplode(array(col("b0"), col("b1"))))
        .withColumnRenamed("pos", "bi").withColumnRenamed("col", "bv")
      val oldEmb = ex2.as("a").join(ex2.as("b"),
          col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"))
        .distinct()
        .join(sig.select(col("vec_id").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
        .join(sig.select(col("vec_id").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          round(graft.functions.ArrayExpressions.vec_dot(col("va"), col("vb")) /
            (col("na") * col("nb")), 6).as("cos"))
        .filter(col("cos") >= 0.35)
      val newEmb = graft.SparkEntry.queries("dedup_embed")(s, dir)
        .select("id_a", "id_b", "cos")
      val nOld = oldEmb.count(); val nNew = newEmb.count()
      val diff = oldEmb.exceptAll(newEmb).count() + newEmb.exceptAll(oldEmb).count()
      val ok = nOld == nNew && diff == 0
      if (!ok) bad += 1
      println(s"AB embed_pairs old=$nOld new=$nNew diff=$diff " +
        (if (ok) "IDENTICAL" else "*** MISMATCH ***"))
      sig.unpersist()
      graft.operators.OperatorCaches.unpersistAll()
    }

    // ---- w1_latest_first: old row_number window form
    locally {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
      val oldW1 = Tables(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          round(col("value"), 2).as("value"))
      val newW1 = graft.SparkEntry.queries("w1_latest_first")(s, dir)
        .select("user_id", "event_id", "event_type", "value")
      val diff = oldW1.exceptAll(newW1).count() + newW1.exceptAll(oldW1).count()
      val ok = diff == 0
      if (!ok) bad += 1
      println(s"AB w1_latest_first diff=$diff " +
        (if (ok) "IDENTICAL" else "*** MISMATCH ***"))
    }

    // ---- sim_ivf_topk: old row_number assignment form
    locally {
      val emb = s.read.parquet(s"$dir/embeddings.parquet")
        .withColumn("v", col("embedding").cast("array<double>"))
      def dot(a: String, b: String) =
        graft.functions.ArrayExpressions.vec_dot(col(a), col(b))
      val e = emb.withColumn("nrm", sqrt(dot("v", "v")))
      val cent = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cnrm"))
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"))
      val byVec = org.apache.spark.sql.expressions.Window
        .partitionBy("vec_id").orderBy(col("ccos").desc, col("cid"))
      val assignedOld = e.crossJoin(broadcast(cent))
        .withColumn("ccos", dot("v", "cv") / (col("nrm") * col("cnrm")))
        .withColumn("rn", row_number().over(byVec))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("label"), col("v"), col("cid"))
      def cosc(a: String, b: String) =
        dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
      val probed = cent.crossJoin(broadcast(q))
        .withColumn("qcos", cosc("cv", "qv"))
        .orderBy(col("qcos").desc, col("cid"))
        .limit(2)
        .select(col("cid"))
      val oldIvf = assignedOld.join(broadcast(probed), "cid")
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(q))
        .withColumn("cos", round(cosc("v", "qv"), 6))
        .orderBy(col("cos").desc, col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("label"), col("cos"))
      val newIvf = graft.SparkEntry.queries("sim_ivf_topk")(s, dir)
      val o = oldIvf.collect().toSeq
      val n = newIvf.collect().toSeq
      val ok = o == n
      if (!ok) bad += 1
      println(s"AB sim_ivf_topk rows old=${o.size} new=${n.size} " +
        (if (ok) "IDENTICAL" else s"*** MISMATCH ***\nold=$o\nnew=$n"))
    }

    println(if (bad == 0) "AB ALL IDENTICAL" else s"AB $bad MISMATCHES")
    s.stop()
    if (bad != 0) sys.exit(1)
  }
}
