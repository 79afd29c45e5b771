package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting — all
  * expression-only (whole-stage-codegen'd) so they stream through a scan
  * of a 100 TB corpus with zero shuffle. */
object TextAnalysis {

  def tokens(text: Column): Column = filter(split(text, "\\s+"), x => x =!= "")

  /** Whitespace + BPE-ish subword estimate: whitespace tokens plus an
    * extra token per ~4 chars of long words (the usual LLM-token budget
    * heuristic when no tokenizer is available). */
  def tokenCountEstimate(text: Column): Column = {
    val ws = size(tokens(text))
    val longWordExtra = aggregate(
      transform(tokens(text), t => greatest(ceil(length(t) / 4.0).cast("long") - 1, lit(0L))),
      lit(0L), (a, x) => a + x)
    ws + longWordExtra
  }

  /** Quality features struct: lengths, ratios the usual corpus filters
    * threshold on (C4-style quality gates). */
  def qualityFeatures(text: Column): Column = {
    val ts = tokens(text)
    val nTok = size(ts)
    struct(
      length(text).as("n_chars"),
      nTok.as("n_tokens"),
      (length(regexp_replace(text, "[^\\p{L}]", "")) / greatest(length(text), lit(1)))
        .as("alpha_ratio"),
      (length(regexp_replace(text, "[^\\p{Punct}]", "")) / greatest(length(text), lit(1)))
        .as("punct_ratio"),
      (size(filter(ts, t => t.isin("the", "a", "an", "of", "and", "to", "in", "is", "that", "it"))) /
        greatest(nTok, lit(1)).cast("double")).as("stopword_ratio"),
      (lit(1.0) - size(array_distinct(ts)) / greatest(nTok, lit(1)).cast("double"))
        .as("repetition_ratio"),
      (aggregate(transform(ts, t => length(t).cast("long")), lit(0L), (a, x) => a + x) /
        greatest(nTok, lit(1)).cast("double")).as("mean_token_len"))
  }

  /** Word n-gram LIST (non-distinct, in order) — the counting basis for
    * repetition signals; empty for texts shorter than n tokens (guarding
    * Spark's count-down sequence(1, 0)). */
  def wordGramList(text: Column, n: Int): Column = {
    val ts = tokens(text)
    if (n == 1) ts
    else when(size(ts) >= n,
      transform(sequence(lit(1), size(ts) - (n - 1)),
        i => array_join(slice(ts, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition signals (the "repetitive documents" corpus
    * gates): fraction of n-grams taken by the single most frequent one
    * (top fraction), and the duplicate n-gram fraction. All expression-
    * only — O(distinct·total) per row, zero shuffle across the corpus. */
  def topGramFraction(text: Column, n: Int): Column = {
    val grams = wordGramList(text, n)
    val counts = transform(array_distinct(grams),
      g => size(filter(grams, x => x === g)))
    coalesce(array_max(counts) / greatest(size(grams), lit(1)).cast("double"),
      lit(0.0))
  }

  def dupGramFraction(text: Column, n: Int): Column = {
    val grams = wordGramList(text, n)
    when(size(grams) === 0, lit(0.0))
      .otherwise(lit(1.0) - size(array_distinct(grams)) / size(grams).cast("double"))
  }

  /** TF-IDF cosine between candidate doc pairs — the content-similarity
    * RERANK step that follows candidate generation (LSH pairs, adjacent
    * ids, retrieval hits): raw-count TF × ln(N/df) IDF, sparse dot via a
    * token-keyed join inside each pair, normalized by the per-doc vector
    * norms. Scale shape: TF/IDF/norms are keyed aggregations; the pair
    * scoring joins move (id, token, weight) rows only — never dense
    * vectors; the lone broadcast is the 1-row corpus count. `pairs` must
    * have columns `doc_a`/`doc_b` matching `idCol`'s type. */
  def tfidfCosine(corpus: DataFrame, pairs: DataFrame, idCol: String,
      textCol: String, toks: Column => Column = tokens): DataFrame = {
    val flat = corpus.select(col(idCol).as("__id"),
      explode(toks(col(textCol))).as("__t"))
    val tf = flat.groupBy("__id", "__t")
      .agg(count(lit(1)).cast("double").as("__tf"))
    val n = corpus.agg(count(lit(1)).cast("double").as("__nn"))
    val df = tf.groupBy("__t").agg(count(lit(1)).cast("double").as("__df"))
    val w = tf.join(df, "__t").crossJoin(broadcast(n))
      .select(col("__id"), col("__t"),
        (col("__tf") * log(col("__nn") / col("__df"))).as("__w"))
      .cache() // the corpus explode→TF→IDF chain feeds THREE consumers
    graft.operators.OperatorCaches.register(w) // (two dot sides + norms)
    val norms = w.groupBy("__id")
      .agg(sqrt(sum(col("__w") * col("__w"))).as("__nrm"))
    val dot = pairs
      .join(w.select(col("__id").as("doc_a"), col("__t"), col("__w").as("__wa")), "doc_a")
      .join(w.select(col("__id").as("doc_b"), col("__t"), col("__w").as("__wb")),
        Seq("doc_b", "__t"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("__wa") * col("__wb")).as("__dot"))
    pairs
      .join(dot, Seq("doc_a", "doc_b"), "left")
      // LEFT joins on the norms: a token-less doc has no norm row, and an
      // inner join would silently DELETE its pairs from the output — a
      // candidate scorer must return a 0 score, not lose candidates
      .join(norms.select(col("__id").as("doc_a"), col("__nrm").as("__na")),
        Seq("doc_a"), "left")
      .join(norms.select(col("__id").as("doc_b"), col("__nrm").as("__nb")),
        Seq("doc_b"), "left")
      .withColumn("tfidf_cos",
        when(coalesce(col("__na"), lit(0.0)) === 0.0 ||
            coalesce(col("__nb"), lit(0.0)) === 0.0, lit(0.0))
          .otherwise(round(
            coalesce(col("__dot"), lit(0.0)) / (col("__na") * col("__nb")), 6)))
      .select(col("doc_a"), col("doc_b"), col("tfidf_cos"))
  }

  /** CCNet-style unigram language-model quality score: train a unigram LM
    * over the corpus (add-one smoothing), then score each document by its
    * average negative log-likelihood and perplexity — the signal CCNet
    * thresholds to split a crawl into head/middle/tail quality buckets.
    *
    * Scale shape: the model is ONE keyed aggregation (token counts) plus
    * a 1-row totals broadcast; scoring is a map-side explode, a broadcast
    * join against the vocabulary-sized model, and a per-document rollup —
    * the corpus-sized relation shuffles once, keyed on the doc id. To
    * score corpus B under corpus A's model, swap `model` sources; tokens
    * unseen by the model are dropped (inner join) — add-one smoothing
    * keeps seen-token probabilities well-defined.
    *
    * Returns (idCol, n_tokens, avg_nll, perplexity), perplexity derived
    * from the 6-dp-rounded avg_nll so downstream thresholds are stable. */
  def unigramNll(corpus: DataFrame, idCol: String, textCol: String,
      toks: Column => Column = tokens): DataFrame = {
    val flat = corpus.select(col(idCol), explode(toks(col(textCol))).as("__t"))
    val model = flat.groupBy(col("__t")).agg(count(lit(1)).as("__c"))
    val tot = model.agg(sum(col("__c")).as("__n"), count(lit(1)).as("__v"))
    val probs = model.crossJoin(broadcast(tot))
      .select(col("__t"), log((col("__c") + 1.0) / (col("__n") + col("__v"))).as("__lp"))
    flat.join(broadcast(probs), "__t")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__lp")).as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(-col("__s") / col("n_tokens"), 6).as("avg_nll"))
      .withColumn("perplexity", round(exp(col("avg_nll")), 6))
  }

  /** Language-ID by stopword-marker voting: score per language = count of
    * that language's marker tokens; predicted = argmax (ties → first).
    * The deterministic n-gram-heuristic skeleton of a real classifier —
    * extend `markers` per deployment. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "that"),
    "fr" -> Seq("le", "la", "les", "et", "de", "est"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "los", "las", "es", "de", "que"))

  def languageId(text: Column): Column = {
    val ts = tokens(lower(text))
    val scores = markers.map { case (lang, ms) =>
      struct(size(filter(ts, t => t.isin(ms: _*))).as("score"), lit(lang).as("lang"))
    }
    // argmax by (score, then stable order): array_max picks lexicographic
    // max of (score, lang) structs — tie falls to later lang name, so add
    // index-descending tiebreak to keep "first marker set wins"
    val indexed = scores.zipWithIndex.map { case (s, i) =>
      struct(s.getField("score").as("score"), lit(markers.size - i).as("prio"),
        s.getField("lang").as("lang"))
    }
    when(size(ts) === 0, lit("und"))
      .otherwise(
        when(array_max(array(indexed: _*)).getField("score") === 0, lit("und"))
          .otherwise(array_max(array(indexed: _*)).getField("lang")))
  }

  /** Rolling (polynomial) content hash over the token sequence — the
    * order-sensitive fingerprint (vs Dedup.canonicalKey which is
    * order-free): h = Σ hash(token_i)·B^i mod M, computed as a fold. */
  def rollingFingerprint(text: Column): Column = {
    val B = 1000003L
    val M = 2147483647L
    aggregate(
      tokens(text),
      struct(lit(0L).as("h"), lit(1L).as("p")),
      (acc, t) => struct(
        ((acc.getField("h") + (crc32(t.cast("binary")) % M) * acc.getField("p")) % M).as("h"),
        ((acc.getField("p") * B) % M).as("p")),
      acc => acc.getField("h"))
  }

  /** Email pattern restricted to the Java-regex ∩ RE2 common subset (no
    * backreferences or lookaround) so external engines replay the scrub
    * identically. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** Dotted-quad IPv4 literal, word-bounded. */
  val Ipv4Pattern = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** PII redaction — the scrub pass every training corpus runs before
    * release: emails and IPv4 literals become typed placeholders, with
    * per-document match counts kept for audit. Pure codegen'd
    * `regexp_replace`/`regexp_count` per row — embarrassingly parallel,
    * no shuffle, linear at any corpus size. Returns a struct
    * (redacted, n_email, n_ip). Emails are replaced before IPs, and
    * n_ip is counted on the email-redacted INTERMEDIATE text — so a
    * dotted-quad consumed by the email rule (u@10.0.0.7.net) is neither
    * replaced nor counted, and each audit count equals the number of
    * placeholders of its kind actually emitted. */
  def redactPii(text: Column): Column = {
    val emailRedacted = regexp_replace(text, EmailPattern, "[EMAIL]")
    struct(
      regexp_replace(emailRedacted, Ipv4Pattern, "[IP]").as("redacted"),
      regexp_count(text, lit(EmailPattern)).cast("long").as("n_email"),
      regexp_count(emailRedacted, lit(Ipv4Pattern)).cast("long").as("n_ip"))
  }

  /** Sequence packing — assemble documents into fixed-token-budget
    * training sequences (the batch-construction step after filtering/
    * dedup): documents are laid out contiguously in (group, id) order and
    * cut into `capacity`-token sequences by prefix sum; a document
    * crossing a boundary stays with the sequence it started in (greedy
    * contiguous packing with overflow — the deterministic policy, not
    * best-fit bin packing, so the layout is reproducible and
    * SQL-replayable). Scale shape: ONE window shuffle partitioned by the
    * group column (source/shard — thousands of groups at corpus scale,
    * each a bounded slice); no global ordering anywhere. Returns the
    * input keys + (seq_id, seq_offset, n_tokens). */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      groupCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, s"sequence capacity $capacity")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", size(tokens(col(textCol))).cast("long"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("__before", col("__cum") - col("n_tokens"))
      .select(col(idCol), col(groupCol), col("n_tokens"),
        (col("__before") / capacity).cast("long").as("seq_id"),
        (col("__before") % capacity).as("seq_offset"))
  }

  /** Corpus-level boilerplate scoring — the C4/CCNet repeated-content
    * filter class (their unit is the LINE; shingles generalise to corpora
    * without line structure): an n-gram is boilerplate when it appears in
    * at least `ceil(minDocFrac · nDocs)` distinct documents, and each
    * document reports how much of its distinct-gram set is boilerplate.
    * Documents shorter than n tokens have no grams and drop out.
    *
    * Scale shape: ONE keyed shuffle on the gram computes document
    * frequencies (per-doc grams are `array_distinct`'d map-side, so the
    * rollup is a plain count); the surviving frequent set is tiny by
    * construction (only grams in ≥frac·N docs) and BROADCASTS back over
    * the per-doc side; the corpus size rides a broadcast 1-row relation.
    * The wide gram relation is never shuffled twice and text never moves.
    * Both engines evaluate `ceil(frac·N)` in IEEE doubles, so the
    * threshold agrees bit-for-bit with the DuckDB oracle. */
  def boilerplate(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, minDocFrac: Double = 0.006): DataFrame = {
    // the per-doc gram SET feeds two consumers (the document-frequency
    // aggregation and the per-doc rollup) and Catalyst cannot reuse the
    // subtree across them — without a cache the n-gram construction (the
    // operator's dominant CPU, measured 1.8 s of a 4.9 s sf0.1 profile
    // per pass) runs twice. Cache the compact per-doc ARRAY relation
    // (one row per doc, not the exploded (doc, gram) pairs), registered
    // for release right after the consuming action. wordNgrams already
    // emits a distinct array, so no extra array_distinct on top.
    val gramArrs = df
      .select(col(idCol), Dedup.wordNgrams(col(textCol), n).as("__gs"))
      .cache()
    OperatorCaches.register(gramArrs)
    val grams = gramArrs.select(col(idCol), explode(col("__gs")).as("__g"))
    val nDocs = gramArrs.select(count(lit(1)).as("__nd"))
    val frequent = grams.groupBy(col("__g"))
      .agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("__df") >= ceil(lit(minDocFrac) * col("__nd")))
      .select(col("__g"), lit(1L).as("__b"))
    grams.join(broadcast(frequent), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__b"), lit(0L))).as("n_boiler"))
      .withColumn("boiler_ratio",
        round(col("n_boiler") / col("n_grams"), 6))
  }

  /** Apply the full per-document analysis in one pass. */
  def analyze(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("quality", qualityFeatures(col(textCol)))
      .withColumn("lang_pred", languageId(col(textCol)))
      .withColumn("n_tokens_est", tokenCountEstimate(col(textCol)))
      .withColumn("fingerprint", Dedup.canonicalKey(col(textCol)))
      .withColumn("rolling_fp", rollingFingerprint(col(textCol)))
      .withColumn("pii", redactPii(col(textCol)))
}
