package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, shingling, document
  * fingerprinting. All pure `functions._` column pipelines (codegen'd,
  * no UDFs) so they hold up on 100 TB of documents: the only shuffles
  * are the final per-doc aggregations, all map-side combinable.
  */
object TextOps {

  /** Small fixed stopword list used by quality scoring + language ID.
    * Kept tiny and literal so the DuckDB oracle can embed the same list. */
  val EnglishStop: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "that")

  /** Language marker words (n-gram-heuristic language ID reduced to its
    * robust core: function-word hit counting). */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "es" -> Seq("el", "la", "los", "de", "que", "y", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("de", "shi", "le", "zhong"))

  /** Explode a text column into (.. , pos, token) rows; single-space
    * tokenization (the corpus is space-separated), empties dropped.
    * posexplode keeps the 0-based token position for shingling. */
  def tokens(df: DataFrame, text: String): DataFrame =
    df.select(col("*"), posexplode(split(col(text), " ")).as(Seq("pos", "token")))
      .filter(col("token") =!= "")

  /** Per-document token statistics + a deterministic quality score.
    * Components follow the reference's quality-metric style (ratios of
    * simple counts): token count, mean token length, stopword ratio,
    * type-token ratio; score = stop_ratio * 0.5 + ttr * 0.5.
    */
  def tokenStats(df: DataFrame, id: String, text: String): DataFrame =
    tokens(df, text)
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("n_tokens"),
        avg(length(col("token")).cast("double")).as("avg_token_len"),
        (sum(when(col("token").isin(EnglishStop: _*), 1).otherwise(0)).cast("double")
          / count(lit(1))).as("stop_ratio"),
        (countDistinct(col("token")).cast("double") / count(lit(1))).as("ttr"))
      .withColumn("quality_score", col("stop_ratio") * 0.5 + col("ttr") * 0.5)

  /** Language ID: score = marker-word hits per language, argmax with a
    * deterministic (score desc, lang asc) tie-break. */
  def langId(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = tokens(df, text)
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      toks.groupBy(col(id))
        .agg(sum(when(col("token").isin(markers: _*), 1).otherwise(0)).as("score"))
        .withColumn("lang_guess", lit(lang))
    }.reduce(_ unionByName _)
    val w = Window.partitionBy(col(id)).orderBy(col("score").desc, col("lang_guess"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .drop("rk")
  }

  /** Word k-gram shingles WITH duplicates (one row per gram occurrence)
    * via k−1 window leads over the exploded tokens (no array
    * materialization per row) — the repetition-scoring input;
    * [[shingles]] is the distinct variant. */
  def shinglesAll(df: DataFrame, id: String, text: String, k: Int): DataFrame = {
    val toks = tokens(df, text).select(col(id), col("pos"), col("token"))
    val w = Window.partitionBy(col(id)).orderBy(col("pos"))
    val parts = (0 until k).map {
      case 0 => col("token")
      case i => lead(col("token"), i).over(w)
    }
    toks.withColumn("shingle", concat_ws(" ", parts: _*))
      .withColumn("_last", parts.last)
      .filter(col("_last").isNotNull)   // window exprs must be materialized
      .select(col(id), col("shingle"))  // before they can appear in a filter
  }

  /** Word k-gram shingles, distinct (id, shingle). */
  def shingles(df: DataFrame, id: String, text: String, k: Int): DataFrame =
    shinglesAll(df, id, text, k).distinct()

  /** Decontamination (beyond reference): k-gram overlap between a train
    * corpus and a benchmark/eval set — the standard eval-leakage filter
    * in LLM training pipelines. Inverted-index join keyed on the gram
    * (ONE shuffle — the q21 shape, so nothing is quadratic in corpus
    * size), distinct shared-gram counts per (train, bench) pair,
    * thresholded. Skew from boilerplate grams can be df-capped upstream
    * exactly like [[Dedup.jaccardPairs]]. */
  def contamination(train: DataFrame, bench: DataFrame, id: String,
                    text: String, k: Int = 8, minShared: Long = 1): DataFrame = {
    val tg = shingles(train, id, text, k).withColumnRenamed(id, "train_id")
    val bg = shingles(bench, id, text, k).withColumnRenamed(id, "bench_id")
    tg.join(bg, "shingle")
      .groupBy(col("train_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Repetition score (beyond reference): duplicated-k-gram fraction per
    * document, 1 − distinct/total — the Gopher-style intra-document
    * repetition quality filter. One explode + one keyed agg. */
  def repetitionScore(df: DataFrame, id: String, text: String,
                      k: Int = 3): DataFrame =
    shinglesAll(df, id, text, k)
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("shingle")).as("n_distinct"))
      .withColumn("rep_ratio",
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_grams"), 6))

  /** Document fingerprint (rolling-hash style): the lexicographic MIN of
    * the md5 hex digests of all character n-grams, plus the distinct
    * n-gram count. A content-defined signature that is stable under
    * document reordering of the corpus and cheap at scale (one explode +
    * one agg). */
  def charGramFingerprint(df: DataFrame, id: String, text: String,
                          n: Int = 8): DataFrame =
    df.select(col(id), col(text).as("_t"))
      .filter(length(col("_t")) >= n)
      .select(col(id),
        explode(sequence(lit(1), length(col("_t")) - (n - 1))).as("i"),
        col("_t"))
      .select(col(id), md5(expr(s"substring(_t, i, $n)")).as("gram_md5"))
      .groupBy(col(id))
      .agg(min(col("gram_md5")).as("fingerprint"),
           countDistinct(col("gram_md5")).as("n_grams"))
}
