package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine BPE tokenizer training and encoding (beyond reference;
  * Sennrich et al. 2016 — the "train a tokenizer on the corpus" step
  * of every LLM data pipeline, usually punted to a single-node tool).
  *
  * Scale design — the whole point of doing this in Spark: the corpus
  * is touched ONCE (a word-count aggregation, map-side combinable);
  * every merge iteration then runs on the VOCABULARY frame (distinct
  * words + counts — orders of magnitude smaller than the corpus and
  * still distributed, so a 100M-type vocabulary from 100 TB of text
  * never funnels through the driver). Per merge: one map-side
  * adjacent-pair explode, one (left,right)-keyed sum agg, and a
  * TakeOrdered(1) argmax — the only driver state is the merge table
  * itself (the model, |merges| rows). Merge application is a map-side
  * string `replace` on the symbol column.
  *
  * Determinism / oracle parity: pair counts are INTEGERS (no float
  * drift anywhere); the argmax tie-breaks (count DESC, left ASC,
  * right ASC) on ASCII binary collation; greedy left-to-right
  * non-overlapping `replace` has identical semantics in the JVM and
  * DuckDB — so the whole trainer replays exactly in SQL (the k01
  * chained-iteration pattern, with integer rather than r6-rounded
  * re-entry).
  *
  * Symbol-sequence representation: every symbol is a unit ` s `
  * carrying its OWN leading and trailing space, units concatenated —
  * ` s1  s2  …  sn ` (double spaces between symbols). The merge
  * rewrite is then a pure string replace of ` l  r ` with ` lr `:
  * because each unit owns its separators, replacing a pair consumes
  * exactly the two units and leaves the neighbors' spaces intact, so
  * plain left-to-right non-overlapping `replace` reproduces reference
  * BPE exactly on repeated runs (" a  a  a  a  a " + merge (a,a) →
  * aa aa a). A single-shared-space encoding gets this WRONG — the
  * first replacement eats the separator the next match needs, giving
  * aa a aa — and the lookaround regex that fixes it (Sennrich's
  * `(?<!\S)l r(?!\S)`) does not exist in RE2, so the oracle could
  * never replay it. */
object Bpe {

  /** One trained merge: `rank` (1-based), the two joined symbols, the
    * pair's corpus frequency at election time. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pairCount: Long)

  /** The ` s1  s2  … ` unit string of a word at character level. */
  private def charSyms(word: Column): Column =
    regexp_replace(word, "(.)", " $1 ")

  /** Adjacent symbol pairs of a symbol string, as (l, r) structs.
    * Guarded: a single-symbol word has no pairs — unguarded,
    * `sequence(0, size-2)` DESCENDS for size 1 and element_at(0)
    * throws. */
  private def pairsOf(sym: Column): Column = {
    val arr = filter(split(sym, " "), s => s =!= "")
    when(size(arr) >= 2,
      transform(sequence(lit(0), size(arr) - 2), j =>
        struct(element_at(arr, j + 1).as("l"),
          element_at(arr, j + 2).as("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))
  }

  /** Train `nMerges` BPE merges over a whitespace-pretokenized text
    * column. Returns the merge table in rank order; stops early if the
    * corpus runs out of co-occurring pairs. `checkpointEvery`
    * truncates the symbol frame's lineage (each merge stacks one
    * `replace` — fine for tens of merges, a 32k-merge production run
    * needs periodic truncation exactly like k01/pageRank). */
  def train(df: DataFrame, text: String, nMerges: Int,
            checkpointEvery: Int = 64): Seq[Merge] = {
    val words = df
      .select(explode(split(col(text), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("wcount"))
      // read 2× per merge (pair agg + rewrite): materialize once
      .localCheckpoint()
    var syms = words.select(charSyms(col("word")).as("sym"),
      col("wcount"))
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      val best = syms
        .select(explode(pairsOf(col("sym"))).as("p"), col("wcount"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("wcount")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += Merge(rank, l, r, l + r, c)
        syms = syms.withColumn("sym",
          call_function("replace", col("sym"), lit(s" $l  $r "),
            lit(s" $l$r ")))
        if (rank % checkpointEvery == 0) syms = syms.localCheckpoint()
        rank += 1
      }
    }
    merges.result()
  }

  /** [[train]] as a DataFrame (the gate/model-sink shape). */
  def trainDF(df: DataFrame, text: String, nMerges: Int): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    train(df, text, nMerges)
      .map(m => (m.rank, m.left, m.right, m.merged, m.pairCount))
      .toDF("rank", "left", "right", "merged", "pair_count")
  }

  /** Encode a text column with a trained merge table: every word's
    * character sequence is rewritten by the merges IN RANK ORDER (the
    * BPE apply contract — rank order, not best-pair-first, is the
    * standard fast encoder and matches how [[train]] built the table
    * on the training corpus itself). The merge table is model-sized
    * by contract, so it unrolls into a STATIC chain of `replace`
    * calls inside one per-word lambda — fully codegen'd, map-side,
    * zero shuffles, embarrassingly parallel at 100 TB. Merges never
    * cross word boundaries (`ws` separates words in the output).
    *
    * Emits `n_tokens_bpe` (INT) and `encoded` — words joined by
    * ` | `, each word its space-separated symbol sequence. */
  def encode(df: DataFrame, text: String, merges: Seq[Merge]): DataFrame = {
    val ordered = merges.sortBy(_.rank)
    def applyMerges(sym: Column): Column =
      ordered.foldLeft(sym) { (e, m) =>
        call_function("replace", e, lit(s" ${m.left}  ${m.right} "),
          lit(s" ${m.merged} "))
      }
    val encodedWords = transform(
      filter(split(col(text), " "), w => w =!= ""),
      w => call_function("replace", trim(applyMerges(charSyms(w))),
        lit("  "), lit(" ")))
    df.withColumn("_enc", encodedWords)
      .withColumn("n_tokens_bpe",
        aggregate(col("_enc"), lit(0), (acc, s) =>
          acc + size(split(s, " "))).cast("int"))
      .withColumn("encoded", array_join(col("_enc"), " | "))
      .drop("_enc")
  }

  /** The tokenizer vocabulary induced by a training corpus and its
    * merge table: base characters first (sorted, ids 0..C−1 — the
    * deterministic convention), then merged symbols in rank order
    * (ids C..C+N−1). Two different merges can yield the SAME merged
    * string (e.g. (a,bc) and (ab,c) both → "abc"); the duplicate keeps
    * its FIRST (minimum) id and later copies are dropped — so the
    * symbol→id map is well-defined and the SQL oracle's vocab join
    * (which applies the same min-id dedup) never fans out. Ids keep
    * their positional values (a dropped duplicate leaves a gap).
    * Alphabet-sized by contract — the only collect. */
  def vocab(df: DataFrame, text: String,
            merges: Seq[Merge]): Seq[(Int, String, String)] = {
    val chars = df
      .select(explode(split(col(text), "")).as("ch"))
      .filter(col("ch") =!= "" && col("ch") =!= " ")
      .distinct().collect().map(_.getString(0)).sorted
    val base = chars.zipWithIndex.map { case (c, i) => (i, c, "char") }
    val m = merges.sortBy(_.rank).zipWithIndex.map { case (mg, i) =>
      (chars.length + i, mg.merged, "merge") }
    val seen = scala.collection.mutable.HashSet[String]()
    (base ++ m).filter { case (_, sym, _) => seen.add(sym) }.toSeq
  }

  /** Tokenizer-feed-ready INTEGER id sequences: [[encode]] then map
    * every symbol through the model-sized vocabulary (a `typedLit`
    * map literal — broadcast-free, codegen'd, still zero shuffles).
    * Emitted EXPLODED as (id, pos, symbol, token_id) — the shape
    * sequence packers and feature stores consume; `pos` is the 0-based
    * symbol position with word boundaries elided. A symbol outside the
    * vocabulary (encoding a corpus the tokenizer never saw, with
    * characters outside the base set) yields a NULL token_id — the
    * caller's OOV policy owns it. */
  def encodeIds(df: DataFrame, id: String, text: String,
                merges: Seq[Merge],
                vocab: Seq[(Int, String, String)]): DataFrame = {
    val vmap = typedLit(vocab.map(v => v._2 -> v._1).toMap)
    encode(df, text, merges)
      .select(col(id), posexplode(filter(
        split(col("encoded"), " "), s => s =!= "|"))
        .as(Seq("pos", "symbol")))
      .withColumn("token_id", element_at(vmap, col("symbol")))
  }

  /** Tokenizer coverage report (b04): encode a corpus with a FROZEN
    * tokenizer and measure per-document out-of-vocabulary mass — the
    * standard "does my tokenizer cover this data" card run before
    * committing to a training mix (a vocabulary trained on English
    * prose meeting code or another script shows up here first). A
    * symbol is OOV iff it maps to no vocabulary id (with character
    * fallback that means characters the training corpus never saw).
    * One map-side encode + one doc-keyed agg. */
  def coverageReport(df: DataFrame, id: String, text: String,
                     merges: Seq[Merge],
                     vocab: Seq[(Int, String, String)]): DataFrame =
    encodeIds(df, id, text, merges, vocab)
      .groupBy(col(id))
      .agg(count(lit(1)).cast("long").as("n_tokens_bpe"),
        sum(when(col("token_id").isNull, 1).otherwise(0)).cast("long")
          .as("n_oov"))
      .withColumn("oov_ratio",
        round(col("n_oov") / col("n_tokens_bpe"), 6))
}
