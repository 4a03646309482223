package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WordPiece subword tokenization (b09) — the third major subword
  * family next to BPE ([[Bpe]]) and unigram-LM ([[Unigram]]): BERT's
  * tokenizer (Wu et al. 2016; Devlin et al. 2018). Pieces come in two
  * forms — word-INITIAL and ##-marked CONTINUATION — and every word is
  * segmented greedily longest-match-first; if no piece matches at any
  * position (or the word exceeds [[MaxWordLen]] chars), the WHOLE word
  * becomes a single [UNK] — BERT's exact is_bad semantics. All outputs
  * are integers (piece/UNK counts), so engine↔oracle parity is exact
  * by construction with no float rounding contract at all.
  *
  * Inventory, in the [[Unigram.trainPieces]] mold: positioned
  * substrings of the corpus's words (start=1 → initial, start>1 →
  * continuation), weighted by word frequency; top `topK` multi-char
  * pieces by (cnt DESC, marked-piece ASC) plus ALL single characters
  * in both forms — so segmentation is total on the training corpus and
  * [UNK] fires exactly on characters the corpus never saw.
  *
  * Scale shape: training is one word-count agg plus a substring
  * explode over the DISTINCT-WORD frame (vocabulary-bounded, not
  * corpus-bounded) and a bounded top-K take (TakeOrderedAndProject —
  * never a global rank window); the model is model-sized by
  * contract (the only collect). Encoding is a stateless mapPartitions
  * pass with the broadcast piece set and a per-task word cache — zero
  * shuffles, embarrassingly parallel, applies unchanged to a stream. */
object WordPiece {

  /** Longest candidate piece (chars) — same DP fan-in bound as
    * [[Unigram.MaxPieceLen]]. */
  val MaxPieceLen = 4

  /** BERT's max_input_chars_per_word, scaled to this corpus: longer
    * words are [UNK] without scanning (also bounds the oracle's
    * greedy unroll depth). */
  val MaxWordLen = 12

  final case class Piece(core: String, isCont: Boolean, cnt: Long)

  /** The distributed piece selection, exposed for the plan audit:
    * top `topK` multi-char positioned substrings by
    * (cnt DESC, marked-piece ASC) — the cut runs as
    * `orderBy(...).limit(topK)`, which Catalyst compiles to
    * TakeOrderedAndProject (per-partition bounded heap + driver merge,
    * the t31/[[Unigram.selectedPieces]] shape), so the full
    * substring-candidate frame never funnels through one unpartitioned
    * rank-window task — unioned with ALL single characters in both
    * forms (alphabet-bounded). */
  private[graft] def selectedPieces(df: DataFrame, text: String,
                                   topK: Int): DataFrame = {
    val words = df
      .select(explode(split(col(text), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pieces = words
      .select(col("w"), col("c"),
        explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("w"), col("c"), col("i"),
        explode(sequence(lit(1),
          least(lit(MaxPieceLen), length(col("w")) - col("i") + 1)))
          .as("l"))
      .select(col("w").substr(col("i"), col("l")).as("core"),
        (col("i") > 1).as("is_cont"), col("c"))
      .groupBy(col("core"), col("is_cont"))
      .agg(sum(col("c")).as("cnt"))
      .withColumn("marked",
        when(col("is_cont"), concat(lit("##"), col("core")))
          .otherwise(col("core")))
    val multi = pieces.filter(length(col("core")) >= 2)
      .orderBy(col("cnt").desc, col("marked")).limit(topK)
      .select(col("core"), col("is_cont"), col("cnt"))
    multi.unionByName(pieces.filter(length(col("core")) === 1)
      .select(col("core"), col("is_cont"), col("cnt")))
  }

  /** Fit the piece inventory (see object doc). */
  def trainPieces(df: DataFrame, text: String,
                  topK: Int = 64): Seq[Piece] = {
    selectedPieces(df, text, topK)
      .collect()
      .map(r => Piece(r.getString(0), r.getBoolean(1), r.getLong(2)))
      .sortBy(p => (p.core, p.isCont))
      .toSeq
  }

  /** [[trainPieces]] as a DataFrame (gate/model-sink shape). */
  def trainPiecesDF(df: DataFrame, text: String,
                    topK: Int = 64): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    trainPieces(df, text, topK)
      .map(p => (p.core, p.isCont, p.cnt))
      .toDF("core", "is_cont", "cnt")
  }

  /** Greedy longest-match-first segmentation of one word over
    * CODEPOINT positions (surrogate pairs whole, like Spark/DuckDB
    * substr). Returns (nPieces, isUnk): [UNK] → (1, true). */
  private[text] def segmentWord(word: String,
      initial: java.util.HashSet[String],
      cont: java.util.HashSet[String]): (Int, Boolean) = {
    val n = word.codePointCount(0, word.length)
    if (n > MaxWordLen) return (1, true)
    val offs = new Array[Int](n + 1)
    var o = 0
    var i = 0
    while (i < n) { offs(i) = o
      o += Character.charCount(word.codePointAt(o)); i += 1 }
    offs(n) = word.length
    var pos = 0
    var np = 0
    while (pos < n) {
      val set = if (pos == 0) initial else cont
      var l = math.min(MaxPieceLen, n - pos)
      var matched = 0
      while (l >= 1 && matched == 0) {
        if (set.contains(word.substring(offs(pos), offs(pos + l))))
          matched = l
        else l -= 1
      }
      if (matched == 0) return (1, true)
      pos += matched
      np += 1
    }
    (np, false)
  }

  /** Encode: per-doc greedy totals — `n_words`, `n_pieces` ([UNK]
    * words count 1) and `n_unk`. Map-side, zero shuffles, stateless. */
  def encode(df: DataFrame, text: String,
             pieces: Seq[Piece]): DataFrame = {
    val spark = df.sparkSession
    val initial = new java.util.HashSet[String]()
    val cont = new java.util.HashSet[String]()
    pieces.foreach(p => (if (p.isCont) cont else initial).add(p.core))
    val bc = spark.sparkContext.broadcast((initial, cont))
    val ti = df.schema.fieldIndex(text)
    val outSchema = df.schema
      .add("n_words", org.apache.spark.sql.types.LongType)
      .add("n_pieces", org.apache.spark.sql.types.LongType)
      .add("n_unk", org.apache.spark.sql.types.LongType)
    df.mapPartitions { rows =>
      val (ini, con) = bc.value
      val cache = new java.util.HashMap[String, (Int, Boolean)](1 << 12)
      rows.map { row =>
        val t = row.getString(ti)
        val words =
          if (t == null) Array.empty[String]
          else t.split(" ").filter(_.nonEmpty)
        var nw = 0L
        var np = 0L
        var nu = 0L
        words.foreach { w =>
          var r = cache.get(w)
          if (r == null) {
            r = segmentWord(w, ini, con)
            if (cache.size >= 100000) cache.clear()
            cache.put(w, r)
          }
          nw += 1L
          np += r._1.toLong
          if (r._2) nu += 1L
        }
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ nw :+ np :+ nu)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
