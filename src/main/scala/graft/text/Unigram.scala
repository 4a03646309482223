package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenization (b08) — the OTHER major subword
  * family next to BPE (sentencepiece's default model; Kudo 2018,
  * "Subword Regularization"): pieces carry log-probabilities and every
  * word takes its VITERBI-best segmentation (maximum total log-prob,
  * ties broken toward FEWER pieces — the deterministic total order
  * both engines replay). This is the frequency-seeded single-pass
  * distillation of Kudo's EM+prune loop, the
  * [[QualityFilterModel]]/[[LangIdTrigramModel]] pattern applied to a
  * tokenizer: the piece inventory is the corpus's top-K most frequent
  * substrings (every single character is always kept, so segmentation
  * is total — no OOV on the training corpus; unseen characters take a
  * frozen penalty), p(piece) = cnt/Σcnt over the selected inventory,
  * and log-probs are ROUNDED TO 6 DECIMALS so the Spark DP and the
  * DuckDB oracle DP add bit-identical doubles in the same order.
  *
  * Scale shape: training is one word-count agg (map-side combinable)
  * plus a substring explode over the DISTINCT-WORD frame (bounded by
  * vocabulary, not corpus) and a bounded top-K take
  * (TakeOrderedAndProject — never a global rank window); the model is
  * model-sized by contract (the only collect). Encoding is one
  * stateless mapPartitions pass with the broadcast piece map and a
  * per-task word cache — zero shuffles, embarrassingly parallel at
  * 100 TB, applies unchanged to a stream. */
object Unigram {

  /** Longest candidate piece — bounds the DP fan-in (4 candidates per
    * position) and the substring explode (≤4 pieces per start). */
  val MaxPieceLen = 4

  /** Frozen log-prob for a character the training corpus never saw
    * (cannot fire on the training corpus itself — every char is in
    * the inventory by construction). */
  val OovLogp = -30.0

  final case class Piece(piece: String, cnt: Long, logp6: Double)

  /** The distributed piece selection, exposed for the plan audit:
    * top `topK` multi-char substrings by (cnt DESC, piece ASC) — the
    * cut runs as `orderBy(...).limit(topK)`, which Catalyst compiles
    * to TakeOrderedAndProject (a per-partition bounded heap + driver
    * merge of ≤topK rows per partition, the t31/q03 top-k shape), so
    * the FULL substring-candidate frame (every ≤[[MaxPieceLen]]
    * substring of every distinct word — billions of rows on a web
    * corpus) never funnels through one unpartitioned window task —
    * unioned with ALL single characters (alphabet-bounded). */
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
      .select(col("w").substr(col("i"), col("l")).as("piece"), col("c"))
      .groupBy(col("piece")).agg(sum(col("c")).as("cnt"))
    val multi = pieces.filter(length(col("piece")) >= 2)
      .orderBy(col("cnt").desc, col("piece")).limit(topK)
      .select(col("piece"), col("cnt"))
    multi.unionByName(pieces.filter(length(col("piece")) === 1))
  }

  /** Fit the piece inventory: all substrings of length 1..MaxPieceLen
    * of the corpus's words, weighted by word frequency (every start
    * position counts), top `topK` multi-char pieces by
    * (cnt DESC, piece ASC) plus ALL single characters; log-probs from
    * relative counts over the selected set, 6-rounded. */
  def trainPieces(df: DataFrame, text: String,
                  topK: Int = 64): Seq[Piece] = {
    val selected = selectedPieces(df, text, topK)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1)
    val total = selected.map(_._2).sum.toDouble
    selected.toSeq.map { case (p, c) =>
      Piece(p, c, r6(math.log(c / total)))
    }
  }

  /** [[trainPieces]] as a DataFrame (gate/model-sink shape). */
  def trainPiecesDF(df: DataFrame, text: String,
                    topK: Int = 64): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    trainPieces(df, text, topK)
      .map(p => (p.piece, p.cnt, p.logp6))
      .toDF("piece", "cnt", "logp6")
  }

  /** Viterbi-segment one word against a piece→logp6 map: DP over
    * CODEPOINT positions (surrogate pairs whole, like Spark/DuckDB
    * substr), state = (score, −pieces) compared lexicographically —
    * max score, then fewer pieces; single characters missing from the
    * inventory take [[OovLogp]]. Returns (score, nPieces). Both
    * engines add the same 6-rounded doubles in the same order, so the
    * scores are bit-identical. */
  private[text] def segmentWord(word: String,
      lp: java.util.HashMap[String, java.lang.Double])
      : (Double, Int) = {
    val n = word.codePointCount(0, word.length)
    val offs = new Array[Int](n + 1)
    var o = 0
    var i = 0
    while (i < n) { offs(i) = o
      o += Character.charCount(word.codePointAt(o)); i += 1 }
    offs(n) = word.length
    val score = new Array[Double](n + 1)
    val np = new Array[Int](n + 1)
    i = 1
    while (i <= n) {
      var bestS = Double.NegativeInfinity
      var bestN = Int.MaxValue
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        val piece = word.substring(offs(j), offs(i))
        val w = lp.get(piece)
        val cand: java.lang.Double =
          if (w != null) w
          else if (i - j == 1) java.lang.Double.valueOf(OovLogp)
          else null
        if (cand != null) {
          val s = score(j) + cand.doubleValue()
          val m = np(j) + 1
          if (s > bestS || (s == bestS && m < bestN)) {
            bestS = s; bestN = m
          }
        }
        j += 1
      }
      score(i) = bestS
      np(i) = bestN
      i += 1
    }
    (score(n), np(n))
  }

  /** Encode: per-doc Viterbi totals — `n_words`, `n_pieces` (sum of
    * per-word best piece counts) and `logprob` (6-rounded sum of
    * per-word best scores). Map-side, zero shuffles, stateless. */
  def encodeViterbi(df: DataFrame, text: String,
                    pieces: Seq[Piece]): DataFrame = {
    val spark = df.sparkSession
    val lpMap = new java.util.HashMap[String, java.lang.Double](
      math.max(16, pieces.size * 2))
    pieces.foreach(p => lpMap.put(p.piece, p.logp6))
    val bc = spark.sparkContext.broadcast(lpMap)
    val ti = df.schema.fieldIndex(text)
    val outSchema = df.schema
      .add("n_words", org.apache.spark.sql.types.LongType)
      .add("n_pieces", org.apache.spark.sql.types.LongType)
      .add("logprob", org.apache.spark.sql.types.DoubleType)
    df.mapPartitions { rows =>
      val lp = bc.value
      val cache = new java.util.HashMap[String, (Double, Int)](1 << 12)
      rows.map { row =>
        val t = row.getString(ti)
        val words =
          if (t == null) Array.empty[String]
          else t.split(" ").filter(_.nonEmpty)
        var nw = 0L
        var npc = 0L
        var s = 0.0
        words.foreach { w =>
          var r = cache.get(w)
          if (r == null) {
            r = segmentWord(w, lp)
            if (cache.size >= 100000) cache.clear()
            cache.put(w, r)
          }
          nw += 1L; npc += r._2.toLong; s += r._1
        }
        org.apache.spark.sql.Row.fromSeq(
          row.toSeq :+ nw :+ npc :+ r6(s))
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  private def r6(v: Double): Double =
    new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
