package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Hand-computed fixtures for the line-granularity curation ops:
  * C4-style per-line quality filtering (t24) and cross-document
  * repeated-line (boilerplate) removal (t25), plus their plan
  * contracts and streaming twins. */
class LineOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  test("charEntropy: known closed-form entropies, zeros and uniforms") {
    val df = Seq(
      (1L, "aaaa"),     // single symbol: H = 0
      (2L, "abab"),     // two equiprobable: H = ln 2
      (3L, "abcd"),     // four equiprobable: H = ln 4
      (4L, ""),         // empty: dropped
      (5L, "aab")       // 2/3,1/3: H = ln3 - (2 ln2)/3
    ).toDF("doc_id", "text")
    val out = TextOps.charEntropy(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.length === 4) // empty doc dropped
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(1L).getAs[Double]("entropy") === 0.0)
    assert(byId(1L).getAs[Long]("n_uniq") === 1L)
    assert(math.abs(byId(2L).getAs[Double]("entropy") - math.log(2)) < 1e-6)
    assert(math.abs(byId(3L).getAs[Double]("entropy") - math.log(4)) < 1e-6)
    assert(byId(3L).getAs[Long]("n_uniq") === 4L)
    val h5 = math.log(3) - 2.0 * math.log(2) / 3.0
    assert(math.abs(byId(5L).getAs[Double]("entropy") - h5) < 1e-6)
    assert(byId(5L).getAs[Long]("n_chars_h") === 3L)
  }

  test("charEntropy plan: no exchange — the fold is a pure map") {
    val df = Seq((1L, "some text here")).toDF("doc_id", "text")
    val plan = TextOps.charEntropy(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("streaming t32 twin: char entropy applies directly to a stream " +
       "and matches batch") {
    val docs = graft.core.Tables.documents(spark, SparkSpec.sfDir)
      .select("doc_id", "text")
    val batch = TextOps.charEntropy(docs, "doc_id", "text")
      .select("doc_id", "n_chars_h", "n_uniq", "entropy")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val tmp = java.nio.file.Files.createTempDirectory("graftent").toString
    docs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val buf = scala.collection.mutable.Map.empty[Long, (Long, Long, Long, Double)]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (b, _) => buf.synchronized {
        buf ++= b.select("doc_id", "n_chars_h", "n_uniq", "entropy")
          .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r)
      }
    val q = graft.streaming.StreamingScore.charEntropy(
        stream, "doc_id", "text")
      .writeStream.foreachBatch(sink).start()
    q.processAllAvailable(); q.stop()
    assert(buf.nonEmpty && buf.toMap === batch)
  }

  test("lineFilter: each C4 rule drops exactly the line built to trip it") {
    val body = Seq(
      "this sentence survives every rule.",   // kept
      "no terminal punctuation here",         // dropped: terminal
      "short.",                               // dropped: < 3 words
      "please enable javascript to continue.", // dropped: blocklist
      "we use a cookie banner.",              // dropped: blocklist
      "function f() { return 1; }",           // dropped: blocklist '{'
      "does this survive too?",               // kept: '?' terminal
      "he said \"stop\"").mkString("\n")      // kept: '"' terminal
    val out = TextOps.lineFilter(Seq((1L, body)).toDF("id", "body"),
        "id", "body")
      .select("id", "n_lines", "n_kept", "clean")
      .as[(Long, Int, Int, String)].collect().head
    assert(out._2 === 8 && out._3 === 3)
    assert(out._4 === Seq("this sentence survives every rule.",
      "does this survive too?", "he said \"stop\"").mkString("\n"))
  }

  test("lineFilter: single-line docs, fully-dropped docs, and rule toggles") {
    val df = Seq(
      (1L, "one good single line."),
      (2L, "all lines bad"),
      (3L, "x.\ny.")).toDF("id", "body")
    val strict = TextOps.lineFilter(df, "id", "body")
      .select("id", "n_lines", "n_kept", "clean")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(strict(0) === ((1L, 1, 1, "one good single line.")))
    assert(strict(1) === ((2L, 1, 0, "")), "doc survives emptied, not dropped")
    assert(strict(2) === ((3L, 2, 0, "")), "1-word lines fail minWords")
    val lax = TextOps.lineFilter(df, "id", "body", minWords = 1,
        requireTerminal = false, blocklist = Nil)
      .select("id", "n_kept").as[(Long, Int)].collect().sortBy(_._1)
    assert(lax.map(_._2).toSeq === Seq(1, 1, 2),
      "with every rule relaxed all lines survive")
  }

  test("lineFilter: the CJK terminal rule keeps 。！？…」-terminated " +
       "lines the Latin default drops, and still drops unterminated " +
       "ones") {
    val body = Seq(
      "这 个 句子 以 句号 结束 。",   // ideographic full stop
      "真 的 吗 ？",                  // full-width question mark
      "太 好 了 ！",                  // full-width exclamation
      "他 说 到 此 为 止 」",          // closing CJK quote
      "这 行 没有 标点 符号",          // dropped: no terminal
      "latin line still works.").mkString("\n")
    val df = Seq((1L, body)).toDF("id", "body")
    val latin = TextOps.lineFilter(df, "id", "body", blocklist = Nil)
      .select("n_kept").as[Int].head()
    assert(latin === 1, "the Latin default keeps only the latin line")
    val cjk = TextOps.lineFilter(df, "id", "body", blocklist = Nil,
        terminalRegex = TextOps.TerminalPunctCjk)
      .select("n_kept", "clean").as[(Int, String)].head()
    assert(cjk._1 === 5, "every terminated CJK line survives")
    assert(!cjk._2.contains("没有 标点"),
      "an unterminated CJK line still fails the gate")
  }

  test("langIdScript: each script class wins its own text, kana beats " +
       "kanji on mixed Japanese, ties break on class name, no letters " +
       "at all is unknown") {
    val df = Seq(
      (1L, "plain english text here"),
      (2L, "中文 文本 没有 假名"),               // pure Han → cjk
      (3L, "これは にほんご 日本"),              // kana-heavy + 2 kanji → jpn_kana
      (4L, "한국어 텍스트 입니다"),
      (5L, "русский текст без латиницы"),
      (6L, "نص عربي قصير"),
      (7L, "12345 !!! ???"),                     // no class chars → unknown
      (8L, "ab 汉字"),                           // 2 lat vs 2 cjk TIE → cjk (name asc)
      (9L, "हिंदी वाक्य की जाँच"),                 // Devanagari → dev
      (10L, "ελληνική πρόταση εδώ"),              // Greek → ell
      (11L, "משפט בעברית כאן"),                  // Hebrew → heb
      (12L, "ประโยคภาษาไทย")                     // Thai → tha
    ).toDF("id", "body")
    val got = graft.text.TextOps.langIdScript(df, "id", "body")
      .select("id", "script_guess").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(1L -> "lat", 2L -> "cjk", 3L -> "jpn_kana",
      4L -> "kor", 5L -> "cyr", 6L -> "ara", 7L -> "unknown",
      8L -> "cjk", 9L -> "dev", 10L -> "ell", 11L -> "heb",
      12L -> "tha"))
    // the ratio is the winning class's character share:
    // 'ab 汉字' = 5 chars, 2 of them cjk → 0.4
    val r = graft.text.TextOps.langIdScript(df, "id", "body")
      .filter(col("id") === 8L).select("script_ratio").as[Double].head()
    assert(r === 0.4)
  }

  test("cjkSegment: unsegmented Han/kana text char-tokenizes, latin " +
       "runs and hangul words survive intact, already-spaced text is " +
       "unchanged") {
    val df = Seq(
      (1L, "这是中文"),
      (2L, "mixed英文text"),
      (3L, "これは日本語"),
      (4L, "한국어 문장 유지"),
      (5L, "plain english words"),
      (6L, "已 经 分 词")).toDF("id", "body")
    val got = graft.text.TextOps.cjkSegmentFrame(df, "id", "body")
      .select("id", "segmented", "n_tokens")
      .as[(Long, String, Long)].collect().sortBy(_._1).toSeq
    assert(got(0) === ((1L, "这 是 中 文", 4L)))
    assert(got(1) === ((2L, "mixed 英 文 text", 4L)),
      "latin runs embedded in CJK survive as words")
    assert(got(2) === ((3L, "こ れ は 日 本 語", 6L)))
    assert(got(3) === ((4L, "한국어 문장 유지", 3L)),
      "hangul is NOT split — Korean carries real spaces")
    assert(got(4) === ((5L, "plain english words", 3L)))
    assert(got(5) === ((6L, "已 经 分 词", 4L)),
      "already-segmented text round-trips unchanged")
    // extension blocks: CJK Ext-A ideographs and HALFWIDTH katakana
    // (legacy ja encodings) segment like their main-block siblings
    val ext = graft.text.TextOps.cjkSegmentFrame(
        Seq((9L, "㐀㑇textｦﾝ")).toDF("id", "body"),
        "id", "body")
      .select("segmented", "n_tokens").as[(String, Long)].head()
    assert(ext === (("㐀 㑇 text ｦ ﾝ", 5L)))
    // the payoff: token ops see real tokens — q19 on the raw text
    // counts ONE token for doc 1, the segmented frame counts 4
    val raw = graft.text.TextOps.tokenStats(df.filter(col("id") === 1L),
      "id", "body").select("n_tokens").as[Long].head()
    assert(raw === 1L, "unsegmented CJK is one giant word to q19")
  }

  test("htmlStrip: script/style contents vanish, tags vanish, entities " +
       "decode single-pass (&amp;lt; stays &lt;), comments go, " +
       "malformed markup over-strips rather than leaks") {
    val df = Seq(
      (1L, "<p>hello <b>world</b></p>"),
      (2L, "<script>alert('x')</script>keep<style>a{b:c}</style>this"),
      (3L, "a &lt;tag&gt; &amp; &quot;q&quot; &#39;s&nbsp;end"),
      (4L, "&amp;lt; double-escaped stays literal"),
      (5L, "<!-- secret -->visible<!-- more\nlines -->"),
      (6L, "<SCRIPT TYPE=\"x\">UPPER\ncase</SCRIPT>ok"),
      (7L, "broken <tag never closes")).toDF("id", "body")
    val got = graft.text.TextOps.htmlStripFrame(df, "id", "body")
      .select("id", "clean").as[(Long, String)].collect()
      .sortBy(_._1).toSeq
    assert(got(0) === ((1L, "hello world")))
    assert(got(1) === ((2L, "keep this")),
      "script/style contents must vanish, surrounding prose survives")
    assert(got(2) === ((3L, "a <tag> & \"q\" 's end")))
    assert(got(3) === ((4L, "&lt; double-escaped stays literal")),
      "single-pass decode: &amp;lt; -> &lt; and STOPS")
    assert(got(4) === ((5L, "visible")))
    assert(got(5) === ((6L, "ok")), "case-insensitive, multiline script")
    assert(got(6) === ((7L, "broken")),
      "an unclosed tag over-strips to the end — never leaks markup")
  }

  test("nfcNormalize: decomposed forms converge on the composed ones " +
       "(so exact dedup sees them as twins), already-NFC text is " +
       "flagged unchanged, nulls pass through") {
    val composed = "café résumé"
    val decomposed = "café résumé"
    assert(composed != decomposed, "the fixture forms are byte-distinct")
    val df = Seq((1L, composed), (2L, decomposed), (3L, "plain"),
      (4L, null.asInstanceOf[String])).toDF("id", "body")
    val got = graft.text.TextOps.nfcNormalizeFrame(df, "id", "body")
      .select("id", "normalized", "changed")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(got(0) === ((1L, composed, 0)))
    assert(got(1) === ((2L, composed, 1)),
      "the decomposed twin converges and is flagged")
    assert(got(2) === ((3L, "plain", 0)))
    assert(got(3)._2 === null && got(3)._3 === 0)
    // the payoff: exact dedup now collapses the pair
    val norm = graft.text.TextOps.nfcNormalizeFrame(
        df.filter(col("id") <= 2L), "id", "body")
      .select(col("id"), col("normalized").as("body"))
    assert(norm.select("body").distinct().count() === 1L,
      "one distinct text after normalization — dedup sees twins")
  }

  test("nfkcNormalize (t29b): fullwidth latin/digits, fi/fl ligatures, " +
       "squared units and decomposed accents all collapse onto plain " +
       "twins; plain ascii is flagged unchanged; NFC alone leaves the " +
       "compatibility forms byte-distinct") {
    val df = Seq(
      (1L, "Ｇｒａｆｔ ５０％ faster"),
      (2L, "the ﬁrst ﬂoor"),
      (3L, "５㎞ in ㎡ units"),
      (4L, "cafe" + 0x301.toChar + " visit"),
      (5L, "plain ascii")).toDF("id", "body")
    val nfkc = graft.text.TextOps.nfcNormalizeFrame(
        df, "id", "body", form = "NFKC")
      .select("id", "normalized", "changed")
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(nfkc(0) === ((1L, "Graft 50% faster", 1)))
    assert(nfkc(1) === ((2L, "the first floor", 1)))
    assert(nfkc(2) === ((3L, "5km in m2 units", 1)),
      "squared units decompose recursively (m-squared -> m2)")
    assert(nfkc(3) === ((4L, "café visit", 1)),
      "NFKC includes the canonical composition step")
    assert(nfkc(4) === ((5L, "plain ascii", 0)))
    // NFC alone composes only the accent — every compatibility form
    // survives byte-distinct (the gap t29b exists to close)
    val nfc = graft.text.TextOps.nfcNormalizeFrame(df, "id", "body")
      .select("id", "changed").as[(Long, Int)]
      .collect().sortBy(_._1).map(_._2).toSeq
    assert(nfc === Seq(0, 0, 0, 1, 0))
  }

  test("dedupLines: corpus-frequent lines vanish everywhere, unique " +
       "prose survives in order; emptied docs stay in the funnel") {
    val boiler = "subscribe to our newsletter"
    val df = Seq(
      (1L, s"alpha prose one\n$boiler\nalpha prose two"),
      (2L, s"$boiler\nbeta prose"),
      (3L, s"gamma prose\n$boiler"),
      (4L, boiler)).toDF("id", "body")
    val out = TextOps.dedupLines(df, "id", "body", maxDf = 3)
      .select("id", "n_lines", "n_kept", "clean")
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) === ((1L, 3, 2, "alpha prose one\nalpha prose two")),
      "survivor order restored from line position")
    assert(out(1) === ((2L, 2, 1, "beta prose")))
    assert(out(2) === ((3L, 2, 1, "gamma prose")))
    assert(out(3) === ((4L, 1, 0, "")),
      "a doc that was ALL boilerplate still appears, emptied")
  }

  test("dedupLines: df counts DISTINCT docs (a line repeated inside one " +
       "doc is not boilerplate) and blank lines are never flagged") {
    val df = Seq(
      (1L, "echo line\necho line\necho line\nunique one"),
      (2L, "unique two\n\nunique three")).toDF("id", "body")
    val out = TextOps.dedupLines(df, "id", "body", maxDf = 2)
      .select("id", "n_kept", "clean")
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(out(0)._2 === 4, "in-doc repetition alone never flags a line")
    assert(out(1) === ((2L, 3, "unique two\n\nunique three")),
      "blank lines pass through verbatim")
  }

  test("dedupLinesBy: df counts within the collection — a line pooled " +
       "across tenants survives where the global op would kill it") {
    val global = "shared press release line"
    val footA = "tenant a footer"
    val df = Seq(
      (1L, "A", s"a one\n$footA\n$global"),
      (2L, "A", s"a two\n$footA\n$global"),
      (3L, "A", s"a three\n$footA"),
      (4L, "B", s"b one\n$global"),
      (5L, "B", s"b two\n$global")).toDF("id", "src", "body")
    val by = TextOps.dedupLinesBy(df, "id", "src", "body", maxDf = 3)
      .select("id", "n_kept", "clean")
      .as[(Long, Int, String)].collect().sortBy(_._1)
    assert(by(0) === ((1L, 2, s"a one\n$global")),
      "tenant A's df-3 footer goes; the cross-tenant line (df 2 in A) stays")
    assert(by(3) === ((4L, 2, s"b one\n$global")))
    val globalOp = TextOps.dedupLines(df, "id", "body", maxDf = 3)
      .select("id", "clean").as[(Long, String)].collect().sortBy(_._1)
    assert(!globalOp.exists(_._2.contains(global)),
      "the global op pools df across tenants (4 >= 3) and kills it")
  }

  test("t24 plan: lineFilter is map-side only — zero exchanges") {
    val df = graft.core.Tables.documents(spark, SparkSpec.sfDir)
      .select(col("doc_id"), concat_ws("\n", col("text"),
        lit("tail line.")).as("body"))
    val out = TextOps.lineFilter(df, "doc_id", "body")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"),
      s"line filter must not shuffle:\n$p")
    assert(p.contains("*("), "expected whole-stage codegen")
  }

  test("t25 plan: keyed aggs and one line-keyed anti-join — no " +
       "cartesian, no global single partition") {
    val q = SparkEntry.queries("t25_line_dedup")(spark, SparkSpec.sfDir)
    q.collect()
    val p = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("SinglePartition") || !p.contains("Window"),
      "no single-partition window stage in the line-dedup path")
  }

  test("streaming t24 twin: direct stream application matches batch " +
       "(stateless map)") {
    val docs = graft.core.Tables.documents(spark, SparkSpec.sfDir)
      .select(col("doc_id"), concat_ws("\n", col("text"),
        lit("enable javascript now"), lit("good closing line.")).as("body"))
    val tmp = java.nio.file.Files.createTempDirectory("graftlines").toString
    docs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val batch = TextOps.lineFilter(docs, "doc_id", "body")
      .select("doc_id", "n_lines", "n_kept", "clean")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    val streamed = graft.streaming.StreamingScore.lineFilter(
      stream, "doc_id", "body")
    val buf = scala.collection.mutable.Map.empty[Long,
      (Long, Int, Int, String)]
    val sink: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (b, _) => buf.synchronized {
        buf ++= b.as[(Long, Int, Int, String)].collect().map(r => r._1 -> r)
      }
    val q = streamed.select("doc_id", "n_lines", "n_kept", "clean")
      .writeStream.foreachBatch(sink).start()
    q.processAllAvailable(); q.stop()
    assert(buf.nonEmpty && buf.toMap === batch)
  }

  test("streaming t25 twin: arriving docs cleaned against the frozen " +
       "boilerplate frame match batch removeLines across micro-batches") {
    val docs = graft.core.Tables.documents(spark, SparkSpec.sfDir)
      .select(col("doc_id"), concat_ws("\n", col("text"),
        lit("all rights reserved"),
        concat(lit("doc "), col("doc_id"), lit(" unique line"))).as("body"))
    val refLines = TextOps.boilerplateLines(docs, "doc_id", "body",
      maxDf = 5).localCheckpoint()
    assert(refLines.count() === 1,
      "exactly the shared footer is boilerplate at maxDf=5")
    val batch = TextOps.removeLines(refLines, docs, "doc_id", "body")
      .select("doc_id", "n_lines", "n_kept", "clean")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    val tmp = java.nio.file.Files.createTempDirectory("graftlines2").toString
    docs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val buf = scala.collection.mutable.Map.empty[Long,
      (Long, Int, Int, String)]
    val q = graft.streaming.StreamingScore.dedupLinesAgainst(
        refLines, stream, "doc_id", "body") { b =>
      buf.synchronized { buf ++= b
        .select("doc_id", "n_lines", "n_kept", "clean")
        .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r) }
    }.start()
    q.processAllAvailable(); q.stop()
    assert(buf.nonEmpty && buf.toMap === batch)
    assert(batch.values.forall(_._3 == 2),
      "footer removed from every doc, prose + unique line survive")
  }

  test("langIdTrigram: held-out es/fr/pt sentences classify correctly, " +
       "scores are finite and 6-rounded, <3-char docs are dropped") {
    // none of these sentences appear in TrainLangIdTrigram's embedded
    // corpus — the six are the t30 gate fixture (held out by design),
    // the last three are fresh everyday-register prose
    val rows = Seq(
      (1L, "la reunión de vecinos se celebra el jueves por la noche en el salón del ayuntamiento", "es"),
      (2L, "le médecin m'a dit que je devais me reposer quelques jours et boire beaucoup d'eau", "fr"),
      (3L, "a reunião dos vizinhos realiza-se na quinta à noite no salão da junta", "pt"),
      (4L, "el médico me dijo que debía descansar unos días y beber mucha agua", "es"),
      (5L, "la réunion des voisins aura lieu jeudi soir dans la salle de la mairie", "fr"),
      (6L, "o médico disse-me que devia descansar uns dias e beber muita água", "pt"),
      (7L, "los niños juegan en el parque cuando hace buen tiempo por la tarde", "es"),
      (8L, "nous avons acheté du pain et du fromage au marché ce matin", "fr"),
      (9L, "as crianças brincam no parque quando faz bom tempo à tarde", "pt"))
    val df = rows.map(r => (r._1, r._2)).toDF("id", "body")
    val got = graft.text.TextOps.langIdTrigram(df, "id", "body")
      .select("id", "lang_guess", "n_grams",
        "score_es", "score_fr", "score_pt")
      .as[(Long, String, Long, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    assert(got.map(g => g._1 -> g._2) === rows.map(r => r._1 -> r._3))
    val bodyById = rows.map(r => r._1 -> r._2).toMap
    got.foreach { g =>
      assert(g._3 === bodyById(g._1).length.toLong - 2,
        "every overlapping trigram of the lowercased text is counted")
      Seq(g._4, g._5, g._6).foreach { s =>
        assert(!s.isNaN && !s.isInfinite)
        assert(s === math.rint(s * 1e6) / 1e6, s"score $s is 6-rounded")
      }
    }
    // documents shorter than 3 characters have no trigrams: dropped,
    // not emitted with a null/zero score row
    val short = graft.text.TextOps.langIdTrigram(
      Seq((1L, "ab"), (2L, ""), (3L, "sí")).toDF("id", "body"),
      "id", "body")
    assert(short.count() === 0L)
  }

  test("langIdTrigramFast: the zero-shuffle mapPartitions scorer " +
       "matches the batch explode+agg shape exactly (ids, guesses, " +
       "every r6 score), drops <3-char docs, and plans no Exchange") {
    val rows = Seq(
      (1L, "la reunión de vecinos se celebra el jueves por la noche en el salón del ayuntamiento"),
      (2L, "le médecin m'a dit que je devais me reposer quelques jours et boire beaucoup d'eau"),
      (3L, "a reunião dos vizinhos realiza-se na quinta à noite no salão da junta"),
      (4L, "nous avons acheté du pain et du fromage au marché ce matin"),
      (5L, "as crianças brincam no parque quando faz bom tempo à tarde"),
      (6L, "ab"),                                  // dropped: 2 chars
      (7L, "astral 😀😀 plane mixed prose here"))
    val df = rows.toDF("id", "body").repartition(4)
    def slurp(d: org.apache.spark.sql.DataFrame)
        : Seq[(Long, Long, Double, Double, Double, String)] = d
      .select("id", "n_grams", "score_es", "score_fr", "score_pt",
        "lang_guess")
      .as[(Long, Long, Double, Double, Double, String)]
      .collect().sortBy(_._1).toSeq
    val batch = slurp(graft.text.TextOps.langIdTrigram(df, "id", "body"))
    val fast = slurp(
      graft.text.TextOps.langIdTrigramFast(df, "id", "body"))
    assert(fast === batch,
      "per-doc local scoring replays the distributed agg bit-for-bit")
    assert(!batch.map(_._1).contains(6L))
    // plan over an un-repartitioned input: the scorer itself must
    // introduce no Exchange
    val q = graft.text.TextOps.langIdTrigramFast(
      rows.toDF("id", "body"), "id", "body")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!plan.contains("Exchange"),
      s"the fast scorer must not shuffle:\n$plan")
  }

  test("streaming t34/t35 twins: stateless per-doc passes match batch " +
       "across micro-batches") {
    val s = spark
    import s.implicits._
    val docs = graft.core.Tables.documents(spark, SparkSpec.sfDir)
      .select(col("doc_id"), concat_ws(". ", col("text"),
        lit("a closing sentence here")).as("body"))
    val tmp = java.nio.file.Files.createTempDirectory("graftwin").toString
    docs.repartition(4).write.mode("overwrite").parquet(tmp)
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(tmp)
    val batchW = TextOps.winnowFingerprints(docs, "doc_id", "body")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val batchR = TextOps.readability(docs, "doc_id", "body")
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val bufW = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long, Long, Long, Long, Long, Long)]
    val sinkW: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (b, _) => bufW.synchronized { bufW ++= b
        .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
        .collect().map(r => r._1 -> r) }
    val qw = graft.streaming.StreamingScore
      .winnowDigest(stream, "doc_id", "body")
      .writeStream.foreachBatch(sinkW).start()
    qw.processAllAvailable(); qw.stop()
    assert(bufW.nonEmpty && bufW.toMap === batchW)
    val bufR = scala.collection.mutable.Map
      .empty[Long, (Long, Long, Long, Long)]
    val sinkR: (org.apache.spark.sql.DataFrame, Long) => Unit =
      (b, _) => bufR.synchronized { bufR ++= b
        .as[(Long, Long, Long, Long)]
        .collect().map(r => r._1 -> r) }
    val qr = graft.streaming.StreamingScore
      .readability(stream, "doc_id", "body")
      .select(col("doc_id"), col("n_words"), col("n_sentences"),
        col("n_syllables"))
      .writeStream.foreachBatch(sinkR).start()
    qr.processAllAvailable(); qr.stop()
    assert(bufR.nonEmpty && bufR.toMap === batchR)
  }

  test("h64Jvm: the in-task hash equals the Column h64 on ascii, " +
       "multi-byte and astral inputs, across seeds") {
    val s = spark
    import s.implicits._
    val samples = Seq("abcdefgh", "汉字かな混じり", "emoji 😀 tail",
      " spaces  inside ", "ß-ligatures-ﬁ")
    val md = graft.text.Dedup.h64Hasher()
    for (seed <- Seq(0, 34, 1234)) {
      val viaCol = samples.toDF("s")
        .select(graft.text.Dedup.h64(col("s"), seed)).as[Long].collect()
      val viaJvm = samples.map(graft.text.Dedup.h64Jvm(md, _, seed))
      assert(viaCol.toSeq === viaJvm,
        s"JVM/Column h64 diverge at seed $seed")
    }
  }

  test("winnowContamination: a planted >= k+win-1 shared passage " +
       "pairs train and bench docs; disjoint docs never pair") {
    val s = spark
    import s.implicits._
    val passage = "the quick brown fox jumps over the lazy dog " * 2
    val train = Seq(
      (2L, s"training document alpha with $passage inside the middle"),
      (4L, "completely unrelated training text about database engines " +
        "and distributed shuffles and partition pruning strategies"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (1L, s"benchmark item beta contains $passage verbatim too"),
      (3L, "another benchmark question on astronomy orbits and comets"))
      .toDF("doc_id", "text")
    val got = TextOps.winnowContamination(train, bench, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSet
    assert(got.exists(p => p._1 == 2L && p._2 == 1L && p._3 >= 2L),
      s"the planted passage must pair (2,1): $got")
    assert(!got.exists(p => p._1 == 4L || p._2 == 3L),
      s"disjoint docs must not pair: $got")
  }

  test("winnowing: the MOSS guarantee — docs sharing a substring of " +
       "length ≥ k+w−1 share a fingerprint; density ≈ 2/(w+1); digest " +
       "agrees with the selection frame") {
    val s = spark
    import s.implicits._
    val shared = "identical stolen phrase here"  // 28 chars ≥ 11
    val rows = Seq(
      (1L, s"completely original opening text then $shared and an end"),
      (2L, s"$shared surrounded by otherwise different wording entirely"),
      (3L, "nothing in common with either of the other two documents"))
      .toDF("id", "body")
    val sel = TextOps.winnowSelections(rows, "id", "body")
      .select(col("id"), col("h")).collect()
      .groupBy(_.getLong(0)).map { case (k, v) =>
        k -> v.map(_.getLong(1)).toSet }
    assert((sel(1L) intersect sel(2L)).nonEmpty,
      "shared ≥11-char substring must contribute a shared fingerprint")
    // density: distinct positions selected per window ≈ 2/(w+1) = 0.4
    val dig = TextOps.winnowFingerprints(rows, "id", "body").collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_sel"), r.getAs[Long]("n_windows"))).toMap
    dig.values.foreach { case (nSel, nWin) =>
      val d = nSel.toDouble / nWin
      assert(d > 0.15 && d < 0.7, s"winnowing density out of band: $d")
    }
    // short doc (< k+w−1) yields no row
    val tiny = Seq((9L, "abcdefghij")).toDF("id", "body") // 10 < 11
    assert(TextOps.winnowFingerprints(tiny, "id", "body").count() === 0L)
  }

  test("readability: hand-counted Flesch/FK on a known sentence pair; " +
       "zero-word doc nulls the scores") {
    val s = spark
    import s.implicits._
    // "the cat sat. it ran away!" -> 2 sentences; words: the,cat,sat,
    // it,ran,away = 6; vowel runs: e,a,a,i,a,a,ay... count by hand:
    // the(1) cat(1) sat(1) it(1) ran(1) away(2: a, ay... 'away' =
    // a-w-a-y -> runs 'a','ay' = 2) -> 7 syllables
    val df = Seq((1L, "the cat sat. it ran away!"), (2L, "?!... --"))
      .toDF("id", "body")
    val r = TextOps.readability(df, "id", "body").collect()
      .map(x => x.getAs[Long]("id") -> x).toMap
    val a = r(1L)
    assert(a.getAs[Long]("n_words") === 6L)
    assert(a.getAs[Long]("n_sentences") === 2L)
    assert(a.getAs[Long]("n_syllables") === 7L)
    val wps = 6.0 / 2.0; val spw = 7.0 / 6.0
    assert(math.abs(a.getAs[Double]("flesch") -
      (206.835 - 1.015 * wps - 84.6 * spw)) < 1e-5)
    assert(math.abs(a.getAs[Double]("fk_grade") -
      (0.39 * wps + 11.8 * spw - 15.59)) < 1e-5)
    val b = r(2L)
    assert(b.getAs[Long]("n_words") === 0L)
    assert(b.isNullAt(b.fieldIndex("flesch")))
    assert(b.isNullAt(b.fieldIndex("fk_grade")))
  }

  test("ngram overlap: hand-computed bigram Jaccard/containment; " +
       "disjoint pair emits a zero row; within-group dups collapse") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("A", "a b c"),          // bigrams {a b, b c}
      ("A", "a b c"),          // duplicate doc: no new bigrams
      ("B", "a b x"),          // {a b, b x}
      ("C", "z z")             // {z z} — disjoint from A and B
    ).toDF("src", "body")
    val out = TextOps.ngramOverlapByGroup(df, "src", "body").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n_a") === 2L)
    assert(ab.getAs[Long]("n_b") === 2L)
    assert(ab.getAs[Long]("n_inter") === 1L)
    assert(math.abs(ab.getAs[Double]("jaccard") - 1.0 / 3.0) < 1e-6)
    assert(math.abs(ab.getAs[Double]("containment_a") - 0.5) < 1e-12)
    val ac = out(("A", "C"))
    assert(ac.getAs[Long]("n_inter") === 0L)
    assert(ac.getAs[Double]("jaccard") === 0.0)
    assert(out.size === 3) // AB, AC, BC — every unordered pair present
  }
}
