package graft.cli

import java.nio.file.{Files, Paths}

/** Flat config with the reference's precedence: defaults ← JSON file ←
  * CLI overrides (app/config.py:3-138; app/main.py:19-38). Values kept
  * as strings at the edge, typed accessors at use sites. */
final case class GraftConfig(values: Map[String, String]) {
  def str(k: String): String = values(k)
  def strOpt(k: String): Option[String] = values.get(k)
  def int(k: String): Int = values(k).toInt
  def long(k: String): Long = values(k).toLong
  def double(k: String): Double = values(k).toDouble
  def bool(k: String): Boolean = values(k).toBoolean
  def ++(overrides: Map[String, String]): GraftConfig =
    GraftConfig(values ++ overrides)
}

object GraftConfig {

  /** Mirrors the reference's defaults that matter to the engine
    * (app/config.py: window_size 144, n_samples 1575, seed 42,
    * interval_hours 4, n_bins 10, block_size 30, n_regimes 4). */
  val defaults: GraftConfig = GraftConfig(Map(
    "mode" -> "generate",
    "generator" -> "block_bootstrap",
    "evaluator" -> "distribution",
    "optimizer" -> "random_sweep",
    "window_size" -> "144",
    "horizon" -> "1",
    "n_samples" -> "1575",
    "seed" -> "42",
    "interval_hours" -> "4",
    "n_bins" -> "10",
    "block_size" -> "30",
    "n_regimes" -> "4",
    "initial_price" -> "1.3",
    "epochs" -> "30",
    "n_layers" -> "3", // TimeGAN GRUs per net (timegan_generator.py:280)
    "conditional" -> "false",
    "threads" -> "4"))

  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def fromJsonFile(path: String): Map[String, String] = {
    val n = mapper.readTree(Files.readString(Paths.get(path)))
    val b = Map.newBuilder[String, String]
    val it = n.fields()
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText() }
    b.result()
  }

  def saveJson(cfg: GraftConfig, path: String): Unit =
    Files.writeString(Paths.get(path), mapper.writeValueAsString(cfg.values))

  /** Every flag any mode reads. A TYPO'D flag silently skipping its
    * stage is a correctness hazard in a data pipeline (a misspelled
    * `--semantic_threshold` would quietly drop the semantic-dedup
    * stage), so CLI args are validated against this list — JSON config
    * files are NOT (reference configs legitimately carry keys the
    * engine ignores). */
  val KnownFlags: Set[String] = Set(
    "load_config", "save_config", "mode", "generator", "evaluator",
    "optimizer", "window_size", "horizon", "n_samples", "seed", "seeds",
    "n_seeds", "interval_hours", "n_bins", "block_size", "block_sizes",
    "n_regimes", "initial_price", "epochs", "n_layers", "conditional",
    "threads", "input", "input_docs", "model", "output", "metrics_out",
    "sweep_out", "synthetic", "real", "real_train", "real_val",
    "real_test", "series_col", "doc_id_col", "text_col", "source_col",
    "n_configs", "max_iter", "tol_window", "ratios", "baseline_cache",
    "near_threshold", "semantic_threshold", "keep_best", "max_rep_ratio",
    "max_dup_ratio",
    "min_tokens", "gopher_min_stop", "langs", "benchmark_docs",
    "min_shared", "max_per_source", "mixture_target", "token_budget",
    "lm_ref_docs", "min_avg_logprob", "min_q_prob", "chunk_window",
    "chunk_stride", "split_salt", "pack_budget", "assign_topics",
    "train_topics", "topic_init", "incremental_from", "stage_timing",
    "max_dup_span", "cut_dup_spans", "cut_contaminated_spans",
    "domain_blocklist", "url_col", "line_filter", "min_line_words",
    "line_blocklist", "line_terminal", "cjk_segment", "html_strip",
    "nfc_normalize", "nfkc_normalize", "max_line_df", "train_bpe",
    "bpe_merges", "target_vocab", "reserved_tokens",
    "dedup_by_url", "min_flesch")

  /** `--key value` CLI args → overrides; `--load_config f.json` merges
    * the file first (CLI still wins — reference precedence). Unknown
    * CLI flags fail fast with the closest known flag. */
  def resolve(args: Array[String]): GraftConfig = {
    val cli = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val unknown = cli.keys.filterNot(KnownFlags)
    require(unknown.isEmpty, {
      def dist(a: String, b: String): Int = { // small Levenshtein
        val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
          if (i == 0) j else if (j == 0) i else 0)
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      unknown.map { k =>
        val near = KnownFlags.minBy(dist(k, _))
        s"unknown flag --$k (did you mean --$near?)"
      }.mkString("; ")
    })
    val fromFile = cli.get("load_config")
      .map(fromJsonFile).getOrElse(Map.empty)
    defaults ++ fromFile ++ cli
  }
}
