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

  /** `--key value` CLI args → overrides; `--load_config f.json` merges
    * the file first (CLI still wins — reference precedence). */
  def resolve(args: Array[String]): GraftConfig = {
    val cli = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val fromFile = cli.get("load_config")
      .map(fromJsonFile).getOrElse(Map.empty)
    defaults ++ fromFile ++ cli
  }
}
