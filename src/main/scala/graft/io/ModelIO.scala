package graft.io

import java.nio.file.{Files, Paths}

import graft.gen.GrasyndaModel
import graft.stats.GarchFit

/** S5: statistical-model artifact persistence — flat JSON files, the
  * shape the reference uses for regime/statistical models
  * (regime_conditional.py:188-195; SURVEY §1.1). Driver-resident
  * models are small (K×K matrices + pools); Jackson (already on the
  * Spark classpath) handles the round-trip.
  */
object ModelIO {
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }

  def saveGrasynda(model: GrasyndaModel, path: String): Unit = {
    val json = mapper.createObjectNode()
    json.set[com.fasterxml.jackson.databind.JsonNode]("interior_edges",
      mapper.valueToTree(model.interiorEdges))
    json.set[com.fasterxml.jackson.databind.JsonNode]("transition",
      mapper.valueToTree(model.transition))
    json.set[com.fasterxml.jackson.databind.JsonNode]("pools",
      mapper.valueToTree(model.pools.map { case (k, v) => k.toString -> v }))
    json.set[com.fasterxml.jackson.databind.JsonNode]("start_probs",
      mapper.valueToTree(model.startProbs))
    Files.writeString(Paths.get(path), mapper.writeValueAsString(json))
  }

  def loadGrasynda(path: String): GrasyndaModel = {
    val n = mapper.readTree(Files.readString(Paths.get(path)))
    def arr(node: com.fasterxml.jackson.databind.JsonNode): Array[Double] = {
      val it = node.elements(); val b = Array.newBuilder[Double]
      while (it.hasNext) b += it.next().asDouble()
      b.result()
    }
    def mat(node: com.fasterxml.jackson.databind.JsonNode): Array[Array[Double]] = {
      val it = node.elements(); val b = Array.newBuilder[Array[Double]]
      while (it.hasNext) b += arr(it.next())
      b.result()
    }
    val pools = {
      val f = n.get("pools").fields()
      val b = Map.newBuilder[Int, Array[Double]]
      while (f.hasNext) { val e = f.next(); b += e.getKey.toInt -> arr(e.getValue) }
      b.result()
    }
    GrasyndaModel(arr(n.get("interior_edges")), mat(n.get("transition")),
      pools, arr(n.get("start_probs")))
  }

  def saveRegime(model: graft.gen.RegimeModel, path: String): Unit = {
    val m = Map(
      "n_regimes" -> model.nRegimes,
      "transition_matrix" -> model.transition,
      "start_probs" -> model.startProbs,
      "regime_params" -> model.params.map(p => Map(
        "mean" -> p.mean, "std" -> p.std, "skew" -> p.skew,
        "ar1" -> p.ar1, "count" -> p.count)),
      "garch" -> model.garch.map(_.map(g => Map(
        "omega" -> g.omega, "alpha" -> g.alpha, "beta" -> g.beta,
        "long_run_var" -> g.longRunVar, "log_lik" -> g.logLik))).orNull,
      // reference to_dict fields (regime_conditional.py:34-46) — makes the
      // artifact a superset of the reference checkpoint, so a loaded model
      // can re-run HMM labeling on new data
      "feature_means" -> model.featureMeans,
      "feature_stds" -> model.featureStds,
      "hmm_means" -> model.hmmMeans,
      "hmm_covars" -> model.hmmCovars,
      "data_mean" -> model.dataMean,
      "data_std" -> model.dataStd)
    Files.writeString(Paths.get(path), mapper.writeValueAsString(m))
  }

  def loadRegime(path: String): graft.gen.RegimeModel = {
    val n = mapper.readTree(Files.readString(Paths.get(path)))
    def arr(node: com.fasterxml.jackson.databind.JsonNode): Array[Double] = {
      val it = node.elements(); val b = Array.newBuilder[Double]
      while (it.hasNext) b += it.next().asDouble()
      b.result()
    }
    def mat(node: com.fasterxml.jackson.databind.JsonNode): Array[Array[Double]] = {
      val it = node.elements(); val b = Array.newBuilder[Array[Double]]
      while (it.hasNext) b += arr(it.next())
      b.result()
    }
    val params = {
      val it = n.get("regime_params").elements()
      val b = Array.newBuilder[graft.gen.RegimeParams]
      while (it.hasNext) {
        val p = it.next()
        b += graft.gen.RegimeParams(p.get("mean").asDouble(), p.get("std").asDouble(),
          p.get("skew").asDouble(), p.get("ar1").asDouble(), p.get("count").asLong())
      }
      b.result()
    }
    val garch =
      if (n.get("garch") == null || n.get("garch").isNull) None
      else Some {
        val it = n.get("garch").elements()
        val b = Array.newBuilder[GarchFit]
        while (it.hasNext) {
          val g = it.next()
          b += GarchFit(g.get("omega").asDouble(), g.get("alpha").asDouble(),
            g.get("beta").asDouble(), g.get("long_run_var").asDouble(),
            g.get("log_lik").asDouble())
        }
        b.result()
      }
    def optArr(key: String): Array[Double] =
      if (n.get(key) == null || n.get(key).isNull) Array.empty else arr(n.get(key))
    def optMat(key: String): Array[Array[Double]] =
      if (n.get(key) == null || n.get(key).isNull) Array.empty else mat(n.get(key))
    def optDbl(key: String, dflt: Double): Double =
      if (n.get(key) == null || n.get(key).isNull) dflt else n.get(key).asDouble()
    graft.gen.RegimeModel(n.get("n_regimes").asInt(),
      mat(n.get("transition_matrix")), arr(n.get("start_probs")), params, garch,
      featureMeans = optArr("feature_means"), featureStds = optArr("feature_stds"),
      hmmMeans = optMat("hmm_means"), hmmCovars = optMat("hmm_covars"),
      dataMean = optDbl("data_mean", 0.0), dataStd = optDbl("data_std", 1.0))
  }

  def saveGarch(fit: GarchFit, path: String): Unit =
    Files.writeString(Paths.get(path), mapper.writeValueAsString(
      Map("omega" -> fit.omega, "alpha" -> fit.alpha, "beta" -> fit.beta,
        "long_run_var" -> fit.longRunVar, "log_lik" -> fit.logLik)))

  /** S5: TimeGAN artifact — generator/supervisor/recovery SeqNets +
    * normalization meta (the flat-JSON analogue of the reference's
    * model dir of .keras files + meta.json, timegan_generator.py:167-186). */
  def saveTimeGan(m: graft.gen.TimeGanModel, path: String): Unit = {
    def layer(g: graft.gen.GruLayer) = Map(
      "wz" -> g.wz, "uz" -> g.uz, "bz" -> g.bz,
      "wr" -> g.wr, "ur" -> g.ur, "br" -> g.br,
      "wh" -> g.wh, "uh" -> g.uh, "bh" -> g.bh)
    def net(n: graft.gen.SeqNet) = Map(
      "layers" -> n.layers.map(layer), // n_layers GRU stack, in order
      "dw" -> n.dw, "db" -> n.db, "sigmoid" -> n.sigmoidHead)
    Files.writeString(Paths.get(path), mapper.writeValueAsString(Map(
      "generator" -> net(m.generator), "supervisor" -> net(m.supervisor),
      "recovery" -> net(m.recovery),
      "n_layers" -> m.generator.layers.length,
      "window_size" -> m.windowSize, "latent_dim" -> m.latentDim,
      "data_min" -> m.dataMin, "data_range" -> m.dataRange)))
  }

  def loadTimeGan(path: String): graft.gen.TimeGanModel = {
    val n = mapper.readTree(Files.readString(Paths.get(path)))
    def arr(node: com.fasterxml.jackson.databind.JsonNode): Array[Double] = {
      val it = node.elements(); val b = Array.newBuilder[Double]
      while (it.hasNext) b += it.next().asDouble()
      b.result()
    }
    def mat(node: com.fasterxml.jackson.databind.JsonNode): Array[Array[Double]] = {
      val it = node.elements(); val b = Array.newBuilder[Array[Double]]
      while (it.hasNext) b += arr(it.next())
      b.result()
    }
    def layer(x: com.fasterxml.jackson.databind.JsonNode): graft.gen.GruLayer =
      graft.gen.GruLayer(
        mat(x.get("wz")), mat(x.get("uz")), arr(x.get("bz")),
        mat(x.get("wr")), mat(x.get("ur")), arr(x.get("br")),
        mat(x.get("wh")), mat(x.get("uh")), arr(x.get("bh")))
    def net(key: String): graft.gen.SeqNet = {
      val x = n.get(key)
      val it = x.get("layers").elements()
      val b = Seq.newBuilder[graft.gen.GruLayer]
      while (it.hasNext) b += layer(it.next())
      graft.gen.SeqNet(
        b.result(),
        mat(x.get("dw")), arr(x.get("db")), x.get("sigmoid").asBoolean())
    }
    graft.gen.TimeGanModel(net("generator"), net("supervisor"), net("recovery"),
      n.get("window_size").asInt(), n.get("latent_dim").asInt(),
      n.get("data_min").asDouble(), n.get("data_range").asDouble())
  }

  /** S5: MLP decoder weights (the VAE/VAE-GAN training artifact the G1
    * inference generator consumes — the flat-JSON analogue of the
    * reference's `.parts/decoder.keras`, vae_gan_trainer.py:318-340). */
  def saveMlp(dec: graft.gen.MlpDecoder, path: String): Unit =
    Files.writeString(Paths.get(path), mapper.writeValueAsString(Map(
      "weights" -> dec.weights, "biases" -> dec.biases,
      "activation" -> dec.activation,
      "layer_activations" -> dec.layerActivations)))

  def loadMlp(path: String): graft.gen.MlpDecoder = {
    val n = mapper.readTree(Files.readString(Paths.get(path)))
    def arr(node: com.fasterxml.jackson.databind.JsonNode): Array[Double] = {
      val it = node.elements(); val b = Array.newBuilder[Double]
      while (it.hasNext) b += it.next().asDouble()
      b.result()
    }
    def mat(node: com.fasterxml.jackson.databind.JsonNode): Array[Array[Double]] = {
      val it = node.elements(); val b = Array.newBuilder[Array[Double]]
      while (it.hasNext) b += arr(it.next())
      b.result()
    }
    def cube(node: com.fasterxml.jackson.databind.JsonNode): Array[Array[Array[Double]]] = {
      val it = node.elements(); val b = Array.newBuilder[Array[Array[Double]]]
      while (it.hasNext) b += mat(it.next())
      b.result()
    }
    val las =
      if (n.has("layer_activations") && n.get("layer_activations").size() > 0) {
        val it = n.get("layer_activations").elements()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().asText()
        b.result()
      } else Nil
    graft.gen.MlpDecoder(cube(n.get("weights")), mat(n.get("biases")),
      n.get("activation").asText(), las)
  }

  def loadGarch(path: String): GarchFit = {
    val n = mapper.readTree(Files.readString(Paths.get(path)))
    GarchFit(n.get("omega").asDouble(), n.get("alpha").asDouble(),
      n.get("beta").asDouble(), n.get("long_run_var").asDouble(),
      n.get("log_lik").asDouble())
  }
}
