package graft

import graft.gen.{MlpDecoder, TimeGanModel}

/** Shared fixed-weight fixtures for the g06f/g08f forward-pass
  * witnesses: BOTH SparkEntry (which runs the real inference code over
  * these weights) and OracleSql (which embeds the same doubles as SQL
  * literals and recomputes the forward pass in DuckDB) read from here,
  * so the two sides can never drift. Double.toString round-trips
  * exactly, so the SQL literals are bit-identical to the JVM values.
  */
object WitnessFixtures {

  /** Tiny MLP decoder (4 → 6 tanh → 8 linear) for the G1 witness. */
  val G06Decoder: MlpDecoder =
    MlpDecoder.random(latentDim = 4, hidden = 6, windowSize = 8, seed = 11L)

  /** Fixed latent input for [[G06Decoder]]. */
  val G06Z: Array[Double] = {
    val rnd = new scala.util.Random(99L)
    Array.fill(4)(rnd.nextGaussian())
  }

  /** Tiny TimeGAN (window 4, latent 2, hidden 3) for the G8 witness:
    * generator GRU → supervisor GRU → recovery GRU + sigmoid head. */
  val G08Model: TimeGanModel =
    TimeGanModel.random(windowSize = 4, latentDim = 2, hidden = 3, seed = 13L)

  /** Fixed 4×2 latent window for [[G08Model]]. */
  val G08Z: Array[Array[Double]] = {
    val rnd = new scala.util.Random(77L)
    Array.fill(4)(Array.fill(2)(rnd.nextGaussian()))
  }
}
