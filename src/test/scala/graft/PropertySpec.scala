package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.gen.{ChangePoint, GruLayer}
import graft.stats.Adf

/** ScalaCheck property coverage for the pure algorithmic cores (the
  * Spark-side behaviors are covered by the oracle gate; these pin the
  * driver-side numerics' invariants across random inputs). */
class PropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(50), p)
    assert(res.passed, res.status.toString)
  }

  test("ADF MacKinnon p-value is monotone non-decreasing in tau") {
    check(Prop.forAll(Gen.choose(-19.0, 2.8), Gen.choose(-19.0, 2.8)) { (a, b) =>
      val lo = math.min(a, b); val hi = math.max(a, b)
      Adf.pValue(lo) <= Adf.pValue(hi) + 1e-12
    })
  }

  test("PELT: sorted breakpoints, min segment size, exact cover") {
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 200 + rnd.nextInt(400)
      val x = Array.tabulate(n) { i =>
        rnd.nextGaussian() * (if ((i / 100) % 2 == 0) 1.0 else 3.0)
      }
      val bk = ChangePoint.pelt(x, 3.0, 30, 5)
      val bounds = 0 +: bk.toSeq
      bk.last == n &&
        bk.sorted.sameElements(bk) &&
        bounds.sliding(2).forall { case Seq(a, b) => b - a >= 30 }
    })
  }

  test("ward: k clusters, labels renumbered by first appearance") {
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 6 + rnd.nextInt(15)
      val k = 1 + rnd.nextInt(math.min(5, n))
      val feats = Array.fill(n, 3)(rnd.nextGaussian())
      val labels = ChangePoint.ward(feats, k)
      val firstSeen = labels.distinct
      labels.length == n &&
        labels.distinct.length == k &&
        labels.forall(l => l >= 0 && l < k) &&
        // renumbered by smallest member => first appearances ascending
        firstSeen.sameElements(firstSeen.sorted)
    })
  }

  test("GRU hidden states are bounded by the tanh candidate range") {
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed)
      val g = GruLayer.random(3, 4, rnd)
      val seq = Array.fill(6, 3)(rnd.nextGaussian() * 2.0)
      // h' = (1-z)h + z*c with c = tanh(...) in [-1,1] and h0 = 0 =>
      // every hidden coordinate stays inside [-1, 1]
      g.run(seq).forall(_.forall(v => v >= -1.0 && v <= 1.0))
    })
  }

  test("GAN per-layer activations round-trip the S5 artifact") {
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed)
      val dec = graft.gen.MlpDecoder(
        Array(Array.fill(3, 2)(rnd.nextGaussian()), Array.fill(2, 3)(rnd.nextGaussian())),
        Array(Array.fill(3)(rnd.nextGaussian()), Array.fill(2)(rnd.nextGaussian())),
        activation = "lrelu", layerActivations = Seq("tanh"))
      val path = java.nio.file.Files.createTempFile("mlp", ".json").toString
      graft.io.ModelIO.saveMlp(dec, path)
      val loaded = graft.io.ModelIO.loadMlp(path)
      java.nio.file.Files.delete(java.nio.file.Paths.get(path))
      val z = Array.fill(2)(rnd.nextGaussian())
      loaded.layerActivations == dec.layerActivations &&
        loaded.forward(z).sameElements(dec.forward(z))
    })
  }

  test("salted partial top-k is lossless: top-k of per-bucket top-ks " +
       "equals the direct top-k under the (score desc, id) order") {
    // the t19 BM25 two-phase argument: anything outside its bucket's
    // top k is beaten by k same-bucket candidates and cannot be global
    // top-k. Scores draw from a small integer range so ties are COMMON
    // — the regime where a broken prune would actually diverge
    check(Prop.forAll(Gen.choose(0L, Long.MaxValue)) { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 1 + rnd.nextInt(300)
      val k = 1 + rnd.nextInt(8)
      val items = Seq.fill(n)(
        (rnd.nextInt(20).toDouble, rnd.nextInt(10000).toLong))
      val ord = Ordering.by[(Double, Long), (Double, Long)] {
        case (s, id) => (-s, id)
      }
      val direct = items.sorted(ord).take(k)
      val pruned = items.groupBy { case (_, id) => id % 64 }
        .values.flatMap(_.sorted(ord).take(k)).toSeq
      pruned.sorted(ord).take(k) == direct
    })
  }
}
