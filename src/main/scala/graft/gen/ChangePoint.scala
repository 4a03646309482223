package graft.gen

/** Change-point detection (PELT) + ward agglomerative clustering —
  * the driver-side algorithmic core of G7 (SURVEY §2.9: "PELT =
  * dynamic program over cost; ward over ≤ hundreds of segments —
  * driver"). Bounded inputs by contract; the Spark side of G7 is the
  * return extraction and the reconstruction.
  */
object ChangePoint {

  /** PELT with a Gaussian (mean+variance) segment cost:
    * cost(seg) = n·ln(var(seg) + ε). The reference uses ruptures' rbf
    * kernel cost (regime_gan.py:42) — documented deviation: both
    * penalize heterogeneous segments; the Gaussian cost is the
    * standard closed-form choice and keeps detection deterministic.
    * `jump` evaluates candidate breakpoints on a stride grid,
    * `minSize` enforces minimum segment length. Returns breakpoint
    * END indices (exclusive), last = n.
    */
  def pelt(x: Array[Double], penalty: Double, minSize: Int = 30,
           jump: Int = 5): Array[Int] = {
    val n = x.length
    if (n < 2 * minSize) return Array(n)
    // prefix sums for O(1) segment cost
    val s1 = new Array[Double](n + 1)
    val s2 = new Array[Double](n + 1)
    var i = 0
    while (i < n) {
      s1(i + 1) = s1(i) + x(i)
      s2(i + 1) = s2(i) + x(i) * x(i)
      i += 1
    }
    def cost(a: Int, b: Int): Double = { // [a, b)
      val m = b - a
      val mean = (s1(b) - s1(a)) / m
      val v = math.max((s2(b) - s2(a)) / m - mean * mean, 1e-12)
      m * math.log(v)
    }
    // candidate grid: multiples of jump, plus n
    val cands = (0 to n).filter(t => t % jump == 0 || t == n).toArray
    val idx = cands.zipWithIndex.toMap
    val f = Array.fill(cands.length)(Double.PositiveInfinity)
    val prev = Array.fill(cands.length)(0)
    f(0) = -penalty
    var active = List(0) // PELT pruning set (indices into cands)
    var ci = 1
    while (ci < cands.length) {
      val t = cands(ci)
      var best = Double.PositiveInfinity; var arg = 0
      var keep = List.empty[Int]
      for (pj <- active) {
        val s = cands(pj)
        if (t - s >= minSize) {
          val v = f(pj) + cost(s, t) + penalty
          if (v < best) { best = v; arg = pj }
        }
        keep ::= pj
      }
      f(ci) = best
      prev(ci) = arg
      // prune: s stays active if f(s) + cost(s,t) <= f(t)
      active = keep.filter { pj =>
        val s = cands(pj)
        t - s < minSize || f(pj) + cost(s, t) <= f(ci)
      }
      active ::= ci
      ci += 1
    }
    // backtrack from n
    val last = cands.length - 1
    if (f(last).isInfinity) return Array(n)
    val bkps = List.newBuilder[Int]
    var cur = last
    while (cur != 0) {
      bkps += cands(cur)
      cur = prev(cur)
    }
    bkps.result().sorted.toArray
  }

  /** Ward agglomerative clustering via Lance–Williams updates over a
    * (small) feature matrix. Returns cluster label per row, labels
    * renumbered by first appearance for determinism. */
  def ward(features: Array[Array[Double]], k: Int): Array[Int] = {
    val n = features.length
    require(k >= 1 && k <= n)
    val d = features(0).length
    // initial clusters: singletons
    var clusters = Array.tabulate(n)(i => (Set(i), features(i).clone(), 1))
    def dist2(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var j = 0
      while (j < d) { val df = a(j) - b(j); acc += df * df; j += 1 }
      acc
    }
    while (clusters.length > k) {
      // ward merge criterion: min (na*nb)/(na+nb) * ||ca - cb||²
      var best = Double.PositiveInfinity; var bi = 0; var bj = 1
      var i = 0
      while (i < clusters.length) {
        var j = i + 1
        while (j < clusters.length) {
          val (_, ca, na) = clusters(i); val (_, cb, nb) = clusters(j)
          val w = na.toDouble * nb / (na + nb) * dist2(ca, cb)
          if (w < best) { best = w; bi = i; bj = j }
          j += 1
        }
        i += 1
      }
      val (ma, ca, na) = clusters(bi); val (mb, cb, nb) = clusters(bj)
      val merged = (ma ++ mb,
        Array.tabulate(d)(j => (ca(j) * na + cb(j) * nb) / (na + nb)),
        na + nb)
      clusters = clusters.zipWithIndex
        .filter { case (_, idx) => idx != bi && idx != bj }
        .map(_._1) :+ merged
    }
    val labels = new Array[Int](n)
    // renumber by smallest member for determinism
    clusters.sortBy(_._1.min).zipWithIndex.foreach { case ((members, _, _), lbl) =>
      members.foreach(m => labels(m) = lbl)
    }
    labels
  }
}
