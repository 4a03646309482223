package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.text.Dedup.minhashLshPairs]] (d01): MinHash
  * near-dup CANDIDATE PAIRS over a document stream. Each arriving doc's
  * signature is computed entirely MAP-SIDE (shingles, bases and the
  * per-permutation minima are array expressions over the doc's own
  * text — no exploded-shingle shuffle), banded into the same md5
  * buckets as the batch op, and verified against every signature the
  * bucket has seen (`GroupState` = the bucket's (id, sig) list): a pair
  * is emitted when the signature-agreement estimate reaches the
  * threshold. Arrival order is the streaming-native pair orientation
  * (earlier doc first); the emitted (min, max, est) tuples equal the
  * batch pair SET regardless of micro-batch boundaries, because state
  * accumulates across batches.
  *
  * Contract notes:
  *  - WITHOUT `stateTtl`, a pair colliding in several bands is emitted
  *    ONLY from the smallest agreeing band: both full signatures are in
  *    the group, so each band decides locally whether it is the pair's
  *    first agreement — no cross-band state, and the output is an exact
  *    multiset match of the batch op's `.distinct()`ed pairs (identical
  *    docs agree on all bands but emit exactly once). WITH `stateTtl`
  *    the guard is DISABLED: the smallest agreeing band's bucket may
  *    have expired while a hotter band's bucket still holds the partner
  *    signature, and the guard would then suppress the pair everywhere.
  *    Under TTL every surviving band emits (at-least-once SET
  *    semantics) — downstream consumers of a TTL'd stream should
  *    `dropDuplicates("id_a","id_b")`;
  *  - state is one signature (numPerm longs) per doc per band, growing
  *    with the corpus inside the retention horizon — production runs
  *    bound it with `stateTtl` (processing-time timeout per bucket;
  *    docs arriving after a bucket expires re-seed it, trading recall
  *    against bounded state, the same trade [[StreamingDedup]] makes
  *    with its watermark).
  */
object StreamingNearDup {

  /** Per-doc MinHash signature as a pure column expression: distinct
    * word k-shingles → md5-derived bases → min over each of the
    * `numPerm` arithmetic permutations (the exact
    * [[graft.text.Dedup.minhashSignatures]] algebra, one row per doc,
    * zero shuffles). Docs with fewer than k tokens get an empty
    * signature (guarded: Spark's `sequence(0, n)` flips direction for
    * negative n instead of returning empty). */
  def signature(text: Column, k: Int, numPerm: Int): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val shingles = array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(0), size(toks) - k),
          i => array_join(slice(toks, i + 1, lit(k)), " ")))
      .otherwise(array().cast("array<string>")))
    val bases = transform(shingles, s =>
      graft.text.Dedup.h64(s, 0).bitwiseAND(graft.text.Dedup.MinhashBaseMask))
    val params = graft.text.Dedup.minhashParams(numPerm)
    array(params.map { case (a, b) =>
      array_min(transform(bases, base =>
        (lit(a) * base + lit(b)) % graft.text.Dedup.MinhashPrime))
    }: _*)
  }

  def nearDupPairs(docs: DataFrame, id: String, text: String, k: Int = 5,
                   numPerm: Int = 64, bands: Int = 16,
                   threshold: Double = 0.5,
                   stateTtl: Option[String] = None): DataFrame = {
    require(numPerm % bands == 0, "bands must divide numPerm")
    val rowsPerBand = numPerm / bands
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select(col(id).cast("long").as("_id"),
        signature(col(text), k, numPerm).as("_sig"))
      .filter(size(col("_sig")) === numPerm && !array_contains(
        transform(col("_sig"), x => x.isNull), true))
    val banded = sigs.select(col("_id"), col("_sig"),
      posexplode(array((0 until bands).map(b =>
        md5(concat_ws(",",
          (0 until rowsPerBand).map(r =>
            col("_sig")(b * rowsPerBand + r).cast("string")): _*))): _*))
        .as(Seq("_band", "_bucket")))
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .select(col("_band"), col("_bucket"), col("_id"), col("_sig"))
      .as[(Int, String, Long, Seq[Long])]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[List[(Long, Seq[Long])],
        (Long, Long, Double)](OutputMode.Append, timeout) {
        (_, rows, state: GroupState[List[(Long, Seq[Long])]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            // in-batch arrival order: id order (the deterministic batch
            // orientation); across batches, arrival order is semantic
            val out = rows.toIndexedSeq.sortBy(_._3).flatMap {
              case (band, _, docId, sig) =>
                val pairs = seen.flatMap { case (pid, psig) =>
                  var agree = 0
                  var i = 0
                  while (i < sig.length) {
                    if (psig(i) == sig(i)) agree += 1
                    i += 1
                  }
                  val est = agree.toDouble / sig.length
                  // emit only from the pair's SMALLEST agreeing band
                  // (computable from the two full signatures — no
                  // cross-band state): a pair agreeing on several bands
                  // lands in each of those buckets, and without this
                  // guard would be emitted once per bucket, overcounting
                  // relative to the batch op's .distinct(). Under
                  // stateTtl the guard is unsound (the smallest agreeing
                  // band's bucket may have EXPIRED while this one still
                  // holds the partner — the pair would be suppressed in
                  // every surviving band), so TTL'd streams emit
                  // per-band: at-least-once set semantics.
                  def bandAgrees(b: Int): Boolean = {
                    var r = b * rowsPerBand; val end = r + rowsPerBand
                    while (r < end && psig(r) == sig(r)) r += 1
                    r == end
                  }
                  val emitHere =
                    if (stateTtl.isEmpty)
                      (0 until bands).find(bandAgrees).contains(band)
                    else bandAgrees(band)
                  if (est >= threshold && pid != docId && emitHere)
                    Some((math.min(pid, docId), math.max(pid, docId), est))
                  else None
                }
                seen = (docId, sig) :: seen
                pairs
            }
            state.update(seen)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
      .toDF("id_a", "id_b", "est_jaccard")
  }

  /** Per-doc SimHash signature as a pure column expression: one
    * `aggregate` over the doc's own token array per bit — the exact
    * [[graft.text.Dedup.simhash]] algebra (token OCCURRENCES, not
    * distinct; sign = bit j of h64(token); bit set iff the signed sum
    * is positive), one row per doc, zero shuffles. */
  def simhashSignature(text: Column): Column = {
    val toks = filter(split(text, " "), t => t =!= "")
    val hs = transform(toks, t => graft.text.Dedup.h64(t, 0).cast("long"))
    (0 until 60).map { j =>
      val bs = aggregate(hs, lit(0),
        (acc, h) => acc + when(
          shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1))
      when(bs > 0, shiftleft(lit(1L), j)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
  }

  /** Streaming twin of [[graft.text.Dedup.simhashPairs]] (d02): SimHash
    * near-dup pairs over a document stream. Same shape as
    * [[nearDupPairs]] — map-side signature, the batch op's 4 rotated
    * 15-bit bands as the state key, pigeonhole recall (a pair within
    * `maxHamming` ≤ 3 agrees exactly on ≥ 1 band), `bit_count(xor)`
    * verify against the bucket's seen signatures. State is ONE long
    * per doc per band (vs numPerm longs for MinHash) — the cheapest
    * streaming dedup state in the engine; `stateTtl` bounds it. */
  def simhashPairs(docs: DataFrame, id: String, text: String,
                   maxHamming: Int = 3,
                   stateTtl: Option[String] = None): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = docs.select(col(id).cast("long").as("_id"),
      simhashSignature(col(text)).as("_sig"))
    val banded = sigs.select(col("_id"), col("_sig"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("_sig"), b * 15).bitwiseAND(0x7FFF)): _*))
        .as(Seq("_band", "_bucket")))
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    banded
      .select(col("_band"), col("_bucket"), col("_id"), col("_sig"))
      .as[(Int, Long, Long, Long)]
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[List[(Long, Long)],
        (Long, Long, Int)](OutputMode.Append, timeout) {
        (_, rows, state: GroupState[List[(Long, Long)]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var seen = state.getOption.getOrElse(Nil)
            val out = rows.toIndexedSeq.sortBy(_._3).flatMap {
              case (band, _, docId, sig) =>
                val pairs = seen.flatMap { case (pid, psig) =>
                  val x = psig ^ sig
                  val ham = java.lang.Long.bitCount(x)
                  // smallest-agreeing-band guard (see nearDupPairs):
                  // identical docs agree on all 4 bands but must emit
                  // exactly once to match batch .distinct() as a multiset.
                  // ham ≤ 3 < 4 bands guarantees some band agrees
                  // (pigeonhole), so WITHOUT stateTtl the guard never
                  // drops a true pair. WITH stateTtl it can (the smallest
                  // agreeing band's bucket may have expired) — TTL'd
                  // streams emit per-band, at-least-once set semantics.
                  def bandAgrees(b: Int): Boolean =
                    ((x >>> (b * 15)) & 0x7FFFL) == 0L
                  val emitHere =
                    if (stateTtl.isEmpty)
                      (0 until 4).find(bandAgrees).contains(band)
                    else bandAgrees(band)
                  if (ham <= maxHamming && pid != docId && emitHere)
                    Some((math.min(pid, docId), math.max(pid, docId), ham))
                  else None
                }
                seen = (docId, sig) :: seen
                pairs
            }
            state.update(seen)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
      }
      .toDF("id_a", "id_b", "hamming")
  }

  /** Streaming documents source (shared layout helper). */
  def documentsStream(spark: org.apache.spark.sql.SparkSession,
                      dir: String): DataFrame =
    StreamingPack.documentsStream(spark, dir)
}
