package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered joins.
  *
  * At 100 TB the expensive part of a selective semi/inner join is not the
  * join itself but shuffling the probe side: every probe row pays the
  * exchange even though only a few percent survive the join. A Bloom
  * filter built from the build-side keys and evaluated on the probe side
  * BEFORE its exchange removes the non-matching rows while they are still
  * sitting in the scan's map tasks — the shuffle then carries only
  * (matches + fpp·N) rows. The final join stays exact: Bloom false
  * positives are eliminated by the real equi-join, so the result is
  * bit-identical to the unfiltered join (which is exactly what the
  * oracle asserts).
  *
  * Engineering shape (everything stays inside whole-stage codegen):
  *  - k hash functions are `xxhash64(key, seed_i)` — one codegen'd call
  *    each, no UDF, no custom expression.
  *  - The bit array is built DISTRIBUTEDLY: each build key explodes to k
  *    bit positions, positions map to (word, mask) pairs, and a
  *    `bit_or` aggregation over 64-bit words produces at most m/64 rows.
  *    The driver only ever collects the aggregated word array (m/64
  *    longs — 128 KiB for a 1M-bit filter), never the keys.
  *  - The word array is embedded as an array literal, so executors get it
  *    with the serialized plan exactly like a broadcast variable, and the
  *    membership test (`element_at` + bitwise AND) is codegen'd straight
  *    into the probe-side scan stage.
  *
  * Sizing follows the standard Bloom calculus: m = -n·ln(p)/ln(2)²,
  * k = (m/n)·ln(2), both clamped to sane minimums. `expectedItems <= 0`
  * means "count the build side first" — one cheap action on the small
  * side (the same eager-fit pattern as Similarity.ivfTopK).
  */
object BloomJoin {

  /** Sized Bloom parameters + the filled word array for `keyCol` of
    * `build`. Returned words array has length m/64, m a multiple of 64. */
  def buildBits(build: DataFrame, keyCol: String, expectedItems: Long = -1L,
      fpp: Double = 0.01): (Array[Long], Int, Long) = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = if (expectedItems > 0) expectedItems
            else math.max(1L, build.select(keyCol).count())
    val ln2 = math.log(2.0)
    val mBits0 = math.ceil(-n * math.log(fpp) / (ln2 * ln2)).toLong
    val mBits = math.max(256L, ((mBits0 + 63) / 64) * 64)
    val k = math.max(1, math.min(16, math.round(mBits.toDouble / n * ln2).toInt))

    val words = new Array[Long]((mBits / 64).toInt)
    val seeds = (0 until k).map(i => lit(i.toLong))
    val posCols = seeds.map(s => pmod(xxhash64(col(keyCol), s), lit(mBits)))
    val rows = build
      .select(explode(array(posCols: _*)).as("pos"))
      .select((col("pos") / 64).cast("int").as("word"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64)).cast("int")).as("mask"))
      .groupBy(col("word"))
      .agg(call_function("bit_or", col("mask")).as("bits"))
      .collect()
    rows.foreach(r => words(r.getInt(0)) = r.getLong(1))
    (words, k, mBits)
  }

  /** Codegen'd membership test for `key` against a built filter. False
    * negatives are impossible for keys that were in the build set. */
  def mightContain(words: Array[Long], k: Int, mBits: Long, key: Column): Column = {
    val arr = typedLit(words)
    (0 until k).map { i =>
      val pos = pmod(xxhash64(key, lit(i.toLong)), lit(mBits))
      val word = call_function("element_at", arr, (pos / 64).cast("int") + 1)
      val mask = call_function("shiftleft", lit(1L), pmod(pos, lit(64)).cast("int"))
      word.bitwiseAND(mask) =!= 0L
    }.reduce(_ && _)
  }

  /** Exact left-semi join with Bloom pre-filtering of the probe side.
    * Result is identical to `probe.join(build, …, "left_semi")`; the
    * Bloom test only thins the probe rows entering the exchange. */
  def semiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val (words, k, mBits) = buildBits(build, buildKey, expectedItems, fpp)
    probe
      .filter(mightContain(words, k, mBits, col(probeKey)))
      .join(build.select(col(buildKey)), col(probeKey) === col(buildKey), "left_semi")
  }
}
