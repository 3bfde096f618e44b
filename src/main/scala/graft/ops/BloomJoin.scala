package graft.ops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{Cast, EvalMode, Literal, XxHash64}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.BloomMightContain

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
  *    each, no UDF; the probe side builds the identical `XxHash64`
  *    expressions so its bits match the build side bit-for-bit.
  *  - The bit array is built DISTRIBUTEDLY: each build key explodes to k
  *    bit positions, positions map to (word, mask) pairs, and a
  *    `bit_or` aggregation over 64-bit words produces at most m/64 rows.
  *    The driver only ever collects the aggregated word array (m/64
  *    longs — 128 KiB for a 1M-bit filter), never the keys.
  *  - The word array travels as a BROADCAST VARIABLE, dereferenced from
  *    a codegen'd `BloomMightContain` expression — executors fetch it
  *    once via the torrent protocol. It is deliberately NOT a plan
  *    literal: a 10M-key filter at fpp 0.01 is ~12 MB, which as a
  *    `typedLit` would ride every serialized task.
  *
  * Sizing follows the standard Bloom calculus: m = -n·ln(p)/ln(2)²,
  * k = (m/n)·ln(2), both clamped to sane minimums. `expectedItems <= 0`
  * means "size from the build side" — a SINGLE driver action running
  * `approx_count_distinct` (map-side partial aggregate, no full shuffle);
  * the ±5% HLL error is absorbed by a 1.1× headroom factor on m.
  */
object BloomJoin {

  /** A sized, filled Bloom filter: broadcast word array + parameters.
    * `bits.value` has length mBits/64. `keyType` is the build key's
    * resolved data type: xxhash64 is type-sensitive (an INT and a BIGINT
    * of the same value hash differently), so probe keys must be hashed
    * AS this type or membership tests silently return false negatives
    * where the equality join's implicit cast would have matched. */
  final case class BloomHandle(bits: Broadcast[Array[Long]], k: Int, mBits: Long,
      keyType: org.apache.spark.sql.types.DataType)

  /** Build a Bloom filter over `keyCol` of `build`, distributedly, and
    * broadcast the word array. Exactly one driver action when
    * `expectedItems` is given; one extra cheap sizing action
    * (`approx_count_distinct`) when it is not. */
  def buildBits(build: DataFrame, keyCol: String, expectedItems: Long = -1L,
      fpp: Double = 0.01): BloomHandle = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val n = if (expectedItems > 0) expectedItems
            else math.max(1L,
              (build.select(approx_count_distinct(col(keyCol))).head.getLong(0) * 1.1).toLong)
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
    BloomHandle(build.sparkSession.sparkContext.broadcast(words), k, mBits,
      build.schema(keyCol).dataType)
  }

  /** Codegen'd membership test for `key` against a built filter. False
    * negatives are impossible for keys that were in the build set. The
    * probe-side `XxHash64(key, seed_i)` children are constructed to be
    * expression-identical to the build side's `xxhash64(key, seed_i)` —
    * including the key's DATA TYPE: the probe key is TRY-cast to the
    * build key's type first, because xxhash64(1:INT) != xxhash64(1:BIGINT).
    * TRY (not ANSI) cast: a probe value unrepresentable in the build type
    * cannot equal any build key, and its null-cast hash at worst yields a
    * false positive, which the exact final join removes. SimplifyCasts
    * drops the cast entirely when the types already agree. */
  def mightContain(h: BloomHandle, key: Column): Column = {
    val keyExpr = Cast(ColumnBridge.expression(key), h.keyType, None, EvalMode.TRY)
    val hashes = (0 until h.k).map(i => XxHash64(Seq(keyExpr, Literal(i.toLong)), 42L))
    ColumnBridge.column(BloomMightContain(hashes, h.mBits, h.bits))
  }

  /** Exact left-semi join with Bloom pre-filtering of the probe side.
    * Result is identical to `probe.join(build, …, "left_semi")`; the
    * Bloom test only thins the probe rows entering the exchange. */
  def semiJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, expectedItems: Long = -1L, fpp: Double = 0.01): DataFrame = {
    val handle = buildBits(build, buildKey, expectedItems, fpp)
    probe
      .filter(mightContain(handle, col(probeKey)))
      .join(build.select(col(buildKey)), col(probeKey) === col(buildKey), "left_semi")
  }
}
