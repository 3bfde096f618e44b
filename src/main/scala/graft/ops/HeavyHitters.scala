package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Exact top-k most frequent values WITHOUT shuffling the full distinct
  * domain — the heavy-hitters primitive a 100 TB token/URL/host audit
  * needs, where a plain groupBy would shuffle billions of distinct keys
  * to count a handful of frequent ones.
  *
  * Two passes over the data, both shuffle-light:
  *   1. A per-partition Misra-Gries sketch (m counters) emits surviving
  *      keys. Pigeonhole guarantee: if an item's GLOBAL count exceeds
  *      n/m, its count must exceed n_p/m in at least one partition, so
  *      the candidate union provably contains every such item. The
  *      sketch output (<= partitions x (m+1) rows) is persisted — it is
  *      aggregate-sized, never the data.
  *   2. An exact recount of candidates only: a broadcast semi join
  *      filters the stream before the count, so the one real shuffle
  *      carries candidate keys only.
  *
  * The result is then PROVED exact on the driver: non-candidates have
  * true count <= n/m, so if the k-th recounted frequency strictly
  * exceeds n/m, no unseen item can displace the top-k. If the proof
  * fails (near-uniform data, m too small), we fall back to the exact
  * full groupBy — the answer is exact either way; the sketch is purely
  * a shuffle-avoidance fast path.
  */
object HeavyHitters {

  /** Misra-Gries over one partition: emits (tag=0, key, 0) for each
    * surviving candidate and one (tag=1, null, n_p) partition-total row.
    * Decrement batches are O(m) but fire at most n/m times: O(n) total. */
  private def mgPartition(it: Iterator[String], m: Int): Iterator[(Int, String, Long)] = {
    val counts = new java.util.HashMap[String, Long](m * 2)
    var np = 0L
    while (it.hasNext) {
      val v = it.next(); np += 1
      val cur = counts.get(v)
      if (cur != 0L || counts.containsKey(v)) counts.put(v, cur + 1)
      else if (counts.size < m) counts.put(v, 1L)
      else {
        val itr = counts.entrySet().iterator()
        while (itr.hasNext) {
          val e = itr.next()
          if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, Long)]
    counts.keySet().forEach(k => out += ((0, k, 0L)))
    out += ((1, null, np))
    out.iterator
  }

  /** Exact top-k of `values` by frequency, ties broken by value ASC.
    * Returns (value, freq) with exactly min(k, |domain|) rows. */
  def topK(values: Dataset[String], k: Int, sketchSize: Int = 4096): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(sketchSize > 0, s"sketchSize must be positive, got $sketchSize")
    val spark = values.sparkSession
    import spark.implicits._

    val mg = values.mapPartitions(mgPartition(_, sketchSize))
      .toDF("tag", "value", "np")
      .persist()
    try {
      val n = mg.filter(col("tag") === 1)
        .agg(coalesce(sum(col("np")), lit(0L))).head().getLong(0)
      val cands = mg.filter(col("tag") === 0).select("value").distinct()
      val top = values.toDF("value")
        .join(broadcast(cands), Seq("value"), "left_semi")
        .groupBy("value").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("value").asc)
        .limit(k)
        .collect()
      // exactness proof: every non-candidate's true count is <= n/m, so
      // a full k candidates whose k-th frequency strictly beats n/m
      // cannot be displaced by anything unseen. Fewer than k candidates
      // does NOT mean the domain is exhausted — that case must fall back.
      val provedExact = top.length == k &&
        top.last.getLong(1) * sketchSize.toLong > n
      if (provedExact)
        spark.createDataFrame(
          spark.sparkContext.parallelize(top.toIndexedSeq, 1), top.head.schema)
      else
        // proof failed: exact fallback (full groupBy). Same answer, full
        // shuffle — the price of near-uniform data or an undersized sketch.
        values.toDF("value")
          .groupBy("value").agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("value").asc)
          .limit(k)
    } finally mg.unpersist()
  }
}
