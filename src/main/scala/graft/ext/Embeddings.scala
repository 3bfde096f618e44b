package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-column transforms for storage/serving pipelines. All are
  * elementwise projections — zero shuffle at any scale.
  */
object Embeddings {

  /** Symmetric per-vector int8 quantization: q[i] = round(v[i] / maxabs *
    * 127), the classic storage-compression step before ANN serving (4×
    * smaller than float32; recall loss negligible for cosine work).
    *
    * Engine-portable determinism: floats are widened to double BEFORE any
    * arithmetic; rounding is floor(x + 0.5) (identical semantics in every
    * SQL engine, unlike round()'s dialect-dependent half-even modes). An
    * all-zero vector quantizes to zeros with scale 0.
    *
    * Output: (idCol, scale double = maxabs, q array<int>).
    */
  def quantizeInt8(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val maxabs = array_max(transform(v, x => abs(x)))
    emb.select(
      col(idCol),
      maxabs.as("scale"),
      when(maxabs === 0.0, transform(v, _ => lit(0)))
        .otherwise(transform(v, x => floor(x / maxabs * 127.0 + 0.5).cast("int")))
        .as("q"))
  }

  /** L2 normalization to the unit sphere (cosine work becomes dot
    * products). Zero vectors stay zero. */
  def l2Normalize(emb: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val norm = sqrt(aggregate(v, lit(0.0), (acc, x) => acc + x * x))
    emb.select(
      col(idCol),
      when(norm === 0.0, v).otherwise(transform(v, x => x / norm)).as("unit"))
  }
}
