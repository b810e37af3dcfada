package graft.ann

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.DotProduct

/** Johnson–Lindenstrauss random projection for embedding columns —
  * the dimensionality-reduction step in front of clustering / ANN /
  * dedup when the full embedding width is wasted on them.
  *
  * The projection matrix is Achlioptas-style dense ±1 signs scaled by
  * 1/√outDim, with each sign drawn from the parity of the first hex
  * nibble of md5("seed|i|j") — NOT from a JVM RNG — so any engine can
  * replay the exact matrix (the DuckDB oracle recomputes every cell)
  * and the transform is stable across runs, partitionings, and
  * library versions. ±1/√k matrices satisfy the JL distortion bound
  * with the same constants as Gaussian ones (Achlioptas 2003).
  *
  * Execution shape: the matrix folds into the plan as `outDim` array
  * literals; each output coordinate is one fused codegen'd
  * [[DotProduct]] loop. Zero shuffle, zero driver state — a pure
  * map at any corpus size. The scale 1/√16 = 0.25 is an exact binary
  * fraction, so sign·scale is exact in float and the double products
  * replay bit-identically cross-engine.
  */
object Projection {

  /** +1 for an even first md5 nibble of "seed|i|j", else −1. */
  private def sign(seed: String, i: Int, j: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed|$i|$j".getBytes("UTF-8"))
    if (((d(0) >> 4) & 0xF) % 2 == 0) 1 else -1
  }

  /** Row j of the (outDim × inDim) projection matrix, scale folded
    * in. Exposed for spec-side replay.
    */
  def matrixRow(inDim: Int, outDim: Int, seed: String, j: Int): Array[Float] = {
    val scale = (1.0 / math.sqrt(outDim.toDouble)).toFloat
    Array.tabulate(inDim)(i => sign(seed, i, j) * scale)
  }

  /** Project an `array<float>` column to `array<double>` of length
    * `outDim`: y_j = Σ_i x_i · (±1/√outDim).
    */
  def project(vec: Column, inDim: Int, outDim: Int, seed: String): Column = {
    require(outDim >= 1 && inDim >= 1, "dims must be >= 1")
    array((0 until outDim).map { j =>
      DotProduct(vec, typedlit(matrixRow(inDim, outDim, seed, j)))
    }: _*)
  }
}
