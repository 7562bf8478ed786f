package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid — "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011): split a d-dim vector into `m`
  * subspaces, k-means each subspace to `k` centroids, store one code per
  * subspace — 64-dim float32 (256 B) compresses to m=8 bytes (32×), and
  * queries score candidates by Asymmetric Distance Computation (ADC): a
  * per-query lookup table of subspace dot products, summed by code.
  *
  * Division of labor, matching how PQ runs at 100 TB:
  *  - TRAINING is driver-side over a SAMPLE (codebooks are m·k·dsub
  *    floats — here 8·16·8 = 1 KB — and practice trains them on ~100k
  *    sampled vectors, never the corpus; deterministic seeded Lloyd).
  *  - ENCODE and ADC are pure Column expressions over the trained
  *    codebook literals — map-side, codegen-friendly, zero shuffle, so
  *    the corpus-sized work stays distributed and the 1 KB codebook
  *    ships inside the plan like the LSH hyperplanes do.
  */
final class ProductQuantizer private (
    val m: Int, val k: Int, val dsub: Int,
    /** codebooks(j)(c) = centroid c of subspace j, length dsub. */
    val codebooks: Array[Array[Array[Double]]]) {

  /** Column of ARRAY<INT> codes (length m) for a vector column. Argmin
    * over each subspace's centroid distances; first-min tie-break keeps
    * it deterministic. */
  def encode(vec: Column): Column = {
    val codes = (0 until m).map { j =>
      val cb = typedlit(codebooks(j).map(_.toSeq).toSeq)
      val sub = slice(vec, j * dsub + 1, dsub)
      val dists = transform(cb, c =>
        aggregate(
          zip_with(sub, c, (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
      (array_position(dists, array_min(dists)) - 1).cast("int")
    }
    array(codes: _*)
  }

  /** ADC score (approximate dot product q·v) for a codes column, given a
    * query vector: lut(j)(c) = q_j · centroid_{j,c}, score = Σ_j
    * lut(j)(codes(j)). The lut is per-query driver math (m·k numbers);
    * the per-candidate work is m array lookups — no vector arithmetic
    * touches the corpus at query time. */
  def adcScore(codes: Column, query: Array[Float]): Column = {
    val luts = (0 until m).map { j =>
      typedlit((0 until k).map { c =>
        var d = 0.0
        var i = 0
        while (i < dsub) { d += query(j * dsub + i) * codebooks(j)(c)(i); i += 1 }
        d
      })
    }
    (0 until m).map { j =>
      element_at(luts(j), element_at(codes, j + 1) + 1)
    }.reduce(_ + _)
  }
}

object ProductQuantizer {

  /** Deterministic seeded Lloyd per subspace over the training sample. */
  def train(
      sample: Array[Array[Float]], m: Int = 8, k: Int = 16,
      iters: Int = 5, seed: Long = 42L): ProductQuantizer = {
    require(sample.nonEmpty, "PQ training needs a non-empty sample")
    val d = sample.head.length
    require(d % m == 0, s"dim $d not divisible by m=$m subspaces")
    val dsub = d / m
    val rnd = new scala.util.Random(seed)
    val codebooks = Array.tabulate(m) { j =>
      val subs = sample.map(v =>
        Array.tabulate(dsub)(i => v(j * dsub + i).toDouble))
      // init: k DISTINCT sampled points — a shuffled index draw, cycling
      // only when the sample has fewer than k points. Sampling with
      // replacement here would frequently seed duplicate centroids
      // (birthday collisions at k=16 over a few hundred points), and a
      // duplicated centroid never wins the first-min tie-break, so it
      // stays a permanently dead code halving that subspace's codebook.
      val order = rnd.shuffle(subs.indices.toList)
      var centroids = Array.tabulate(k)(c =>
        subs(order(c % order.length)).clone())
      for (_ <- 0 until iters) {
        val sums = Array.fill(k)(new Array[Double](dsub))
        val counts = new Array[Long](k)
        subs.foreach { s =>
          var best = 0; var bestD = Double.MaxValue
          var c = 0
          while (c < k) {
            var dist = 0.0; var i = 0
            while (i < dsub) {
              val diff = s(i) - centroids(c)(i); dist += diff * diff; i += 1
            }
            if (dist < bestD) { bestD = dist; best = c }
            c += 1
          }
          counts(best) += 1
          var i = 0
          while (i < dsub) { sums(best)(i) += s(i); i += 1 }
        }
        centroids = Array.tabulate(k)(c =>
          if (counts(c) == 0) centroids(c) // empty cell keeps its centroid
          else Array.tabulate(dsub)(i => sums(c)(i) / counts(c)))
      }
      centroids
    }
    new ProductQuantizer(m, k, dsub, codebooks)
  }
}
