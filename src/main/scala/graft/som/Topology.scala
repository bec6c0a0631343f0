package graft.som

/** SOM grid topology: neuron coordinates on the euclidean plane, grid
  * adjacency for the U-matrix, and the hexagonal row shift.
  *
  * Semantics derive from the reference (public repo jcfaracco/xpysom-dask):
  * meshgrid construction `xpysom.py:193-206`, hexagonal shift
  * `_xx[::-2] -= 0.5` (`xpysom.py:205-206`), U-matrix neighbor offsets
  * `xpysom.py:799-804`, topographic-error coordinate lookup
  * `xpysom.py:741-746`.
  *
  * Grid convention: neuron (i, j) with i in [0, x), j in [0, y); flat id
  * = i * y + j (row-major over (x, y), matching `xpysom.py:240`).
  */
sealed trait Topology extends Serializable {
  def x: Int
  def y: Int
  final def numNeurons: Int = x * y

  /** Euclidean-plane x coordinate of neuron (i, j) as used by the
    * generic (hex-aware) neighborhood kernels: `xx.T[c]` in
    * `neighborhoods.py:45-46` over the shifted meshgrid.
    */
  def euclidX(i: Int, j: Int): Double

  /** Euclidean-plane y coordinate of neuron (i, j) (never shifted). */
  final def euclidY(i: Int, j: Int): Double = j.toDouble

  /** Whether meshgrid row index r (axis of length y) is shifted by -0.5
    * under the hexagonal convention. `_xx[::-2]` selects rows from the
    * LAST row stepping back by 2 (`xpysom.py:206`): row r is shifted iff
    * (y - 1 - r) % 2 == 0.
    */
  def shiftedRow(r: Int): Boolean

  /** Topographic-error plane coordinates of a neuron (i, j).
    *
    * The reference indexes the (y, x)-shaped meshgrids directly with
    * (i, j) — `self._xx[b2my_xy[0], b2my_xy[1]]` at `xpysom.py:742-743` —
    * i.e. WITHOUT the transpose used by the neighborhood kernels. We
    * replicate that literal behavior (it matters for hexagonal maps):
    * teX = j - 0.5*[i shifted], teY = i.
    */
  def teX(i: Int, j: Int): Double
  final def teY(i: Int, j: Int): Double = i.toDouble

  /** U-matrix neighbor offsets (ii, jj) for a neuron whose j (column on
    * the grid) has the given parity; `e = y % 2 == 0` in `xpysom.py:809`.
    */
  def umatrixOffsets(jEven: Boolean): (Array[Int], Array[Int])

  /** Is the pair of best-matching units topographically adjacent?
    * Rect: Chebyshev distance <= 1 (`xpysom.py:736-740`); hex: euclidean
    * distance of te-plane coords <= 1.5 (`xpysom.py:741-746`).
    */
  def adjacent(i1: Int, j1: Int, i2: Int, j2: Int): Boolean
}

final case class Rectangular(x: Int, y: Int) extends Topology {
  override def euclidX(i: Int, j: Int): Double = i.toDouble
  override def shiftedRow(r: Int): Boolean = false
  override def teX(i: Int, j: Int): Double = j.toDouble
  private val off = (Array(0, -1, -1, -1, 0, 1, 1, 1), Array(-1, -1, 0, 1, 1, 1, 0, -1))
  override def umatrixOffsets(jEven: Boolean): (Array[Int], Array[Int]) = off
  override def adjacent(i1: Int, j1: Int, i2: Int, j2: Int): Boolean =
    math.abs(i1 - i2) <= 1 && math.abs(j1 - j2) <= 1
}

final case class Hexagonal(x: Int, y: Int) extends Topology {
  override def shiftedRow(r: Int): Boolean = (y - 1 - r) % 2 == 0 && y - 1 - r >= 0
  override def euclidX(i: Int, j: Int): Double =
    if (shiftedRow(j)) i - 0.5 else i.toDouble
  override def teX(i: Int, j: Int): Double =
    if (shiftedRow(i)) j - 0.5 else j.toDouble
  // xpysom.py:803-804 — index [e] with boolean e (False->0, True->1).
  private val offOdd = (Array(1, 1, 1, 0, -1, 0), Array(1, 0, -1, -1, 0, 1))   // e = false (j odd)
  private val offEven = (Array(0, 1, 0, -1, -1, -1), Array(1, 0, -1, -1, 0, 1)) // e = true (j even)
  override def umatrixOffsets(jEven: Boolean): (Array[Int], Array[Int]) =
    if (jEven) offEven else offOdd
  override def adjacent(i1: Int, j1: Int, i2: Int, j2: Int): Boolean = {
    val dx = teX(i1, j1) - teX(i2, j2)
    val dy = teY(i1, j1) - teY(i2, j2)
    math.sqrt(dx * dx + dy * dy) <= 1.5
  }
}

object Topology {
  def apply(name: String, x: Int, y: Int): Topology = name match {
    case "rectangular" => Rectangular(x, y)
    case "hexagonal"   => Hexagonal(x, y)
    case other =>
      // xpysom.py:196-198
      throw new IllegalArgumentException(
        s"$other not supported only hexagonal and rectangular available")
  }
}
