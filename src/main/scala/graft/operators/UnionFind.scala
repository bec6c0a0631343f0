package graft.operators

/** Single-task connected components for candidate graphs that fit one
  * executor partition: union-find with path halving, roots pinned to the
  * component-minimum id so the final `find` IS the keep_id. Runs inside
  * `mapPartitions` (never on the driver); the caller bounds input size.
  *
  * Memory: primitive open-addressing maps, ~32 bytes/node at load <= 0.5 —
  * the 2M-edge gate in [[Dedup.resolveDuplicateClusters]] means <= 4M nodes
  * => ~130 MB peak in the one task, far under a normal executor heap and an
  * order of magnitude below boxed java.util.HashMap.
  */
private[operators] object UnionFind {

  /** Open-addressing Long->Long map (linear probing, power-of-two capacity,
    * no deletion). Arbitrary long keys — 0 and Long.MinValue are valid ids —
    * so slot occupancy is a separate byte array, not a sentinel key.
    */
  private[operators] final class LongLongMap(expectedKeys: Int) {
    private var cap = Integer.highestOneBit(math.max(16, expectedKeys * 2) * 2 - 1)
    private var mask = cap - 1
    private var keys = new Array[Long](cap)
    private var vals = new Array[Long](cap)
    private var occ = new Array[Boolean](cap)
    private var n = 0

    def size: Int = n

    @inline private def slot(k: Long): Int = {
      // splitmix64 finalizer: sequential ids must not cluster probes
      var x = k + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      ((x ^ (x >>> 31)) & mask).toInt
    }

    def getOrElse(k: Long, default: Long): Long = {
      var i = slot(k)
      while (occ(i)) {
        if (keys(i) == k) return vals(i)
        i = (i + 1) & mask
      }
      default
    }

    def put(k: Long, v: Long): Unit = {
      var i = slot(k)
      while (occ(i)) {
        if (keys(i) == k) { vals(i) = v; return }
        i = (i + 1) & mask
      }
      occ(i) = true; keys(i) = k; vals(i) = v; n += 1
      if (n * 2 > cap) grow()
    }

    private def grow(): Unit = {
      val ok = keys; val ov = vals; val oo = occ; val ocap = cap
      cap <<= 1; mask = cap - 1
      keys = new Array[Long](cap); vals = new Array[Long](cap)
      occ = new Array[Boolean](cap); n = 0
      var i = 0
      while (i < ocap) {
        if (oo(i)) put(ok(i), ov(i))
        i += 1
      }
    }

    def keysIterator: Iterator[Long] = new Iterator[Long] {
      private var i = advance(0)
      private def advance(from: Int): Int = {
        var j = from
        while (j < cap && !occ(j)) j += 1
        j
      }
      def hasNext: Boolean = i < cap
      def next(): Long = { val k = keys(i); i = advance(i + 1); k }
    }
  }

  /** Consume (id, nbr) edges, emit (id, componentMinId) for every distinct
    * id seen. Union attaches the larger root under the smaller, so roots
    * are component minima by construction; path halving keeps amortized
    * find near-constant regardless of edge order.
    */
  def minLabels(edges: Iterator[(Long, Long)]): Iterator[(Long, Long)] = {
    val parent = new LongLongMap(1 << 12)
    val nodes = new LongLongMap(1 << 12)
    @inline def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) {
        val gp = parent.getOrElse(p, p)
        if (gp != p) parent.put(x, gp) // halve: skip x straight to grandparent
        x = p
        p = gp
      }
      x
    }
    while (edges.hasNext) {
      val (a, b) = edges.next()
      nodes.put(a, 0L)
      nodes.put(b, 0L)
      val ra = find(a)
      val rb = find(b)
      if (ra < rb) parent.put(rb, ra)
      else if (rb < ra) parent.put(ra, rb)
    }
    nodes.keysIterator.map(n => (n, find(n)))
  }
}
