package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM coverage for the single-task connected-components kernel:
  * the map's open-addressing mechanics (adversarial keys, growth) and
  * union-find's min-label semantics against a naive reference.
  */
class UnionFindSpec extends AnyFunSuite {

  test("LongLongMap: adversarial keys, overwrite, growth past capacity") {
    val m = new UnionFind.LongLongMap(4) // force several grows
    val keys = Seq(0L, -1L, Long.MinValue, Long.MaxValue, 1L, 16L, 32L, 48L) ++
      (100L until 400L) // sequential ids — the probe-clustering case
    keys.zipWithIndex.foreach { case (k, i) => m.put(k, i.toLong) }
    assert(m.size == keys.size)
    keys.zipWithIndex.foreach { case (k, i) =>
      assert(m.getOrElse(k, -999L) == i.toLong, s"key $k")
    }
    assert(m.getOrElse(7777L, -999L) == -999L)
    m.put(0L, 42L) // overwrite must not grow size
    assert(m.getOrElse(0L, -999L) == 42L && m.size == keys.size)
    assert(m.keysIterator.toSet == keys.toSet)
  }

  test("union-find min labels match a naive reference on random graphs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 20) {
      val n = 2 + rnd.nextInt(60)
      val ids = Array.fill(n)(rnd.nextLong())
      val edges = Seq.fill(1 + rnd.nextInt(80))(
        (ids(rnd.nextInt(n)), ids(rnd.nextInt(n))))
      // naive: iterate neighbor-min to fixpoint over an adjacency map
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      var lab = nodes.map(x => x -> x).toMap
      var changed = true
      while (changed) {
        changed = false
        for ((a, b) <- edges) {
          val m = math.min(lab(a), lab(b))
          if (lab(a) != m) { lab += a -> m; changed = true }
          if (lab(b) != m) { lab += b -> m; changed = true }
        }
        // label-of-label contraction so chains terminate quickly
        val lab2 = lab.map { case (k, v) => k -> lab.getOrElse(v, v) }
        if (lab2 != lab) { lab = lab2; changed = true }
      }
      val got = UnionFind.minLabels(edges.iterator).toMap
      assert(got == lab, s"trial $trial: $edges")
    }
  }

  test("union-find handles degenerate shapes") {
    // self-loop only
    assert(UnionFind.minLabels(Iterator((5L, 5L))).toMap == Map(5L -> 5L))
    // empty input
    assert(UnionFind.minLabels(Iterator.empty).toMap == Map.empty[Long, Long])
    // long chain inserted in worst-case (descending) order
    val chain = (0L until 5000L).reverse.map(i => (i, i + 1))
    val r = UnionFind.minLabels(chain.iterator).toMap
    assert(r.size == 5001 && r.values.forall(_ == 0L))
    // negative and extreme ids: min is the most negative
    val ext = UnionFind.minLabels(Iterator((Long.MaxValue, -3L),
      (-3L, Long.MinValue))).toMap
    assert(ext.values.forall(_ == Long.MinValue))
  }
}
