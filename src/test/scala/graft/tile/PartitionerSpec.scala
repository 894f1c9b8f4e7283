package graft.tile

import org.scalatest.funsuite.AnyFunSuite

/** pv9 weight-aware merge placement (VERDICT r4 #3). Placement is a pure
  * function of the sampled weights — byte output never depends on it (the
  * Oracle byte-parity suite pins that); these tests pin the SCHEDULING
  * properties the fix exists for. */
class PartitionerSpec extends AnyFunSuite {

  test("lptAssign: heaviest tile lands on partition 0, top-K spread 1:1") {
    val heavy = Seq(10L -> 100L, 11L -> 90L, 12L -> 80L, 13L -> 70L)
    val m = Pyramid.lptAssign(heavy, 8)
    assert(m(10L) === 0)
    assert(m(11L) === 1)
    assert(m(12L) === 2)
    assert(m(13L) === 3)
    assert(m.values.toSeq.distinct.size === 4) // no collisions while bins free
  }

  test("lptAssign: more heavy tiles than bins → least-loaded bin wins") {
    val heavy = (0 until 6).map(i => (i.toLong, (100 - i).toLong))
    val m = Pyramid.lptAssign(heavy, 2)
    // 100→b0, 99→b1, 98→b1(99<100? no: b1 has 99 < b0's 100 → b1)...
    // invariant to pin: loads end balanced within the max single weight
    val loads = m.toSeq.groupBy(_._2).view
      .mapValues(_.map(kv => 100L - kv._1).sum).toMap
    assert(loads.keySet === Set(0, 1))
    assert(math.abs(loads(0) - loads(1)) <= 100)
    assert(m.size === 6)
  }

  test("lptAssign: deterministic under input order permutations") {
    val heavy = Seq(5L -> 50L, 6L -> 50L, 7L -> 20L)
    assert(Pyramid.lptAssign(heavy, 4) ===
      Pyramid.lptAssign(heavy.reverse, 4))
    // equal weights tie-break on tile id: lower id first → lower index
    assert(Pyramid.lptAssign(heavy, 4)(5L) === 0)
    assert(Pyramid.lptAssign(heavy, 4)(6L) === 1)
  }

  test("partitioner: pinned keys honored, others hash in range") {
    val p = new WeightedTilePartitioner(16, Map(42L -> 3))
    assert(p.getPartition(42L) === 3)
    (0L until 1000L).foreach { t =>
      val b = p.getPartition(t)
      assert(b >= 0 && b < 16)
    }
    // deterministic
    assert(p.getPartition(7L) === p.getPartition(7L))
  }

  test("run codec round-trips a sorted run") {
    val feats = Array(
      FeatPayload(9L, 0, 0, 1L, Array[Byte](1, 2, 3)),
      FeatPayload(9L, 1, 2, -5L, Array.emptyByteArray),
      FeatPayload(9L, 2, 1, Long.MaxValue, Array[Byte](0)))
    val back = RunCodec.unpack(9L, RunCodec.pack(feats))
    assert(back.length === 3)
    feats.zip(back).foreach { case (a, b) =>
      assert(a.tile_id === b.tile_id && a.layer_rank === b.layer_rank &&
        a.kind_rank === b.kind_rank && a.id === b.id &&
        a.blob.toSeq === b.blob.toSeq)
    }
  }
}
