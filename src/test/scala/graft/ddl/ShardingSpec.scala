package graft.ddl

import org.scalatest.funsuite.AnyFunSuite

class ShardingSpec extends AnyFunSuite {

  test("primaryMap pairs by index when targets cover sources") {
    assert(Sharding.primaryMap(Seq("a", "b"), Seq("x", "y", "z")) ==
      Map("a" -> "x", "b" -> "y"))
  }

  test("primaryMap round-robins overflow with the reference's overwrite quirk") {
    // config_copier.go:95-102 — second loop starts at len(targets)-1, so
    // source[nt-1] ("c") remaps to target[0]
    assert(Sharding.primaryMap(Seq("a", "b", "c", "d", "e"), Seq("x", "y", "z")) ==
      Map("a" -> "x", "b" -> "y", "c" -> "x", "d" -> "y", "e" -> "z"))
  }

  test("zoneAssignments pairs tags by shard index, refuses unequal counts") {
    val src = Seq("s0" -> Seq("hot"), "s1" -> Seq("cold", "eu"))
    assert(Sharding.zoneAssignments(src, Seq("t0", "t1")) ==
      Seq("t0" -> "hot", "t1" -> "cold", "t1" -> "eu"))
    // no tags anywhere → no-op regardless of counts
    assert(Sharding.zoneAssignments(Seq("s0" -> Nil), Seq("t0", "t1")).isEmpty)
    intercept[IllegalArgumentException] {
      Sharding.zoneAssignments(src, Seq("t0"))
    }
  }

  test("splitPoints picks every segment-th min until chunksNeeded ranges exist") {
    val mins = (0 until 25).map(i => f"k$i%02d")
    // segment = 25/3 = 8 → splits at indices 8 and 16
    assert(Sharding.splitPoints(mins, 3) == Seq("k08", "k16"))
    // n == chunksNeeded: every interior min qualifies, first cn-1 win
    assert(Sharding.splitPoints(Seq("a", "b", "c"), 3) == Seq("b", "c"))
    assert(Sharding.splitPoints(mins, 1).isEmpty)
    intercept[IllegalArgumentException] { Sharding.splitPoints(Seq("a"), 2) }
  }

  test("chunkMoves places range i on shard i, nothing for single-shard targets") {
    assert(Sharding.chunkMoves(Seq("a", "b", "c"), Seq("t0", "t1", "t2")) ==
      Seq("a" -> "t0", "b" -> "t1", "c" -> "t2"))
    assert(Sharding.chunkMoves(Seq("a", "b", "c", "d"), Seq("t0", "t1")) ==
      Seq("a" -> "t0", "b" -> "t1"))
    assert(Sharding.chunkMoves(Seq("a", "b"), Seq("t0")).isEmpty)
  }
}
