package graft.monitor

import graft.SparkSpec

class ProgressSpec extends SparkSpec {

  test("ETA formula: elapsed×(1−p)/p (data_copier.go:155-163)") {
    // half done after 10s → 10s to go
    assert(Progress.Snapshot(100, 50, 0, 10000).etaMs.contains(10000L))
    // 90% done after 9s → 1s to go
    assert(Progress.Snapshot(100, 90, 0, 9000).etaMs.contains(1000L))
    // nothing completed yet → no estimate
    assert(Progress.Snapshot(100, 0, 0, 5000).etaMs.isEmpty)
    assert(Progress.Snapshot(0, 0, 0, 5000).etaMs.isEmpty)
    assert(Progress.Snapshot(100, 50, 0, 10000).statusLine.contains("completed:50"))
  }

  test("listener counts scheduler tasks across a tracked job") {
    val (result, snap) = Progress.tracked(spark) {
      spark.range(1000000).repartition(8).count()
    }
    assert(result == 1000000L)
    assert(snap.total >= 8, s"expected >=8 tasks, saw ${snap.total}")
    assert(snap.completed == snap.total)
    assert(snap.failed == 0)
    assert(snap.percent == 1.0)
  }
}
