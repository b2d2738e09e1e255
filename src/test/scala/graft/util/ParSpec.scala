package graft.util

import org.scalatest.funsuite.AnyFunSuite

class ParSpec extends AnyFunSuite {

  test("run executes every thunk and preserves effects") {
    val hits = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    Par.run(() => { hits.add(1); () }, () => { hits.add(2); () },
      () => { hits.add(3); () })
    assert(hits.size == 3)
  }

  test("run rethrows the first failure after awaiting all thunks") {
    val finished = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[IllegalStateException] {
      Par.run(
        () => throw new IllegalStateException("boom"),
        () => { Thread.sleep(100); finished.set(true) })
    }
    assert(e.getMessage == "boom")
    // the failing thunk must NOT abandon its siblings mid-write: every
    // action is awaited before the failure propagates
    assert(finished.get())
  }

  test("concurrent sibling failures attach as suppressed, not discarded") {
    val e = intercept[IllegalStateException] {
      Par.run(
        () => throw new IllegalStateException("first"),
        () => throw new IllegalArgumentException("second"))
    }
    assert(e.getMessage == "first")
    assert(e.getSuppressed.map(_.getMessage).toSeq == Seq("second"))
  }

  test("thunks run on attributable par-sink-<i> threads") {
    val names = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    Par.run(() => { names.add(Thread.currentThread().getName); () },
      () => { names.add(Thread.currentThread().getName); () })
    assert(names.contains("par-sink-0") && names.contains("par-sink-1"))
  }

  test("single thunk runs on the caller thread (serial fallback)") {
    val caller = Thread.currentThread().getId
    var seen = -1L
    Par.run(() => seen = Thread.currentThread().getId)
    assert(seen == caller)
  }

  test("eval3 returns all three values") {
    assert(Par.eval3(() => 1, () => "a", () => 2L) == ((1, "a", 2L)))
  }
}
