package graft.ext

import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import org.scalatest.funsuite.AnyFunSuite

/** Par is the driver-overlap primitive every lifecycle operator rides —
  * its failure semantics and nesting behaviour are load-bearing for
  * state consistency (ADVICE r21: a caller observing completion while
  * a sibling job still mutates tables corrupts cross-rep state), so
  * they are pinned here rather than assumed.
  */
class ParSpec extends AnyFunSuite {

  test("map preserves order and runs every element") {
    assert(Par.map(1 to 20)(_ * 2) == (2 to 40 by 2))
  }

  test("a failure rethrows ONLY after every sibling completed (ADVICE r21 medium)") {
    // The hazard: fail-fast would return control to a caller that
    // immediately drops/recreates tables a still-running sibling is
    // writing. Pin: when the first element throws instantly, the
    // caller must not observe the exception until the slow sibling
    // has finished its work.
    val slowDone = new AtomicBoolean(false)
    val e = intercept[RuntimeException] {
      Par.all(
        () => throw new RuntimeException("fast failure"),
        () => { Thread.sleep(300); slowDone.set(true); 1 })
    }
    assert(e.getMessage == "fast failure")
    assert(slowDone.get(),
      "Par returned control while a sibling thunk was still running")
  }

  test("later failures attach as suppressed to the first") {
    val e = intercept[RuntimeException] {
      Par.all[Int](
        () => throw new RuntimeException("first"),
        () => { Thread.sleep(50); throw new IllegalStateException("second") })
    }
    assert(e.getMessage == "first")
    assert(e.getSuppressed.map(_.getMessage).toSeq == Seq("second"))
  }

  test("nesting completes without deadlock and holds exactly outer x inner tasks") {
    // The fan-out cap convention (Par doc): concurrency is bounded by
    // the CALL SITES, nesting multiplies them, and the cached pool
    // must neither deadlock (a bounded pool would: pooled tasks block
    // on slots their ancestors hold) nor amplify beyond outer*inner.
    val outer = 3; val inner = 4
    val live = new AtomicInteger(0)
    val peak = new AtomicInteger(0)
    val res = Par.map(0 until outer) { i =>
      Par.map(0 until inner) { j =>
        val n = live.incrementAndGet()
        peak.getAndAccumulate(n, math.max)
        Thread.sleep(100)
        live.decrementAndGet()
        i * inner + j
      }.sum
    }
    assert(res.sum == (0 until outer * inner).sum, "every leaf ran once")
    assert(peak.get() <= outer * inner,
      s"peak concurrency ${peak.get()} exceeds the call sites' product")
    assert(peak.get() >= inner,
      "nesting serialized entirely — the overlap the operators rely on is gone")
  }
}
