package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.StoredIndexes

/** The build-once staging root's concurrency and keying contracts —
  * the two properties a parallel runner would lean on. */
class StoredIndexesSpec extends AnyFunSuite {

  test("colliding String.hashCode corpus dirs get distinct artifact paths") {
    // "Aa" and "BB" famously share a Java hashCode; with the old
    // 32-bit keying one corpus's index would silently serve the other
    assert("Aa".hashCode === "BB".hashCode)
    assert(StoredIndexes.pathFor("idx", "Aa") !== StoredIndexes.pathFor("idx", "BB"))
    // and the key is stable: same input, same path
    assert(StoredIndexes.pathFor("idx", "Aa") === StoredIndexes.pathFor("idx", "Aa"))
  }

  test("concurrent first builders run the build exactly once, all share it") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String =
            StoredIndexes.ensure("spec_art", "/spec/corpus") { p =>
              calls.incrementAndGet()
              Thread.sleep(50) // widen the race window
              java.nio.file.Files.createDirectories(java.nio.file.Paths.get(p))
              ()
            }
        })
      }
      val paths = futures.map(_.get()).toSet
      assert(calls.get() === 1, "the build must run exactly once")
      assert(paths.size === 1, "every caller must see the same artifact path")
    } finally pool.shutdown()
  }

  test("a failed build is not memoized; the next caller retries") {
    val calls = new java.util.concurrent.atomic.AtomicInteger(0)
    assertThrows[RuntimeException] {
      StoredIndexes.ensure("spec_fail", "/spec/corpus") { _ =>
        calls.incrementAndGet(); sys.error("boom")
      }
    }
    StoredIndexes.ensure("spec_fail", "/spec/corpus")(_ => calls.incrementAndGet())
    assert(calls.get() === 2)
  }
}
