package graft.annotate

import org.scalatest.funsuite.AnyFunSuite

/** Guards the compiled-payload cache contract: keys are broadcast-VALUE
  * identities (never Broadcast.id, which a recreated SparkContext reuses from
  * 0 and would silently serve a previous dictionary's compilation), and
  * eviction removes one LRU entry instead of clearing the cache. */
class CompileCacheSpec extends AnyFunSuite {

  test("ValueIdentity: distinct objects get distinct tokens, same object is stable") {
    // equal-by-value but distinct objects — the exact shape of "new context,
    // recreated broadcast with a reused id": must NOT collide
    val a = new String("dict")
    val b = new String("dict")
    assert(a == b && (a ne b))
    assert(ValueIdentity.of(a) != ValueIdentity.of(b))
    assert(ValueIdentity.of(a) == ValueIdentity.of(a))
  }

  test("CompileCache: hit avoids recompute, overflow evicts ONE entry (LRU), not all") {
    var computes = 0
    val c = new CompileCache[String](2)
    def get(k: String) = c.getOrCompute(k) { computes += 1; s"v$k" }
    assert(get("a") == "va" && get("a") == "va" && computes == 1)
    get("b")
    get("a") // touch a → b is now eldest
    get("c") // overflow: evicts b only
    assert(computes == 3)
    get("a") // still cached — a wholesale clear would recompute here
    assert(computes == 3)
    get("b") // evicted → recompute
    assert(computes == 4)
  }
}
