package graft.embed

import org.scalatest.funsuite.AnyFunSuite

class EmbedderSpec extends AnyFunSuite {
  private val e = HashingEmbedder(64)

  test("hash32 matches the cross-engine md5 contract") {
    // DuckDB: SELECT CAST(('0x'||substr(md5('abc'),1,8)) AS BIGINT) = 2416005272
    assert(HashingEmbedder.hash32("abc") == 2416005272L)
    assert(HashingEmbedder.hash32("") == 0xd41d8cd9L) // md5("") = d41d8cd9...
  }

  test("deterministic across instances and calls") {
    val a = e.embed("big data table scan query")
    val b = HashingEmbedder(64).embed("big data table scan query")
    assert(a.toSeq == b.toSeq)
  }

  test("output is L2-normalized for non-empty input") {
    val v = e.embed("hello world foo")
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    assert(math.abs(norm - 1.0) < 1e-6)
    assert(v.length == 64)
  }

  test("empty / whitespace input embeds to the zero vector") {
    assert(e.embed("").forall(_ == 0.0f))
    assert(e.embed("   ").forall(_ == 0.0f))
  }

  test("case-insensitive tokenization") {
    assert(e.embed("Hello World").toSeq == e.embed("hello world").toSeq)
  }

  test("different texts map to different directions") {
    val a = e.embed("alpha beta gamma")
    val b = e.embed("delta epsilon zeta")
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    assert(dot < 0.999) // not identical directions
  }
}
