package graft.embed

import graft.SparkSpec

class EmbedderSpec extends SparkSpec {

  private val e = Embedder.default

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    dot // vectors are unit-norm
  }

  test("deterministic: same text, same vector, dim 384") {
    val v1 = e.encodeOne("metformin renal clearance study")
    val v2 = e.encodeOne("metformin renal clearance study")
    assert(v1.length == 384)
    assert(v1.toSeq == v2.toSeq)
  }

  test("unit L2 norm (reference normalize_embeddings=True)") {
    val v = e.encodeOne("some document text here")
    val norm = math.sqrt(v.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("near-duplicate texts are closer than unrelated texts") {
    val base = e.encodeOne("the quick brown fox jumps over the lazy dog near the river")
    val near = e.encodeOne("the quick brown fox jumps over the lazy dog near a river")
    val far = e.encodeOne("completely unrelated telescope aperture photon flux calibration")
    assert(cos(base, near) > 0.8)
    assert(cos(base, near) > cos(base, far))
  }

  test("empty/null-safe: zero vector, no NaNs") {
    val v = e.encodeOne("")
    assert(v.forall(x => !x.isNaN))
    assert(v.forall(_ == 0f))
  }

  test("batch path equals per-row path") {
    val texts = Seq("a b c", "d e f", "a b c")
    val batch = e.encode(texts)
    assert(batch(0).toSeq == batch(2).toSeq)
    assert(batch(1).toSeq == e.encodeOne("d e f").toSeq)
  }
}
