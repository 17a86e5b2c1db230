package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins weightedJaccardPairs' contract: exact Σmin/Σmax values on a
  * hand-computed fixture, the multiplicity discrimination that motivates
  * it over set Jaccard, and the df-cap dropping boilerplate grams from
  * BOTH the totals and the pairing.
  */
class WeightedJaccardSpec extends SparkSpec {

  private def pairs(rows: Seq[(Long, String)], maxDf: Int = 64,
                    threshold: Double = 0.0): Map[(Long, Long), (Long, Double)] = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "text")
    Dedup.weightedJaccardPairs(df, "doc_id", "text", 3, threshold, maxDf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
  }

  test("hand-computed Σmin / (totA+totB−Σmin) on overlapping grams") {
    // doc 1: "a b c d"  → grams {a b c, b c d}, tot=2
    // doc 2: "a b c e"  → grams {a b c, b c e}, tot=2
    // shared: "a b c" min(1,1)=1 → wJ = 1/(2+2−1) = 1/3
    val m = pairs(Seq((1L, "a b c d"), (2L, "a b c e")))
    assert(m((1L, 2L)) === ((1L, 0.3333)))
  }

  test("multiplicity discriminates where set Jaccard saturates") {
    // doc 1 contains the phrase once; doc 2 repeats it 4× — identical
    // gram SETS (set Jaccard = 1.0 on shared grams) but weighted
    // Jaccard sees the tf imbalance
    val once = "x y z"
    val four = "x y z x y z x y z x y z"
    val m = pairs(Seq((1L, once), (2L, four)))
    val (smin, wj) = m((1L, 2L))
    // doc1 grams: {x y z}×1, tot=1; doc2: 10 grams (window over 12
    // tokens), of which "x y z" appears 4×; shared min = 1
    assert(smin === 1L)
    assert(wj < 0.12) // 1 / (1 + 10 − 1) = 0.1
    assert(wj === 0.1)
  }

  test("df-capped grams vanish from totals AND pairing") {
    // the gram "t t t" appears in every doc (df=4 > maxDf=3) → dropped;
    // docs 1/2 still pair on "p q r", docs 3/4 share ONLY boilerplate
    // and must not pair at all
    val rows = Seq(
      (1L, "t t t p q r"), (2L, "t t t p q r"),
      (3L, "t t t a a a"), (4L, "t t t b b b"))
    val m = pairs(rows, maxDf = 3)
    assert(m.keySet.forall { case (a, b) => Set(a, b).subsetOf(Set(1L, 2L)) },
      s"boilerplate-only docs paired: ${m.keySet}")
    assert(m.contains((1L, 2L)))
    // doc1 ≡ doc2: after the cap both keep the same surviving gram
    // multiset, so wJ = 1.0
    assert(m((1L, 2L))._2 === 1.0)
  }

  test("threshold filters strictly below") {
    val rows = Seq((1L, "a b c d"), (2L, "a b c e"))
    assert(pairs(rows, threshold = 0.34).isEmpty) // 1/3 < 0.34
    assert(pairs(rows, threshold = 0.33).nonEmpty)
  }
}
