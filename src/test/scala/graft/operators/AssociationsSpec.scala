package graft.operators

import graft.SparkSpec

class AssociationsSpec extends SparkSpec {
  import spark.implicits._

  // 5 baskets over items A/B/C/D; D appears once (infrequent)
  private val facts = Seq(
    (1L, "A"), (1L, "B"), (1L, "C"),
    (2L, "A"), (2L, "B"),
    (3L, "A"), (3L, "C"),
    (4L, "B"), (4L, "C"), (4L, "D"),
    (5L, "A"), (5L, "B"), (5L, "C"),
    (5L, "A") // duplicate fact row: distinct() must collapse it
  ).toDF("basket", "item")

  private def rules(minItem: Double, minPair: Double, minConf: Double) =
    Associations.assocRules(facts, "basket", "item", minItem, minPair, minConf)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap

  test("hand-checked counts and metrics") {
    // n(A)=4 n(B)=4 n(C)=4; n(AB)=3 n(AC)=3 n(BC)=3; nb=5
    val got = rules(0.0, 0.0, 0.0)
    val (nBoth, sup, conf, lift) = got(("A", "B"))
    assert(nBoth === 3L)
    assert(sup === 0.6) // 3/5
    assert(conf === 0.75) // 3/4
    assert(lift === 0.9375) // 3*5/(4*4)
    // both directions are emitted with symmetric support/lift
    assert(got(("B", "A"))._2 === 0.6)
    assert(got(("B", "A"))._4 === 0.9375)
  }

  test("a-priori prune: infrequent item appears in no rule") {
    // D is in 1/5 baskets; with minItemSupport 0.3 it must vanish
    val got = rules(0.3, 0.0, 0.0)
    assert(!got.keys.exists(k => k._1 == "D" || k._2 == "D"))
    assert(got.keys.toSet ===
      Set(("A", "B"), ("B", "A"), ("A", "C"), ("C", "A"), ("B", "C"), ("C", "B")))
  }

  test("confidence filter compares the unrounded ratio") {
    // all rules have conf 0.75 here; threshold just above keeps none,
    // exactly at keeps all
    assert(rules(0.3, 0.0, 0.750001).isEmpty)
    assert(rules(0.3, 0.0, 0.75).size === 6)
  }

  test("pair-support filter") {
    // all pairs have support 0.6; 0.7 kills them
    assert(rules(0.3, 0.7, 0.0).isEmpty)
  }
}
