package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance weighting + Gumbel-top-k resampling
  * ([[graft.operators.Dsir]]) — brute-force equality against an
  * in-test Scala reimplementation, the sampling-law sanity of the
  * Gumbel draw, edge-text contracts, and the broadcast plan shape. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 64

  /** In-test reference: identical feature definition (unigrams +
    * bigrams of Java split(' ')), hash, smoothing and λ chain. */
  private def bruteWeights(
      raw: Seq[(Long, String)], target: Seq[(Long, String)],
      alpha: Double = 1.0): Map[Long, (Long, Double)] = {
    def feats(s: String): Seq[Int] = {
      val t = s.split(' ')
      val out = scala.collection.mutable.ArrayBuffer[Int]()
      var i = 0
      while (i < t.length) {
        def b(f: String): Int = {
          val h = graft.functions.HashFunctions.hash64(f)
          (((h % dims) + dims) % dims).toInt
        }
        out += b(t(i))
        if (i + 1 < t.length) out += b(t(i) + " " + t(i + 1))
        i += 1
      }
      out.toSeq
    }
    val rf = raw.flatMap { case (_, s) => feats(s) }
    val tf = target.flatMap { case (_, s) => feats(s) }
    val rc = rf.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tc = tf.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val (nr, nt) = (rf.size.toDouble, tf.size.toDouble)
    def lam(b: Int): Double =
      math.log(tc.getOrElse(b, 0L).toDouble + alpha) -
        math.log(nt + alpha * dims) -
        math.log(rc(b).toDouble + alpha) +
        math.log(nr + alpha * dims)
    raw.map { case (id, s) =>
      val fs = feats(s)
      id -> (fs.size.toLong ->
        BigDecimal(fs.map(lam).sum)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toMap
  }

  test("importanceWeights equals brute force on a random corpus") {
    val rnd = new scala.util.Random(17)
    val vocab = Vector("spark", "scan", "join", "agg", "the", "fast", "slow")
    def doc(): String =
      Seq.fill(2 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    val raw = (1L to 60L).map(i => i -> doc())
    val target = raw.filter(_._1 % 5 == 0).map { case (i, _) => i -> doc() }
    val got = Dsir.importanceWeights(
      raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"),
      "doc_id", "text", dims = dims)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    val want = bruteWeights(raw, target)
    assert(got.keySet === want.keySet)
    for ((id, (nf, lw)) <- want) {
      assert(got(id)._1 === nf, s"n_features of $id")
      assert(math.abs(got(id)._2 - lw) <= 1e-4 + 1e-12,
        s"logw of $id: got ${got(id)._2}, want $lw")
    }
  }

  test("weights separate target-like from off-target docs") {
    // target is pure "alpha beta"; raw has target-like and junk docs —
    // the target-like ones must score strictly higher
    val raw = Seq(
      (1L, "alpha beta alpha beta alpha beta"),
      (2L, "gamma delta gamma delta gamma delta"),
      (3L, "alpha beta alpha beta alpha beta"),
      (4L, "epsilon zeta epsilon zeta epsilon zeta"))
    val target = Seq((100L, "alpha beta alpha beta"))
    val w = Dsir.importanceWeights(
      raw.toDF("doc_id", "text"), target.toDF("doc_id", "text"),
      "doc_id", "text", dims = dims)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w(1L) > w(2L) && w(3L) > w(4L))
    assert(w(1L) === w(3L)) // identical docs, identical weight
  }

  test("null and degenerate texts follow the q120 contract") {
    val raw = Seq((1L, "a b"), (2L, null), (3L, "   "), (4L, ""))
      .toDF("doc_id", "text")
    val target = Seq((9L, "a b")).toDF("doc_id", "text")
    val rows = Dsir.importanceWeights(raw, target, "doc_id", "text",
      dims = dims).collect().map(r =>
      r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(rows(2L) === ((None, None)))           // null text -> nulls
    assert(rows(3L)._1 === Some(0L))              // all-space: 0 features
    assert(rows(3L)._2 === Some(0.0))
    assert(rows(4L)._1 === Some(1L))              // "" -> one empty token
    assert(rows(1L)._1 === Some(3L))              // 2 unigrams + 1 bigram
  }

  test("gumbelTopK: deterministic under seed, law of the Gumbel-max trick") {
    val w = (1L to 200L).map(i => (i, if (i <= 20) 2.0 else -2.0))
      .toDF("doc_id", "logw")
    val a = Dsir.gumbelTopK(w, "doc_id", "logw", k = 30, seed = Some(5L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Dsir.gumbelTopK(w, "doc_id", "logw", k = 30, seed = Some(5L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq) // same seed, same sample, same ranks
    // e^4 ≈ 55x weight ratio: the 20 heavy docs should dominate the
    // top 30 but the noise must admit SOME light docs over 200 draws
    val heavy = a.count(_._1 <= 20L)
    assert(heavy >= 15, s"heavy docs in top-30: $heavy")
    val c = Dsir.gumbelTopK(w, "doc_id", "logw", k = 30, seed = Some(6L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(c.toSeq !== a.toSeq) // different seed, different draw
  }

  test("gumbelTopK with seed=None is the deterministic top-k by weight") {
    val w = Seq((1L, 0.5), (2L, 3.0), (3L, -1.0), (4L, 3.0))
      .toDF("doc_id", "logw")
    val got = Dsir.gumbelTopK(w, "doc_id", "logw", k = 3, seed = None)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((2L, 1L), (4L, 2L), (1L, 3L))) // ties break by id
  }

  test("plan: λ table joins under a broadcast hint; selection is TakeOrdered") {
    val raw = (1L to 50L).map(i => (i, s"tok$i common")).toDF("doc_id", "text")
    val target = Seq((1L, "common common")).toDF("doc_id", "text")
    val w = Dsir.importanceWeights(raw, target, "doc_id", "text", dims = dims)
    val plan = w.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"λ join must broadcast, got:\n$plan")
    val topk = Dsir.gumbelTopK(w, "id", "logw", k = 5, seed = Some(1L))
    val tplan = topk.queryExecution.executedPlan.toString
    assert(tplan.contains("TakeOrderedAndProject"),
      s"selection must be distributed top-k, got:\n$tplan")
  }
}
