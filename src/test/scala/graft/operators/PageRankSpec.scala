package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Integer fixed-point PageRank. Ground truth is an in-test
  * replay of the exact arithmetic (long division, damped per-edge
  * contributions, order-independent long sums) — the same spelling the
  * q141 DuckDB oracle unrolls. */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Exact in-memory replay of the operator's integer recurrence. */
  private def brute(edges: Seq[(Long, Long)], iters: Int,
      scale: Long = 1000000000000L, dn: Long = 85L,
      dd: Long = 100L,
      seeds: Option[Set[Long]] = None): Map[Long, Long] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val base = ((dd - dn) * scale) / dd
    def baseOf(n: Long) = seeds match {
      case Some(s) => if (s(n)) base else 0L
      case None => base
    }
    var r = nodes.map(n =>
      n -> (if (seeds.forall(_(n))) scale else 0L)).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      e.foreach { case (s, d) =>
        in(d) += (dn * (r(s) / deg(s))) / dd
      }
      r = nodes.map(n => n -> (baseOf(n) + in(n))).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank(edges.toDF("src", "dst"), "src", "dst", iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("two-node cycle: closed-form fixed point") {
    // symmetric pair, outdeg 1 both: r_{i+1} = base + 85% of r_i
    val got = run(Seq((1L, 2L), (2L, 1L)), iters = 3)
    var r = 1000000000000L
    for (_ <- 1 to 3) r = 150000000000L + (85L * r) / 100L
    assert(got === Map(1L -> r, 2L -> r))
  }

  test("star hub collects mass; dangling leaves decay to base") {
    // directed star 2..5 -> 1; node 1 dangles (no out-edges)
    val got = run((2L to 5L).map(i => (i, 1L)), iters = 2)
    // leaves: no in-edges, rank = base after every iteration
    (2L to 5L).foreach(i => assert(got(i) === 150000000000L))
    // hub iter1: base + 4 * 85% of scale; iter2: base + 4 * 85% of base
    val it2 = 150000000000L + 4L * ((85L * 150000000000L) / 100L)
    assert(got(1L) === it2)
  }

  test("randomized graphs equal the exact integer replay") {
    val rnd = new Random(7)
    for (trial <- 1 to 3) {
      val n = 20 + trial * 10
      val edges = (1 to n * 3).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val want = brute(edges, iters = 4)
      val got = run(edges, iters = 4)
      assert(got === want, s"trial $trial")
    }
  }

  test("duplicate edges collapse; null endpoints drop") {
    val e = Seq((1L, 2L), (1L, 2L), (2L, 1L))
    assert(run(e, 2) === brute(Seq((1L, 2L), (2L, 1L)), 2))
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(1L, 2L),
        org.apache.spark.sql.Row(2L, 1L),
        org.apache.spark.sql.Row(null, 3L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("dst",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val got = PageRank(withNull, "src", "dst", iterations = 2)
      .as[(Long, Long)].collect().toMap
    assert(got === brute(Seq((1L, 2L), (2L, 1L)), 2))
  }

  test("total mass is conserved on a symmetrized graph (no dangling)") {
    val rnd = new Random(11)
    val half = (1 to 40).map(_ =>
      (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(p => p._1 != p._2)
    val edges = (half ++ half.map(_.swap)).distinct
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.size
    val got = run(edges, iters = 5)
    val total = got.values.sum
    // integer truncation only ever loses mass, one ulp per node per
    // division — total stays within nodes*(iters)*(outdeg) ulps of
    // nodes*scale and never exceeds it
    assert(total <= nodes * 1000000000000L)
    assert(total > (nodes * 1000000000000L * 999L) / 1000L)
  }

  test("personalized: teleport lands only on seeds; exact integer replay; " +
      "a component with no seed stays at zero") {
    val rnd = new Random(17)
    // two disjoint symmetric components: {0..7} and {100..105}
    val a = (1 to 30).map(_ =>
      (rnd.nextInt(8).toLong, rnd.nextInt(8).toLong)).filter(p => p._1 != p._2)
    val b = (1 to 10).map(_ =>
      (100L + rnd.nextInt(6), 100L + rnd.nextInt(6))).filter(p => p._1 != p._2)
    val edges = (a ++ a.map(_.swap) ++ b ++ b.map(_.swap)).distinct
    val seeds = Seq(0L, 3L)
    val want = brute(edges, iters = 4, seeds = Some(seeds.toSet))
    val got = PageRank(edges.toDF("src", "dst"), "src", "dst",
      iterations = 4, seeds = Some(seeds))
      .as[(Long, Long)].collect().toMap
    assert(got === want)
    // the seedless component receives no teleport and no propagation
    got.filter(_._1 >= 100L).values.foreach(v => assert(v === 0L))
    // seeds and their neighborhood carry all the mass
    assert(got.filter(_._1 < 8L).values.sum > 0L)
  }

  test("noDanglingReceivers path equals the default on a symmetrized graph") {
    val rnd = new Random(13)
    val half = (1 to 30).map(_ =>
      (rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2)
    val edges = (half ++ half.map(_.swap)).distinct
    val df = edges.toDF("src", "dst")
    val a = PageRank(df, "src", "dst", iterations = 4)
      .as[(Long, Long)].collect().toMap
    val b = PageRank(df, "src", "dst", iterations = 4,
      noDanglingReceivers = true)
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("argument validation") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](PageRank(e, "src", "dst", 0))
    intercept[IllegalArgumentException](
      PageRank(e, "src", "dst", 5, scale = 0L))
    intercept[IllegalArgumentException](
      PageRank(e, "src", "dst", 5, dampNum = 101L))
  }
}
