package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{VectorFunctions => V}

/** The native codegen kernel must be BIT-IDENTICAL to the HOF left fold
  * (that equivalence is what keeps the DuckDB oracle exact). */
class DotProductSpec extends SparkSpec {

  test("native dot == HOF fold, bit-exact, on real embeddings") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
      .select(col("vec_id"), V.toDouble(col("embedding")).as("v"))
    val a = emb.select(col("vec_id").as("a_id"), col("v").as("a_v"))
    val b = emb.select(col("vec_id").as("b_id"), col("v").as("b_v"))
    val mismatches = a.join(b, col("a_id") < col("b_id") && col("b_id") < col("a_id") + 20)
      .withColumn("nat", DotProduct(col("a_v"), col("b_v")))
      .withColumn("hof", V.dot(col("a_v"), col("b_v")))
      .filter(col("nat") =!= col("hof"))
      .count()
    assert(mismatches === 0L)
  }

  test("null and length-mismatch behavior") {
    import spark.implicits._
    val df = Seq(
      // dimension mismatch -> NULL (zip_with null-pads, so the HOF
      // form is also null) — a truncated partial dot would be a
      // confidently wrong cosine for mixed embedding versions
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0, 9.0))),
      (Some(Seq(1.0, 2.0)), Some(Seq(3.0, 4.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(DotProduct(col("a"), col("b"))).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getDouble(0) === 11.0)
    assert(out(2).isNullAt(0))
  }

  test("null ELEMENT yields NULL (HOF parity), not a silent 0.0 term") {
    import spark.implicits._
    val df = Seq(
      (Seq(Option(1.0), None), Seq(Option(3.0), Option(4.0))),
      (Seq(Option(1.0), Option(2.0)), Seq(Option(3.0), Option(4.0))))
      .toDF("a", "b")
    val out = df.select(
      DotProduct(col("a"), col("b")).as("nat"),
      V.dot(col("a"), col("b")).as("hof")).collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1)) // both engines agree
    assert(out(1).getDouble(0) === 11.0)
    assert(out(1).getDouble(1) === 11.0)
  }

  test("expression participates in whole-stage codegen") {
    val emb = graft.Tables(spark, sf("sf0.001"), "embeddings")
      .select(V.toDouble(col("embedding")).as("v"))
      .select(DotProduct(col("v"), col("v")).as("d"))
    // "*(n)" marks operators inside a WholeStageCodegen span
    val plan = emb.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().startsWith("*("), plan)
  }
}
