package graft.expressions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ops.VectorSim

/** The native dot-product expression: bit-exact vs the HOF fold, codegen
  * path exercised, SQL registration via GraftExtensions. */
class DotProductSpec extends SparkSpec {
  import spark.implicits._

  test("bit-identical to the aggregate(zip_with) fold on real embeddings") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), VectorSim.toDouble(col("embedding")).as("e"))
      .limit(50).cache()
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(
        DotProduct(col("a.e"), col("b.e")).as("native"),
        VectorSim.dotHof(col("a.e"), col("b.e")).as("hof"))
    // exact bitwise equality, not tolerance — same fold order required
    assert(pairs.filter(col("native") =!= col("hof")).count() == 0)
    assert(pairs.filter(col("native").isNull).count() == 0)
  }

  test("null array yields null; length mismatch uses the shorter prefix") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0))),
      (None: Option[Seq[Double]], Some(Seq(1.0)))).toDF("a", "b")
    val got = df.select(DotProduct(col("a"), col("b"))).as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(14.0), None))
  }

  test("registered for SQL via spark.sql.extensions=graft.GraftExtensions") {
    val got = spark.sql("SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(got == 11.0)
  }
}
