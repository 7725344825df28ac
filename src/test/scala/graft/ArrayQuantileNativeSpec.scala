package graft

import org.apache.spark.sql.functions._
import graft.matrix.ArrayOps

/** The native codegen'd ArrayQuantileT7 must be bit-identical to the
  * built-ins composition it replaces — on random data, floats, and the
  * numpy worked examples.
  */
class ArrayQuantileNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native quantile == composed quantile, bit-exact, on random arrays") {
    val rng = new scala.util.Random(42)
    val arrays = Seq.fill(200)(Seq.fill(1 + rng.nextInt(40))(rng.nextGaussian() * 100))
    val qs = Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)
    val df = arrays.map(Tuple1(_)).toDF("a")
    qs.foreach { q =>
      val rows = df.select(
        ArrayOps.rowQuantile($"a", q).as("native"),
        ArrayOps.rowQuantileComposed($"a", q).as("composed")).collect()
      rows.foreach { r =>
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
               java.lang.Double.doubleToLongBits(r.getDouble(1)),
          s"q=$q: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      }
    }
  }

  test("native quantile matches numpy worked examples and casts float arrays") {
    val r = Seq(Tuple1(Seq(4.0f, 1.0f, 3.0f, 2.0f))).toDF("a")
      .select(ArrayOps.rowQuantile($"a", 0.75).as("q75"),
              ArrayOps.rowQuantile($"a", 0.5).as("med")).head()
    assert(r.getDouble(0) == 3.25 && r.getDouble(1) == 2.5)
  }

  test("registered for SQL as array_quantile_t7") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql("SELECT array_quantile_t7(array(4.0d, 1.0d, 3.0d, 2.0d), 0.75d) AS q").head()
    assert(r.getDouble(0) == 3.25)
  }

  test("simhash/scale_row/decimal_dot registered for SQL") {
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT simhash(array(5L, 5L, 5L), 4) AS sh,
                scale_row(array(1.0d, 2.0d), 3.0d) AS sr,
                decimal_dot(array(0.5d, 2.0d), array(2.0d, 0.25d)) AS dd""").head()
    assert(r.getLong(0) == 5L) // all votes positive on bits 0 and 2
    assert(r.getSeq[Double](1) == Seq(3.0, 6.0))
    assert(r.getDouble(2) == 1.5)
  }

  test("null/empty semantics: empty array and null element give null") {
    val df = Seq(Tuple1(Seq.empty[java.lang.Double]), Tuple1(Seq[java.lang.Double](1.0, null)))
      .toDF("a").select(ArrayOps.rowQuantile($"a", 0.5).as("q"))
    assert(df.collect().forall(_.isNullAt(0)))
  }

  test("generated code compiles and agrees with interpreted eval (CODEGEN_ONLY)") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, "CODEGEN_ONLY") // broken doGenCode would now fail, not fall back
      val df = graft.io.Tables.embeddings(spark, sf("sf0.001"))
        .select(col("vec_id"), ArrayOps.rowQuantile(col("embedding"), 0.75).as("q"))
      val codegenSum = df.agg(sum(round($"q", 6))).head().getDouble(0)
      spark.conf.set(key, "NO_CODEGEN")
      val interpSum = df.agg(sum(round($"q", 6))).head().getDouble(0)
      assert(codegenSum == interpSum && df.count() == 500)
    } finally {
      prev match { case Some(v) => spark.conf.set(key, v); case None => spark.conf.unset(key) }
    }
  }
}
