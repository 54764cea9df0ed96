package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixedPointDotSpec extends SparkSpec {

  test("fp_dot equals the HOF aggregate(zip_with) form bit-for-bit") {
    import spark.implicits._
    FixedPointDot.install(spark)
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextGaussian()), Array.fill(64)(rnd.nextGaussian()))
    }
    val df = rows.toDF("id", "a", "b")
      .withColumn("native", expr("fp_dot(a, b)"))
      .withColumn("hof", expr(
        "aggregate(zip_with(a, b, (x, y) -> x*y), CAST(0 AS BIGINT), " +
          "(acc, p) -> acc + CAST(FLOOR(p * 1000000000000.0 + 0.5) AS BIGINT))"))
    assert(df.filter($"native" =!= $"hof").isEmpty,
      "native expression diverged from the interpreted HOF contract")
    // and from an independent re-derivation of the kernels' JVM fold
    val got = df.select($"id", $"native").as[(Long, Long)].collect().toMap
    rows.foreach { case (id, a, b) =>
      val want = a.zip(b).map { case (x, y) =>
        math.floor(x * y * 1e12 + 0.5).toLong
      }.sum
      assert(got(id) == want, s"row $id: native ${got(id)} != kernel fold $want")
    }
  }

  test("fp_dot edge cases: empty arrays, zero vectors, null input") {
    import spark.implicits._
    FixedPointDot.install(spark)
    val df = Seq(
      (1L, Some(Array.empty[Double]), Some(Array.empty[Double])),
      (2L, Some(Array(0.0, 0.0)), Some(Array(0.0, 0.0))),
      (3L, None, Some(Array(1.0)))
    ).toDF("id", "a", "b").withColumn("d", expr("fp_dot(a, b)"))
    val got = df.select($"id", $"d").collect().map(r => r.getLong(0) -> (
      if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).contains(0L), "empty arrays fold to 0")
    assert(got(2L).contains(0L), "zero vectors fold to 0")
    assert(got(3L).isEmpty, "null input propagates null")
  }

  test("fp_dot codegen compiles on NON-nullable containsNull=false inputs") {
    import spark.implicits._
    FixedPointDot.install(spark)
    // array(...) over non-nullable id builds containsNull=false arrays on
    // a non-nullable column, so fp_dot.nullable is FALSE and
    // nullSafeCodeGen leaves ev.isNull undeclared (FalseLiteral): the
    // generated branch must not write to it (`false = true;` fails Janino
    // and silently drops the stage to interpreted). fallback=false makes
    // that failure loud instead of a quiet 10x.
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val got = spark.range(3)
        .select($"id", expr(
          "fp_dot(array(CAST(id AS DOUBLE), 2.0D), array(3.0D, CAST(id AS DOUBLE)))").as("d"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0L until 3L).foreach { id =>
        val want = math.floor(id * 3.0 * 1e12 + 0.5).toLong +
          math.floor(2.0 * id * 1e12 + 0.5).toLong
        assert(got(id) == want, s"id $id: ${got(id)} != $want")
      }
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("fp_dot null ELEMENTS null the whole sum, matching the HOF form (ADVICE r5)") {
    import spark.implicits._
    FixedPointDot.install(spark)
    // element-nullable arrays via sql literals: the HOF form propagates
    // null through the sum; fp_dot must agree instead of reading the
    // null slot as garbage
    val df = spark.sql(
      """SELECT fp_dot(a, b) AS native,
                aggregate(zip_with(a, b, (x, y) -> x*y), CAST(0 AS BIGINT),
                  (acc, p) -> acc + CAST(FLOOR(p * 1000000000000.0 + 0.5) AS BIGINT)) AS hof
         FROM VALUES
           (array(1.0D, CAST(NULL AS DOUBLE), 3.0D), array(1.0D, 1.0D, 1.0D)),
           (array(1.0D, 2.0D), array(CAST(NULL AS DOUBLE), 1.0D)),
           (array(1.0D, 2.0D), array(3.0D, 4.0D)) AS t(a, b)""")
    val rows = df.collect()
    assert(rows(0).isNullAt(0) && rows(0).isNullAt(1), "null element in a -> NULL, both forms")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1), "null element in b -> NULL, both forms")
    assert(!rows(2).isNullAt(0) && rows(2).getLong(0) == rows(2).getLong(1),
      "non-null rows still agree with the HOF form")
  }
}
