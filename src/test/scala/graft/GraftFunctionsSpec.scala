package graft

import org.apache.spark.sql.SparkSessionExtensions

class GraftFunctionsSpec extends SparkSpec {

  test("registered SQL functions work end-to-end through spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(1D,2D,3D), array(4D,5D,6D)) AS d, " +
        "vec_normalize(array(3D,4D)) AS n")
      .collect().head
    assert(r.getDouble(0) === 32.0)
    val n = r.getSeq[Double](1)
    assert(n.zip(Seq(0.6, 0.8)).forall { case (a, b) =>
      math.abs(a - b) < 1e-12 })
  }

  test("registration is idempotent") {
    GraftFunctions.register(spark)
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT vec_dot(array(1D), array(2D)) AS d")
      .collect().head.getDouble(0) === 2.0)
  }

  test("the extensions class injects every function") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; builders are wired
    assert(GraftFunctions.all.map(_._1.funcName).toSet
      === Set("vec_dot", "vec_normalize"))
  }
}
