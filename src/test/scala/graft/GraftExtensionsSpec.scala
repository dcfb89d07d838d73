package graft

class GraftExtensionsSpec extends SparkSpecBase {

  test("float_array_dot is callable from SQL after registration") {
    // config-driven path (spark.sql.extensions=graft.GraftExtensions) only
    // applies to NEW sessions; the runtime path registers into this one
    org.apache.spark.sql.graft.GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT float_array_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("GraftExtensions wires the same builder (smoke)") {
    val ext = new GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext(e) // must not throw; full session-creation path needs a fresh JVM
  }
}
