package graft

/** The custom expressions are registered for SQL (GraftFunctions.registerAll
  * at session build; GraftExtensions for spark.sql.extensions) — verify the
  * SQL surface agrees with the Column API and the kernel statics. */
class FunctionsSqlSpec extends SparkSpec {
  import spark.implicits._

  test("graft_jaro_winkler usable from SQL and equals the kernel") {
    val got = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS jw").as[Double].collect()(0)
    assert(math.abs(got - 0.9611111111111111) < 1e-12)
  }

  test("graft_cosine_sim from SQL over array literals") {
    val got = spark.sql(
      "SELECT graft_cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").as[Double].collect()(0)
    assert(got == 0.0)
  }

  test("graft_simhash64 deterministic from SQL") {
    val a = spark.sql("SELECT graft_simhash64('alpha beta gamma') AS h").as[Long].collect()(0)
    val b = spark.sql("SELECT graft_simhash64('alpha beta gamma') AS h").as[Long].collect()(0)
    assert(a == b)
  }

  test("vector kernels reject non-float/double and MIXED element types at analysis") {
    import org.apache.spark.sql.AnalysisException
    // int arrays: the original silent-garbage class — must fail analysis
    val eInt = intercept[AnalysisException] {
      spark.sql("SELECT graft_cosine_sim(array(1, 2), array(3, 4))").collect()
    }
    assert(eInt.getMessage.contains("array<float> or"), eInt.getMessage)
    // mixed float × double: each side is individually legal, but the kernel
    // dispatches on the LEFT element type — getFloat over double storage
    // would return garbage halves, so analysis must reject the mix
    val mixed = Seq((Array(1f, 0f), Array(1.0, 0.0))).toDF("f", "d")
    val eMix = intercept[AnalysisException] {
      mixed.select(graft.functions.GraftFunctions.cosine_sim($"f", $"d")).collect()
    }
    assert(eMix.getMessage.contains("share one element"), eMix.getMessage)
    // same-typed calls still pass: float×float and double×double
    val okF = mixed.select(graft.functions.GraftFunctions.cosine_sim($"f", $"f"))
      .as[Double].collect()(0)
    val okD = mixed.select(graft.functions.GraftFunctions.cosine_sim($"d", $"d"))
      .as[Double].collect()(0)
    assert(math.abs(okF - 1.0) < 1e-9 && math.abs(okD - 1.0) < 1e-9)
  }

  test("all graft functions present in the session registry") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    for (name <- Seq("graft_jaro_winkler", "graft_cosine_sim", "graft_simhash64"))
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name not registered")
  }
}
