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

  test("all graft functions present in the session registry") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    for (name <- Seq("graft_jaro_winkler", "graft_cosine_sim", "graft_simhash64"))
      assert(reg.functionExists(FunctionIdentifier(name)), s"$name not registered")
  }
}
