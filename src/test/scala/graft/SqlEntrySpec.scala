package graft

/** E2 entry point (SURVEY.md §3.2): identical SQL text through
  * spark.sql over the registered catalog views must agree with the
  * DataFrame-DSL form of the same query.
  */
class SqlEntrySpec extends SparkSpec {

  test("SQL text entry agrees with the DSL form (Q13)") {
    val c = Catalog(spark, sf("sf0.001"))
    c.register()
    val viaSql = spark.sql(operators.Aggregates.q13Oracle
        .replace("TIMESTAMP '1998-09-02 00:00:00'", "TIMESTAMP'1998-09-02 00:00:00'"))
      .collect()
    val viaDsl = operators.Aggregates.q13(spark, sf("sf0.001")).collect()
    assert(viaSql.length == viaDsl.length)
    viaSql.zip(viaDsl).foreach { case (s, d) => assert(s == d, s"$s != $d") }
  }

  test("SQL text entry agrees with the DSL form (Q04 join)") {
    val c = Catalog(spark, sf("sf0.001"))
    c.register()
    val viaSql = spark.sql(operators.Joins.q04Oracle).collect()
    val viaDsl = operators.Joins.q04(spark, sf("sf0.001")).collect()
    assert(viaSql.length == viaDsl.length)
    viaSql.zip(viaDsl).foreach { case (s, d) => assert(s == d, s"$s != $d") }
  }
}
