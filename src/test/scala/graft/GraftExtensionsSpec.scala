package graft

/** The declarative registration path: a `newSession()` gets a FRESH
  * function registry (runtime `registerFunctions` calls don't carry over),
  * so these resolving proves the `spark.sql.extensions` injection works —
  * exactly what a cluster job setting only the config would rely on.
  */
class GraftExtensionsSpec extends SparkSpec {

  test("new sessions resolve graft_dot/graft_shingles via spark.sql.extensions alone") {
    val ns = spark.newSession()
    val dot = ns
      .sql("SELECT graft_dot(array(cast(2.0 as float), cast(3.0 as float)), array(cast(4.0 as float), cast(5.0 as float))) AS d")
      .collect()(0).getDouble(0)
    assert(dot == 23.0)
    val sh = ns
      .sql("SELECT graft_shingles('a b c d', 3) AS s")
      .collect()(0).getSeq[String](0)
    assert(sh == Seq("a b c", "b c d"))
    val dotl = ns
      .sql("SELECT graft_dotl(array(2L, 3L), array(4L, 5L)) AS d")
      .collect()(0).getLong(0)
    assert(dotl == 23L)
  }
}
