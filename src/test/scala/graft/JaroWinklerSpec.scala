package graft

import org.apache.spark.sql.functions._

import graft.functions.JaroWinklerExpression
import graft.operators.Dedup

/** Pins the native Jaro-Winkler expression to the rapidfuzz/DuckDB
  * semantics the q139 oracle hash-checks: empty→0, transpositions
  * integer-halved, prefix bonus capped at 4 and gated on jaro > 0.7.
  * Textbook values are asserted to 1e-9 (the raw double, no rounding).
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    Seq((a, b)).toDF("a", "b")
      .select(JaroWinklerExpression.jaro_winkler(col("a"), col("b")))
      .head().getDouble(0)

  test("textbook values match the reference implementation") {
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-9)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-9)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-9)
  }

  test("edge semantics: empty, identical, disjoint, window-blocked") {
    assert(jw("", "") === 0.0)     // rapidfuzz/DuckDB: empty scores 0
    assert(jw("", "x") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("abc", "xyz") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window max(2,2)/2-1 = 0: no cross-match
  }

  test("transpositions are integer-halved: a 3-cycle counts 1, not 1.5") {
    // abxyzc/abyzxc: m=6, 3 out-of-order matches → t = 3/2 = 1
    assert(math.abs(jw("abxyzc", "abyzxc") - 0.9555555555555556) < 1e-9)
  }

  test("prefix bonus gates on jaro > 0.7 and caps at 4") {
    // jaro = 0.5 < 0.7: the 2-char prefix earns nothing
    assert(math.abs(jw("aaxxxxxx", "aayyyyyy") - 0.5) < 1e-9)
    // 7-char prefix capped at 4: jaro 11/12, jw = jaro + 0.4*(1-jaro)
    assert(math.abs(jw("aaaaaaab", "aaaaaaac") - 0.95) < 1e-9)
  }

  test("SQL registration serves the same expression") {
    JaroWinklerExpression.register(spark)
    val v = spark.sql("SELECT jaro_winkler('martha', 'marhta')").head().getDouble(0)
    assert(math.abs(v - 0.9611111111111111) < 1e-9)
  }

  test("blockedJaroWinklerPairs: block discipline + rounded threshold") {
    val people = Seq(
      (1L, "jonathan", "X"), (2L, "johnathan", "X"), // same block, jw high
      (3L, "jonathan", "Y"),                         // other block: never paired
      (4L, "zzzz", "X")                              // dissimilar: below threshold
    ).toDF("id", "name", "blk")
    val out = Dedup.blockedJaroWinklerPairs(people, "id", "name",
        Seq("blk"), minSim = 0.9)
      .as[(Long, Long, String, String, Double)].collect()
    assert(out.map(r => (r._1, r._2)) === Array((1L, 2L)))
    assert(out.head._5 >= 0.9 && out.head._5 <= 1.0)
  }
}
