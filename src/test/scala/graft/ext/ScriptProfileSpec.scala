package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Charset/script sanity profile. */
class ScriptProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def run(rows: (Long, String)*) = {
    val df = rows.toDF("doc_id", "text")
    ScriptProfile.battery(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
  }

  test("clean text: exact class counts, majority gate passes") {
    val r = run(1L -> "hello world 42!")(1L)
    assert(r.getAs[Long]("n_chars") === 15L)
    assert(r.getAs[Long]("n_latin") === 10L)
    assert(r.getAs[Long]("n_digit") === 2L)
    assert(r.getAs[Long]("n_space") === 2L)
    assert(r.getAs[Long]("n_other") === 1L) // the '!'
    assert(r.getAs[Boolean]("clean") === true)
  }

  test("replacement character flags the document") {
    val r = run(1L -> "good text here\uFFFD")(1L)
    assert(r.getAs[Long]("n_replacement") === 1L)
    assert(r.getAs[Boolean]("clean") === false)
  }

  test("control characters flag, but tab/newline/CR do not") {
    val out = run(
      1L -> "line one\nline two\ttabbed\r\n",
      2L -> "binary\u0001spill\u0007here")
    assert(out(1L).getAs[Long]("n_control") === 0L)
    assert(out(1L).getAs[Boolean]("clean") === true)
    assert(out(2L).getAs[Long]("n_control") === 2L)
    assert(out(2L).getAs[Boolean]("clean") === false)
  }

  test("latin majority gate: digit-heavy text fails without damage chars") {
    val r = run(1L -> "ab 123456789012")(1L)
    // non-space = 14, latin 2: 4 < 14 -> not clean
    assert(r.getAs[Long]("n_control") === 0L)
    assert(r.getAs[Boolean]("clean") === false)
  }

  test("empty text: zero counts, fails the majority gate vacuously-safe") {
    val r = run(1L -> "")(1L)
    assert(r.getAs[Long]("n_chars") === 0L)
    // 0 >= 0 holds, no damage chars: empty counts as clean
    assert(r.getAs[Boolean]("clean") === true)
    assert(r.getAs[Long]("latin_frac_x1e6") === 0L)
  }

  test("damage lane discriminates every signal at sf0.001") {
    val out = graft.queries.NorthStar.queries("script_profile")(spark, sf0001)
    val agg = out.agg(
      sum(when(col("clean"), 1).otherwise(0)).as("c"),
      sum(when(!col("clean"), 1).otherwise(0)).as("d"),
      sum(when(col("n_replacement") > 0, 1).otherwise(0)).as("r"),
      sum(when(col("n_control") > 0, 1).otherwise(0)).as("k"),
      sum(when(col("n_digit") * 3 > col("n_chars"), 1).otherwise(0)).as("g"))
      .collect().head
    (0 to 4).foreach { i =>
      assert(agg.getLong(i) > 0L, s"lane audit column $i is vacuous")
    }
  }
}
