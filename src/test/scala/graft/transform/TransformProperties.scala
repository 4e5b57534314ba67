package graft.transform

import java.time.LocalDateTime

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestBase
import graft.config.TransformSpec

/** Property-based DSL contracts (SURVEY §5.4):
  *  - the transform dispatcher is TOTAL: arbitrary config lists never
  *    throw at compile (plan-construction) time — unknown kinds and
  *    missing fields are skipped, the reference's documented behavior;
  *  - the required-field filter never keeps a null required value;
  *  - partition derivation is idempotent (already-present columns are
  *    never re-derived).
  */
class TransformProperties extends SparkTestBase {
  import spark.implicits._

  /** Deterministic scalacheck sampling (no scalatest bridge offline). */
  private def forAllSeeded[A](gen: Gen[A], n: Int = 30)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  // All-string frame — the CSV contract (untyped reader, casts are
  // config transforms). datetime on a non-string column is an analysis
  // error in the reference too, so totality is a string-column property.
  private lazy val base = Seq(
    ("1", "2024-01-01 10:00:00", "  pad  ", "1.5"),
    ("2", "not-a-date", "x", null),
    ("3", null, null, "2.0")
  ).toDF("id", "created", "label", "score")

  private val kinds = Gen.oneOf(
    "datetime", "timestamp", "string", "integer", "double", "trim",
    "regexp_replace", "bogus", "", "DATETIME")
  private val fields = Gen.oneOf("id", "created", "label", "score", "")
  private val specGen = for {
    k <- kinds
    f <- fields
    fmt <- Gen.option(Gen.oneOf("yyyy-MM-dd HH:mm:ss", "YYYY-MM-DD", "yyyy/MM/dd"))
  } yield TransformSpec(field = f, kind = k, format = fmt,
    pattern = Some("[a-z]"), replacement = Some("_"))

  test("arbitrary config lists apply cleanly or fail loudly — never corrupt") {
    // Empty fields/kinds and unknown kinds are no-ops; bad VALUES become
    // nulls (ANSI off). A type-incompatible chain (e.g. double-cast then
    // datetime on the same field) is an analysis error — same loud
    // failure as the reference — never a silent wrong answer.
    var applied = 0
    forAllSeeded(Gen.listOfN(6, specGen), n = 40) { specs =>
      scala.util.Try(Transforms.compile(specs)(base)) match {
        case scala.util.Success(out) =>
          assert(out.columns.toSeq == base.columns.toSeq) // columns never added/removed
          out.collect()
          applied += 1
        case scala.util.Failure(e) =>
          assert(e.isInstanceOf[org.apache.spark.SparkException]
            || e.isInstanceOf[org.apache.spark.sql.AnalysisException])
      }
    }
    assert(applied >= 20, s"property vacuous: only $applied/40 spec lists applied")
  }

  test("a malformed datetime format pattern fails fast at plan construction") {
    intercept[IllegalArgumentException] {
      Transforms.compile(Seq(TransformSpec(
        field = "created", kind = "datetime", format = Some("bad fmt"))))(base)
    }
  }

  test("a transform naming an absent column fails analysis (reference parity)") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Transforms.compile(Seq(TransformSpec(field = "no_such", kind = "trim")))(base)
        .collect()
    }
  }

  test("required-filter never keeps a null required field") {
    forAllSeeded(Gen.someOf(Seq("id", "created", "label"))) { req =>
      val out = NullFilter.compile(req.toSeq)(base).collect()
      out.foreach { row =>
        req.foreach(c => assert(!row.isNullAt(row.fieldIndex(c))))
      }
    }
  }

  test("partition derivation is idempotent and never overwrites") {
    val t0 = LocalDateTime.of(2026, 3, 1, 0, 0)
    val once = Partitioner.compile(Seq("year", "month", "day"), t0)(base)
    val twice = Partitioner.compile(Seq("year", "month", "day"), t0)(once)
    assert(once.columns.toSeq == twice.columns.toSeq)
    assert(once.collect().map(_.toSeq).toSeq == twice.collect().map(_.toSeq).toSeq)
  }
}
