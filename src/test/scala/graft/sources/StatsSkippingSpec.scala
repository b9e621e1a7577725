package graft.sources

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unit matrix for [[StatsSkipping]]'s per-file keep predicate: every
  * supported operator against in-range / out-of-range stats, the
  * flipped literal-first forms, missing stats (never skip), the
  * unsupported-shape fallback, and the FLOAT round-trip trap (stored
  * "1.1" must compare in float space, or an exactly-matching file gets
  * skipped).
  */
class StatsSkippingSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("l", LongType), StructField("d", DoubleType),
    StructField("f", FloatType), StructField("s", StringType),
    StructField("dt", DateType)))

  private def a(name: String): AttributeReference = {
    val f = schema(name)
    AttributeReference(name, f.dataType)()
  }

  private def keep(e: Expression, stats: StatsSkipping.Stats): Boolean =
    StatsSkipping.compile(Seq(e), schema) match {
      case Some(p) => p(stats)
      case None => fail(s"conjunct unexpectedly unsupported: $e")
    }

  test("operator matrix on a long column with stats [10, 20]") {
    val st = Map("l" -> ("10", "20"))
    assert(keep(EqualTo(a("l"), Literal(15L)), st))
    assert(!keep(EqualTo(a("l"), Literal(25L)), st))
    assert(!keep(EqualTo(a("l"), Literal(5L)), st))
    assert(keep(GreaterThan(a("l"), Literal(19L)), st))
    assert(!keep(GreaterThan(a("l"), Literal(20L)), st))
    assert(keep(GreaterThanOrEqual(a("l"), Literal(20L)), st))
    assert(!keep(GreaterThanOrEqual(a("l"), Literal(21L)), st))
    assert(keep(LessThan(a("l"), Literal(11L)), st))
    assert(!keep(LessThan(a("l"), Literal(10L)), st))
    assert(keep(LessThanOrEqual(a("l"), Literal(10L)), st))
    assert(!keep(LessThanOrEqual(a("l"), Literal(9L)), st))
    // flipped literal-first forms mirror the operator
    assert(keep(GreaterThan(Literal(11L), a("l")), st))   // l < 11
    assert(!keep(GreaterThan(Literal(10L), a("l")), st))  // l < 10
    assert(keep(In(a("l"), Seq(Literal(1L), Literal(12L))), st))
    assert(!keep(In(a("l"), Seq(Literal(1L), Literal(99L))), st))
  }

  test("missing stats or unsupported shapes never skip") {
    // no stats for the column: keep
    assert(keep(EqualTo(a("l"), Literal(999L)), Map.empty))
    // an unsupported conjunct alone: compile yields None (keep all)
    assert(StatsSkipping.compile(Seq(IsNotNull(a("l"))), schema).isEmpty)
    // unsupported + supported: only the supported one filters
    val p = StatsSkipping.compile(
      Seq(IsNotNull(a("l")), EqualTo(a("l"), Literal(5L))), schema).get
    assert(!p(Map("l" -> ("10", "20"))))
    assert(p(Map("l" -> ("1", "20"))))
  }

  test("float stats compare in float space (the 1.1f round-trip)") {
    // a file whose only value is 1.1f stores min=max="1.1"; the query
    // literal is the WIDENED float 1.1f — the file must be kept
    val st = Map("f" -> ("1.1", "1.1"))
    assert(keep(EqualTo(a("f"), Literal(1.1f)), st))
    assert(!keep(EqualTo(a("f"), Literal(2.2f)), st))
  }

  test("strings compare in UTF8 binary order; dates as epoch days") {
    val st = Map("s" -> ("apple", "mango"))
    assert(keep(EqualTo(a("s"),
      Literal(UTF8String.fromString("kiwi"), StringType)), st))
    assert(!keep(EqualTo(a("s"),
      Literal(UTF8String.fromString("zebra"), StringType)), st))
    val dst = Map("dt" -> ("2024-01-10", "2024-01-20"))
    val mid = java.time.LocalDate.parse("2024-01-15").toEpochDay.toInt
    val out = java.time.LocalDate.parse("2024-02-01").toEpochDay.toInt
    assert(keep(EqualTo(a("dt"), Literal(mid, DateType)), dst))
    assert(!keep(EqualTo(a("dt"), Literal(out, DateType)), dst))
  }
}
