package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property-based specs (SURVEY.md §5's ScalaCheck item) for the
  * determinism primitives everything else leans on. Generators are
  * sampled with pinned seeds (no scalatestplus bridge in the offline
  * cache), so runs are reproducible.
  */
class FunctionsPropSpec extends SparkSpec {

  private val params = Gen.Parameters.default

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(params, Seed(seed)).getOrElse(
      throw new IllegalStateException("gen failed"))

  private def cases[T](g: Gen[T], n: Int = 12): Seq[T] =
    (1 to n).map(i => sample(g, i.toLong * 7919))

  private val textGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.alphaStr, Gen.const("don't"), Gen.const("café"),
    Gen.const("123"), Gen.const("  "), Gen.const("!?;"),
    Gen.const("汉字"))).map(_.mkString(" "))

  test("graft_count_matches equals the length of regexp_extract_all") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val regexes = Seq("[\\p{L}]+|[\\p{N}]+|[^\\p{L}\\p{N}\\s]",
      "\\d+", "[a-z]+", "汉")
    for (texts <- cases(Gen.listOfN(8, textGen)); re <- regexes) {
      val df = texts.toDF("t")
      // expected: the raw array collected (no Size node, so the rewrite
      // can't touch it) and measured driver-side
      val expected = df.select(
          regexp_extract_all(col("t"), lit(re), lit(0)).as("a"))
        .as[Seq[String]].collect().map(_.length)
      val got = df.selectExpr(s"graft_count_matches(t, '${re.replace("\\", "\\\\")}') AS c")
        .as[Int].collect()
      assert(got.toSeq === expected.toSeq, s"regex $re")
    }
  }

  test("graft_count_matches with a foldable NULL regex is NULL, not a crash") {
    graft.plans.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_count_matches('abc', CAST(NULL AS STRING)) AS c")
      .collect()
    assert(r.head.isNullAt(0))
  }

  test("RewriteCountMatches: size(regexp_extract_all) plans the fused count") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    // a parquet-backed input: literal rows constant-fold to a
    // LocalRelation before the rewrite could be observed
    val docs = graft.core.Tables.documents(spark, sf0001)
    val df = docs
      .select(size(regexp_extract_all(col("text"), lit("\\d+"), lit(0)))
        .as("n"))
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_count_matches"), opt)
    assert(!opt.toLowerCase.contains("regexp_extract_all"), opt)
    // and the fused plan computes the same totals as the raw arrays
    val expected = docs
      .select(regexp_extract_all(col("text"), lit("\\d+"), lit(0)).as("a"))
      .as[Seq[String]].collect().map(_.length.toLong).sum
    assert(df.as[Int].collect().map(_.toLong).sum === expected)
    // group index != 0 must NOT be rewritten (group counts can differ)
    val grp = docs
      .select(size(regexp_extract_all(col("text"), lit("(\\d)"), lit(1)))
        .as("n"))
    assert(!grp.queryExecution.optimizedPlan.toString
      .contains("graft_count_matches"))
  }

  test("tokens: every token is a non-empty all-letter run from the text") {
    import spark.implicits._
    for (texts <- cases(Gen.listOfN(8, textGen))) {
      val toks = texts.toDF("t").select(explode(tokens(col("t"))).as("w"))
        .as[String].collect()
      assert(toks.forall(w => w.nonEmpty && w.forall(Character.isLetter)))
    }
  }

  test("tokens: sum of wc counts equals total token count (SURVEY §5)") {
    import spark.implicits._
    for (texts <- cases(Gen.listOfN(8, textGen))) {
      val df = texts.toDF("t").select(tokens(col("t")).as("w"))
      val total = df.select(sum(size(col("w")))).head.getLong(0)
      val wcSum = df.select(explode(col("w")).as("word"))
        .groupBy("word").count()
        .select(sum(col("count"))).head.getLong(0)
      assert(total === wcSum)
    }
  }

  test("dsum is invariant under repartitioning (order-independence)") {
    import spark.implicits._
    for ((xs, i) <- cases(Gen.listOfN(64, Gen.chooseNum(-1e6, 1e6)))
           .zipWithIndex) {
      val base = xs.toDF("x")
      val parts = i % 7 + 1
      val a = base.coalesce(1).agg(dsum(col("x"))).head.getDouble(0)
      val b = base.repartition(parts).agg(dsum(col("x"))).head.getDouble(0)
      // exact equality is the whole point — no epsilon
      assert(java.lang.Double.compare(a, b) === 0, s"$a != $b at $parts")
    }
  }

  test("qcosine: cosine of a vector with itself is 1") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-1.0, 1.0))
      .suchThat(_.exists(v => math.abs(v) > 1e-3))
    for (vs <- cases(Gen.listOfN(4, vecGen), n = 6)) {
      val df = vs.map(_.toArray).toDF("v")
        .select(qcosine(qvec(col("v")), qvec(col("v"))).as("c"))
      df.as[Double].collect().foreach(c => assert(math.abs(c - 1.0) < 1e-12))
    }
  }

  test("padKey preserves numeric order lexicographically") {
    import spark.implicits._
    for (ids <- cases(Gen.listOfN(32, Gen.chooseNum(0L, 99999999L)))) {
      val padded = ids.toDF("id").select(padKey(col("id")).as("p"))
        .as[String].collect()
      assert(padded.sorted.map(_.toLong).toSeq === ids.sorted)
    }
  }
}
