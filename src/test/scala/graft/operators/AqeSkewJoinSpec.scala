package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** EXERCISES (not just asserts) the runtime skew mitigation SCALE.md's
  * cross-cutting notes lean on: AQE's OptimizeSkewedJoin. A join whose
  * shuffle puts ~97% of the left side's bytes in one partition is run
  * under AQE with toy-scale skew thresholds; the final adaptive plan
  * must show the skewed side split (`skew=true` on the sort-merge
  * join), and the result must equal the AQE-off join bit for bit —
  * mitigation may never change semantics. This is the automatic
  * counterpart of the manual `salted_join_revenue` operator: salting
  * rewrites the query, AQE re-plans it at runtime from observed
  * partition sizes.
  */
class AqeSkewJoinSpec extends SparkSpec {

  test("AQE splits the skewed partition of a shuffle join; result exact") {
    // ISOLATED session (shared context, own SQLConf): this test disables
    // broadcast joins and rewires AQE thresholds — leaking that into the
    // suite-global session would warp plans under concurrently-running
    // plan-asserting specs (zero-exchange bucketing, WindowGroupLimit)
    val s = spark.newSession()
    import s.implicits._
    val confs = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // toy-scale thresholds: the hot partition is a few MB, siblings KB
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "256k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64k",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      // a broadcast join would dodge the shuffle being tested
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    // conf.get can return literal null (adaptive.autoBroadcastJoinThreshold
    // defaults to it) — flatten that to "restore by unsetting"
    val prev = confs.keys.map(k =>
      k -> scala.util.Try(Option(s.conf.get(k))).toOption.flatten).toMap
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // key 0 carries 100k ~60B rows (~6 MB pre-shuffle); 50 cold keys
      // carry 100 rows each — with 4 shuffle partitions the hot
      // partition dwarfs the median by far more than the 2x factor.
      // Built FRESH per run: a Dataset memoizes its QueryExecution, so
      // re-collecting one frame after flipping adaptive.enabled would
      // re-execute the SAME adaptive plan and verify nothing.
      def buildJoined() = {
        val left = s.range(0, 100000).select(
            lit(0L).as("k"), concat(lit("payload-"), col("id")).as("payload"))
          .unionAll(s.range(0, 5000).select(
            (col("id") % 50 + 1).as("k"),
            concat(lit("cold-"), col("id")).as("payload")))
        val right = s.range(0, 51).select(
          col("id").as("k"), concat(lit("dim-"), col("id")).as("attr"))
        left.join(right, "k")
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n"), max(col("payload")).as("max_payload"),
            max(col("attr")).as("attr"))
      }
      val joined = buildJoined()
      val got = joined.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      // the FINAL adaptive plan (after execution) must mark the join skewed
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE never split the skewed partition:\n$plan")
      // semantics unchanged: a NON-adaptive run of a freshly-built plan
      // must match exactly
      s.conf.set("spark.sql.adaptive.enabled", "false")
      val offJoined = buildJoined()
      val offPlan = offJoined.queryExecution.executedPlan.toString
      assert(!offPlan.contains("AdaptiveSparkPlan"),
        s"AQE-off control still compiled adaptively:\n$offPlan")
      val expected = offJoined.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
      assert(got === expected)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
