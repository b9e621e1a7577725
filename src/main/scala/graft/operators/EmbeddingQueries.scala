package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.core.Checkpoint.CheckpointOps
import graft.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Numeric determinism: vectors are quantized to 1e-6 BIGINTs (`qvec`) so
  * dot products and squared norms are exact integers (|q| ≤ ~5e5 ⇒
  * 64-dim dot ≤ ~1.6e13 « 2^53); the only floating point is the final
  * sqrt/divide, IEEE-identical in both engines — so cosine top-k is
  * value-hash verifiable against DuckDB.
  *
  * Scale story:
  *   - Brute force is the correctness baseline: queries are broadcast, so
  *     the candidate side streams through one map stage and the only
  *     shuffle is the per-query top-k (k rows per query out of each
  *     partition after the rank filter — Spark's window TopK pushes the
  *     limit into the sort).
  *   - The IVF path is the 100 TB shape: cluster assignment is one
  *     broadcast-join map pass (centroids are tiny), the index is
  *     `(centroid_id → members)` — effectively a partition-pruned search
  *     where each query probes `NProbe` clusters instead of the full
  *     corpus. On a real cluster the assignment output would be written
  *     bucketed by `centroid_id` so probes become partition-pruned scans.
  */
object EmbeddingQueries {

  private val K       = 5
  private val NProbe  = 2
  private val NQuery  = 10
  /** Scale-correct training parameterization: a CONSTANT centroid
    * count. Seed stride = ceil(N / TargetNlist) is derived from the
    * corpus count inside the plan, so at any corpus size the centroid
    * table stays TargetNlist rows — broadcast stays tiny, assignment
    * stays O(N · nlist) with nlist constant, i.e. linear in N.
    *
    * (The r7-era STRIDED parameterization — every 100th vector a
    * centroid, nlist = N/100, assignment O(N²/100), measured 94× at
    * 100× data — is gone: every catalog entry now derives its seed
    * stride from an in-plan count. Two granularities are exercised:
    * [[TargetNlist]] and [[TargetNlistWide]].)
    */
  private val TargetNlist = 8
  /** Second, finer index granularity (nlist = 16): the legacy
    * pinned-seed IVF entries train/probe through this one, so the
    * catalog covers the nlist tuning axis with two distinct trained
    * trajectories — both constant-count, both linear at scale.
    */
  private val TargetNlistWide = 16
  /** Near-dup cosine threshold (see [[dedupEmbedding]] note). */
  private val DupThreshold = 0.35

  /** Quantized vectors WITH precomputed norm: `sqrt(dot(v,v))` is
    * computed once per vector here rather than once per candidate pair
    * inside the join (a 3x reduction in dot products; values are
    * bit-identical because the expression tree per pair is unchanged:
    * dot/sqrt(na)/sqrt(nb)).
    */
  /** Native codegen'd dot product (graft.functions.QDotLong) — one fused
    * loop instead of interpreted zip_with/aggregate lambdas. */
  private def ndot(a: Column, b: Column): Column =
    call_function("graft_qdot", a, b)

  private[operators] def qEmb(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), qvec(col("embedding")).as("qv"))
      .withColumn("nrm", sqrt(ndot(col("qv"), col("qv")).cast("double")))
  }

  /** Deterministic fixed-count seed rows: stride ceil(N / nlist) comes
    * from a broadcast scalar count computed IN the plan (no driver
    * action), so the seed count stays `nlist` at ANY corpus size — the
    * one-row count side is the lone intentional broadcast-nested-loop
    * join in this file (PlanLintSpec pins the exemption structurally:
    * the broadcast side must be a grouping-free aggregate). Returns
    * `emb`'s columns filtered to the seeds; callers rename.
    */
  private def fixedSeeds(emb: DataFrame, nlist: Int): DataFrame = {
    val k = emb.agg(
      ceil(count(lit(1)).cast("double") / nlist).cast("long").as("k"))
    emb.crossJoin(broadcast(k))
      .filter(col("vec_id") % col("k") === 0)
      .drop("k")
  }

  /** Brute-force exact cosine top-k: each of the first `NQuery` vectors
    * against the whole corpus (self excluded).
    */
  def annBruteForce(s: SparkSession, dir: String): DataFrame = {
    val q = qEmb(s, dir).filter(col("vec_id") < NQuery)
      .select(col("vec_id").as("query_id"), col("qv").as("quv"),
        col("nrm").as("qnrm"))
    val c = qEmb(s, dir)
    val sims = c.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (ndot(col("quv"), col("qv")).cast("double") / col("qnrm") /
          col("nrm")).as("sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    sims.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** IVF cluster assignment: nearest centroid per vector (the "index
    * build" pass). One broadcast join + per-partition top-1. Seeds are
    * the in-plan fixed-count stride ([[fixedSeeds]] at
    * [[TargetNlistWide]]): assignment is O(N · nlist) with nlist
    * constant — linear in the corpus.
    */
  def annIvfAssign(s: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(s, dir).sharedCheckpoint()
    val cents = fixedSeeds(emb, TargetNlistWide)
      .select(col("vec_id").as("centroid_id"), col("qv").as("cv"),
        col("nrm").as("cnrm"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("centroid_id"))
    emb
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        (ndot(col("qv"), col("cv")).cast("double") / col("nrm") /
          col("cnrm")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"), col("sim"))
  }

  /** IVF search: each query probes its `NProbe` nearest centroids and
    * ranks only the members of those clusters — the pruned-search shape
    * (approximate: recall < 1 by design; deterministic given the pinned
    * centroid choice, so still oracle-verifiable).
    */
  def annIvfTopk(s: SparkSession, dir: String): DataFrame =
    annIvfTopkAt(s, dir, NProbe)

  /** [[annIvfTopk]] at an explicit probe width — the recall/cost knob a
    * deployment tunes. The catalog entry pins `NProbe`; `AnnRecallSpec`
    * sweeps this to pin the index's recall-vs-nprobe contract (recall
    * must climb toward exact as probes widen — the property a broken
    * assignment or probe list loses first).
    */
  private[operators] def annIvfTopkAt(s: SparkSession, dir: String,
      nprobe: Int): DataFrame = {
    // ONE corpus scan: the quantized+normed table is checkpointed and
    // shared by the centroid list, the assignment build, the probe pass
    // and the final ranking (plain multi-reference would rescan the
    // parquet once per consumer — object-producing subtrees get no
    // exchange reuse). This is the harness stand-in for what a real
    // deployment persists anyway: the IVF index artifact, written
    // bucketed by centroid_id.
    val emb = qEmb(s, dir).sharedCheckpoint()
    val cents = fixedSeeds(emb, TargetNlistWide)
      .select(col("vec_id").as("centroid_id"), col("qv").as("cv"),
        col("nrm").as("cnrm"))
    // index: every vector assigned to its nearest centroid
    val wAssign = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("centroid_id"))
    val assigned = emb
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("centroid_id"),
        (ndot(col("qv"), col("cv")).cast("double") / col("nrm") /
          col("cnrm")).as("sim"))
      .withColumn("rn", row_number().over(wAssign))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("centroid_id"))
      .join(emb, "vec_id")
    // probe lists: NProbe nearest centroids per query
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("centroid_id"))
    val probes = emb.filter(col("vec_id") < NQuery)
      .select(col("vec_id").as("query_id"), col("qv").as("quv"),
        col("nrm").as("qnrm"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("quv"), col("qnrm"), col("centroid_id"),
        (ndot(col("quv"), col("cv")).cast("double") / col("qnrm") /
          col("cnrm")).as("sim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nprobe)
      .select(col("query_id"), col("quv"), col("qnrm"), col("centroid_id"))
    // search only the probed clusters
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    probes.join(assigned, "centroid_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (ndot(col("quv"), col("qv")).cast("double") / col("qnrm") /
          col("nrm")).as("sim"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  private val KmeansIters = 3

  /** Nearest-centroid assignment by exact-integer cosine (ties broken by
    * centroid_id): the shared kernel of the IVF index build and the
    * KMeans training loop. One broadcast of the centroid table per call;
    * the corpus side streams map-only.
    */
  private[operators] def assignNearest(emb: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("sim").desc, col("centroid_id"))
    emb.crossJoin(broadcast(
        cents.withColumn("cnrm",
          sqrt(ndot(col("cv"), col("cv")).cast("double")))))
      .select(col("vec_id"), col("qv"), col("centroid_id"),
        (ndot(col("qv"), col("cv")).cast("double") /
          sqrt(ndot(col("qv"), col("qv")).cast("double")) /
          col("cnrm")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("qv"), col("centroid_id"))
  }

  /** DETERMINISTIC KMEANS (spherical, 3 Lloyd iterations) — the real
    * "train the IVF index" operator behind [[annIvfTopk]]'s pinned-seed
    * stand-in. Each iteration is one broadcast-assignment pass over the
    * corpus plus one partial-aggregated per-dimension sum; new centroid
    * components are the TRUNCATED integer mean `(sx - sx % n) div n` —
    * exact in 64-bit both here and in DuckDB (component sums stay far
    * below 2^53), so after three rounds both engines hold bit-identical
    * centroid vectors. Empty clusters drop (no assignment row). The
    * output is a scalar digest per surviving centroid — member count and
    * the exact integer self-dot of the trained vector — because the
    * driver's compare can't sort array columns; matching digests pin the
    * whole 3-round trajectory.
    *
    * At 100 TB: centroids are broadcast (nlist « corpus), assignment is
    * map-only, the per-dim sum shuffles nlist × dim rows after map-side
    * combine, and each round's result is checkpointed (same iterative
    * shape as [[DedupQueries]]' connected components).
    */
  /** The 3-round Lloyd loop itself; returns the trained
    * (centroid_id, cv) table. See [[annKmeansCentroids]] for the full
    * determinism story.
    */
  private def trainKmeans(emb: DataFrame): DataFrame =
    trainKmeansFrom(emb,
      fixedSeeds(emb, TargetNlistWide)
        .select(col("vec_id").as("centroid_id"), col("qv").as("cv")))

  /** The Lloyd loop over an arbitrary deterministic seed table. */
  private def trainKmeansFrom(emb: DataFrame, seeds: DataFrame): DataFrame = {
    var cents = seeds
    for (_ <- 1 to KmeansIters) {
      cents = assignNearest(emb, cents)
        .select(col("centroid_id"),
          posexplode(col("qv")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos"))
        .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
        .withColumn("c", expr("(sx - sx % n) div n"))
        .groupBy(col("centroid_id"))
        .agg(collect_list(struct(col("pos"), col("c"))).as("pc"))
        .select(col("centroid_id"),
          expr("transform(array_sort(pc), s -> s.c)").as("cv"))
        .sharedCheckpoint()
    }
    cents
  }

  def annKmeansCentroids(s: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(s, dir).select(col("vec_id"), col("qv")).sharedCheckpoint()
    val cents = trainKmeans(emb)
    assignNearest(emb, cents)
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_members"))
      .join(cents.select(col("centroid_id"),
        ndot(col("cv"), col("cv")).as("cnorm")), "centroid_id")
      .select(col("centroid_id"), col("n_members"), col("cnorm"))
  }

  /** KMeans training with a CONSTANT centroid count ([[TargetNlist]]) —
    * the fix for the strided variant's O(N²/100) scale-killer. The seed
    * stride ceil(N / TargetNlist) comes from a broadcast scalar count
    * computed IN the plan (no driver action), then the identical 3-round
    * Lloyd loop and digest as [[annKmeansCentroids]]. At 100× data the
    * centroid table is still TargetNlist rows: the broadcast stays
    * bytes-sized and assignment work grows linearly with the corpus
    * instead of quadratically.
    */
  def annKmeansFixedNlist(s: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(s, dir).select(col("vec_id"), col("qv")).sharedCheckpoint()
    val seeds = fixedSeeds(emb, TargetNlist)
      .select(col("vec_id").as("centroid_id"), col("qv").as("cv"))
    val cents = trainKmeansFrom(emb, seeds)
    assignNearest(emb, cents)
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_members"))
      .join(cents.select(col("centroid_id"),
        ndot(col("cv"), col("cv")).as("cnorm")), "centroid_id")
      .select(col("centroid_id"), col("n_members"), col("cnorm"))
  }

  /** SEARCH THROUGH THE TRAINED INDEX: [[trainKmeans]] centroids used
    * the way [[annIvfTopk]] uses the pinned-seed ones — each query
    * probes its NProbe nearest trained centroids and ranks only those
    * clusters' members. Train + assign + probe + rank is the complete
    * IVF lifecycle in one verifiable query (the oracle chains the
    * training CTEs into the probe/search SQL). Same 100 TB shape:
    * centroids broadcast, one checkpointed corpus scan, per-query work
    * bounded by the probed clusters.
    */
  def annKmeansTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(s, dir).select(col("vec_id"), col("qv")).sharedCheckpoint()
    annTopkThrough(emb, trainKmeans(emb))
  }

  /** The complete fixed-nlist IVF lifecycle: constant-centroid-count
    * training ([[annKmeansFixedNlist]]'s loop) AND the probe/search pass
    * through that index — so the linear-at-scale parameterization covers
    * both halves of the operator, not just the training.
    */
  def annIvfFixedTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(s, dir).select(col("vec_id"), col("qv")).sharedCheckpoint()
    val seeds = fixedSeeds(emb, TargetNlist)
      .select(col("vec_id").as("centroid_id"), col("qv").as("cv"))
    annTopkThrough(emb, trainKmeansFrom(emb, seeds))
  }

  /** The PERSISTED IVF index: train once, store the index as catalog
    * tables — centroids plain, the corpus assignment BUCKETED on
    * `centroid_id` — and serve the probe/search pass from those tables.
    * This is the shape an ANN store actually runs at 100 TB: training
    * cost is paid once per corpus generation (the table names embed a
    * content fingerprint, [[graft.core.Warehouse]], so a regenerated
    * corpus rebuilds instead of serving stale clusters), and each query
    * batch reads ONLY the probed clusters — the bucketed layout turns
    * the probe→candidate join into a bucket-local read with no shuffle
    * of the corpus side, and bucket count scales with corpus bytes
    * ([[graft.core.Warehouse.bucketCount]]). The oracle is the same
    * chained train+probe+search SQL as `ann_ivf_fixed_topk`: persistence
    * must be semantically invisible.
    */
  def annIvfPersisted(s: SparkSession, dir: String): DataFrame = {
    val suffix = Tables.dirKey(dir)
    val fp = Tables.dataFingerprint(s"$dir/embeddings.parquet")
    val bytes = org.apache.commons.io.FileUtils.sizeOf(
      new java.io.File(s"$dir/embeddings.parquet"))
    val nBuckets = graft.core.Warehouse.bucketCount(s, bytes)
    val centPrefix   = s"graft_ivf_cents_${suffix}_"
    val assignPrefix = s"graft_ivf_assign_${suffix}_"
    val centTbl   = s"$centPrefix${fp}_b$nBuckets"
    val assignTbl = s"$assignPrefix${fp}_b$nBuckets"
    graft.core.Warehouse.ensure(s, Seq(centPrefix, assignPrefix),
        Seq(centTbl, assignTbl)) {
      val emb = qEmb(s, dir).select(col("vec_id"), col("qv"))
        .sharedCheckpoint()
      val seeds = fixedSeeds(emb, TargetNlist)
        .select(col("vec_id").as("centroid_id"), col("qv").as("cv"))
      val cents = trainKmeansFrom(emb, seeds)
      cents.write.mode("overwrite").saveAsTable(centTbl)
      assignNearest(emb, s.table(centTbl))
        .write.bucketBy(nBuckets, "centroid_id")
        .mode("overwrite").saveAsTable(assignTbl)
    }
    annTopkOver(s.table(assignTbl), s.table(centTbl))
  }

  /** Base/delta split for the incremental index lifecycle: every 10th
    * vector is the "new arrivals" batch, the rest the trained corpus. */
  private[operators] val IvfDeltaMod = 10

  /** Build the base persisted index: centroids trained on the BASE
    * vectors only, base assignment stored bucketed. Package-visible so
    * `AnnIvfIncrementalSpec` can drive the two lifecycle steps against
    * its own table names and observe the file-level invariants.
    */
  private[operators] def ivfIncrementalBase(s: SparkSession, dir: String,
      centTbl: String, assignTbl: String, nBuckets: Int): Unit = {
    val base = qEmb(s, dir).select(col("vec_id"), col("qv"))
      .filter(col("vec_id") % IvfDeltaMod =!= 0).sharedCheckpoint()
    val seeds = fixedSeeds(base, TargetNlist)
      .select(col("vec_id").as("centroid_id"), col("qv").as("cv"))
    trainKmeansFrom(base, seeds)
      .write.mode("overwrite").saveAsTable(centTbl)
    assignNearest(base, s.table(centTbl))
      .write.bucketBy(nBuckets, "centroid_id")
      .mode("overwrite").saveAsTable(assignTbl)
  }

  /** The incremental ADD: assign only the delta batch to the FROZEN
    * centroids and append bucket-aligned. The job's cost is
    * O(delta · nlist) — no retraining, no corpus re-shuffle — and the
    * append writes new bucket files next to the old ones, so every
    * base index file stays byte-identical (the spec pins this).
    */
  private[operators] def ivfIncrementalAppend(s: SparkSession, dir: String,
      centTbl: String, assignTbl: String, nBuckets: Int): Unit = {
    val delta = qEmb(s, dir).select(col("vec_id"), col("qv"))
      .filter(col("vec_id") % IvfDeltaMod === 0)
    assignNearest(delta, s.table(centTbl))
      .write.bucketBy(nBuckets, "centroid_id")
      .mode("append").saveAsTable(assignTbl)
  }

  /** INCREMENTAL index maintenance for the persisted IVF — the ANN
    * analog of `dedup_incremental` and the warehouse's snapshot
    * commits: a production index ingests new vectors continuously and
    * cannot retrain + re-shuffle the corpus per batch. Lifecycle here:
    * train centroids on the 90% base, persist base assignment
    * bucketed; then ADD the 10% delta by assigning it to the frozen
    * centroids and appending bucket-aligned (Spark validates the
    * bucket spec on append, so the probe→candidate join stays
    * bucket-local over old AND new files). At 100 TB: each ingest
    * batch costs O(batch · nlist) compute and O(batch) write, base
    * files are immutable (cheap to cache/replicate), and centroid
    * drift is a monitored retrain trigger, not a per-batch cost. The
    * oracle replays the same composite relationally — train on base,
    * assign ALL vectors to those centroids, probe/search — so a wrong
    * delta assignment or a lost append hash-mismatches; serving
    * through the incremental index must equal a from-scratch build
    * against the same centroids.
    */
  def annIvfIncremental(s: SparkSession, dir: String): DataFrame = {
    val suffix = Tables.dirKey(dir)
    val fp = Tables.dataFingerprint(s"$dir/embeddings.parquet")
    val bytes = org.apache.commons.io.FileUtils.sizeOf(
      new java.io.File(s"$dir/embeddings.parquet"))
    val nBuckets = graft.core.Warehouse.bucketCount(s, bytes)
    val centPrefix   = s"graft_ivfi_cents_${suffix}_"
    val assignPrefix = s"graft_ivfi_assign_${suffix}_"
    val centTbl   = s"$centPrefix${fp}_b$nBuckets"
    val assignTbl = s"$assignPrefix${fp}_b$nBuckets"
    // the build APPENDS into assignTbl as its second step, so unlike
    // the single-write ann_* entries, a crash between the steps leaves
    // a complete-looking but delta-less index. The marker table is
    // written LAST and gates ensure: incomplete builds fail the
    // existence check and are swept + rebuilt.
    val doneTbl = s"$assignPrefix${fp}_b${nBuckets}_done"
    graft.core.Warehouse.ensure(s, Seq(centPrefix, assignPrefix),
        Seq(centTbl, assignTbl, doneTbl)) {
      ivfIncrementalBase(s, dir, centTbl, assignTbl, nBuckets)
      ivfIncrementalAppend(s, dir, centTbl, assignTbl, nBuckets)
      s.range(1).write.mode("overwrite").saveAsTable(doneTbl)
    }
    annTopkOver(s.table(assignTbl), s.table(centTbl))
  }

  /** Probe + pruned search through a trained centroid table (shared by
    * the strided and fixed-nlist lifecycles). */
  private def annTopkThrough(emb: DataFrame, cents: DataFrame): DataFrame =
    annTopkOver(assignNearest(emb, cents), cents)

  /** Probe + pruned search over an ALREADY-ASSIGNED corpus
    * (vec_id, qv, centroid_id) — the serve path of
    * [[annIvfPersisted]], where assignment comes from a persisted
    * index table rather than being recomputed. Queries are drawn from
    * the assigned table itself (assignment is 1:1 with the corpus).
    */
  private def annTopkOver(assigned: DataFrame, cents: DataFrame): DataFrame = {
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("centroid_id"))
    val probes = assigned.filter(col("vec_id") < NQuery)
      .select(col("vec_id").as("query_id"), col("qv").as("quv"))
      .crossJoin(broadcast(cents.withColumn("cnrm",
        sqrt(ndot(col("cv"), col("cv")).cast("double")))))
      .select(col("query_id"), col("quv"), col("centroid_id"),
        (ndot(col("quv"), col("cv")).cast("double") /
          sqrt(ndot(col("quv"), col("quv")).cast("double")) /
          col("cnrm")).as("sim"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= NProbe)
      .select(col("query_id"), col("quv"), col("centroid_id"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    probes.join(assigned, "centroid_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (ndot(col("quv"), col("qv")).cast("double") /
          sqrt(ndot(col("quv"), col("quv")).cast("double")) /
          sqrt(ndot(col("qv"), col("qv")).cast("double"))).as("sim"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** Int8 coarse-quantization parameters for [[annInt8Rerank]]: qv is
    * 1e-6-quantized with |qv| < 2^20 (unit-ish vectors), so
    * `(qv + 2^20) >> 13` is an exact non-negative floor division by 8192
    * in BOTH engines (arithmetic shift == floor division only for
    * non-negative operands — the offset, 128·8192, guarantees that),
    * yielding a [-128, 127] code that fits a physical TINYINT.
    */
  private val CoarseOffset = 1L << 20
  private val CoarseShiftBits = 13
  /** Coarse candidates per query handed to the exact rerank. */
  private val NCoarse = 50

  /** Two-tier quantized search: int8 coarse scan + exact rerank.
    *
    * The 100 TB shape for brute-force-quality ANN when an IVF index is
    * not available (or recall must be near-exact): materialize a COARSE
    * copy of the corpus at 1 byte/dim (8× narrower than the exact
    * BIGINT vectors, 4× narrower than float32), scan THAT for every
    * query's integer dot-product top-`NCoarse`, and fetch full-precision
    * vectors only for the ~NCoarse·|queries| survivors. The expensive
    * full-width scan is replaced by a cheap narrow one: at 100 TB the
    * coarse pass reads ~12 TB, and the exact pass reads a few MB by
    * vec_id. Quantization is deterministic (fixed offset + shift — no
    * data-dependent scale factor), so coarse scores, tie-breaks, and the
    * final ranks are bit-identical to the DuckDB oracle.
    */
  def annInt8Rerank(s: SparkSession, dir: String): DataFrame = {
    val full = qEmb(s, dir)
    // the int8 tier: checkpointed once, 1 byte/dim at rest
    val coarse = full.select(col("vec_id"),
      transform(col("qv"), x =>
        (shiftright(x + CoarseOffset, CoarseShiftBits) - lit(128L))
          .cast("tinyint")).as("c8"))
      .sharedCheckpoint()
    val q8 = coarse.filter(col("vec_id") < NQuery)
      .select(col("vec_id").as("query_id"), col("c8").as("q8"))
    // coarse pass: queries broadcast, the narrow corpus streams; the
    // native dot runs on the widened codes (the cast is per-batch CPU,
    // the 8× byte saving is in the scan/checkpoint layer where it counts)
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("cscore").desc, col("vec_id"))
    val cands = coarse.join(broadcast(q8), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        ndot(col("c8").cast("array<bigint>"), col("q8").cast("array<bigint>"))
          .as("cscore"))
      .withColumn("crank", row_number().over(wCoarse))
      .filter(col("crank") <= NCoarse)
      .select(col("query_id"), col("vec_id"))
    // exact rerank: full-precision vectors fetched ONLY for candidates
    val qFull = full.filter(col("vec_id") < NQuery)
      .select(col("vec_id").as("query_id"), col("qv").as("quv"),
        col("nrm").as("qnrm"))
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    cands.join(full, "vec_id").join(broadcast(qFull), "query_id")
      .select(col("query_id"), col("vec_id"),
        (ndot(col("quv"), col("qv")).cast("double") / col("qnrm") /
          col("nrm")).as("sim"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** LSH tables: 4 tables × 8 random-hyperplane sign bits. Hyperplane
    * components are ±1 derived from md5 parity (pinned hash family, so
    * Spark and DuckDB compute identical buckets — the "randomness" is
    * deterministic and verifiable, same discipline as the MinHash family).
    */
  private val LshTables = 4
  private val LshBits   = 8

  /** sign(t)(j)(i-1) for hyperplane bit j of table t, dimension i. */
  private def lshSigns(dim: Int): Array[Array[Array[Int]]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(LshTables, LshBits, dim) { (t, j, i0) =>
      val d = md.digest(s"$t:$j:${i0 + 1}".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0xf) >= 8) 1 else -1
    }
  }

  /** Sign-LSH approximate top-k: each vector hashes to one 8-bit bucket
    * per table (sign of the exact integer dot with ±1 hyperplanes);
    * candidates are the union over tables of same-bucket vectors, then
    * exact cosine ranks them. The multi-table union is the recall knob
    * (L tables of b bits: P[candidate] = 1−(1−cosᵇθ')ᴸ). At 100 TB the
    * bucket table is a narrow (vec_id, table, bucket) relation bucketed
    * by (table, bucket) — candidate generation is an equi-join, never a
    * scan of the corpus per query.
    */
  /** The narrow (vec_id, t, bucket) LSH bucket table over `emb`,
    * checkpointed: every consumer is a join side, and an
    * object-producing subtree gets no exchange reuse — without the
    * checkpoint the 32-dot sign kernel runs once per consumer. Shared by
    * [[annLshTopk]] (search) and [[dedupEmbedding]] (near-dup blocking).
    * Map-only and O(N · tables · bits): unlike centroid assignment, the
    * bucket-space size is FREE — at 100 TB you widen `LshBits` with
    * log(N) to hold bucket occupancy constant without the hash pass
    * costing a dot more.
    */
  private def lshBuckets(s: SparkSession, emb: DataFrame): DataFrame = {
    import s.implicits._
    emb.select(col("vec_id"), col("qv")).as[(Long, Array[Long])]
      .mapPartitions { rows =>
        var signs: Array[Array[Array[Int]]] = null
        rows.flatMap { case (vecId, qv) =>
          if (signs == null) signs = lshSigns(qv.length)
          (0 until LshTables).map { t =>
            val sb = new java.lang.StringBuilder(LshBits)
            var j = 0
            while (j < LshBits) {
              var dot = 0L
              var i = 0
              while (i < qv.length) { dot += qv(i) * signs(t)(j)(i); i += 1 }
              sb.append(if (dot >= 0L) '1' else '0')
              j += 1
            }
            (vecId, t, sb.toString)
          }
        }
      }.toDF("vec_id", "t", "bucket")
      .sharedCheckpoint()
  }

  def annLshTopk(s: SparkSession, dir: String): DataFrame = {
    val buckets = lshBuckets(s, qEmb(s, dir))
    val q = buckets.filter(col("vec_id") < NQuery)
      .select(col("vec_id").as("query_id"), col("t"), col("bucket"))
    val cand = q.join(buckets, Seq("t", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
    val qv = qEmb(s, dir)
    val wRank = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    cand
      .join(qv.select(col("vec_id").as("query_id"), col("qv").as("quv"),
        col("nrm").as("qnrm")), "query_id")
      .join(qv, "vec_id")
      .select(col("query_id"), col("vec_id"),
        (ndot(col("quv"), col("qv")).cast("double") / col("qnrm") /
          col("nrm")).as("sim"))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= K)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank"), col("sim"))
  }

  /** Max vectors per (table, bucket) admitted to pair expansion — the
    * skew guard (same role as the simhash band cap): a degenerate
    * bucket never produces O(bucket²) pairs. Deterministic semantics:
    * the cap is on bucket SIZE, not on a selection within the bucket,
    * so both engines drop exactly the same (whole) buckets.
    */
  private val MaxLshBucket = 200L

  /** Embedding-cosine near-duplicate pairs, LSH-blocked: candidate
    * pairs come only from vectors sharing a sign-LSH bucket in some
    * table (never a full cross join), then exact quantized cosine
    * filters at [[DupThreshold]].
    *
    * Why LSH and not IVF blocking (the r7 shape): near-dup blocking
    * needs block COUNT to grow with N so block SIZE stays constant —
    * with centroid blocking that forces nlist ∝ N and the assignment
    * pass back to O(N · nlist) = O(N²/·), the exact scale-killer the
    * ANN entries just removed. The sign-LSH bucket space costs nothing
    * to widen ([[lshBuckets]]): hashing stays O(N · tables · bits) while
    * 2^bits tracks N, so BOTH the blocking and the assignment are
    * linear. Recall is the standard multi-table OR (pairs above the
    * threshold collide in ≥1 of 4 tables with high probability).
    *
    * Threshold note: the synthetic harness embeddings have no true
    * near-dups (max pairwise cosine ≈ 0.48), so the threshold is set low
    * enough to exercise the operator; production near-dup would use
    * ~0.95 with the identical plan (and higher-sim pairs collide MORE).
    */
  def dedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    val emb = qEmb(s, dir).sharedCheckpoint()
    val buckets = lshBuckets(s, emb)
    val admitted = buckets.groupBy(col("t"), col("bucket"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n").between(2L, MaxLshBucket))
      .select(col("t"), col("bucket"))
    val inBucket = buckets.join(admitted, Seq("t", "bucket"))
    val a = inBucket.select(col("t"), col("bucket"),
      col("vec_id").as("vec_a"))
    val b = inBucket.select(col("t"), col("bucket"),
      col("vec_id").as("vec_b"))
    val cand = a.join(b, Seq("t", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct()
    cand
      .join(emb.select(col("vec_id").as("vec_a"), col("qv").as("qa"),
        col("nrm").as("na")), "vec_a")
      .join(emb.select(col("vec_id").as("vec_b"), col("qv").as("qb"),
        col("nrm").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        (ndot(col("qa"), col("qb")).cast("double") / col("na") / col("nb"))
          .as("sim"))
      .filter(col("sim") >= DupThreshold)
  }

  /** Per-label corpus stats: count + average vector norm (norms rounded
    * to the 1e-6 decimal grid before the order-independent exact sum).
    */
  def embLabelStats(s: SparkSession, dir: String): DataFrame = {
    graft.plans.GraftExtensions.register(s)
    Tables.embeddings(s, dir)
      .select(col("label"),
        sqrt(ndot(qvec(col("embedding")), qvec(col("embedding")))
          .cast("double")).as("qnorm"))
      .groupBy("label")
      .agg(count(lit(1)).as("n_vectors"),
           davg(col("qnorm") / 1000000.0).as("avg_norm"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_brute_force" -> annBruteForce _,
    "ann_ivf_assign"  -> annIvfAssign _,
    "ann_ivf_topk"    -> annIvfTopk _,
    "ann_kmeans_centroids" -> annKmeansCentroids _,
    "ann_kmeans_fixed_nlist" -> annKmeansFixedNlist _,
    "ann_ivf_fixed_topk" -> annIvfFixedTopk _,
    "ann_ivf_persisted" -> annIvfPersisted _,
    "ann_ivf_incremental" -> annIvfIncremental _,
    "ann_kmeans_topk" -> annKmeansTopk _,
    "ann_lsh_topk"    -> annLshTopk _,
    "ann_int8_rerank" -> annInt8Rerank _,
    "dedup_embedding" -> dedupEmbedding _,
    "emb_label_stats" -> embLabelStats _)

  /** Shared oracle fragments (DuckDB). */
  private val qvecSql =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"
  private def dotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) AS DOUBLE)"
  private def cosSql(a: String, b: String): String =
    s"${dotSql(a, b)} / sqrt(${dotSql(a, a)}) / sqrt(${dotSql(b, b)})"

  /** KMeans oracle builders: the same 3-round Lloyd trajectory as
    * chained CTEs; all centroid arithmetic is exact 64-bit integer, so
    * both engines hold bit-identical centroids after every round.
    */
  private val KmDim = 64
  private def kmAssign(cents: String): String = kmAssignOn("v", cents)
  /** Assignment CTE over an arbitrary source relation (vec_id, qv). */
  private def kmAssignOn(src: String, cents: String): String =
    s"""(SELECT vec_id, qv, centroid_id FROM (
       |  SELECT v.vec_id, v.qv, c.centroid_id,
       |    row_number() OVER (PARTITION BY v.vec_id
       |      ORDER BY ${cosSql("v.qv", "c.cv")} DESC, c.centroid_id) AS rn
       |  FROM $src v CROSS JOIN $cents c) WHERE rn = 1)""".stripMargin
  private def kmUpdate(a: String): String =
    s"""(SELECT centroid_id, list(c ORDER BY pos) AS cv FROM (
       |  SELECT centroid_id, pos, CAST((sx - sx % n) / n AS BIGINT) AS c
       |  FROM (SELECT centroid_id, i AS pos,
       |          CAST(sum(qv[i]) AS BIGINT) AS sx, count(*) AS n
       |        FROM $a AS t, unnest(generate_series(1, $KmDim)) AS g(i)
       |        GROUP BY centroid_id, i) )
       | GROUP BY centroid_id)""".stripMargin
  private def kmChainFrom(c0Where: String): String =
    s"""v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
       |c0 AS (SELECT vec_id AS centroid_id, qv AS cv FROM v
       |       WHERE $c0Where),
       |c1 AS ${kmUpdate(kmAssign("c0"))},
       |c2 AS ${kmUpdate(kmAssign("c1"))},
       |c3 AS ${kmUpdate(kmAssign("c2"))}""".stripMargin
  /** Fixed-nlist seeds: stride = ceil(N / nlist), same in-plan scalar
    * as the Spark side's [[fixedSeeds]]. */
  private def fixedStrideSql(nlist: Int): String =
    s"vec_id % (SELECT CAST(ceil(count(*) / $nlist.0)" +
      " AS BIGINT) FROM v) = 0"
  private lazy val kmFixedChainSql: String =
    kmChainFrom(fixedStrideSql(TargetNlist))
  private lazy val kmWideChainSql: String =
    kmChainFrom(fixedStrideSql(TargetNlistWide))

  /** The sign-LSH bucket table as CTEs (v, bits, buckets) — the DuckDB
    * twin of [[lshBuckets]]'s pinned md5 hyperplane family; shared by
    * the `ann_lsh_topk` and `dedup_embedding` oracles.
    */
  private lazy val lshChainSql: String =
    s"""v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
       |bits AS (
       |  SELECT vec_id, t, j,
       |    CASE WHEN list_sum(list_transform(generate_series(1, len(qv)),
       |      i -> qv[i] * (CASE WHEN substr(md5(t || ':' || j || ':' || i),
       |                                     1, 1) >= '8'
       |                    THEN 1 ELSE -1 END))) >= 0
       |    THEN '1' ELSE '0' END AS bit
       |  FROM v,
       |       unnest(generate_series(0, ${LshTables - 1})) AS tt(t),
       |       unnest(generate_series(0, ${LshBits - 1})) AS jj(j)),
       |buckets AS (
       |  SELECT vec_id, t, string_agg(bit, '' ORDER BY j) AS bucket
       |  FROM bits GROUP BY vec_id, t)""".stripMargin

  /** The fixed-nlist train+probe+search chain — shared verbatim by the
    * inline (`ann_ivf_fixed_topk`) and persisted (`ann_ivf_persisted`)
    * lifecycles.
    */
  private lazy val ivfFixedTopkSql: String =
    s"""WITH $kmFixedChainSql,
       |a3 AS ${kmAssign("c3")},
       |probes AS (
       |  SELECT query_id, centroid_id FROM (
       |    SELECT q.vec_id AS query_id, c.centroid_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.centroid_id) AS rn
       |    FROM v q CROSS JOIN c3 c WHERE q.vec_id < $NQuery)
       |  WHERE rn <= $NProbe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN a3 a ON p.centroid_id = a.centroid_id
       |  WHERE a.vec_id <> p.query_id),
       |sims AS (
       |  SELECT query_id, c.vec_id, ${cosSql("qc.qv", "cc.qv")} AS sim
       |  FROM cand c
       |  JOIN v qc ON qc.vec_id = c.query_id
       |  JOIN v cc ON cc.vec_id = c.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
       |  FROM sims)
       |SELECT query_id, vec_id AS neighbor_id, rank, sim
       |FROM ranked WHERE rank <= $K""".stripMargin

  /** Incremental-lifecycle twin: centroids trained on the BASE slice
    * only (v is the filtered corpus, so the stride scalar and all three
    * Lloyd rounds see base vectors alone), then ALL vectors — base and
    * delta — assigned to those frozen centroids, then the shared
    * probe/search. Serving through the appended index must equal this
    * from-scratch composite exactly.
    */
  private lazy val ivfIncrementalSql: String =
    s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings
       |           WHERE vec_id % $IvfDeltaMod <> 0),
       |c0 AS (SELECT vec_id AS centroid_id, qv AS cv FROM v
       |       WHERE ${fixedStrideSql(TargetNlist)}),
       |c1 AS ${kmUpdate(kmAssign("c0"))},
       |c2 AS ${kmUpdate(kmAssign("c1"))},
       |c3 AS ${kmUpdate(kmAssign("c2"))},
       |vall AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
       |a3 AS ${kmAssignOn("vall", "c3")},
       |probes AS (
       |  SELECT query_id, centroid_id FROM (
       |    SELECT q.vec_id AS query_id, c.centroid_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.centroid_id) AS rn
       |    FROM vall q CROSS JOIN c3 c WHERE q.vec_id < $NQuery)
       |  WHERE rn <= $NProbe),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN a3 a ON p.centroid_id = a.centroid_id
       |  WHERE a.vec_id <> p.query_id),
       |sims AS (
       |  SELECT query_id, c.vec_id, ${cosSql("qc.qv", "cc.qv")} AS sim
       |  FROM cand c
       |  JOIN vall qc ON qc.vec_id = c.query_id
       |  JOIN vall cc ON cc.vec_id = c.vec_id),
       |ranked AS (
       |  SELECT query_id, vec_id, sim,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
       |  FROM sims)
       |SELECT query_id, vec_id AS neighbor_id, rank, sim
       |FROM ranked WHERE rank <= $K""".stripMargin

  val oracles: Map[String, String] = Map(
    "ann_ivf_incremental" -> ivfIncrementalSql,
    "ann_brute_force" ->
      s"""WITH q AS (SELECT vec_id AS query_id, $qvecSql AS quv
         |           FROM embeddings WHERE vec_id < $NQuery),
         |c AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
         |sims AS (
         |  SELECT query_id, vec_id, ${cosSql("quv", "qv")} AS sim
         |  FROM c JOIN q ON vec_id <> query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
         |  FROM sims)
         |SELECT query_id, vec_id AS neighbor_id, rank, sim
         |FROM ranked WHERE rank <= $K""".stripMargin,
    "ann_int8_rerank" ->
      s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
         |c8 AS (SELECT vec_id,
         |  list_transform(qv, x ->
         |    ((x + $CoarseOffset) >> $CoarseShiftBits) - 128) AS c8
         |  FROM v),
         |q8 AS (SELECT vec_id AS query_id, c8 AS q8
         |       FROM c8 WHERE vec_id < $NQuery),
         |cand AS (
         |  SELECT query_id, c.vec_id AS vec_id,
         |    list_sum(list_transform(generate_series(1, len(c.c8)),
         |      i -> c.c8[i] * q8[i])) AS cscore
         |  FROM c8 c JOIN q8 ON c.vec_id <> query_id),
         |top AS (
         |  SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cscore DESC, vec_id) AS crank
         |    FROM cand) WHERE crank <= $NCoarse),
         |q AS (SELECT vec_id AS query_id, qv AS quv
         |      FROM v WHERE vec_id < $NQuery),
         |sims AS (
         |  SELECT t.query_id, t.vec_id, ${cosSql("quv", "qv")} AS sim
         |  FROM top t JOIN v ON v.vec_id = t.vec_id
         |    JOIN q ON q.query_id = t.query_id),
         |ranked AS (
         |  SELECT query_id, vec_id, sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
         |  FROM sims)
         |SELECT query_id, vec_id AS neighbor_id, rank, sim
         |FROM ranked WHERE rank <= $K""".stripMargin,
    "ann_ivf_assign" ->
      s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
         |cents AS (SELECT vec_id AS centroid_id, qv AS cv
         |          FROM v WHERE ${fixedStrideSql(TargetNlistWide)}),
         |sims AS (
         |  SELECT vec_id, centroid_id, ${cosSql("qv", "cv")} AS sim
         |  FROM v CROSS JOIN cents),
         |ranked AS (
         |  SELECT vec_id, centroid_id, sim,
         |    row_number() OVER (PARTITION BY vec_id
         |      ORDER BY sim DESC, centroid_id) AS rn
         |  FROM sims)
         |SELECT vec_id, centroid_id, sim FROM ranked WHERE rn = 1""".stripMargin,
    "ann_ivf_topk" ->
      s"""WITH v AS (SELECT vec_id, $qvecSql AS qv FROM embeddings),
         |cents AS (SELECT vec_id AS centroid_id, qv AS cv
         |          FROM v WHERE ${fixedStrideSql(TargetNlistWide)}),
         |assigned AS (
         |  SELECT vec_id, centroid_id FROM (
         |    SELECT vec_id, centroid_id,
         |      row_number() OVER (PARTITION BY vec_id
         |        ORDER BY ${cosSql("qv", "cv")} DESC, centroid_id) AS rn
         |    FROM v CROSS JOIN cents) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, centroid_id FROM (
         |    SELECT q.vec_id AS query_id, centroid_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.qv", "cv")} DESC, centroid_id) AS rn
         |    FROM v q CROSS JOIN cents WHERE q.vec_id < $NQuery)
         |  WHERE rn <= $NProbe),
         |cand AS (
         |  SELECT p.query_id, a.vec_id
         |  FROM probes p JOIN assigned a ON p.centroid_id = a.centroid_id
         |  WHERE a.vec_id <> p.query_id),
         |sims AS (
         |  SELECT query_id, c.vec_id, ${cosSql("qc.qv", "cc.qv")} AS sim
         |  FROM cand c
         |  JOIN v qc ON qc.vec_id = c.query_id
         |  JOIN v cc ON cc.vec_id = c.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
         |  FROM sims)
         |SELECT query_id, vec_id AS neighbor_id, rank, sim
         |FROM ranked WHERE rank <= $K""".stripMargin,
    "ann_kmeans_centroids" ->
      s"""WITH $kmWideChainSql
         |SELECT a.centroid_id, count(*) AS n_members, cn.cnorm
         |FROM ${kmAssign("c3")} a
         |JOIN (SELECT centroid_id,
         |        CAST(list_sum(list_transform(generate_series(1, $KmDim),
         |          i -> cv[i] * cv[i])) AS BIGINT) AS cnorm
         |      FROM c3) cn USING (centroid_id)
         |GROUP BY a.centroid_id, cn.cnorm""".stripMargin,
    "ann_kmeans_fixed_nlist" ->
      s"""WITH $kmFixedChainSql
         |SELECT a.centroid_id, count(*) AS n_members, cn.cnorm
         |FROM ${kmAssign("c3")} a
         |JOIN (SELECT centroid_id,
         |        CAST(list_sum(list_transform(generate_series(1, $KmDim),
         |          i -> cv[i] * cv[i])) AS BIGINT) AS cnorm
         |      FROM c3) cn USING (centroid_id)
         |GROUP BY a.centroid_id, cn.cnorm""".stripMargin,
    "ann_ivf_fixed_topk" -> ivfFixedTopkSql,
    // persistence must be semantically invisible: the stored index
    // serves EXACTLY what the inline lifecycle computes
    "ann_ivf_persisted" -> ivfFixedTopkSql,
    "ann_kmeans_topk" ->
      s"""WITH $kmWideChainSql,
         |a3 AS ${kmAssign("c3")},
         |probes AS (
         |  SELECT query_id, centroid_id FROM (
         |    SELECT q.vec_id AS query_id, c.centroid_id,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.qv", "c.cv")} DESC, c.centroid_id) AS rn
         |    FROM v q CROSS JOIN c3 c WHERE q.vec_id < $NQuery)
         |  WHERE rn <= $NProbe),
         |cand AS (
         |  SELECT p.query_id, a.vec_id
         |  FROM probes p JOIN a3 a ON p.centroid_id = a.centroid_id
         |  WHERE a.vec_id <> p.query_id),
         |sims AS (
         |  SELECT query_id, c.vec_id, ${cosSql("qc.qv", "cc.qv")} AS sim
         |  FROM cand c
         |  JOIN v qc ON qc.vec_id = c.query_id
         |  JOIN v cc ON cc.vec_id = c.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
         |  FROM sims)
         |SELECT query_id, vec_id AS neighbor_id, rank, sim
         |FROM ranked WHERE rank <= $K""".stripMargin,
    "ann_lsh_topk" ->
      s"""WITH $lshChainSql,
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
         |  FROM buckets q JOIN buckets c
         |    ON q.t = c.t AND q.bucket = c.bucket AND c.vec_id <> q.vec_id
         |  WHERE q.vec_id < $NQuery),
         |sims AS (
         |  SELECT query_id, c.vec_id, ${cosSql("qc.qv", "cc.qv")} AS sim
         |  FROM cand c
         |  JOIN v qc ON qc.vec_id = c.query_id
         |  JOIN v cc ON cc.vec_id = c.vec_id),
         |ranked AS (
         |  SELECT query_id, vec_id, sim,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
         |  FROM sims)
         |SELECT query_id, vec_id AS neighbor_id, rank, sim
         |FROM ranked WHERE rank <= $K""".stripMargin,
    "dedup_embedding" ->
      s"""WITH $lshChainSql,
         |admitted AS (
         |  SELECT t, bucket FROM buckets GROUP BY t, bucket
         |  HAVING count(*) BETWEEN 2 AND $MaxLshBucket),
         |cand AS (
         |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM buckets a
         |  JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket
         |    AND a.vec_id < b.vec_id
         |  JOIN admitted s ON s.t = a.t AND s.bucket = a.bucket),
         |pairs AS (
         |  SELECT vec_a, vec_b, ${cosSql("va.qv", "vb.qv")} AS sim
         |  FROM cand
         |  JOIN v va ON va.vec_id = vec_a
         |  JOIN v vb ON vb.vec_id = vec_b)
         |SELECT vec_a, vec_b, sim FROM pairs WHERE sim >= $DupThreshold""".stripMargin,
    "emb_label_stats" ->
      s"""SELECT label, COUNT(*) AS n_vectors,
         |  CAST(SUM(CAST(sqrt(${dotSql("qv", "qv")}) / 1000000.0
         |      AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_norm
         |FROM (SELECT label, $qvecSql AS qv FROM embeddings)
         |GROUP BY label""".stripMargin)
}
