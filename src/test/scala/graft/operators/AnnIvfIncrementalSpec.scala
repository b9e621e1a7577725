package graft.operators

import java.io.File

import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the index-maintenance mechanics the `ann_ivf_incremental`
  * oracle cannot see (it only proves the served results):
  *
  *  1. the delta append is O(batch): exactly the delta's rows are
  *     added, and every BASE index file stays byte-identical
  *     (name/size/mtime) — new bucket files land next to old ones;
  *  2. the appended table's assignment equals a from-scratch
  *     assignment of the full corpus against the same frozen
  *     centroids — no vector lost, duplicated, or re-clustered;
  *  3. the bucket spec survives the append (Spark validates it, and
  *     the table keeps serving bucket-local joins).
  */
class AnnIvfIncrementalSpec extends SparkSpec {

  private def dropWithLocation(tbl: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    // a crashed earlier run can leave the managed location on disk with
    // no catalog entry; CREATE then refuses the orphan dir
    org.apache.commons.io.FileUtils.deleteQuietly(
      new File("spark-warehouse", tbl))
  }

  test("delta append leaves base files untouched and matches full assignment") {
    val cent = "graft_ivfi_spec_cents"
    val asg  = "graft_ivfi_spec_assign"
    dropWithLocation(cent)
    dropWithLocation(asg)
    val nBuckets = 8
    EmbeddingQueries.ivfIncrementalBase(spark, sf0001, cent, asg, nBuckets)

    val loc = new File(java.net.URI.create(
      spark.sessionState.catalog.getTableMetadata(TableIdentifier(asg))
        .location.toString))
    def files(): Set[(String, Long, Long)] =
      Option(loc.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && !f.getName.startsWith("_") &&
          !f.getName.startsWith("."))  // _SUCCESS + .crc commit markers
        .map(f => (f.getName, f.length, f.lastModified)).toSet
    val baseFiles = files()
    assert(baseFiles.nonEmpty)
    val baseCount = spark.table(asg).count()

    EmbeddingQueries.ivfIncrementalAppend(spark, sf0001, cent, asg, nBuckets)

    val afterFiles = files()
    assert(baseFiles.subsetOf(afterFiles),
      "append rewrote base index files: " + (baseFiles -- afterFiles))
    assert(afterFiles.size > baseFiles.size, "append wrote no new files")

    val emb = EmbeddingQueries.qEmb(spark, sf0001)
      .select(col("vec_id"), col("qv"))
    val nDelta = emb
      .filter(col("vec_id") % EmbeddingQueries.IvfDeltaMod === 0).count()
    assert(spark.table(asg).count() === baseCount + nDelta)

    // appended table == from-scratch assignment against the same
    // frozen centroids (set compare on (vec_id, centroid_id))
    val got = spark.table(asg).select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = EmbeddingQueries
      .assignNearest(emb, spark.table(cent))
      .select(col("vec_id"), col("centroid_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want, "incremental index diverges from full assignment")

    // bucket spec survived the append
    val meta = spark.sessionState.catalog.getTableMetadata(TableIdentifier(asg))
    assert(meta.bucketSpec.exists(_.numBuckets === nBuckets))

    dropWithLocation(cent)
    dropWithLocation(asg)
  }
}
