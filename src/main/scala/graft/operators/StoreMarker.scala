package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/**
 * The `_BUILT` marker protocol shared by every persisted store (MinhashIndex,
 * IvfIndex; Lineage uses the same idea with its own manifest): a store is
 * valid iff the marker exists, the marker is deleted BEFORE any destructive
 * write and recreated only AFTER the write completes, so every torn state is
 * marker-less and heals by rebuild instead of being served. One audited copy
 * of the ordering — the protocol was previously hand-written per site, where
 * a future fix to one copy could silently miss the others.
 */
private[graft] object StoreMarker {
  private def path(dir: String) = new Path(dir, "_BUILT")
  private def fs(spark: SparkSession, dir: String) =
    path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(path(dir))

  /** Drop the marker before touching data (no-op when absent). */
  def invalidate(spark: SparkSession, dir: String): Unit = {
    val f = fs(spark, dir)
    if (f.exists(path(dir))) f.delete(path(dir), false)
  }

  /** Commit the store: create the marker AFTER all data is written. */
  def commit(spark: SparkSession, dir: String): Unit =
    fs(spark, dir).create(path(dir), true).close()
}
