package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Shared tombstone set for persisted indexes ([[MinhashIndex]], [[IvfIndex]]):
 * retired ids live in `<dir>/tombstones` (long ids, duplicates harmless) and
 * are anti-joined out of reads until a compaction rewrites the store. One
 * audited copy of the swap/heal protocol — like [[StoreMarker]], the
 * crash-ordering rules must not fork per index type.
 *
 * Un-retire rewrites the set via stage → park → checked renames; a crash at
 * any point is healed by [[resolve]] on the next read. When the live set is
 * MISSING (crash mid-swap) the staged new set is restored if present (it is
 * complete before the first rename), else the parked old set. When the live
 * set still exists alongside staging leftovers (crash before the park
 * rename), the LIVE set wins and staging is discarded — conservative: a
 * suppressed id stays suppressed, and the append replay re-runs the
 * un-retire to completion. Never the reverse: swapping in a staged set
 * while a live one exists would race a concurrent in-progress rewrite.
 */
private[graft] object Tombstones {

  private val schema = StructType(Seq(StructField("id", LongType, nullable = false)))

  private def paths(dir: String) = (
    new Path(dir, "tombstones"),
    new Path(dir, ".tombstones_old"),
    new Path(dir, ".tombstones_new"))

  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(schema).parquet(s"$dir/tombstones")

  /** Append retired ids (idempotent — anti-join semantics absorb dups).
    * Heals any torn un-retire swap FIRST: appending into a fresh dir while
    * the real set sat parked in staging would make the next resolve()
    * discard every previously retired id. */
  def retire(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit = {
    resolve(spark, dir)
    ids.select(col(idCol).cast("long").as("id")).distinct()
      .write.mode("append").parquet(s"$dir/tombstones")
  }

  /** Resolve the tombstone dir, healing any torn [[unretire]] swap first.
    * Returns None when the store has no tombstones. Heal renames are
    * CHECKED: on object stores a rename can fail by returning false, and
    * proceeding would delete the only surviving tombstone copy below —
    * silently serving retired (taken-down) documents again. */
  def resolve(spark: SparkSession, dir: String): Option[Path] = {
    val (tomb, oldP, newP) = paths(dir)
    val fs = tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(tomb)) {
      if (fs.exists(newP)) {
        if (!fs.rename(newP, tomb))
          throw new java.io.IOException(s"tombstone heal: could not restore $newP in $dir")
      } else if (fs.exists(oldP)) {
        if (!fs.rename(oldP, tomb))
          throw new java.io.IOException(s"tombstone heal: could not restore $oldP in $dir")
      }
    }
    if (fs.exists(oldP)) fs.delete(oldP, true)
    if (fs.exists(newP)) fs.delete(newP, true)
    if (fs.exists(tomb)) Some(tomb) else None
  }

  /** PINNED snapshot of the current tombstone set: resolves the dir, then
    * reads exactly the parquet files present at this instant — ids retired
    * concurrently AFTER the snapshot never appear in it. compact() needs
    * this pinning: it must remove from the live set only the ids it
    * actually applied to the rewrite, or a retire landing mid-compact is
    * silently cleared without ever being applied (round-5 ADVICE #1).
    * None when the store has no tombstones. */
  def snapshot(spark: SparkSession, dir: String): Option[DataFrame] =
    resolve(spark, dir).map { tomb =>
      val fs = tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(tomb).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext
          .emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files.toIndexedSeq: _*)
    }

  /** Anti-join the tombstone set out of `df` (matching on `idCol`) when one
    * exists; the common no-tombstone case keeps the exact original plan
    * (driver-side FS checks only). */
  def minus(spark: SparkSession, dir: String, df: DataFrame, idCol: String): DataFrame =
    resolve(spark, dir) match {
      case Some(_) =>
        df.join(read(spark, dir).select(col("id").as(idCol)), Seq(idCol), "left_anti")
      case None => df
    }

  /** Remove `ids` from the tombstone set (no-op without tombstones or
    * overlap). Stage → park → checked renames; see the object scaladoc for
    * the heal contract. */
  def unretire(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit = {
    val tomb = resolve(spark, dir).getOrElse(return)
    val fs = tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // distinct so the left-outer mark below cannot multiply tombstone rows;
    // anti-join semantics downstream are unaffected by it
    val longIds = ids.select(col(idCol).cast("long").as("id")).distinct()
    // ONE probe job for both decisions (r6 — a streaming append pays this
    // per micro-batch): total rows and overlapping rows out of a single
    // marked aggregate; previously a semi-join count plus an anti-join
    // count ran the same two scans sequentially.
    val st = read(spark, dir)
      .join(longIds.withColumn("x", lit(1)), Seq("id"), "left_outer")
      .agg(count(lit(1)), count(col("x"))).head()
    val (total, overlap) = (st.getLong(0), st.getLong(1))
    if (overlap == 0) return
    val remaining = read(spark, dir).join(longIds, Seq("id"), "left_anti")
    if (overlap == total) {
      // last tombstone un-retired: CLEAR rather than swap in an empty set —
      // an empty-but-present dir would cost every future read its
      // no-tombstone fast path and let compact() rewrite the whole store
      // over nothing
      clear(spark, dir)
      return
    }
    val (_, oldP, newP) = paths(dir)
    remaining.write.mode("overwrite").parquet(newP.toString)
    if (!fs.rename(tomb, oldP))
      throw new java.io.IOException(s"unretire: could not park old tombstones in $dir")
    if (!fs.rename(newP, tomb))
      throw new java.io.IOException(s"unretire: could not swap tombstones in $dir")
    fs.delete(oldP, true)
  }

  /** Drop the whole tombstone set (after a compaction made it redundant). */
  def clear(spark: SparkSession, dir: String): Unit = {
    val (tomb, oldP, newP) = paths(dir)
    val fs = tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(tomb, oldP, newP).foreach(p => if (fs.exists(p)) fs.delete(p, true))
  }
}
