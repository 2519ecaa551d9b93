package graft.ops

import org.apache.spark.sql.DataFrame

private[ops] object opsutil {

  /** Spread a SMALL scan across the cluster before heavy per-row work.
    *
    * The corpus inputs here arrive as one parquet file: the scan planner
    * packs them into one or two splits, so an expensive per-row projection
    * (sha256 shingling, ImageIO decode, 64-dim dot products) runs nearly
    * single-threaded while the rest of the cluster idles — the classic
    * unsplittable-input skew of guide §2.5, fixed the way the guide says:
    * repartition right after the read.
    *
    * Scale-guarded: only kicks in when the scan yields FEWER partitions
    * than the cluster's parallelism. At 100 TB the corpus is thousands of
    * splits and this is a no-op — a blanket repartition there would be a
    * full shuffle of the payload, which is exactly what we must not do.
    * The shuffle this does pay (the sub-parallelism case) is bounded by
    * the input's size, which the guard proves is tiny.
    */
  def spread(df: DataFrame): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df else df.repartition(p)
  }
}
