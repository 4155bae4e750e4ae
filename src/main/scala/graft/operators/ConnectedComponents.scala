package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair list — the step that turns near-dup
  * PAIRS (from MinHash/SimHash/Jaccard) into duplicate GROUPS with a
  * canonical keeper per group.
  *
  * Algorithm: iterative minimum-label propagation. Every node starts
  * labeled with itself; each round, a node's label becomes the minimum
  * label in its closed neighborhood; stop when no label changes. Rounds
  * needed = graph diameter (near-dup clusters are tiny, so 2-4 in
  * practice); each round is two hash joins + an aggregate — all keyed
  * shuffles, no driver-side graph. Deterministic: min() has no ties to
  * break.
  */
object ConnectedComponents {

  /** @param pairs two-column DataFrame of undirected edges (ids of one
    *              orderable type)
    * @return (id, component) — component = smallest id reachable */
  def components(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val e0 = pairs.toDF("a", "b")
    // symmetrize once; self-loops keep isolated-after-filter nodes stable
    val edges = e0
      .unionByName(e0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .cache()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("comp", col("id"))
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("comp", "bcomp"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("bcomp")).as("ncomp"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
        .cache()
      val changed = updated.alias("u")
        .join(labels.alias("l"), Seq("id"))
        .where(col("u.comp") =!= col("l.comp"))
        .limit(1).count() > 0
      labels = updated
      converged = !changed
      i += 1
    }
    labels
  }

  /** Duplicate groups from a near-dup pair list: every id mapped to its
    * group's keeper (the smallest id), one row per non-keeper — the
    * "rows to drop" list of a dedup job. */
  def dedupPlan(pairs: DataFrame): DataFrame =
    components(pairs)
      .where(col("id") =!= col("comp"))
      .select(col("id").as("drop_id"), col("comp").as("keeper_id"))
}
