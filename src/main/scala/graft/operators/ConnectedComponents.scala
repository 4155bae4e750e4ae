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
    var prev: DataFrame = null
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("b"), col("comp").as("bcomp")), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("bcomp")).as("ncomp"))
      // Carry the previous label through the SAME pass so the convergence
      // check is a filter over this round's result — not a second join
      // against the previous iteration (halves the jobs per round).
      val step0 = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("comp").as("prev_comp"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"))
      // cache() does NOT truncate lineage: after k rounds the logical plan
      // nests k joins deep and optimizer time grows superlinearly (driver
      // OOM on deep graphs). localCheckpoint every 3 rounds materializes
      // to block storage and cuts the plan back to a leaf. (On a cluster
      // where executor loss matters, swap for checkpoint() + checkpointDir
      // — localCheckpoint blocks are lost with their executor.)
      val step = if (i % 3 == 2) step0.localCheckpoint() else step0.cache()
      val changed = step.where(col("comp") =!= col("prev_comp")).limit(1).count() > 0
      // step is materialized by the count above; the previous round's
      // cache is now superseded and can go.
      if (prev != null) prev.unpersist(false)
      prev = step
      labels = step.select("id", "comp")
      converged = !changed
      i += 1
    }
    // Partial labels would hand the caller a dedup plan that merges too
    // little — and [[maintain]] builds every LATER fold on top of the
    // returned labels, so one truncated fold would silently corrupt all
    // subsequent incremental state. Non-convergence must be an ERROR,
    // not a warning the caller can miss.
    if (!converged)
      throw new IllegalStateException(
        s"ConnectedComponents: maxIter=$maxIter reached before convergence; " +
          "labels are NOT final (cluster diameter exceeds maxIter) — raise " +
          "maxIter or use componentsStar (O(log^2 n) rounds on any graph)")
    edges.unpersist(false)
    labels
  }

  /** INCREMENTAL maintenance — CC(E_old ∪ E_new) from the OLD LABELS
    * and the new edges alone, never re-touching the accumulated edge
    * set. Sound because component merging is monotone under appends
    * (components only merge, never split) and label = MIN reachable
    * id: condense each new edge's endpoints through the old labels
    * (an unseen endpoint keeps itself), run [[components]] on the
    * CONDENSED graph — batch-sized + touched components, with any
    * within-component edge collapsing to a self-loop — and the
    * condensed label of an old component c is exactly the min id of
    * every old cluster merged into it (c is itself the min id of its
    * own cluster). Old nodes remap comp → condensed comp (untouched
    * components keep their label without ever being read); brand-new
    * nodes take their condensed label directly. Iteration cost per
    * batch is the condensed graph's diameter, not the full graph's.
    * Order-independence of merging means NO append-order contract —
    * any partition of the edge stream folds to the one-shot labels
    * (ConnectedComponentsPropertySpec pins random splits; q219 is
    * gated by q62's oracle verbatim).
    *
    * @param labels   (id, comp) from the previous fold ([[components]]
    *                 or an earlier [[maintain]])
    * @param newPairs the new batch's undirected edges (two columns)
    * @return (id, comp) over all nodes seen so far */
  def maintain(labels: DataFrame, newPairs: DataFrame,
               maxIter: Int = 20): DataFrame = {
    val e = newPairs.toDF("a", "b")
    val condensed = e
      .join(labels.select(col("id").as("a"), col("comp").as("ca")),
        Seq("a"), "left")
      .join(labels.select(col("id").as("b"), col("comp").as("cb")),
        Seq("b"), "left")
      .select(coalesce(col("ca"), col("a")).as("a"),
        coalesce(col("cb"), col("b")).as("b"))
    // components() THROWS on non-convergence (never returns partial
    // labels), so a truncated fold can't poison later incremental state
    val cond = components(condensed, maxIter)
    val remapped = labels
      .join(cond.select(col("id").as("comp"), col("comp").as("newc")),
        Seq("comp"), "left")
      .select(col("id"), coalesce(col("newc"), col("comp")).as("comp"))
    // condensed nodes not present in the old labels are brand-new ids
    val fresh = cond.join(labels.select("id"), Seq("id"), "left_anti")
    // LINEAGE CUT at the fold boundary: this output is the next fold's
    // `labels` input, and the plan above references `labels` THREE
    // times (two condensation joins + the anti-join) — k chained folds
    // would nest the full history 3^k deep in the LOGICAL plan, and the
    // plan/explain strings alone OOM the driver long before any data
    // does (the same reason components() checkpoints every 3 rounds).
    // The store-backed deployment ([[CcIndex]]) truncates through
    // parquet instead; this keeps the documented in-memory chaining
    // usable. (Cluster note: swap for checkpoint() where executor loss
    // matters — localCheckpoint blocks die with their executor.)
    remapped.unionByName(fresh.select("id", "comp")).localCheckpoint()
  }

  /** Duplicate groups from a near-dup pair list: every id mapped to its
    * group's keeper (the smallest id), one row per non-keeper — the
    * "rows to drop" list of a dedup job. */
  def dedupPlan(pairs: DataFrame): DataFrame =
    components(pairs)
      .where(col("id") =!= col("comp"))
      .select(col("id").as("drop_id"), col("comp").as("keeper_id"))

  /** Alternating large-star / small-star contraction (Kiveris, Lattanzi,
    * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
    * and Beyond", SoCC'14 — a public algorithm). Where [[components]]
    * needs DIAMETER rounds (min labels travel one hop per round), star
    * contraction rewires the graph itself each round — every node's
    * neighborhood collapses toward its minimum — and converges in
    * O(log^2 n) rounds on any graph. Same building blocks (keyed joins +
    * aggregates, no driver-side graph, lineage cut every round), so it is
    * the drop-in choice when dedup clusters can be long chains (URL
    * redirect graphs, record-linkage transitivity) rather than tight
    * near-dup cliques.
    *
    * Round = large-star then small-star:
    *  - large-star: per node u with closed-neighborhood min m(u), rewire
    *    every LARGER neighbor v > u to m(u);
    *  - small-star: per node u over SMALLER-or-equal neighbors, rewire
    *    them (and u) to the minimum.
    * At the fixed point edges form stars: every node points straight at
    * its component's minimum.
    *
    * @return (id, comp) in the same shape as [[components]] */
  def componentsStar(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    val e0 = pairs.toDF("a", "b")
    // canonical undirected set: (hi, lo), hi > lo — every rewiring below
    // emits (node, smaller-label) pairs, so this orientation is stable
    var edges = e0
      .select(greatest(col("a"), col("b")).as("hi"), least(col("a"), col("b")).as("lo"))
      .where(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val sym = edges.select(col("hi").as("u"), col("lo").as("v"))
        .unionByName(edges.select(col("lo").as("u"), col("hi").as("v")))
      // closed-neighborhood minimum per node
      val mins = sym.groupBy("u").agg(least(min(col("v")), first(col("u"))).as("m"))
      // large-star: larger neighbors attach to m(u)
      val large = sym.where(col("v") > col("u"))
        .join(mins, Seq("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .where(col("hi") =!= col("lo"))
        .distinct()
      // small-star over the rewired set: each node u with its smaller
      // neighbors {v} and m = min(v); attach u and every v != m to m
      val smallNbrs = large.select(col("hi").as("u"), col("lo").as("v"))
      val smallMins = smallNbrs.groupBy("u").agg(min(col("v")).as("m"))
      val small = smallNbrs.join(smallMins, Seq("u"))
        .select(col("u").as("hi"), col("m").as("lo"))
        .unionByName(smallNbrs.join(smallMins, Seq("u"))
          .where(col("v") =!= col("m"))
          .select(col("v").as("hi"), col("m").as("lo")))
        .where(col("hi") =!= col("lo"))
        .distinct()
        .localCheckpoint() // cut lineage every round; also materializes for the diff
      // fixed point: small == edges as sets (both distinct, so count +
      // one-way difference suffices)
      val same = small.count() == edges.count() &&
        small.except(edges).limit(1).count() == 0
      edges = small
      converged = same
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"componentsStar: maxIter=$maxIter reached before convergence; " +
          "labels are NOT final — raise maxIter")
    // stars: every non-root points at its root; roots label themselves
    val nodes = e0.select(col("a").as("id")).unionByName(e0.select(col("b").as("id"))).distinct()
    nodes.join(edges.select(col("hi").as("id"), col("lo")), Seq("id"), "left")
      .groupBy("id")
      .agg(coalesce(min(col("lo")), first(col("id"))).as("comp"))
  }
}
