package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree-oriented triangle counting over an undirected edge set —
  * the Schank–Wagner / Latapy bound made distributed: orient every
  * edge from its (degree, id)-smaller endpoint to the larger, build
  * wedges by self-joining out-edges AT THE APEX KEY, and close each
  * wedge with one more equi-join. Orientation bounds out-degree by
  * √(2·|E|), so wedge volume is O(|E|^1.5) instead of Σ deg² — every
  * join keyed, nothing all-pairs.
  *
  * Input: a DataFrame of undirected edges with integral endpoint
  * columns `u` < `v`, ONE ROW PER EDGE (callers dedupe; a duplicated
  * edge would double-count its triangles). Each unordered wedge is
  * generated exactly once by ranking the two leaves in the SAME
  * (degree, id) order the orientation uses, so the closing edge is
  * oriented leaf₁ → leaf₂ by construction and the equi-join needs no
  * disjunction. [[count]] returns one row
  * (n_nodes, n_edges, n_triangles); [[perNode]] keeps the wedge APEX
  * through the closing join and explodes each triangle to its three
  * corners for node-grain counts and the local clustering coefficient.
  *
  * Engine-added (no reference analog): the cohesion statistic of
  * co-occurrence graphs — co-supply, co-purchase, co-citation.
  */
object Triangles {

  /** (degree table, oriented edge list (src, dst, ddst)). The degree
    * table is NODE-grain — dim-sized for co-occurrence graphs over
    * bounded entity sets, but unbounded for arbitrary graphs (a
    * billion-node edge list has a billion-row degree table, and a
    * FORCED broadcast hint would bypass the threshold and OOM the
    * build). Stats decide instead (SkewRoute.rightFitsBroadcast, the
    * same rule the as-of/band router uses): hint only when the
    * estimate fits spark.sql.autoBroadcastJoinThreshold, otherwise
    * leave the join unhinted — a keyed shuffle join that AQE may still
    * upgrade to broadcast from RUNTIME sizes. The wedge bound does not
    * depend on how the degree annotation is joined. */
  private def orient(e: DataFrame): (DataFrame, DataFrame) = {
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (SkewRoute.rightFitsBroadcast(df)) broadcast(df) else df
    val withDeg = e
      .join(maybeBroadcast(deg.select(col("node").as("u"), col("deg").as("du"))),
        Seq("u"))
      .join(maybeBroadcast(deg.select(col("node").as("v"), col("deg").as("dv"))),
        Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddst"))
    (deg, oriented)
  }

  /** Closed triangles as (apex, a, b) — each exactly once, with
    * (apex, a, b) the orientation's (degree, id) order. */
  private def triangles(oriented: DataFrame): DataFrame =
    oriented.select(col("src"), col("dst").as("a"), col("ddst").as("da"))
      .join(oriented.select(col("src"), col("dst").as("b"),
        col("ddst").as("db")), Seq("src"))
      .where(col("da") < col("db") ||
        (col("da") === col("db") && col("a") < col("b")))
      .select(col("src").as("apex"), col("a"), col("b"))
      .join(oriented.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_semi")

  def count(edges: DataFrame, u: String = "u", v: String = "v"): DataFrame = {
    val e = edges.select(col(u).as("u"), col(v).as("v"))
    val (deg, oriented) = orient(e)
    val nTriangles = triangles(oriented)
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
    val nEdges = e.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_edges"))
    val nNodes = deg.agg(org.apache.spark.sql.functions.count(lit(1)).as("n_nodes"))
    nNodes.crossJoin(nEdges).crossJoin(nTriangles)
      .select("n_nodes", "n_edges", "n_triangles")
  }

  /** INCREMENTAL maintenance: the triangle-count DELTA from appending
    * `newEdges` to `oldEdges` — the number of triangles in old ∪ new
    * with AT LEAST ONE new edge, so
    * `count(old ∪ new) = count(old) + countDelta(old, new)` and a
    * maintained total folds additively across waves (q224 holds the
    * fold to q203's oracle verbatim).
    *
    * PRECONDITION: `newEdges` is disjoint from `oldEdges` (both
    * canonical u < v, one row per edge) — a duplicated edge would
    * recount its old triangles.
    *
    * Why this is sound under degree drift: degrees (and thus the
    * (degree, id) orientation) change as edges append, but a
    * triangle's membership in the delta is decided by EDGE AGE alone —
    * orientation only DEDUPES wedge generation within this fold, and
    * any orientation counts each triangle exactly once. So the fold
    * re-annotates degrees over old ∪ new (one O(|E|) aggregate — linear
    * bookkeeping, cheap next to wedge volume) and never re-counts old
    * wedge pairs.
    *
    * Delta triangles by their canonical (apex, a, b) decomposition,
    * partitioned into the disjoint cases:
    *   - ≥1 NEW WEDGE EDGE: wedges from (new a-leaf × any b-leaf) ∪
    *     (old a-leaf × new b-leaf) at the apex key — the a-slot age
    *     makes the union disjoint and covers both-new exactly once —
    *     closed by a semi-join against ALL oriented edges. Volume ≤
    *     |Δ| · √(2|E|) (the orientation bound, batch-scaled).
    *   - BOTH WEDGE EDGES OLD, CLOSING NEW: for each new oriented edge
    *     (a, b) — whose own orientation IS the canonical leaf order —
    *     apexes with old out-edges to both a and b, via two keyed
    *     joins against the old adjacency (O(|Δ| · avg-in-degree)
    *     intermediate; in-neighborhoods of thresholded co-occurrence
    *     graphs are support-bounded).
    *   - both wedge edges old, closing old: an OLD triangle — not in
    *     the delta by definition.
    *
    * @return one row, `n_new_triangles` LONG */
  def countDelta(oldEdges: DataFrame, newEdges: DataFrame,
                 u: String = "u", v: String = "v"): DataFrame = {
    val all = oldEdges.select(col(u).as("u"), col(v).as("v"))
      .withColumn("is_new", lit(false))
      .unionByName(newEdges.select(col(u).as("u"), col(v).as("v"))
        .withColumn("is_new", lit(true)))
    val deg = all.select(col("u").as("node"))
      .unionAll(all.select(col("v").as("node")))
      .groupBy("node").agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))
    countDeltaWithDeg(all, deg)
  }

  /** [[countDelta]] with a CALLER-SUPPLIED node order: `deg` is any
    * (node, deg) table covering every endpoint of `all` with exactly
    * one row per node. Classification is by EDGE AGE, and orientation
    * only dedupes wedge generation WITHIN this fold — any per-fold-
    * consistent (deg, id) order counts each triangle exactly once —
    * so maintained degree counts ([[TriIndex]]) substitute for the
    * recomputed aggregate without changing the result; keeping them
    * real degrees is what preserves the |Δ|·√(2|E|) wedge bound. */
  private[operators] def countDeltaWithDeg(all: DataFrame,
                                           deg: DataFrame): DataFrame = {
    def maybeBroadcast(df: DataFrame): DataFrame =
      if (SkewRoute.rightFitsBroadcast(df)) broadcast(df) else df
    val withDeg = all
      .join(maybeBroadcast(deg.select(col("node").as("u"), col("deg").as("du"))),
        Seq("u"))
      .join(maybeBroadcast(deg.select(col("node").as("v"), col("deg").as("dv"))),
        Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // reused six times below; materialize once and cut lineage
    val oriented = withDeg.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddst"),
      col("is_new")).localCheckpoint()
    val oNew = oriented.where(col("is_new"))
    val oOld = oriented.where(!col("is_new"))
    def leafA(df: DataFrame) = df.select(col("src"),
      col("dst").as("a"), col("ddst").as("da"))
    def leafB(df: DataFrame) = df.select(col("src"),
      col("dst").as("b"), col("ddst").as("db"))
    val canon = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val wedgeEdgeNew = leafA(oNew).join(leafB(oriented), Seq("src"))
      .where(canon)
      .unionByName(leafA(oOld).join(leafB(oNew), Seq("src")).where(canon))
    val closedAny = wedgeEdgeNew.select("src", "a", "b")
      .join(oriented.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_semi")
    val closedNew = oNew.select(col("src").as("a"), col("dst").as("b"))
      .join(oOld.select(col("dst").as("a"), col("src").as("w")), Seq("a"))
      .join(oOld.select(col("dst").as("b"), col("src").as("w")),
        Seq("b", "w"), "left_semi")
    closedAny.agg(org.apache.spark.sql.functions.count(lit(1)).as("n"))
      .unionByName(
        closedNew.agg(org.apache.spark.sql.functions.count(lit(1)).as("n")))
      .agg(sum("n").as("n_new_triangles"))
  }

  /** Node-grain report: (node, degree, n_triangles, clustering) —
    * local clustering coefficient c(v) = 2·t(v)/(d(v)·(d(v)−1)), NULL
    * for degree-1 nodes (no wedge to close). Shape: the same oriented
    * wedge pipeline with the APEX carried through the closing join,
    * each triangle exploded to its three corners (3 rows per triangle
    * — output-bounded), then one node-grain aggregate left-joined onto
    * the degree table so triangle-free nodes report 0. */
  def perNode(edges: DataFrame, u: String = "u", v: String = "v"): DataFrame = {
    val e = edges.select(col(u).as("u"), col(v).as("v"))
    val (deg, oriented) = orient(e)
    val corners = triangles(oriented)
      .select(explode(array(col("apex"), col("a"), col("b"))).as("node"))
      .groupBy("node").agg(org.apache.spark.sql.functions.count(lit(1)).as("n_triangles"))
    deg.join(corners, Seq("node"), "left")
      .select(col("node"), col("deg").as("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") > 1,
          lit(2.0) * coalesce(col("n_triangles"), lit(0L)) /
            (col("deg").cast("double") * (col("deg") - 1))).as("clustering"))
  }
}
