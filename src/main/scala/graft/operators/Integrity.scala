package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Referential-integrity audit — the nightly constraint check a
  * lakehouse runs because parquet enforces no foreign keys.
  *
  * Scale shape: both directions reduce to DISTINCT keysets BEFORE any
  * anti join — the orphan probe anti-joins the child's distinct FK set
  * (dim-sized at any corpus scale) against the parent keys, never the
  * child fact rows against the parent table; childless parents is the
  * mirror. The orphan ROW count re-touches the fact table once with a
  * broadcast semi-join of the (tiny, usually empty) orphan keyset.
  */
object Integrity {

  /** One audit row for the relationship child.fk → parent.pk:
    * (relation, n_child_keys, n_orphan_keys, n_orphan_rows,
    *  n_parent_keys, n_childless_parents, ok). */
  def fkAudit(name: String, child: DataFrame, fk: String,
      parent: DataFrame, pk: String): DataFrame = {
    val ck = child.select(col(fk).as("k")).distinct()
    val pkeys = parent.select(col(pk).as("k")).distinct()
    val orphanKeys = ck.join(pkeys, Seq("k"), "left_anti")
    val orphanRows = child.select(col(fk).as("k"))
      .join(broadcast(orphanKeys), Seq("k"), "left_semi")
    val childless = pkeys.join(ck, Seq("k"), "left_anti")
    ck.agg(count(lit(1)).as("n_child_keys"))
      .crossJoin(orphanKeys.agg(count(lit(1)).as("n_orphan_keys")))
      .crossJoin(orphanRows.agg(count(lit(1)).as("n_orphan_rows")))
      .crossJoin(pkeys.agg(count(lit(1)).as("n_parent_keys")))
      .crossJoin(childless.agg(count(lit(1)).as("n_childless_parents")))
      .select(lit(name).as("relation"), col("n_child_keys"),
        col("n_orphan_keys"), col("n_orphan_rows"),
        col("n_parent_keys"), col("n_childless_parents"),
        (col("n_orphan_keys") === 0L).as("ok"))
  }
}
