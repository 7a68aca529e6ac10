package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a pair graph — the canonicalization step
  * after near-dup detection: every document in a duplicate cluster maps
  * to the cluster's minimum doc id (the "keeper"), so dedup becomes a
  * semi-join against keepers.
  *
  * Algorithm: iterative min-label propagation. Each round every node
  * takes the minimum label among itself and its neighbours; fixpoint is
  * reached after diameter(G) rounds. Near-dup graphs are overwhelmingly
  * tiny cliques (pairs/triples), so convergence is 1–2 rounds in
  * practice. Each round is one keyed join + aggregate — no driver-side
  * data, only a convergence `count()`. At extreme scale the classic
  * upgrade is alternating large-star/small-star contraction
  * (O(log n) rounds on pathological chains); the operator's contract
  * (min-id labeling) is identical, so it can swap in transparently.
  *
  * Deterministic: the fixpoint labeling is a pure function of the edge
  * set (min over connected component), independent of iteration order —
  * which is what makes it oracle-checkable against a recursive-CTE
  * transitive closure.
  */
object Components {

  /** edges(aCol, bCol) → (id, root): every node labeled with its
    * component's minimum id. Only nodes present in edges appear. */
  def minLabel(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val a = col(aCol); val b = col(bCol)
    val sym = edges.select(a.as("src"), b.as("dst"))
      .union(edges.select(b.as("src"), a.as("dst")))
      .distinct()
      .persist()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("root", col("id"))
      .persist()
    // materialized `updated` of the previous round — its successor
    // labels read THROUGH it, so it stays cached until the next round
    // has materialized (unpersisting earlier would silently recompute
    // the whole lineage each round: quadratic blowup)
    var retired: DataFrame = null
    var changed = 1L
    while (changed > 0) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("root")).as("nmin"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("root"),
          least(col("root"), coalesce(col("nmin"), col("root"))).as("next"))
        .persist()
      // (measured: a pointer-doubling hop join per round costs more than
      // the rounds it saves on near-dup graphs, which are shallow —
      // chains barely exist, so min-propagation converges in 2-3 rounds)
      changed = updated.filter(col("next") < col("root")).count() // materializes
      if (retired != null) retired.unpersist()
      retired = updated
      labels = updated.select(col("id"), col("next").as("root"))
    }
    sym.unpersist()
    labels
  }
}
