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

  /** Round bound: min-label propagation converges in diameter(G) rounds,
    * and near-dup graphs are shallow cliques (2–3 rounds). A graph that
    * needs more than this many rounds is adversarially chain-shaped —
    * abort loudly (each round is a full join+agg pass; an unbounded loop
    * on hostile input would burn the cluster silently) and point at the
    * O(log n) star-contraction swap-in. */
  val MaxRounds = 64

  /** edges(aCol, bCol) → (id, root): every node labeled with its
    * component's minimum id. Only nodes present in edges appear.
    * `maxRounds` raises the abort-loudly convergence cap for callers on
    * deep-but-legitimate graphs without switching to the counted API. */
  def minLabel(edges: DataFrame, aCol: String, bCol: String,
               maxRounds: Int = MaxRounds): DataFrame =
    minLabelCounted(edges, aCol, bCol, maxRounds)._1

  /** [[minLabel]] plus the number of propagation rounds executed —
    * observable so tests can pin rounds = O(diameter), and callers can
    * monitor convergence on production graphs. */
  def minLabelCounted(edges: DataFrame, aCol: String, bCol: String,
                      maxRounds: Int = MaxRounds): (DataFrame, Int) = {
    val a = col(aCol); val b = col(bCol)
    // Hash-partition the symmetric edge set on the per-round join key
    // (dst) BEFORE caching: every propagation round joins sym⋈labels on
    // dst, and a cached-but-arbitrarily-partitioned sym would re-shuffle
    // the full edge set (the big side — |E| ≫ |V| on dup graphs) every
    // round. Partitioned once, each round exchanges only the labels
    // side; InMemoryRelation preserves the partitioning across rounds.
    val sym = edges.select(a.as("src"), b.as("dst"))
      .union(edges.select(b.as("src"), a.as("dst")))
      .distinct()
      .repartition(col("dst"))
      .persist()
    // Lineage MUST be truncated every round, not just cached: each
    // round's plan references `labels` twice (through nbrMin and the
    // outer join), so an un-truncated logical plan tree DOUBLES per
    // round — 2^rounds nodes, and the driver OOMs stringifying/
    // re-optimizing it long before data is a problem. localCheckpoint
    // materializes the round eagerly and replaces the plan with a
    // LogicalRDD scan (executor-local storage; on a real cluster with
    // executor loss in play, set a checkpoint dir and swap in
    // .checkpoint() — same contract, reliable storage).
    // Init fuses propagation round 1: label₀ = min(id, min(neighbors))
    // is exactly what the first loop iteration would compute from
    // root=id, for one aggregation instead of a join+agg round.
    var labels = sym.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("root"))
      .select(col("src").as("id"), col("root"))
      .localCheckpoint()
    var changed = 1L
    var rounds = 1 // the fused init IS round 1 — keeps rounds = hops+1
    while (changed > 0) {
      rounds += 1
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"Components.minLabel did not converge in $maxRounds rounds — " +
            "the duplicate graph has a pathological long-chain structure " +
            "(diameter > maxRounds). Swap in alternating large-star/" +
            "small-star contraction (same min-id contract, O(log n) " +
            "rounds) or raise maxRounds deliberately.")
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min(col("root")).as("nmin"))
      // (measured: a pointer-doubling hop join per round costs more than
      // the rounds it saves on near-dup graphs, which are shallow —
      // chains barely exist, so min-propagation converges in 2-3 rounds)
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("root"),
          least(col("root"), coalesce(col("nmin"), col("root"))).as("next"))
        .localCheckpoint() // eager: materializes + truncates lineage
      changed = updated.filter(col("next") < col("root")).count()
      labels = updated.select(col("id"), col("next").as("root"))
    }
    sym.unpersist()
    (labels, rounds)
  }
}
