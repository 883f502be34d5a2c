package graft.operators

/** The ONE fixed-point scale every exact-metric family uses (RRF fused
  * scores, retrieval-eval metrics, PageRank mass, ROUGE/BLEU
  * precisions): 1e12. Each family re-exports it under its local name
  * for readability, but the literal lives here — the oracle SQL
  * hardcodes `1000000000000.0`, so a divergent per-family copy would
  * break the documented cross-family contract silently.
  */
object FixedPoint {
  val Scale = 1000000000000L // 1e12
}
