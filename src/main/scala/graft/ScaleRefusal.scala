package graft

/** Loud-guard refusal from a deliberately size-bounded audit instrument
  * (exact O(n²) pair truths, broadcast-only key indexes): the operator
  * counted its input FIRST and declined to launch work that cannot
  * scale, which is promised behavior, not breakage. A dedicated subtype
  * of IllegalArgumentException so (a) existing `intercept[IAE]` specs
  * and caller catch blocks keep working unchanged, and (b) the Bench
  * runner can record the sf1 refusals (q34/q154/q155 at 10× gate scale)
  * as `designed_skips` instead of `failed` — r13 VERDICT #4: a `failed:
  * 3` artifact entry was indistinguishable at a glance from a real
  * regression. */
class ScaleRefusal(msg: String) extends IllegalArgumentException(msg)
