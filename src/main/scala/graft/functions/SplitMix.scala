package graft.functions

/** The splitmix64 finalizer — the ONE implementation of the mixing
  * function every deterministic stream in the library derives from
  * (LSH hyperplane diagonals, simhash second hash, embedder weights,
  * scale-up replica transforms). Previously four byte-identical private
  * copies; a constant tweak to one would have silently diverged the
  * others' streams, so they all route here now.
  */
object SplitMix {
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
