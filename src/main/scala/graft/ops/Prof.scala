package graft.ops

/** Build-stage wall-time profiling, printed under `-Dgraft.buildProfile`
  * (the hook the 10× append probe and the sf1 build tuning read). One
  * shared helper so every artifact family reports stages in the same
  * shape: `  [family] stage  N.NN s`. */
object Prof {
  @inline def on: Boolean = sys.props.contains("graft.buildProfile")

  def tt[A](family: String)(name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    if (on)
      println(f"  [$family] $name%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }
}
