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

  /** Degradation census: every SAFE fallback an append path takes when
    * an infra step fails (epoch table unreadable, epoch carry failed —
    * the consumer then runs its full-recompute path once). Output rows
    * are unaffected, but a soak that hits these repeatedly is paying
    * the slow path every batch — so the events COUNT here (the probes
    * print the census, SoakSpec asserts it zero) rather than living
    * only in a stderr line a log-grep has to find. */
  private val degradedCounts = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  def degrade(family: String, what: String): Unit = {
    degradedCounts.computeIfAbsent(s"$family:$what",
      _ => new java.util.concurrent.atomic.AtomicLong).incrementAndGet()
    ()
  }

  private[graft] def degraded: Map[String, Long] = {
    import scala.jdk.CollectionConverters._
    degradedCounts.asScala.map { case (k, v) => (k, v.get()) }.toMap
  }

  private[graft] def degradedTotal: Long = degraded.values.sum

  private[graft] def resetDegraded(): Unit = degradedCounts.clear()
}
