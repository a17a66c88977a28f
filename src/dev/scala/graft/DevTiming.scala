package graft

/** Shared timing helper for the dev-only probe mains (Prof,
  * ScaleProbe, Scale50) — one definition so the output format cannot
  * drift between them. Not part of the library surface. */
object DevTiming {
  def time[T](tag: String)(name: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[$tag] $name%-32s ${(System.nanoTime() - t0) / 1e9}%7.2f s"); r
  }
}
