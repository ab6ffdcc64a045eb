package graft.streaming

/** Phase timer for the live-index store folds: prints per-phase wall
  * time when `GRAFT_PROF=1` (measurement hook per optimization guide
  * §1; zero overhead in normal runs beyond a nanoTime call).
  */
private[streaming] object Prof {
  private val on = sys.env.get("GRAFT_PROF").contains("1")
  def timed[T](label: String)(f: => T): T =
    if (!on) f
    else {
      val t0 = System.nanoTime()
      val r  = f
      println(f"[prof] $label%-26s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
}
