package graft.core

/** Env-gated logging bootstrap (reference: src/logging.rs:21-31).
  *
  * The reference initializes a DEBUG-level tracing subscriber at program
  * start unless `DEBUG_FEATURE_FACTORY` is unset, empty, "0", or "false".
  * Spark ships log4j2, so instead of installing a subscriber we gate a
  * lightweight debug channel the library logs through; the enable rule is
  * identical. `init` is idempotent and runs once on first use.
  */
object Logging {

  /** Reference rule (logging.rs:23-25): unset/empty/"0"/"false" → disabled;
    * anything else → DEBUG enabled. Injectable env for tests. */
  def enabledIn(env: Map[String, String]): Boolean =
    env.get("DEBUG_FEATURE_FACTORY").exists(v => v != "0" && v != "false" && v.nonEmpty)

  @volatile private var initialized = false
  @volatile private var enabled = false

  def init(env: Map[String, String] = sys.env): Unit = synchronized {
    if (!initialized) {
      enabled = enabledIn(env)
      initialized = true
      if (enabled) debug("logging enabled at DEBUG level")
    }
  }

  def isEnabled: Boolean = { init(); enabled }

  /** Debug-level message; no-op unless enabled (message is by-name, so
    * callers pay nothing when disabled). */
  def debug(msg: => String): Unit = {
    init()
    if (enabled) System.err.println(s"[graft DEBUG] $msg")
  }

  /** Test hook: reset so a different env map can be applied. */
  private[graft] def resetForTest(): Unit = synchronized { initialized = false }
}
