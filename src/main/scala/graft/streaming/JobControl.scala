package graft.streaming

/** I7: the reference's per-provider on-error dataflow policy
  * (`src/vunnel/provider.py:25-61,300-336`): FAIL (propagate), SKIP
  * (swallow, dispose state), RETRY(count, delay) falling back to
  * FAIL/SKIP on exhaustion — with input/result state disposal hooks
  * (the `on_error.input`/`on_error.results` KEEP/DELETE semantics).
  *
  * Job-control, not engine: in the Spark design this wraps a provider
  * pipeline's driver-side run (fetch + spark action + commit), while
  * task-level retries inside an action stay Spark's own.
  */
object JobControl {

  sealed trait OnError
  case object Fail extends OnError
  case object Skip extends OnError
  final case class Retry(count: Int, delayMs: Long = 0L,
      onExhausted: OnError = Fail) extends OnError

  final case class Outcome[T](result: Option[T], attempts: Int,
      error: Option[Throwable]) {
    def succeeded: Boolean = result.isDefined
  }

  /** Run `body` under `policy`. `dispose` runs once if the run ends in a
    * swallowed (SKIP) failure — the state-disposal hook (delete staged
    * input / partial results). FAIL endings propagate the last error
    * AFTER running `dispose`. */
  def run[T](policy: OnError, dispose: () => Unit = () => ())(
      body: () => T): Outcome[T] = {
    val (retries, delayMs, terminal) = policy match {
      case Retry(n, d, t) => (math.max(n, 0), d, t)
      case p => (0, 0L, p)
    }
    var attempts = 0
    var lastErr: Throwable = null
    while (attempts <= retries) {
      attempts += 1
      try {
        return Outcome(Some(body()), attempts, None)
      } catch {
        // NonFatal only: OOM/interrupt/fatal errors are not provider
        // failures and must not be retried or swallowed
        case scala.util.control.NonFatal(e) =>
          lastErr = e
          if (attempts <= retries && delayMs > 0) {
            try Thread.sleep(delayMs)
            catch {
              case ie: InterruptedException =>
                // cancellation during backoff: restore the flag, clean
                // up state, and propagate — no further attempts
                Thread.currentThread().interrupt()
                dispose()
                throw ie
            }
          }
      }
    }
    dispose()
    terminal match {
      case Skip => Outcome(None, attempts, Some(lastErr))
      case _ => throw lastErr
    }
  }
}
