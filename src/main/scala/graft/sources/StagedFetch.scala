package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}
import java.time.format.DateTimeFormatter
import java.time.ZonedDateTime
import graft.streaming.JobControl

/** Driver-side staged-fetch utility honoring the reference's retry
  * envelope (`src/vunnel/utils/http_wrapper.py:187-316,26-74`) and the
  * S14 digest-checked artifact cache
  * (`tool/fixdate/grype_db_first_observed.py:244-303`):
  *
  *  - exponential backoff with jitter, capped at `maxInterval`
  *    (`backoff_sleep_interval`, http_wrapper.py:305-316)
  *  - rate-limit detection: 429 always, 503 only with a Retry-After
  *    header (`_is_rate_limited`); the wait honors Retry-After in both
  *    RFC 7231 forms (seconds / HTTP-date), capped at `maxRateLimitWait`
  *    to prevent a hostile header from stalling the run, and skips the
  *    backoff for that attempt
  *  - exhausted retries re-raise the last failure
  *
  * The transport is injected (this engine performs no network I/O of
  * its own — fetch is the driver's side of the bargain); the sleeper
  * and jitter are injectable for deterministic tests. [[fetchStaged]]
  * composes the retry envelope with [[JobControl]]'s FAIL/SKIP/RETRY
  * provider policy (I7) and the digest-checked skip.
  */
object StagedFetch {

  final case class Response(status: Int, headers: Map[String, String] = Map.empty,
      body: Array[Byte] = Array.empty) {
    def header(name: String): Option[String] =
      headers.collectFirst { case (k, v) if k.equalsIgnoreCase(name) => v }
  }

  /** GET transport: url → response (may throw on transport errors). */
  type Transport = String => Response

  final case class HttpError(status: Int, url: String)
    extends RuntimeException(s"HTTP $status for $url")

  final case class Config(
      retries: Int = 5,
      backoffSeconds: Double = 3.0,
      maxIntervalSeconds: Double = 600.0,
      defaultRateLimitWait: Double = 30.0,
      maxRateLimitWait: Double = 300.0)

  /** Retry-After in both RFC 7231 forms; None for missing, unparseable,
    * zero/negative, or already-past values (caller uses the default). */
  def parseRetryAfter(value: Option[String],
      nowEpochSeconds: => Double = System.currentTimeMillis() / 1000.0): Option[Double] =
    value.map(_.trim).filter(_.nonEmpty).flatMap { v =>
      v.toIntOption match {
        case Some(s) => if (s > 0) Some(s.toDouble) else None
        case None =>
          try {
            val dt = ZonedDateTime.parse(v, DateTimeFormatter.RFC_1123_DATE_TIME)
            val delay = dt.toEpochSecond - nowEpochSeconds
            if (delay > 0) Some(delay) else None
          } catch { case _: Exception => None }
      }
    }

  /** interval · 2^attempt, capped, plus jitter ∈ [0, 1). */
  def backoffSleepInterval(interval: Double, attempt: Int,
      maxValue: Double, jitter: Double): Double =
    math.min(interval * math.pow(2.0, attempt), maxValue) + jitter

  /** 429 always; 503 only when Retry-After is present. */
  def isRateLimited(r: Response): Boolean =
    r.status == 429 || (r.status == 503 && r.header("Retry-After").isDefined)

  /** GET with the reference's retry envelope. Throws the last failure
    * when retries are exhausted. `sleeper` receives every wait in
    * seconds; `jitter` is sampled per backoff. */
  def get(url: String, transport: Transport, cfg: Config = Config(),
      sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong),
      jitter: () => Double = () => scala.util.Random.nextDouble(),
      nowEpochSeconds: () => Double = () => System.currentTimeMillis() / 1000.0)
      : Response = {
    var lastError: Throwable = null
    var skipBackoff = false
    var attempt = 0
    while (attempt <= cfg.retries) {
      if (lastError != null && !skipBackoff)
        sleeper(backoffSleepInterval(cfg.backoffSeconds, attempt - 1,
          cfg.maxIntervalSeconds, jitter()))
      skipBackoff = false
      lastError = null
      try {
        val r = transport(url)
        if (isRateLimited(r)) {
          if (attempt >= cfg.retries) throw HttpError(r.status, url)
          val wait = parseRetryAfter(r.header("Retry-After"), nowEpochSeconds())
            .getOrElse(cfg.defaultRateLimitWait)
          sleeper(math.min(wait, cfg.maxRateLimitWait))
          skipBackoff = true
          lastError = HttpError(r.status, url) // marks a consumed attempt
        } else if (r.status >= 400) {
          throw HttpError(r.status, url)
        } else {
          return r
        }
      } catch {
        case scala.util.control.NonFatal(e) => lastError = e
      }
      attempt += 1
    }
    throw lastError
  }

  /** Digest-checked staged download (S14): skip when the remote digest
    * matches `<dest>.digest`; otherwise fetch under the retry envelope,
    * write via tmp + atomic replace, then persist the digest. The whole
    * operation runs under the provider's [[JobControl]] policy.
    * Returns Outcome(Some(true)) = downloaded, Some(false) = cache hit. */
  def fetchStaged(url: String, dest: Path, transport: Transport,
      resolveDigest: () => Option[String],
      policy: JobControl.OnError = JobControl.Fail,
      cfg: Config = Config(),
      sleeper: Double => Unit = s => Thread.sleep((s * 1000).toLong))
      : JobControl.Outcome[Boolean] = {
    val digestPath = dest.resolveSibling(dest.getFileName.toString + ".digest")
    JobControl.run(policy) { () =>
      val remote = resolveDigest()
      val cacheHit = remote.exists { rd =>
        Files.exists(dest) && Files.exists(digestPath) &&
          Files.readString(digestPath).trim == rd
      }
      if (cacheHit) false
      else {
        val r = get(url, transport, cfg, sleeper)
        if (dest.getParent != null) Files.createDirectories(dest.getParent)
        val tmp = dest.resolveSibling(dest.getFileName.toString + ".tmp")
        Files.write(tmp, r.body)
        Files.move(tmp, dest, StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
        remote.foreach(rd => Files.writeString(digestPath, rd))
        true
      }
    }
  }
}
