package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.StagedFetch
import graft.sources.StagedFetch.{Config, HttpError, Response}
import graft.streaming.JobControl

/** Staged-fetch retry envelope (VERDICT r2 item 9; reference
  * `utils/http_wrapper.py:187-316`) with a scripted fake transport:
  * 429/503 Retry-After waits, backoff+jitter, digest-checked cache. */
class FetchSpec extends AnyFunSuite {

  /** Transport yielding scripted responses; records calls. */
  private class Script(responses: Response*) extends (String => Response) {
    var calls = 0
    def apply(url: String): Response = {
      calls += 1
      responses(math.min(calls - 1, responses.length - 1))
    }
  }

  private def collectSleeps(): (Double => Unit, () => List[Double]) = {
    val b = scala.collection.mutable.ListBuffer.empty[Double]
    ((s: Double) => { b += s; () }, () => b.toList)
  }

  test("429 honors Retry-After seconds, skips backoff, then succeeds") {
    val t = new Script(
      Response(429, Map("Retry-After" -> "7")),
      Response(200, body = "ok".getBytes))
    val (sleeper, sleeps) = collectSleeps()
    val r = StagedFetch.get("u", t, Config(), sleeper, jitter = () => 0.0)
    assert(r.status == 200 && new String(r.body) == "ok")
    assert(t.calls == 2)
    assert(sleeps() == List(7.0)) // only the Retry-After wait, no backoff
  }

  test("503 is rate-limited ONLY with Retry-After; header is case-insensitive") {
    assert(StagedFetch.isRateLimited(Response(503, Map("retry-after" -> "5"))))
    assert(!StagedFetch.isRateLimited(Response(503)))
    assert(StagedFetch.isRateLimited(Response(429)))
  }

  test("503 without Retry-After takes the exponential backoff path") {
    val t = new Script(Response(503), Response(503), Response(200))
    val (sleeper, sleeps) = collectSleeps()
    val r = StagedFetch.get("u", t, Config(backoffSeconds = 3), sleeper,
      jitter = () => 0.0)
    assert(r.status == 200)
    assert(sleeps() == List(3.0, 6.0)) // 3·2^0, 3·2^1
  }

  test("Retry-After HTTP-date and the anti-DoS cap") {
    val now = 1700000000.0
    val date = java.time.ZonedDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(now.toLong + 60),
      java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
    assert(StagedFetch.parseRetryAfter(Some(date), now) == Some(60.0))
    // past date / zero / negative / garbage → None (default applies)
    assert(StagedFetch.parseRetryAfter(Some("0"), now).isEmpty)
    assert(StagedFetch.parseRetryAfter(Some("-5"), now).isEmpty)
    assert(StagedFetch.parseRetryAfter(Some("soon"), now).isEmpty)
    // hostile Retry-After capped at maxRateLimitWait
    val t = new Script(
      Response(429, Map("Retry-After" -> "100000")), Response(200))
    val (sleeper, sleeps) = collectSleeps()
    StagedFetch.get("u", t, Config(), sleeper, jitter = () => 0.0)
    assert(sleeps() == List(300.0))
  }

  test("backoff is capped at maxInterval and carries the jitter") {
    assert(StagedFetch.backoffSleepInterval(3, 10, 600, 0.5) == 600.5)
    assert(StagedFetch.backoffSleepInterval(3, 2, 600, 0.25) == 12.25)
  }

  test("exhausted retries re-raise the last failure after retries+1 calls") {
    val t = new Script(Response(500))
    val (sleeper, _) = collectSleeps()
    val err = intercept[HttpError] {
      StagedFetch.get("u", t, Config(retries = 3), sleeper, jitter = () => 0.0)
    }
    assert(err.status == 500 && t.calls == 4)
  }

  test("rate-limited final attempt fails instead of waiting") {
    val t = new Script(Response(429, Map("Retry-After" -> "9")))
    val (sleeper, sleeps) = collectSleeps()
    intercept[HttpError] {
      StagedFetch.get("u", t, Config(retries = 1), sleeper, jitter = () => 0.0)
    }
    assert(t.calls == 2)
    assert(sleeps() == List(9.0)) // waited once; the final 429 fails fast
  }

  test("digest-checked cache: miss downloads + stamps, hit skips transport") {
    val dir = Files.createTempDirectory("graft-fetch")
    val dest = dir.resolve("artifact.db")
    val t = new Script(Response(200, body = "payload".getBytes))
    val (sleeper, _) = collectSleeps()

    val first = StagedFetch.fetchStaged("u", dest, t,
      () => Some("sha256:abc"), sleeper = sleeper)
    assert(first.result.contains(true) && t.calls == 1)
    assert(Files.readString(dest) == "payload")
    assert(Files.readString(dir.resolve("artifact.db.digest")) == "sha256:abc")

    val second = StagedFetch.fetchStaged("u", dest, t,
      () => Some("sha256:abc"), sleeper = sleeper)
    assert(second.result.contains(false) && t.calls == 1) // no new call

    // digest drift → re-download
    val third = StagedFetch.fetchStaged("u", dest, t,
      () => Some("sha256:def"), sleeper = sleeper)
    assert(third.result.contains(true) && t.calls == 2)

    // unresolvable remote digest → always re-download (no false cache hit)
    val fourth = StagedFetch.fetchStaged("u", dest, t,
      () => None, sleeper = sleeper)
    assert(fourth.result.contains(true) && t.calls == 3)
  }

  test("fetchStaged composes with JobControl SKIP policy (I7)") {
    val dir = Files.createTempDirectory("graft-fetch-skip")
    val t = new Script(Response(500))
    val (sleeper, _) = collectSleeps()
    val out = StagedFetch.fetchStaged("u", dir.resolve("x"), t,
      () => None, policy = JobControl.Skip,
      cfg = Config(retries = 0), sleeper = sleeper)
    assert(out.result.isEmpty && out.error.exists(_.isInstanceOf[HttpError]))
  }
}
