package graft.sources

import scala.util.control.NonFatal

/** Connector-internal resilience (SURVEY.md §2.10 pacing/retry;
  * reference processor.py:46-94, authenticator.py:7-35): bounded retry
  * with exponential backoff around transient reader failures, and a
  * cached bearer token that refreshes inside an expiry margin.
  *
  * Mapping to Spark: the reference's per-granule retry loop lives INSIDE
  * its downloader; here the analog wraps the partition reader's open
  * path, and a failure that survives the bounded retries rethrows so the
  * task falls back to Spark's own `spark.task.maxFailures` /
  * speculative-execution machinery — connector retries absorb transient
  * blips cheaply, task retries handle real faults with a fresh JVM
  * context. The reference instead returns None (skips the granule);
  * silently dropping partitions is wrong for an engine, so the bounded
  * failure is surfaced.
  */
object Resilience {

  /** processor.py:46-94 analog: run `op`, retrying up to
    * `maxRetries - 1` times with backoff `baseMs << attempt`
    * (the 2^attempt schedule at processor.py:88). `op` receives the
    * 0-based attempt number; `sleep` is injectable for tests. */
  def withRetry[T](maxRetries: Int, baseMs: Long,
      sleep: Long => Unit = ms => Thread.sleep(ms))(op: Int => T): T = {
    var attempt = 0
    while (true) {
      try return op(attempt)
      catch {
        case NonFatal(e) if attempt < maxRetries - 1 =>
          sleep(baseMs << attempt)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** authenticator.py:7-35 analog: `bearer` returns a cached token,
    * re-minting when now >= expiry - margin (`should_refresh`). Token
    * minting is injected — the policy (cache + margin-driven refresh),
    * not the identity provider, is the logic under test. Thread-safe:
    * one mint wins per expiry window. */
  final class TokenCache(mint: () => String, expiryMs: Long, marginMs: Long,
      now: () => Long = () => System.currentTimeMillis()) {
    private var token: String = _
    private var expiresAt: Long = Long.MinValue
    private var mints: Int = 0

    // token == null guards the first call (expiresAt - marginMs would
    // underflow before any mint)
    def shouldRefresh: Boolean =
      synchronized(token == null || now() >= expiresAt - marginMs)

    def bearer: String = synchronized {
      if (token == null || now() >= expiresAt - marginMs) {
        token = mint()
        expiresAt = now() + expiryMs
        mints += 1
      }
      s"Bearer $token"
    }

    /** Number of mint calls so far (refresh-policy observability). */
    def mintCount: Int = synchronized(mints)
  }
}
