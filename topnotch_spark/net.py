"""Bounded-retry HTTP with timeouts — the one helper behind every REST
touchpoint of the engine (plan reader GET, report writer PUT).

Policy (shared so reader and writer cannot drift):

- ``timeout_s`` is passed to ``urlopen`` on EVERY attempt. Without it a
  hung endpoint — one that accepts the connection and then never
  responds — blocks the caller forever; for the report PUT that means
  the whole plan run, and no retry ever engages because no exception is
  raised. Socket timeouts are retryable.
- ``retries`` EXTRA attempts with exponential backoff and ±25%
  deterministic jitter seeded from ``jitter_key`` (md5 of key+attempt —
  reproducible, no RNG state, and a fleet of simultaneous plan runs does
  not re-collide in lockstep).
- Client errors (4xx) never retry: the request will not get better.
  5xx, connection errors, and timeouts do.

Reference parity: the reference's TnReader.scala / TnWriter.scala REST
paths are single-shot; the retry/timeout envelope is this engine's
hardening for plan servers behind rolling deploys (VERDICT r11 #6,
ADVICE r11 writers.py:108).
"""

from __future__ import annotations

import hashlib
import time
import urllib.error
import urllib.request


def http_request_with_retry(
    url: str,
    *,
    data: bytes | None = None,
    method: str = "GET",
    headers: dict[str, str] | None = None,
    retries: int = 2,
    backoff_base_s: float = 0.5,
    timeout_s: float = 30.0,
    jitter_key: str = "",
) -> bytes:
    """Issue the request, retrying transient failures; return the body
    bytes of the first 2xx response. Raises the last error once
    ``retries`` extra attempts are exhausted; raises immediately on 4xx.
    """
    last: Exception | None = None
    for attempt in range(max(0, int(retries)) + 1):
        if attempt:
            h = hashlib.md5(
                f"{jitter_key}:{attempt}".encode()
            ).digest()[0]
            jitter = 0.75 + 0.5 * (h / 255.0)
            time.sleep(backoff_base_s * (2 ** (attempt - 1)) * jitter)
        req = urllib.request.Request(
            url, data=data, method=method, headers=headers or {}
        )
        try:
            with urllib.request.urlopen(  # noqa: S310 — user endpoint
                req, timeout=timeout_s
            ) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            if 400 <= e.code < 500:
                raise  # client error: retrying cannot help
            last = e
        except (urllib.error.URLError, OSError, TimeoutError) as e:
            # URLError wraps refused connections and socket timeouts;
            # bare socket.timeout/TimeoutError can surface from reads
            last = e
    assert last is not None
    raise last
