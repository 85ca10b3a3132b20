"""Retry harness for transient TPU-worker failures.

The axon TPU worker is known to crash and self-recover in ~30 s
(CLAUDE.md: "TPU worker process crashed or restarted"; a single XLA call
running >~2 min kills it).  Round 3's driver-captured benchmark recorded
``value: 0, error: JaxRuntimeError: FAILED_PRECONDITION: TPU backend
error`` for exactly such a flake — the harness gave up on the first
exception even though a rerun minutes later passed cleanly.  Every
device-touching measurement section must therefore absorb the worker's
self-recovery window before recording an error.

No reference counterpart: the reference runs on the host CPU and never
faces a remote-accelerator availability window (its failure handling is
``do_exit_on_error``, ``/root/reference/src/solver/utils.py``); this
module is tunnel-environment infrastructure.
"""

from __future__ import annotations

import sys
import time
from typing import Callable

# Substrings that identify a transient device/runtime failure worth
# waiting out.  Matched case-insensitively against ``repr(exc)`` so both
# the exception type name (JaxRuntimeError, XlaRuntimeError) and the
# status message are visible to the check.
TRANSIENT_MARKERS = (
    "failed_precondition",
    "unavailable",
    "deadline_exceeded",
    "tpu backend",
    "worker process crashed",
    "worker process restarted",
    "socket closed",
    "connection reset",
    # NOTE: bare "internal: " is NOT a marker — Mosaic/XLA *compile*
    # errors also surface as INTERNAL and must fail fast (ADVICE r4).
    # Worker-death INTERNAL statuses carry one of the phrases below.
    "internal: failed to get global tpu topology",
    "internal: no such device",
    "internal: stream executor",
)


def is_transient_device_error(exc: BaseException) -> bool:
    """True when ``exc`` looks like a self-healing device/tunnel failure.

    Deliberately narrow: programming errors (TypeError, ShapeError,
    Mosaic compile failures) must NOT be retried — they would burn
    3x the wall clock to report the same bug.
    """
    text = repr(exc).lower()
    return any(marker in text for marker in TRANSIENT_MARKERS)


def retry_transient(
    fn: Callable,
    *,
    tries: int = 3,
    sleep_s: float = 35.0,
    label: str = "",
    is_transient: Callable[[BaseException], bool] = is_transient_device_error,
    sleep: Callable[[float], None] = time.sleep,
    on_retry: Callable[[int, BaseException], None] | None = None,
):
    """Run ``fn()``; on a transient device error, sleep and retry.

    ``tries`` is the TOTAL attempt count (so ``tries=3`` = up to 2
    retries).  ``sleep_s`` defaults to the measured worker self-recovery
    window (~30 s) plus margin.  Non-transient exceptions propagate
    immediately; the last transient exception propagates after the final
    attempt so callers keep their existing error-recording paths.

    ``sleep`` and ``is_transient`` are injectable for tests.
    """
    last: BaseException | None = None
    for attempt in range(tries):
        try:
            return fn()
        except BaseException as exc:  # noqa: BLE001 — filtered below
            if not is_transient(exc):
                raise
            last = exc
            if attempt == tries - 1:
                break
            if on_retry is not None:
                on_retry(attempt, exc)
            else:
                # stderr, NOT stdout: CLI callers emit one JSON line on
                # stdout that harnesses capture with `tail -1` — a retry
                # notice there displaces the measurement (seen live on
                # the round-4 d=32 RIPM job).
                print(
                    f"[retry_transient] {label or getattr(fn, '__name__', 'fn')}: "
                    f"transient device error (attempt {attempt + 1}/{tries}), "
                    f"sleeping {sleep_s:.0f}s: {exc!r}"[:400],
                    file=sys.stderr,
                    flush=True,
                )
            sleep(sleep_s)
    assert last is not None
    raise last
