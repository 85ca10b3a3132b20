"""Forced-failure tests for the transient-device-error retry harness.

VERDICT r3 item 1: the round-3 driver bench recorded value=0 for a
transient ``JaxRuntimeError: FAILED_PRECONDITION: TPU backend error`` that
the worker healed from in ~30 s.  These tests prove the wrapper absorbs
exactly that failure shape — and nothing else.
"""

import pytest

from riptrm_tpu.utils.retry import is_transient_device_error, retry_transient


class FakeJaxRuntimeError(RuntimeError):
    """Stands in for jax.errors.JaxRuntimeError (repr carries the status)."""


def _transient_exc():
    return FakeJaxRuntimeError(
        "FAILED_PRECONDITION: TPU backend error: worker process crashed "
        "or restarted"
    )


def test_recovers_after_transient_failures():
    sleeps = []
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise _transient_exc()
        return 42

    out = retry_transient(flaky, tries=3, sleep_s=35.0, sleep=sleeps.append)
    assert out == 42
    assert calls["n"] == 3
    assert sleeps == [35.0, 35.0]  # slept the recovery window between tries


def test_non_transient_raises_immediately():
    calls = {"n": 0}

    def buggy():
        calls["n"] += 1
        raise TypeError("shape mismatch — a programming error, not a flake")

    with pytest.raises(TypeError):
        retry_transient(buggy, tries=3, sleep=lambda s: None)
    assert calls["n"] == 1  # no retry burned on a real bug


def test_exhausted_tries_reraises_last_transient():
    calls = {"n": 0}

    def always_down():
        calls["n"] += 1
        raise _transient_exc()

    with pytest.raises(FakeJaxRuntimeError):
        retry_transient(always_down, tries=3, sleep=lambda s: None)
    assert calls["n"] == 3


def test_on_retry_hook_sees_each_failure():
    seen = []

    def flaky():
        if len(seen) < 1:
            raise _transient_exc()
        return "ok"

    out = retry_transient(
        flaky,
        tries=2,
        sleep=lambda s: None,
        on_retry=lambda attempt, exc: seen.append((attempt, type(exc).__name__)),
    )
    assert out == "ok"
    assert seen == [(0, "FakeJaxRuntimeError")]


@pytest.mark.parametrize(
    "msg,transient",
    [
        ("FAILED_PRECONDITION: TPU backend error", True),
        ("UNAVAILABLE: socket closed", True),
        ("DEADLINE_EXCEEDED: operation timed out", True),
        ("INTERNAL: TPU worker process crashed or restarted", True),
        ("Connection reset by peer", True),
        ("dot_general shape mismatch", False),
        ("Mosaic lowering failed: unsupported op", False),
        ("invalid literal for int()", False),
    ],
)
def test_transient_marker_classification(msg, transient):
    assert is_transient_device_error(RuntimeError(msg)) is transient
