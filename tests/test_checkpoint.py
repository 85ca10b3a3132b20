"""Checkpoint/resume tests (a capability the reference lacks; SURVEY §5)."""

import numpy as np
import pytest

from riptrm_tpu.experiment.checkpoint import job_is_done, load_state, save_state
from riptrm_tpu.problems import nonneg_pca
from riptrm_tpu.solvers.riptrm import RIPTRM, init_state


@pytest.fixture(scope="module")
def pca():
    return nonneg_pca.load_problem("dataset/NonnegPCA/1", "a")


def test_state_roundtrip(tmp_path, pca):
    opt = {"TRS_solver": "tCG", "second_order_stationarity": False}
    st = init_state(pca, RIPTRM(opt).option)
    path = str(tmp_path / "ck.npz")
    save_state(path, st, {"elapsed": 1.5})
    st2, meta = load_state(path, st)
    assert meta["elapsed"] == 1.5
    np.testing.assert_array_equal(np.asarray(st.x), np.asarray(st2.x))
    np.testing.assert_array_equal(np.asarray(st.y), np.asarray(st2.y))
    assert float(st2.mu) == float(st.mu)


def test_riptrm_resume_continues(tmp_path, pca):
    """Interrupt a solve after a few outer iterations; a resumed run must
    continue (not restart) and reach a better residual."""
    path = str(tmp_path / "run.npz")
    base = {
        "maxtime": 120,
        "tolresid": 1e-9,
        "TRS_solver": "tCG",
        "second_order_stationarity": False,
        "checkpoint_path": path,
        "checkpoint_every": 0.0,  # checkpoint on every step
    }
    out1 = RIPTRM(base | {"maxiter": 4}).run(pca)
    res1 = out1.log["residual"][-1]
    iters1 = max(out1.log["iteration"])
    assert iters1 >= 4

    out2 = RIPTRM(base | {"maxiter": 10, "resume": True}).run(pca)
    # resumed log contains the earlier rows plus new ones
    assert max(out2.log["iteration"]) >= 10
    assert out2.log["residual"][-1] < res1
    # prefix of the resumed log equals the first run's log
    n = len(out1.log["residual"]) - 1  # last row of run1 may repeat on resume
    np.testing.assert_allclose(
        out2.log["residual"][:n], out1.log["residual"][:n], rtol=1e-12
    )


def test_job_done_marker(tmp_path):
    assert not job_is_done(str(tmp_path), "X")
    (tmp_path / "X_log.csv").write_text("iteration\n0\n")
    assert job_is_done(str(tmp_path), "X")


def test_load_legacy_positional_checkpoint(tmp_path):
    """Checkpoints written by the pre-name-keying format (leaf_<i> keys,
    meta in the sidecar only) still load."""
    import json

    import jax

    from riptrm_tpu.experiment.checkpoint import load_state

    tmpl = {"a": np.zeros(3), "b": np.zeros((2, 2))}
    leaves = jax.tree.leaves({"a": np.arange(3.0), "b": np.eye(2)})
    path = str(tmp_path / "old.npz")
    np.savez(path, **{f"leaf_{i}": l for i, l in enumerate(leaves)})
    with open(path + ".meta.json", "w") as f:
        json.dump({"k": 7}, f)
    state, meta = load_state(path, tmpl)
    np.testing.assert_array_equal(state["a"], np.arange(3.0))
    np.testing.assert_array_equal(state["b"], np.eye(2))
    assert meta == {"k": 7}


def test_load_state_rejects_layout_mismatch(tmp_path):
    import pytest

    from riptrm_tpu.experiment.checkpoint import load_state, save_state

    path = str(tmp_path / "s.npz")
    save_state(path, {"a": np.zeros(3)}, {"k": 1})
    with pytest.raises(ValueError, match="lacks field"):
        load_state(path, {"other": np.zeros(3)})


def test_meta_embedded_in_archive(tmp_path):
    """State + meta are one atomic file: meta round-trips even if the
    sidecar .meta.json is deleted (or was torn by a kill)."""
    import os

    from riptrm_tpu.experiment.checkpoint import load_state, save_state

    path = str(tmp_path / "s.npz")
    save_state(path, {"a": np.arange(4.0)}, {"steps_done": 40})
    os.remove(path + ".meta.json")
    state, meta = load_state(path, {"a": np.zeros(4)})
    assert meta == {"steps_done": 40}


def test_legacy_positional_requires_matching_shapes(tmp_path):
    """A legacy leaf_<i> checkpoint whose leaf COUNT matches but whose
    shapes do not must be rejected, not silently misassigned."""
    import json

    path = str(tmp_path / "legacy.npz")
    np.savez(
        path,
        leaf_0=np.zeros((3, 3)),
        leaf_1=np.zeros(5),
        __meta__=np.asarray(json.dumps({})),
    )
    template = {"a": np.zeros((3, 3)), "b": np.zeros(5)}
    state, _ = load_state(path, template)  # matching shapes: accepted
    assert state["a"].shape == (3, 3)
    bad_template = {"a": np.zeros((4, 4)), "b": np.zeros(5)}
    with pytest.raises(ValueError, match="different solver-state layout"):
        load_state(path, bad_template)
