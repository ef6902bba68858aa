"""Aux subsystems: telemetry, checkpoint/resume, validation."""
import numpy as np
import pytest

from trips_tpu.utils.checkpoint import CheckpointCallback, load_state, save_state
from trips_tpu.utils.telemetry import SolverTrace, Timer
from trips_tpu.utils.validation import (
    check_noise_level,
    check_noise_type,
    check_Regparam,
    is_identity,
    soft_thresh,
)


def test_timer():
    t = Timer()
    with t.scope("a"):
        pass
    with t.scope("a"):
        pass
    rep = t.report()
    assert rep["a"]["count"] == 2


def test_solver_trace_as_callback():
    from trips_tpu.operators import Blur1D, FirstDerivative1D
    from trips_tpu.solvers import GKS

    n = 40
    np.random.seed(0)
    op = Blur1D(n, 3.0)
    A = np.asarray(op.mat)
    x_true = np.sin(np.linspace(0, 3, n))
    b = A @ x_true + 0.01 * np.random.randn(n)
    trace = SolverTrace(name="gks")
    GKS(op, b, FirstDerivative1D(n), projection_dim=3, n_iter=5,
        regparam="gcv", callback=trace)
    assert len(trace.records) == 5
    assert "lam" in trace.records[0]
    assert trace.summary()["iterations"] == 5


def test_checkpoint_roundtrip(tmp_path):
    path = str(tmp_path / "state.npz")
    state = {"x": np.arange(5.0), "lam": 0.3,
             "hist": [np.ones(3), np.zeros(2)]}
    save_state(path, state)
    got = load_state(path)
    np.testing.assert_allclose(got["x"], state["x"])
    assert float(got["lam"]) == 0.3
    np.testing.assert_allclose(got["hist"][0], np.ones(3))
    np.testing.assert_allclose(got["hist"][1], np.zeros(2))


def test_checkpoint_callback(tmp_path):
    path = str(tmp_path / "ck.npz")
    cb = CheckpointCallback(path, every=2)
    cb(0, x=np.ones(4), lam=0.1)
    got = load_state(path)
    np.testing.assert_allclose(got["x"], np.ones(4))


def test_validation():
    assert is_identity(np.eye(4))
    assert not is_identity(np.ones((4, 4)))
    np.testing.assert_allclose(soft_thresh(np.array([-2.0, 0.5, 3.0]), 1.0),
                               [-1.0, 0.0, 2.0])
    check_noise_type("Gaussian")
    with pytest.raises(TypeError):
        check_noise_type("weird")
    check_noise_level(1)
    with pytest.raises(TypeError):
        check_noise_level(-1)
    check_Regparam("gcv")
    check_Regparam(0.5)
    with pytest.raises(TypeError):
        check_Regparam(-2)


def test_dynamic_loader_gated_download():
    from trips_tpu.problems import generate_emoji

    with pytest.raises((FileNotFoundError, Exception)) as e:
        generate_emoji(dataset=30)
    assert "missing" in str(e.value) or "download" in str(e.value).lower()
