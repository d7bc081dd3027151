"""Parity test for the optional torch inference backend (skip-guarded:
this sandbox ships no torch/GPU — on a torch-equipped host the test
pins the numpy/torch forward to float32 round-off)."""

import numpy as np
import pytest


def test_torch_forward_batch_parity():
    torch = pytest.importorskip("torch")  # noqa: F841
    from dup_ocropy_ray.nn.lstm import BiLSTMRecognizer

    net = BiLSTMRecognizer(ni=48, ns=32, seed=3)
    rng = np.random.default_rng(0)
    B, T = 4, 40
    lengths = np.array([40, 31, 17, 8])
    xs = np.zeros((B, T, 48), dtype=np.float32)
    for b, L in enumerate(lengths):
        xs[b, :L] = rng.random((L, 48), dtype=np.float32)
    ref = net.forward_batch(xs, lengths)
    net.use_torch(device="cpu")
    got = net.forward_batch(xs, lengths)
    assert got.shape == ref.shape
    assert float(np.abs(got - ref).max()) < 1e-4


def test_torch_backend_absent_fails_loudly():
    """backend='torch' without torch must raise, not fall back."""
    try:
        import torch  # noqa: F401

        pytest.skip("torch present — loud-failure path not reachable")
    except ImportError:
        pass
    from dup_ocropy_ray.stages.recognize import LineRecognizer

    with pytest.raises(ImportError):
        LineRecognizer(backend="torch")


def test_unknown_backend_rejected():
    from dup_ocropy_ray.stages.recognize import LineRecognizer

    with pytest.raises(ValueError):
        LineRecognizer(backend="mlx")


# --------------------------------------------------------------- shim
# torch cannot be installed in this sandbox (no network, no wheels), so
# the real-torch test above skips. These tests inject tests/torch_shim
# (a numpy stand-in for the ~12 torch calls the backend makes) as
# sys.modules['torch'], which EXECUTES every line of TorchBiLSTMForward
# and the backend-selection path and pins parity with the numpy
# forward. Only real torch's op semantics stay unproven.


@pytest.fixture()
def shim_torch(monkeypatch):
    import sys

    if "torch" in sys.modules and not hasattr(
            sys.modules["torch"], "__file__"):
        del sys.modules["torch"]
    try:
        import torch  # noqa: F401

        pytest.skip("real torch present — shim would shadow it")
    except ImportError:
        pass
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "torch_shim", os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "torch_shim.py"))
    torch_shim = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(torch_shim)
    monkeypatch.setitem(sys.modules, "torch", torch_shim)
    return torch_shim


def test_shim_forward_batch_parity(shim_torch):
    """Identical to the real-torch parity test, run through the shim:
    gate split order, per-line reversal, [fwd, bwd] concat, softmax —
    all of torch_backend's own logic — must reproduce the numpy
    forward to float32 round-off."""
    from dup_ocropy_ray.nn.lstm import BiLSTMRecognizer

    net = BiLSTMRecognizer(ni=48, ns=32, seed=3)
    rng = np.random.default_rng(0)
    B, T = 4, 40
    lengths = np.array([40, 31, 17, 8])
    xs = np.zeros((B, T, 48), dtype=np.float32)
    for b, L in enumerate(lengths):
        xs[b, :L] = rng.random((L, 48), dtype=np.float32)
    ref = net.forward_batch(xs, lengths)
    net.use_torch(device="cpu")
    got = net.forward_batch(xs, lengths)
    assert got.shape == ref.shape
    assert float(np.abs(got - ref).max()) < 1e-4


def test_shim_line_recognizer_backend_selection(shim_torch):
    """LineRecognizer(backend='torch') through the shim: the actor
    __init__ selection path runs, and transcriptions equal the numpy
    backend's on the committed uw3 model."""
    import os

    import pyarrow as pa

    from dup_ocropy_ray.functions import png as _png
    from dup_ocropy_ray.sources.uw3 import load_uw3_cached, split_uw3
    from dup_ocropy_ray.stages.recognize import LineRecognizer

    model = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "dup_ocropy_ray", "models",
        "uw3_model.npz")
    if not (os.path.exists(model)
            and os.path.exists("/root/reference/tests/uw3-500.tgz")):
        pytest.skip("uw3 model/tarball absent")
    _, test = split_uw3(load_uw3_cached())
    batch = pa.table({
        "line_id": pa.array([r["line_id"] for r in test[:6]]),
        "line_png": pa.array(
            [_png.encode_gray(r["image"]) for r in test[:6]],
            pa.binary()),
    })
    a = LineRecognizer(model_path=model)(batch)
    b = LineRecognizer(model_path=model, backend="torch",
                       device="cpu")(batch)
    assert a.column("text").to_pylist() == b.column("text").to_pylist()
    assert b.column("rec_status").to_pylist() == ["ok"] * 6
