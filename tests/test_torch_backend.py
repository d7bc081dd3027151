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
