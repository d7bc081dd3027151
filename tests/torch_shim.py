"""Minimal numpy-backed stand-in for the torch API subset
nn/torch_backend.py uses — a TEST fixture, not a torch replacement.

Purpose: this sandbox cannot install torch (no network, no wheels), so
the real-torch parity test skips. Injecting this module as
``sys.modules['torch']`` lets the suite EXECUTE every line of
TorchBiLSTMForward (weight layout, gate split order, per-line
reversals, concat order, softmax, the LineRecognizer backend-selection
path) and pin its output to the numpy reference. What remains unproven
is only that real torch implements these ~12 ops with standard
semantics — not the backend's own logic.

The surface mirrors torch semantics for exactly the calls the backend
makes: ``Tensor`` is an ndarray subclass (views/arithmetic/@/indexing
for free) adding ``split``/``cpu``/``numpy``.
"""

from __future__ import annotations

from contextlib import contextmanager

import numpy as np

float32 = np.float32


class Tensor(np.ndarray):
    def split(self, size: int, dim: int = 0):
        n = self.shape[dim]
        return tuple(
            np.take(self, np.arange(i, min(i + size, n)),
                    axis=dim).view(Tensor)
            for i in range(0, n, size))

    def cpu(self) -> "Tensor":
        return self

    def numpy(self) -> np.ndarray:
        return np.asarray(self)


def _t(a, dtype=None) -> Tensor:
    return np.asarray(a, dtype=dtype or np.float32).view(Tensor)


def device(name):  # the backend only stores/passes it through
    return name


def as_tensor(a, device=None, dtype=None) -> Tensor:
    return _t(a, dtype)


def ones(shape, device=None, dtype=None) -> Tensor:
    return _t(np.ones(shape, dtype=dtype or np.float32))


def zeros(shape, device=None, dtype=None) -> Tensor:
    return _t(np.zeros(shape, dtype=dtype or np.float32))


def empty(shape, device=None, dtype=None) -> Tensor:
    return _t(np.empty(shape, dtype=dtype or np.float32))


def zeros_like(x) -> Tensor:
    return _t(np.zeros_like(x))


def cat(tensors, dim: int = 0) -> Tensor:
    return _t(np.concatenate([np.asarray(t) for t in tensors], axis=dim))


def flip(x, dims) -> Tensor:
    return _t(np.flip(np.asarray(x), axis=tuple(dims)).copy())


def sigmoid(x) -> Tensor:
    with np.errstate(over="ignore"):  # exp overflow -> inf -> 0, exact
        return _t(1.0 / (1.0 + np.exp(-np.asarray(x, dtype=np.float32))))


def tanh(x) -> Tensor:
    return _t(np.tanh(np.asarray(x)))


def softmax(x, dim: int) -> Tensor:
    a = np.asarray(x, dtype=np.float32)
    e = np.exp(a - a.max(axis=dim, keepdims=True))
    return _t(e / e.sum(axis=dim, keepdims=True))


@contextmanager
def no_grad():
    yield
