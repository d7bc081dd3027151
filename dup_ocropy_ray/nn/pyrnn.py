"""Importer for the reference's legacy ``.pyrnn.gz`` recognizer models
(python-2 pickles of ocrolib.lstm.SeqRecognizer, saved by
ocropus-rtrain and loaded at ocrolib/common.py:430-450 /
ocropus-rpred:119-131), so a reference user's existing trained models
load straight into this engine.

The pickle is read with a RESTRICTED unpickler: numpy array
reconstruction resolves to real numpy; every other global (ocrolib.*
classes, function references like normalize_nfkc) resolves to inert
shim types that only carry their attribute dict — no arbitrary code
from the model file ever executes. Weight layout maps 1:1 (reference
ocrolib/lstm.py:403-427 source=[1, x, h_prev], WGI/WGF/WCI/WGO gate
rows, WIP/WFP/WOP peepholes; :282-288 Softmax W2 over [1, h]):

    WGI->Wi  WGF->Wf  WCI->Wc  WGO->Wo  WIP->pi  WFP->pf  WOP->po  W2->W

The only semantic delta: the reference skips the output peephole at
t=0 (lstm.py:422 ``if t>0``); we apply it every frame — the first frame
is always pad pixels, so decoded text is unaffected.

py2 pickles need ``encoding='latin1'`` for numpy arrays and byte
strings; unicode transcripts come through unchanged.
"""

from __future__ import annotations

import gzip
import io
import pickle

import numpy as np

from .lstm import BiLSTMRecognizer

_NUMPY_ALLOWED = {
    ("numpy.core.multiarray", "_reconstruct"),
    ("numpy.core.multiarray", "scalar"),
    ("numpy._core.multiarray", "_reconstruct"),
    ("numpy._core.multiarray", "scalar"),
    ("numpy", "ndarray"),
    ("numpy", "dtype"),
    ("numpy.core.numeric", "_frombuffer"),
    ("numpy._core.numeric", "_frombuffer"),
}


def _reconstructor(cls, base, state):
    """copy_reg._reconstructor stand-in for shimmed legacy classes: make
    the instance without running any legacy __init__."""
    obj = object.__new__(cls)
    if state not in (None, ()):
        obj.__dict__["_basestate"] = state
    return obj


_MAPPED = {
    ("copy_reg", "_reconstructor"): _reconstructor,  # py2 pickles
    ("copyreg", "_reconstructor"): _reconstructor,
    ("__builtin__", "object"): object,
    ("builtins", "object"): object,
    # string payload decoding helper emitted by py3 picklers (the test
    # fixture writer); benign
    ("_codecs", "encode"): __import__("codecs").encode,
}


class _Shim:
    """Inert stand-in for a legacy class: holds the pickled attribute
    dict, executes nothing."""

    _qualname = "?"

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["_state"] = state

    def __call__(self, *a, **k):  # function refs (e.g. normalize_nfkc)
        raise RuntimeError(f"legacy callable {self._qualname} is inert")

    def __repr__(self):
        return f"<legacy {self._qualname}>"


class _RestrictedUnpickler(pickle.Unpickler):
    def __init__(self, fh):
        super().__init__(fh, encoding="latin1")
        self._shims: dict[tuple, type] = {}

    def find_class(self, module, name):
        if (module, name) in _NUMPY_ALLOWED:
            return super().find_class(module, name)
        if (module, name) in _MAPPED:
            return _MAPPED[(module, name)]
        key = (module, name)
        if key not in self._shims:
            cls = type(name, (_Shim,), {"_qualname": f"{module}.{name}"})
            self._shims[key] = cls
        return self._shims[key]


def _walk_nets(obj):
    """Flatten the Stacked/Parallel/Reversed combinator tree into the
    (forward LSTM, backward LSTM, Softmax) triple of BIDILSTM
    (reference lstm.py:700-709)."""
    d = obj.__dict__
    cls = type(obj).__name__
    if cls == "Stacked":
        out = []
        for sub in d["nets"]:
            out.extend(_walk_nets(sub))
        return out
    if cls == "Parallel":
        out = []
        for sub in d["nets"]:
            out.extend(_walk_nets(sub))
        return out
    if cls == "Reversed":
        return [("reversed", d["net"])]
    if cls == "LSTM":
        return [("lstm", obj)]
    if cls == "Softmax":
        return [("softmax", obj)]
    return []


def load_pyrnn(path_or_bytes) -> BiLSTMRecognizer:
    """.pyrnn(.gz) file -> BiLSTMRecognizer ready for the recognizer
    actor pool."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        raw = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    rec = _RestrictedUnpickler(io.BytesIO(raw)).load()

    d = rec.__dict__
    lstm_obj = d.get("lstm")
    if lstm_obj is None:
        raise ValueError("not a SeqRecognizer pickle (no .lstm attribute)")
    parts = _walk_nets(lstm_obj)
    fwd = next(o for k, o in parts if k == "lstm")
    # _walk_nets already unwrapped Reversed(net) to its inner LSTM
    bwd = next(o for k, o in parts if k == "reversed")
    softmax = next(o for k, o in parts if k == "softmax")

    def arr(o, name):
        a = np.asarray(o.__dict__[name], dtype=np.float64)
        return a

    ni_ns = arr(fwd, "WGI").shape  # (ns, 1+ni+ns)
    ns = ni_ns[0]
    ni = ni_ns[1] - 1 - ns

    # charset from the codec's code2char map, ordered by code
    codec = d.get("codec")
    if codec is not None:
        c2c = codec.__dict__["code2char"]
        charset = [str(c2c[i]) for i in range(len(c2c))]
    else:
        charset = [""] + ["~"] * (arr(softmax, "W2").shape[0] - 1)

    net = BiLSTMRecognizer(ni=ni, ns=ns, charset=charset)
    for layer, src in ((net.fwd, fwd), (net.bwd, bwd)):
        layer.Wi = arr(src, "WGI")
        layer.Wf = arr(src, "WGF")
        layer.Wc = arr(src, "WCI")
        layer.Wo = arr(src, "WGO")
        layer.pi = arr(src, "WIP")
        layer.pf = arr(src, "WFP")
        layer.po = arr(src, "WOP")
        layer._zero_moments()
    net.out.W = arr(softmax, "W2")
    net.out.mom = np.zeros_like(net.out.W)
    if net.out.W.shape != (net.codec.size(), 2 * ns + 1):
        raise ValueError(
            f"softmax shape {net.out.W.shape} inconsistent with "
            f"codec {net.codec.size()} / 2*ns+1 {2 * ns + 1}")
    return net
