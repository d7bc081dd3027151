"""Line recognition stage — the stateful actor-pool stage.

The reference loads the pickled LSTM once in the parent and forks workers
(reference ocropus-rpred:119-139); the Ray-native equivalent is an actor
pool: ``ds.map_batches(LineRecognizer, concurrency=N, batch_size=B)`` with
the model loaded once in ``__init__`` and batched numpy inference in
``__call__``.

Per line (reference ocropus-rpred:144-266): check_line guards → center
normalization (R2/R3) → prepare_line (R4) → bidi-LSTM forward (R5-R7) →
CTC decode (R8/R9) → text normalization (R11). Lines in a batch are
length-bucketed and run through ONE batched forward per bucket — the
engine's hot path is matmuls, not Python.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions import png
from ..functions.text import normalize_text
from ..nn.lstm import BiLSTMRecognizer, ctc_best_path, prepare_line
from .lineest import check_line, normalize_line

DEFAULT_MODEL = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                             "models", "fixture_model.npz")

LOW_CONFIDENCE = 0.6


class LineRecognizer:
    """Actor-pool UDF: line_png -> (text, confidence, rec_status)."""

    def __init__(self, model_path: str | None = None, pad: int = 16,
                 nocheck: bool = False, bucket_width: int = 32,
                 keep_png: bool = False):
        self.net = BiLSTMRecognizer.load_npz(model_path or DEFAULT_MODEL)
        self.pad = pad
        self.nocheck = nocheck
        self.bucket_width = bucket_width
        self.keep_png = keep_png  # retain line_png (gtedit correction sink)

    def _prepare(self, data: bytes):
        """PNG -> (T,48) input or (None, reason)."""
        gray = png.decode_gray(data)
        if gray.size == 0 or gray.max() == gray.min():
            return None, "image is blank"
        if not self.nocheck:
            reason = check_line(np.amax(gray) - gray)
            if reason:
                return None, reason
        # trim to the ink columns: extracted crops carry a few px of
        # horizontal margin (extract_masked pad), while the model's
        # training lines start at their first ink column — canonicalize so
        # line-start timing matches the training distribution
        ink_cols = np.nonzero((gray < 0.5 * (gray.max() + gray.min())).any(axis=0))[0]
        if len(ink_cols):
            gray = gray[:, ink_cols[0] : ink_cols[-1] + 1]
        norm = normalize_line(gray)
        return prepare_line(norm, self.pad), ""

    def __call__(self, batch: pa.Table) -> pa.Table:
        pngs = batch.column("line_png").to_pylist()
        n = len(pngs)
        texts: list[str] = [""] * n
        confs = np.zeros(n)
        statuses = ["ok"] * n
        prepared: list[tuple[int, np.ndarray]] = []
        for i, data in enumerate(pngs):
            if data is None:  # page-marker row: passes through untouched
                statuses[i] = "marker"
                continue
            try:
                xs, reason = self._prepare(data)
            except Exception as e:
                xs, reason = None, f"error: {type(e).__name__}: {e}"
            if xs is None:
                statuses[i] = reason
            else:
                prepared.append((i, xs))
        # length-bucketed batched inference
        prepared.sort(key=lambda p: p[1].shape[0])
        k = 0
        while k < len(prepared):
            j = k + 1
            T0 = prepared[k][1].shape[0]
            while (
                j < len(prepared)
                and prepared[j][1].shape[0] - T0 <= self.bucket_width
                and j - k < 64
            ):
                j += 1
            group = prepared[k:j]
            Tmax = group[-1][1].shape[0]
            B = len(group)
            xs = np.zeros((B, Tmax, self.net.ni), dtype=np.float32)
            lengths = np.zeros(B, dtype=np.int64)
            for b, (_, x) in enumerate(group):
                lengths[b] = x.shape[0]
                xs[b, : x.shape[0]] = x
            ys = self.net.forward_batch(xs, lengths)
            for b, (i, _) in enumerate(group):
                y = ys[b, : int(lengths[b])]
                codes = ctc_best_path(y)
                raw = self.net.codec.decode(codes)
                texts[i] = normalize_text(raw)
                if codes:
                    # mean posterior of the emitted (non-blank) frames
                    emit = y.max(axis=1)[y.argmax(axis=1) != 0]
                    confs[i] = float(emit.mean()) if emit.size else 0.0
                else:
                    confs[i] = float(y[:, 0].mean())
            k = j
        out = batch if self.keep_png else batch.drop_columns(["line_png"])
        out = out.append_column("text", pa.array(texts, pa.string()))
        out = out.append_column("confidence", pa.array(confs, pa.float64()))
        out = out.append_column("rec_status", pa.array(statuses, pa.string()))
        return out
