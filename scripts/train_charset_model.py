#!/usr/bin/env python
"""Train a FULL-CHARSET line recognizer — the reference's default
charset (ocrolib/chars.py:7-22: ascii + xsymbols + German umlauts/ß +
French + Portuguese accents) including Unicode ligature glyphs rendered
as single glyphs and decoded to their expanded forms
(chars.py:37-59 replacements / functions/text.py REPLACEMENTS).

Data is purely synthetic: deterministic multi-lingual word-bank lines
rendered with the from-scratch TTF rasterizer (sources/linegen.py, two
DejaVu faces) under lo/med degradations. Ground truth is
normalize_text(rendered string) — the reference's own training-text
convention — so the model learns to emit 'fi' for a rendered 'ﬁ'
ligature glyph and straight quotes for typographic ones.

Same synchronous data-parallel Trainer pool as train_uw3_model.py.

Usage: python scripts/train_charset_model.py [--steps 3000] [--workers 6]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from dup_ocropy_ray.functions.edist import levenshtein
from dup_ocropy_ray.functions.text import normalize_text
from dup_ocropy_ray.nn.lstm import (BiLSTMRecognizer, prepare_line,
                                    translate_back)
from dup_ocropy_ray.sources import linegen  # noqa: F401
from dup_ocropy_ray.stages.lineest import normalize_line

from dup_ocropy_ray.sources.charsetgen import (  # noqa: E402
    SERIF, default_charset, gen_lines)


def gen_prepared(n: int, seed: int, fonts, degradations: str = "med"):
    """(prepared input, gt) pairs from the shared charsetgen corpus."""
    return [(prepare_line(normalize_line(img)), gt)
            for img, gt in gen_lines(n, seed, fonts, degradations)]


@ray.remote(num_cpus=4)
class Trainer:
    def __init__(self, prepped, charset, worker_id, ns, seed):
        self.data = sorted(prepped, key=lambda r: r[0].shape[0])
        self.net = BiLSTMRecognizer(ni=48, ns=ns, charset=charset,
                                    seed=seed)
        self.wid = worker_id

    def grads(self, weights, step, bsize, frac=1.0):
        rng = np.random.default_rng((self.wid + 1) * 1_000_003 + step)
        hi = max(bsize, int(len(self.data) * min(1.0, frac)))
        start = int(rng.integers(0, max(1, hi - bsize + 1)))
        batch = self.data[start : start + bsize]
        self.net.set_weights(weights)
        err = self.net.grad_minibatch_batched(batch)
        return self.net.collect_grads(), err, len(batch)

    def eval_cer(self, weights, prepped_eval):
        # production decode: region-argmax CTC + normalize_text, the
        # exact LineRecognizer path (see train_uw3_model.eval_cer)
        self.net.set_weights(weights)
        dist = 0
        total = 0
        for x, txt in prepped_eval:
            y = self.net.forward(x)
            pred = normalize_text(self.net.codec.decode(translate_back(y)))
            dist += levenshtein(pred, txt)
            total += len(txt)
        return dist, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--workers", type=int, default=6)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--ns", type=int, default=100)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--lr-half-life", type=int, default=1000)
    ap.add_argument("--lr-hold", type=int, default=600)
    ap.add_argument("--curriculum", type=int, default=400)
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--train-lines", type=int, default=4000)
    ap.add_argument("--eval-lines", type=int, default=400)
    ap.add_argument("--seed", type=int, default=5)
    ap.add_argument("--init", default=None)
    ap.add_argument("--time-budget", type=float, default=0)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dup_ocropy_ray", "models", "full_charset_model.npz"))
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4 * args.workers + 2,
                 include_dashboard=False)

    charset = default_charset()
    fonts = [linegen.DEJAVU, SERIF]
    print("rendering corpus...", flush=True)
    # disjoint seed ranges; eval lines are never trained on
    tr = gen_prepared(args.train_lines, 1_000_000 + args.seed, fonts, "med")
    te = gen_prepared(args.eval_lines, 9_000_000 + args.seed, fonts, "med")
    cov = set()
    for _, t in tr:
        cov.update(t)
    print(f"train {len(tr)} eval {len(te)} charset {len(charset)} "
          f"covered {len(cov & set(charset))}", flush=True)

    if args.init:
        net = BiLSTMRecognizer.load_npz(args.init, dtype=np.float64)
        assert net.codec.size() == len(charset)
    else:
        net = BiLSTMRecognizer(ni=48, ns=args.ns, charset=charset,
                               seed=args.seed)

    workers = [Trainer.remote(tr, charset, w, args.ns, args.seed + w)
               for w in range(args.workers)]
    ev_shards = [te[i :: args.workers] for i in range(args.workers)]
    ev_refs = [ray.put(s) for s in ev_shards]

    best = (1e9, -1)
    t0 = time.time()
    for step in range(1, args.steps + 1):
        lr = args.lr * (0.5 ** (max(0, step - args.lr_hold)
                                / args.lr_half_life)
                        if args.lr_half_life else 1.0)
        frac = (1.0 if not args.curriculum
                else 0.25 + 0.75 * min(1.0, step / args.curriculum))
        wref = ray.put(net.get_weights())
        outs = ray.get([w.grads.remote(wref, step, args.batch, frac)
                        for w in workers])
        total_n = sum(n for _, _, n in outs)
        avg = {}
        for g, _, n in outs:
            for k, v in g.items():
                avg[k] = avg.get(k, 0) + v * (n / total_n)
        net.set_grads(avg)
        net.apply_adam(lr, step)
        err = float(np.mean([e for _, e, _ in outs]))
        if step % 10 == 0:
            print(f"step {step} err {err:.4f} lr {lr:.2e} "
                  f"{time.time()-t0:.0f}s", flush=True)
        if step % args.eval_every == 0 or step == args.steps:
            wref = ray.put(net.get_weights())
            res = ray.get([w.eval_cer.remote(wref, ev_refs[i])
                           for i, w in enumerate(workers)])
            dist = sum(d for d, _ in res)
            tot = sum(t for _, t in res)
            cer = dist / max(1, tot)
            tag = ""
            if cer < best[0]:
                best = (cer, step)
                net.save_npz(args.out)
                with open(args.out + ".json", "w") as f:
                    json.dump({"cer": cer, "step": step,
                               "train": len(tr), "test": len(te),
                               "charset": len(charset)}, f)
                tag = "  [checkpointed]"
            print(f"step {step} HELD-OUT CER {cer:.4f} "
                  f"(best {best[0]:.4f} @ {best[1]}){tag}", flush=True)
        if args.time_budget and time.time() - t0 > args.time_budget:
            print(f"time budget hit at step {step}", flush=True)
            break
    print(f"done: best held-out CER {best[0]:.4f} @ step {best[1]}",
          flush=True)
    ray.shutdown()


if __name__ == "__main__":
    main()
