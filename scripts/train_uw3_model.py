#!/usr/bin/env python
"""Train a line recognizer on the reference's REAL uw3-500 scan corpus
(reference run-rtrain:5-6 / run-test-ci test_rtrain) with synchronous
data-parallel gradient averaging over a Ray actor pool.

Each Trainer actor holds the preprocessed train shard (normalize_line ->
prepare_line done ONCE in __init__, the stateful-stage pattern); per step
every worker draws a length-bucketed minibatch, runs one batched CTC
gradient pass (nn/lstm.py grad_minibatch_batched), and ships its gradient
dict back; the driver averages, takes one Adam step, and re-broadcasts
weights via ray.put. Held-out CER (deterministic hash split, never
trained on) drives checkpoint selection to
dup_ocropy_ray/models/uw3_model.npz.

Usage: python scripts/train_uw3_model.py [--steps 4000] [--workers 8]
"""

import argparse
import json
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from dup_ocropy_ray.functions.edist import levenshtein
from dup_ocropy_ray.functions.text import normalize_text
from dup_ocropy_ray.nn.lstm import (BiLSTMRecognizer, prepare_line,
                                    translate_back)
from dup_ocropy_ray.sources.uw3 import load_uw3_cached, split_uw3, uw3_charset
from dup_ocropy_ray.stages.lineest import check_line, normalize_line

def load_corpus():
    # default per-uid cache path — a fixed shared /tmp path would load
    # (unpickle) a file another user could have pre-created
    return load_uw3_cached()


def prep_records(lines):
    """normalize+prepare every usable line; drop check_line rejects (the
    reference trainer skips them the same way, ocropus-rtrain:188-199)."""
    out = []
    for rec in lines:
        img = rec["image"]
        ink = np.amax(img) - img
        if ink.max() > 0:
            ink = ink / ink.max()
        if check_line(ink):
            continue
        txt = normalize_text(rec["text"])
        if not txt:
            continue
        x = prepare_line(normalize_line(img))
        out.append((rec["line_id"], x, txt))
    return out


@ray.remote(num_cpus=4)
class Trainer:
    def __init__(self, prepped, charset, worker_id, ns, seed):
        # sort once by length so adjacent-window minibatches pad minimally
        self.data = sorted(prepped, key=lambda r: r[1].shape[0])
        self.net = BiLSTMRecognizer(ni=48, ns=ns, charset=charset, seed=seed)
        self.wid = worker_id

    def grads(self, weights, step, bsize, frac=1.0):
        """One minibatch gradient. ``frac`` is the length-curriculum
        cap: sample only from the shortest ``frac`` of the (length-
        sorted) pool — short lines exit the CTC blank-plateau far
        faster, then the cap opens to the full corpus."""
        rng = np.random.default_rng((self.wid + 1) * 1_000_003 + step)
        hi = max(bsize, int(len(self.data) * min(1.0, frac)))
        # +1: integers() is exclusive-high — without it the longest
        # line in the (length-sorted) pool is never sampled
        start = int(rng.integers(0, max(1, hi - bsize + 1)))
        batch = self.data[start : start + bsize]
        self.net.set_weights(weights)
        err = self.net.grad_minibatch_batched([(x, t) for _, x, t in batch])
        return self.net.collect_grads(), err, len(batch)

    def eval_cer(self, weights, prepped_eval):
        """Held-out CER under the PRODUCTION decode: region-argmax CTC
        (translate_back, blank threshold 0.7) + normalize_text — the
        exact path LineRecognizer runs. Checkpoint selection on plain
        best-path (predict_string) picked checkpoints that REGRESSED
        under region decode (measured this round: best-path 0.0369 ->
        region 0.0611 while the baseline was region 0.0481)."""
        self.net.set_weights(weights)
        dist = 0
        total = 0
        for _, x, txt in prepped_eval:
            y = self.net.forward(x)
            pred = normalize_text(self.net.codec.decode(translate_back(y)))
            dist += levenshtein(pred, txt)
            total += len(txt)
        return dist, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--ns", type=int, default=100)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--lr-half-life", type=int, default=1200)
    ap.add_argument("--lr-hold", type=int, default=800,
                    help="steps at full lr before the half-life decay")
    ap.add_argument("--curriculum", type=int, default=600,
                    help="steps to open the length cap from 25%% to 100%%")
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--init", default=None)
    ap.add_argument("--real-augment", type=int, default=0,
                    help="add N degraded copies of the REAL uw3 train "
                         "scans (linegen.degrade_real: blur/noise/affine "
                         "on the scan itself — stays in the uw3 glyph "
                         "distribution, unlike --ttf-augment)")
    ap.add_argument("--ttf-augment", type=int, default=0,
                    help="add N TTF-degraded renders of train texts")
    ap.add_argument("--ttf-shuffle", type=float, default=0.0,
                    help="fraction of --ttf-augment lines rendered from "
                         "NOVEL word sequences resampled from the train "
                         "vocabulary (kills line-level memorization; "
                         "word tokens keep their real punctuation/case)")
    ap.add_argument("--aug-seed", type=int, default=0,
                    help="offset for the augmentation streams — a warm "
                         "continuation with a fresh offset trains on NEW "
                         "degraded copies / renders instead of the same "
                         "pool the previous run already fit. The offset "
                         "is additive to per-line seeds, so it must "
                         "exceed the pool size (use >= 4*(real-augment"
                         "+ttf-augment), e.g. 50000, 100000) or the new "
                         "pool largely overlaps the previous one")
    ap.add_argument("--time-budget", type=float, default=0,
                    help="stop after this many seconds (0 = no limit)")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "dup_ocropy_ray", "models", "uw3_model.npz"))
    args = ap.parse_args()

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4 * args.workers + 2,
                 include_dashboard=False)

    lines = load_corpus()
    charset = uw3_charset(lines)
    train, test = split_uw3(lines)
    tr = prep_records(train)
    te = prep_records(test)
    if args.real_augment > 0:
        # in-distribution pool: degraded copies of the real train scans
        # (sources/linegen.py degrade_real); eval stays pure held-out
        from dup_ocropy_ray.sources import linegen

        raw = [(rec["line_id"], rec["image"], normalize_text(rec["text"]))
               for rec in train]
        aug = []
        k = 0
        while len(aug) < args.real_augment and k < 4 * args.real_augment:
            _, img, txt = raw[k % len(raw)]
            if txt:
                try:
                    d = linegen.degrade_real(img, 20_000 + args.aug_seed + k)
                    if (min(d.shape) >= 10 and (d < 0.5).any()
                            and not check_line(1.0 - d)):
                        aug.append((f"real-{k}",
                                    prepare_line(normalize_line(d)), txt))
                except Exception:
                    pass
            k += 1
        tr = tr + aug
        print(f"real augmentation: +{len(aug)} lines", flush=True)
    if args.ttf_augment > 0:
        # regularization pool: TTF-degraded renders of the TRAIN texts
        # (sources/linegen.py) — same transcripts, different font/noise
        # distribution; eval stays pure uw3 held-out
        from dup_ocropy_ray.sources import linegen

        texts = [t for _, _, t in tr]
        # alternate faces and degradation presets deterministically —
        # font/noise DIVERSITY is the point of this pool
        fonts = [linegen.DEJAVU,
                 "/usr/share/fonts/truetype/dejavu/DejaVuSerif.ttf"]
        degs = ["lo", "med", "med", "hi"]
        vocab = sorted({w for t in texts for w in t.split()})
        srng = np.random.default_rng(4242 + args.aug_seed)
        k = 0
        aug = []
        while len(aug) < args.ttf_augment:
            if vocab and srng.random() < args.ttf_shuffle:
                # novel word sequence from the real train vocabulary
                nw = int(srng.integers(4, 11))
                t = " ".join(vocab[int(srng.integers(len(vocab)))]
                             for _ in range(nw))
            else:
                t = texts[k % len(texts)]
            try:
                img = linegen.genline(t, 10_000 + args.aug_seed + k,
                                      font=fonts[k % len(fonts)],
                                      degradations=degs[k % len(degs)])
                if min(img.shape) >= 10 and (img < 0.5).any():
                    aug.append((f"ttf-{k}", prepare_line(normalize_line(img)),
                                t))
            except KeyError:
                pass
            k += 1
            if k > 4 * args.ttf_augment:
                break
        tr = tr + aug
        print(f"ttf augmentation: +{len(aug)} lines", flush=True)
    print(f"train {len(tr)} test {len(te)} charset {len(charset)}", flush=True)

    if args.init:
        net = BiLSTMRecognizer.load_npz(args.init, dtype=np.float64)
        assert net.codec.size() == len(charset)
    else:
        net = BiLSTMRecognizer(ni=48, ns=args.ns, charset=charset,
                               seed=args.seed)

    workers = [Trainer.remote(tr, charset, w, args.ns, args.seed + w)
               for w in range(args.workers)]
    # shard the held-out set across workers once
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
                scaled = v * (n / total_n)
                avg[k] = avg.get(k, 0) + scaled
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
                               "train": len(tr), "test": len(te)}, f)
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
