#!/usr/bin/env python
"""Matched-perplexity LM benchmark: mtl_tpu vs the ACTUAL PyTorch reference.

The LM counterpart of bench_matched_cer.py (round-2 VERDICT flagged the LM
throughput claim as lacking a matched-quality protocol):

1. One synthetic 3-task Markov corpus (EN / ZH / code-switched target) —
   first-order structure so perplexity has something to learn beyond
   unigram stats.
2. ONE set of initial weights: the Flax scan-LSTM init is transplanted into
   the reference ``RNNModel`` imported from /root/reference
   (mtl_tpu.parity.torch_ref.rnnlm_to_torch_state — the same transplant the
   parity tests prove equivalent at 1e-5).
3. ONE deterministic window stream: LMDataset's seeded sampler yields
   identical bptt windows to both frameworks.
4. Both run the reference's LM meta-transfer iteration
   (lm/main_meta_transfer.py:299-368): per task inner SGD at
   lr/meta_lr_factor, ratio-weighted query losses on the code-switched
   window, accumulated outer grad, clip, outer SGD. The torch side mirrors
   tests/test_lm_torch_parity.py's loop (query backward before the weight
   reset — the in-place load_state_dict corrupts live autograd graphs in
   modern torch); the mtl_tpu side uses make_lm_meta_step.
5. Every --eval-every iterations both measure valid CE on the target task
   with the same windowing math (evaluate_lm semantics; the torch twin
   below carries hidden across windows identically).

Outputs one JSON line with both curves and wall/utt-to-target; persists
into matched_ppl_results.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

K_TASKS = 3
ARCH = dict(rnn_type="LSTM", ninp=200, nhid=200, nlayers=2, dropout=0.0,
            tie_weights=False)
BPTT = 35
BATCH = 20  # reference lm defaults (main_meta_transfer.py:27-43)
# lr 5 instead of the reference's word-LM default 20: at 20 BOTH frameworks
# oscillate on this toy corpus (torch's doubled LSTM bias makes its
# effective step bigger still); a fixed stable lr applied identically to
# both sides keeps time-to-target well defined. Annealing is OFF by default
# (--anneal-every 0): anneal-on-noise froze each side at a different floor.
LR = 5.0
META_LR_FACTOR = 3.0
RATIO = 0.8
CLIP = 0.25


def build_data():
    from mtl_tpu.data.synthetic import make_synthetic_lm_corpus
    from mtl_tpu.lm.data import Corpus, Dictionary, LMDataset

    dirs = make_synthetic_lm_corpus("/tmp/ppl_corpus", num_tasks=K_TASKS,
                                    sentences_per_task=400, seed=11,
                                    markov=True)
    dictionary = Dictionary()
    corpora = [
        Corpus(os.path.join(d, "train.txt"),
               os.path.join(d, "valid.txt"),
               os.path.join(d, "test.txt"), dictionary=dictionary)
        for d in dirs
    ]
    ds = LMDataset([c.train for c in corpora], BPTT, BATCH)
    target_valid = corpora[-1].valid
    return corpora, dictionary, ds, target_valid


def sample_iter(ds, it):
    """The reference's per-iteration windows: one (train) window per task +
    the code-switched query window (lm/main_meta_transfer.py:299-310)."""
    samples = [ds.sample(i, it) for i in range(K_TASKS)]
    datas = np.stack([s[0] for s in samples])
    targets = np.stack([s[1] for s in samples])
    _, _, q_data, q_target = ds.sample(-1, it)
    return datas, targets, q_data, q_target


def sustained_hit(curve, target_ppl):
    """First eval point CONFIRMING sustained convergence: ppl <= target on
    >= 2 consecutive evals (returns the second of the pair). A single
    sub-target sample does not count — the torch side's curve is
    non-monotonic on this toy corpus (VERDICT r4 #1: 11.2@10 -> 23.5@20 ->
    10.3@30 must not declare victory on the wiggle at 10)."""
    for prev, cur in zip(curve, curve[1:]):
        if prev["ppl"] <= target_ppl and cur["ppl"] <= target_ppl:
            return cur
    return None


def summarize(curve, target_ppl):
    hit = sustained_hit(curve, target_ppl)
    return {
        "curve": curve,
        "target_criterion": "ppl <= target on 2 consecutive evals",
        "reached_target": hit is not None,
        "iters_to_target": hit["iter"] if hit else None,
        "wall_s_to_target": hit["wall_s"] if hit else None,
    }


def run_tpu(ntokens, ds, target_valid, args):
    import jax
    import jax.numpy as jnp

    from mtl_tpu.lm.model import RNNLM
    from mtl_tpu.lm.train import (
        evaluate_lm,
        joint_ratios,
        make_lm_meta_step,
    )

    model = RNNLM(ntoken=ntokens, **ARCH)
    params = model.init(jax.random.PRNGKey(3), jnp.zeros((2, 1), jnp.int32))
    # the shared-init contract: what run_torch receives must be THESE
    # weights, not the trained ones (a round-5 diagnostic caught the torch
    # side starting from our converged params and "reaching target" by
    # wobbling around it — same_init was silently violated)
    init_params = jax.tree.map(np.asarray, params)
    ratios = joint_ratios(K_TASKS, RATIO)
    step = make_lm_meta_step(model, CLIP, ratios, META_LR_FACTOR)
    rng = jax.random.PRNGKey(0)

    # warm the compile outside the timed region
    d0, t0_, qd0, qt0 = sample_iter(ds, 0)
    p_w, total, _ = step(params, jnp.asarray(d0), jnp.asarray(t0_),
                         jnp.asarray(qd0), jnp.asarray(qt0), LR, rng)
    float(total)
    del p_w

    curve = []
    wall = 0.0
    lr, best_val = LR, None
    consec_hits = 0
    t0 = time.perf_counter()
    for it in range(args.max_iters):
        datas, targets, q_data, q_target = sample_iter(ds, it)
        rng, sub = jax.random.split(rng)
        params, total, _ = step(params, jnp.asarray(datas),
                                jnp.asarray(targets), jnp.asarray(q_data),
                                jnp.asarray(q_target), lr, sub)
        if (it + 1) % args.eval_every == 0:
            float(total)  # close the timed chain with one value fetch
            wall += time.perf_counter() - t0
            val = evaluate_lm(model, params, target_valid, BPTT)
            ppl = math.exp(min(val, 30))
            curve.append({"iter": it + 1, "wall_s": round(wall, 2),
                          "ppl": round(ppl, 3)})
            print(f"[tpu] iter {it+1} wall {wall:.1f}s ppl {ppl:.2f} "
                  f"lr {lr:.3f}", flush=True)
            # sustained-convergence stop (see sustained_hit)
            consec_hits = consec_hits + 1 if ppl <= args.target_ppl else 0
            if consec_hits >= 2:
                break
            # anneal on plateau (lm/main_meta_transfer.py:398-408) at the
            # reference's epoch-ish cadence — annealing on every fine-grained
            # curve sample freezes the lr on eval noise (observed: both
            # sides stall above any common target)
            if args.anneal_every and (it + 1) % args.anneal_every == 0:
                if best_val is None or val < best_val:
                    best_val = val
                else:
                    lr /= 4.0
            t0 = time.perf_counter()
    return init_params, curve


def torch_evaluate(tm, stream, ntokens, eval_batch_size=10):
    """evaluate_lm's exact windowing math on the torch side (hidden carried
    across windows; ragged tail weighted by true length)."""
    import torch

    from mtl_tpu.lm.data import batchify, get_batch

    eval_batch_size = min(eval_batch_size, max(1, len(stream) // (BPTT + 1)))
    source = batchify(np.asarray(stream).reshape(-1), eval_batch_size)
    crit = torch.nn.CrossEntropyLoss()
    hidden = tm.init_hidden(eval_batch_size)
    total_loss, total_len = 0.0, len(source)
    i = 0
    with torch.no_grad():
        while i < len(source) - 1:
            data, target = get_batch(source, i, BPTT)
            out, hidden = tm(torch.from_numpy(data.copy()).long(), hidden)
            loss = float(crit(out.view(-1, ntokens),
                              torch.from_numpy(target.copy()).long()))
            total_loss += loss * data.shape[0]
            i += BPTT
    return total_loss / max(total_len, 1)


def run_torch(ntokens, ds, target_valid, init_params, args):
    import torch

    from mtl_tpu.lm.train import joint_ratios
    from mtl_tpu.parity.torch_ref import (
        rnnlm_to_torch_state,
        stub_missing_native_deps,
    )

    stub_missing_native_deps()
    lm_path = "/root/reference/lm"
    if lm_path not in sys.path:
        sys.path.append(lm_path)
    from model.rnn_model import RNNModel

    torch.set_num_threads(os.cpu_count() or 1)
    tm = RNNModel(ARCH["rnn_type"], ntokens, ARCH["ninp"], ARCH["nhid"],
                  ARCH["nlayers"], dropout=ARCH["dropout"],
                  tie_weights=ARCH["tie_weights"])
    tm.load_state_dict(rnnlm_to_torch_state(init_params, ARCH["nlayers"]))
    tm.train()
    crit = torch.nn.CrossEntropyLoss()
    ratios = joint_ratios(K_TASKS, RATIO)

    from copy import deepcopy

    def ce(data, target):
        hidden = tm.init_hidden(data.shape[1])
        out, _ = tm(torch.from_numpy(data.copy()).long(), hidden)
        return crit(out.view(-1, ntokens),
                    torch.from_numpy(target.copy()).long())

    curve = []
    wall = 0.0
    lr, best_val = LR, None
    consec_hits = 0
    t0 = time.perf_counter()
    for it in range(args.max_iters):
        datas, targets, q_data, q_target = sample_iter(ds, it)
        weights_original = deepcopy(tm.state_dict())
        acc = {n: torch.zeros_like(p) for n, p in tm.named_parameters()}
        for i in range(K_TASKS):
            tm.zero_grad()
            ce(datas[i], targets[i]).backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
            torch.optim.SGD(tm.parameters(), lr=lr / META_LR_FACTOR).step()
            tm.zero_grad()
            (ce(q_data, q_target) * ratios[i]).backward()
            for n, p in tm.named_parameters():
                acc[n] += p.grad.detach()
            tm.load_state_dict(weights_original)
        tm.zero_grad()
        for n, p in tm.named_parameters():
            p.grad = acc[n]
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        torch.optim.SGD(tm.parameters(), lr=lr).step()
        if (it + 1) % args.eval_every == 0:
            wall += time.perf_counter() - t0
            tm.eval()
            val = torch_evaluate(tm, target_valid, ntokens)
            tm.train()
            ppl = math.exp(min(val, 30))
            curve.append({"iter": it + 1, "wall_s": round(wall, 2),
                          "ppl": round(ppl, 3)})
            print(f"[torch] iter {it+1} wall {wall:.1f}s ppl {ppl:.2f} "
                  f"lr {lr:.3f}", flush=True)
            consec_hits = consec_hits + 1 if ppl <= args.target_ppl else 0
            if consec_hits >= 2:
                break
            if wall > args.torch_max_seconds:
                print("[torch] wall cap hit", flush=True)
                break
            if args.anneal_every and (it + 1) % args.anneal_every == 0:
                if best_val is None or val < best_val:
                    best_val = val
                else:
                    lr /= 4.0
            t0 = time.perf_counter()
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-iters", type=int, default=2000)
    ap.add_argument("--eval-every", type=int, default=10)
    ap.add_argument("--anneal-every", type=int, default=0)
    ap.add_argument("--target-ppl", type=float, default=11.0)
    ap.add_argument("--torch-max-seconds", type=float, default=3600.0)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    args = ap.parse_args()

    corpora, dictionary, ds, target_valid = build_data()
    ntokens = len(dictionary)
    windows_per_iter = K_TASKS + 1
    tokens_per_iter = windows_per_iter * BPTT * BATCH
    out = {"protocol": {
        "arch": ARCH, "bptt": BPTT, "batch": BATCH, "lr": LR,
        "meta_lr_factor": META_LR_FACTOR, "ratio": RATIO, "clip": CLIP,
        "ntokens": ntokens, "target_ppl": args.target_ppl,
        "corpus": "3-task sparse-Markov, 400 sentences/task",
        "tokens_per_iter": tokens_per_iter,
        "same_init": True, "same_windows": True,
    }}

    init_params = None
    if not args.skip_tpu:
        init_params, curve = run_tpu(ntokens, ds, target_valid, args)
        s = summarize(curve, args.target_ppl)
        if s["wall_s_to_target"]:
            s["tokens_per_sec"] = round(
                s["iters_to_target"] * tokens_per_iter
                / s["wall_s_to_target"], 1)
        out["mtl_tpu"] = s
        np.save("/tmp/ppl_init_params.npy",
                np.asarray([init_params], dtype=object), allow_pickle=True)
    if not args.skip_torch:
        if init_params is None:
            init_params = np.load("/tmp/ppl_init_params.npy",
                                  allow_pickle=True)[0]
        curve = run_torch(ntokens, ds, target_valid, init_params, args)
        s = summarize(curve, args.target_ppl)
        if s["wall_s_to_target"]:
            s["tokens_per_sec"] = round(
                s["iters_to_target"] * tokens_per_iter
                / s["wall_s_to_target"], 1)
        out["torch_reference_cpu"] = s

    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "matched_ppl_results.json")
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    merged = results.get("default", {})
    merged.update(out)
    results["default"] = merged
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
