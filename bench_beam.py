#!/usr/bin/env python
"""Decode scaling study: greedy and beam RTF vs batch size and beam width.

VERDICT r2 #8: beam RTF (416x) trailed greedy (1283x) 3x with no recorded
batching/width scaling data. This sweeps batch {8, 32} x beam width {3, 8}
(plus greedy) on the flagship model and persists the grid, so BASELINE.md
can state where the RTF>=600x operating points are.

Timing is tunnel-safe: the axon remote-TPU tunnel deduplicates identical
dispatches (same fn + same buffers), so every iteration perturbs the
features by eps * f(previous output) — a real data dependency — and the
loop is closed with one float()/np.asarray() fetch. (bench.py's meta-step
loop chains through the TrainState the same way; its greedy RTF loop
predates this and re-dispatched identical buffers, which the tunnel can
short-circuit — numbers from this file supersede it.)

Reference counterpart: test.py beam decode over AudioDataLoader batches
(/root/reference/test.py:112-171, modules/decoder.py:186-291) — per-utt
Python loop, re-forwarding the full prefix per hypothesis per step.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

VOCAB_SIZE = 64
SECONDS_PER_UTT = 8.0
MAX_STEPS = 100  # realistic transcript horizon for ~8 s utterances


def make_features(cfg, b: int, rng: np.random.RandomState):
    import jax.numpy as jnp

    from __graft_entry__ import _synthetic_batch
    from mtl_tpu.train.steps import prepare_features

    frames = int(SECONDS_PER_UTT * 100)  # 10 ms hop
    batch = {k: jnp.asarray(v) for k, v in
             _synthetic_batch(cfg, b, frames, 16, VOCAB_SIZE).items()}
    feats, lengths = prepare_features(batch, cfg)
    audio_seconds = float(np.sum(np.asarray(batch["audio_lengths"])) / 16000)
    return feats, lengths, audio_seconds


def time_decode(run, feats, n_iters: int, warmup: int = 6):
    """Chained timing: each iteration's features depend on the previous
    iteration's output ids, defeating tunnel-level dispatch dedup.

    ``warmup`` chained iterations run before the timed loop: the axon
    tunnel's first ~5 dispatches of a fresh session carry 0.3-1.8 s of
    one-time ramp that a single warmup dispatch does not absorb — measured
    root cause of the round-3/round-4 20x greedy-RTF contradiction
    (BASELINE.md round-5 decode section)."""
    import jax.numpy as jnp

    ids = run(feats)
    np.asarray(ids)  # compile + settle
    for _ in range(warmup):
        ids = run(feats + 1e-9 * jnp.sum(ids).astype(feats.dtype))
    np.asarray(ids)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        bump = (1e-9 * jnp.sum(ids).astype(feats.dtype))
        ids = run(feats + bump)
    np.asarray(ids)
    return (time.perf_counter() - t0) / n_iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--widths", type=int, nargs="+", default=[3, 8])
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _flagship_cfg
    from mtl_tpu.decode.beam import beam_decode_ids
    from mtl_tpu.decode.greedy import greedy_decode_ids
    from mtl_tpu.models.transformer import build_model

    cfg = _flagship_cfg()
    model = build_model(cfg, VOCAB_SIZE)
    rng = np.random.RandomState(0)
    grid = []

    params = None
    for b in args.batches:
        feats, lengths, audio_s = make_features(cfg, b, rng)
        if params is None:
            seq_in = np.ones((b, 8), np.int32)
            params = model.init(jax.random.PRNGKey(0), feats, lengths,
                                seq_in)

        # greedy full-horizon is the pessimistic bound (always MAX_STEPS
        # decode iterations); beam's while_loop exits once every slot has
        # retired, so with an untrained model it runs far fewer steps —
        # steps_run is recorded so the rows are comparable.
        for exit_flag in (False, True):
            def greedy(f, e=exit_flag):
                return greedy_decode_ids(model, params, f, lengths,
                                         MAX_STEPS, 1, e)

            wall = time_decode(greedy, feats, args.iters)
            grid.append({"decoder": "greedy", "batch": b,
                         "early_exit": exit_flag,
                         "steps_run": MAX_STEPS if not exit_flag else None,
                         "rtf": round(audio_s / wall, 1),
                         "wall_s_per_batch": round(wall, 3)})
            print(json.dumps(grid[-1]), flush=True)

        for w in args.widths:
            def beam(f, w=w):
                return beam_decode_ids(model, params, f, lengths, w,
                                       MAX_STEPS, 1, 0)

            def beam_ids(f, w=w):
                return beam(f)[0]

            steps_run = int(np.max(np.asarray(beam(feats)[3])))
            wall = time_decode(beam_ids, feats, args.iters)
            grid.append({"decoder": "beam", "batch": b, "width": w,
                         "steps_run": steps_run,
                         "rtf": round(audio_s / wall, 1),
                         "wall_s_per_batch": round(wall, 3)})
            print(json.dumps(grid[-1]), flush=True)

    out = {"grid": grid, "max_steps": MAX_STEPS,
           "seconds_per_utt": SECONDS_PER_UTT,
           "platform": jax.devices()[0].platform}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "beam_study_results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"best_beam_rtf": max(
        g["rtf"] for g in grid if g["decoder"] == "beam")}))


if __name__ == "__main__":
    main()
