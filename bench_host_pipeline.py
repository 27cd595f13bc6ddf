#!/usr/bin/env python
"""Host input-pipeline weak scaling: can one host feed N chips?

VERDICT r4 weak #6: the 8-chip projection holds per-chip compute at ~85 ms
but one prefetch thread costs ~23 ms per warm flagship chip-batch — feeding
8 chips' batches (8x the utterances) from one thread would overrun the step.
This bench measures exactly that, plus the fix (MultiWorkerPrefetcher with
per-iteration seeded draws — trainer.py), entirely host-side (no TPU, no
tunnel; the device step time it must beat is measured_steps.json's).

Reference counterpart: the single threading.Thread double buffer at
/root/reference/trainer/asr/transient_trainer.py:127-139.

Rows:
  feed_1chip  — sample_meta_batch(k=8)   single thread (the r1 measurement)
  feed_Nchip  — sample_meta_batch(k=8*N) single thread (weak-scaling demand)
  workers_W   — MultiWorkerPrefetcher sustained get() rate for the 8-chip
                feed with W workers (this host has 1 core — W>1 gains come
                only from GIL-released native decode; the row records the
                honest single-core number and the per-core math for a real
                v5e-8 host is in BASELINE.md)

Run: python bench_host_pipeline.py  (tunnel-free; pure host work)
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

K_TASKS = 3
K_PER_CHIP = 8
MAX_SEC = 8.0
ITERS = 30
WARM = 5


def build_dataset():
    from mtl_tpu.config import Config
    from mtl_tpu.data.dataset import SpectrogramDataset
    from mtl_tpu.data.synthetic import make_synthetic_corpus
    from mtl_tpu.data.vocab import Vocab

    root = "/tmp/host_pipeline_corpus"
    manifests, labels = make_synthetic_corpus(
        root, num_tasks=K_TASKS, utts_per_task=32, max_sec=MAX_SEC,
        max_chars=24,
    )
    cfg = Config()
    cfg.data.train_manifest_list = manifests
    cfg.data.labels_path = labels
    cfg.finalize()
    vocab = Vocab.from_json(labels)
    return SpectrogramDataset(vocab, cfg, manifests, is_train=True)


def time_single(ds, k, iters=ITERS, warm=WARM):
    for _ in range(warm):
        ds.sample_meta_batch(k, k)
    t0 = time.perf_counter()
    for _ in range(iters):
        ds.sample_meta_batch(k, k)
    return (time.perf_counter() - t0) / iters * 1e3


def time_workers(ds, k, workers, iters=ITERS, warm=WARM):
    from mtl_tpu.train.trainer import MultiWorkerPrefetcher

    def fetch_at(i):
        return ds.sample_meta_batch(
            k, k, rng=np.random.RandomState((123 + i) % 2 ** 32))

    p = MultiWorkerPrefetcher(fetch_at, workers)
    for _ in range(warm):
        p.get()
    t0 = time.perf_counter()
    for _ in range(iters):
        p.get()
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ds = build_dataset()
    ncpu = os.cpu_count() or 1
    out = {"host_cpus": ncpu, "k_tasks": K_TASKS, "k_per_chip": K_PER_CHIP,
           "utt_sec": MAX_SEC, "rows": {}}

    for n_chips in (1, 4, 8):
        ms = time_single(ds, K_PER_CHIP * n_chips)
        out["rows"][f"feed_{n_chips}chip_single_thread_ms"] = round(ms, 1)
        print(json.dumps({f"feed_{n_chips}chip_ms": round(ms, 1),
                          "utts_per_iter":
                          K_TASKS * 2 * K_PER_CHIP * n_chips}), flush=True)

    for workers in (1, 2, 4):
        ms = time_workers(ds, K_PER_CHIP * 8, workers)
        out["rows"][f"feed_8chip_workers{workers}_ms"] = round(ms, 1)
        print(json.dumps({f"workers_{workers}_8chip_ms": round(ms, 1)}),
              flush=True)

    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "host_pipeline_results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
