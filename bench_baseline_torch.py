#!/usr/bin/env python
"""PyTorch CPU baseline for bench.py's vs_baseline ratio.

A from-scratch torch implementation of the reference's per-iteration work
(transient_trainer.py:150-255) at the flagship config: per task — support
forward+backward through vgg-CNN + factorized-attention Transformer, inner
SGD step, query forward+backward, weight restore; then outer Adam step.
Architecture dims follow README.md:47-61 (2-enc/4-dec, d=512, r=100
factorized attention, 8 heads, d_k=d_v=64, d_inner=512); this file is an
independent re-implementation used ONLY as a measuring stick — the TPU
framework never imports it.

NOTE: this host has no GPU; the reference was a GPU codebase, so this CPU
number understates the reference. Treat vs_baseline accordingly (BASELINE.md
discusses provenance).
"""

from __future__ import annotations

import math
import time
from copy import deepcopy


def build_torch_model(vocab_size):
    import torch
    import torch.nn as nn

    d_model, heads, dk, dinner, r = 512, 8, 64, 512, 100

    class FactorizedMHA(nn.Module):
        def __init__(self):
            super().__init__()
            self.qa = nn.Linear(d_model, r, bias=False)
            self.qb = nn.Linear(r, heads * dk)
            self.ka = nn.Linear(d_model, r, bias=False)
            self.kb = nn.Linear(r, heads * dk)
            self.va = nn.Linear(d_model, r, bias=False)
            self.vb = nn.Linear(r, heads * dk)
            self.oa = nn.Linear(heads * dk, r, bias=False)
            self.ob = nn.Linear(r, d_model)
            self.ln = nn.LayerNorm(d_model)

        def forward(self, q, k, v, mask=None):
            B, Tq, _ = q.shape
            Tk = k.shape[1]
            res = q
            qh = self.qb(self.qa(q)).view(B, Tq, heads, dk).transpose(1, 2)
            kh = self.kb(self.ka(k)).view(B, Tk, heads, dk).transpose(1, 2)
            vh = self.vb(self.va(v)).view(B, Tk, heads, dk).transpose(1, 2)
            att = qh @ kh.transpose(-1, -2) / math.sqrt(dk)
            if mask is not None:
                att = att.masked_fill(mask, float("-inf"))
            att = att.softmax(-1)
            ctx = (att @ vh).transpose(1, 2).reshape(B, Tq, heads * dk)
            return self.ln(self.ob(self.oa(ctx)) + res)

    class FFN(nn.Module):
        def __init__(self):
            super().__init__()
            self.l1 = nn.Linear(d_model, dinner)
            self.l2 = nn.Linear(dinner, d_model)
            self.ln = nn.LayerNorm(d_model)

        def forward(self, x):
            return self.ln(self.l2(self.l1(x).relu()) + x)

    class EncLayer(nn.Module):
        def __init__(self):
            super().__init__()
            self.attn, self.ffn = FactorizedMHA(), FFN()

        def forward(self, x):
            return self.ffn(self.attn(x, x, x))

    class DecLayer(nn.Module):
        def __init__(self):
            super().__init__()
            self.self_attn, self.cross, self.ffn = (
                FactorizedMHA(), FactorizedMHA(), FFN()
            )

        def forward(self, x, enc, causal):
            x = self.self_attn(x, x, x, causal)
            x = self.cross(x, enc, enc)
            return self.ffn(x)

    class Model(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Sequential(
                nn.Conv2d(1, 64, 3, 1, 1), nn.ReLU(),
                nn.Conv2d(64, 64, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2, 2),
                nn.Conv2d(64, 128, 3, 1, 1), nn.ReLU(),
                nn.Conv2d(128, 128, 3, 1, 1), nn.ReLU(), nn.MaxPool2d(2, 2),
            )
            self.inp = nn.Linear(40 * 128, d_model)
            self.ln_in = nn.LayerNorm(d_model)
            self.enc = nn.ModuleList([EncLayer() for _ in range(2)])
            self.emb = nn.Embedding(vocab_size, d_model)
            self.dec = nn.ModuleList([DecLayer() for _ in range(4)])
            self.out = nn.Linear(d_model, vocab_size, bias=False)

        def forward(self, spec, tgt):
            import torch

            x = self.conv(spec)  # B,128,F/4,T/4
            B, C, F, T = x.shape
            x = x.view(B, C * F, T).transpose(1, 2)
            h = self.ln_in(self.inp(x))
            for l in self.enc:
                h = l(h)
            L = tgt.shape[1]
            causal = torch.triu(torch.ones(L, L, dtype=torch.bool), 1)
            y = self.emb(tgt)
            for l in self.dec:
                y = l(y, h, causal)
            return self.out(y)

    return Model()


def run_torch_baseline(k_tasks, k_train, k_valid, frames, tgt_len, vocab_size,
                       iters=2):
    import torch

    torch.set_num_threads(max(1, torch.get_num_threads()))
    model = build_torch_model(vocab_size)
    inner = torch.optim.SGD(model.parameters(), lr=1e-4)
    outer = torch.optim.Adam(model.parameters(), lr=1e-4)
    ce = torch.nn.CrossEntropyLoss()

    freq = 161
    spec_s = torch.randn(k_train, 1, freq, frames)
    spec_q = torch.randn(k_valid, 1, freq, frames)
    tgt_s = torch.randint(4, vocab_size, (k_train, tgt_len))
    tgt_q = torch.randint(4, vocab_size, (k_valid, tgt_len))

    def one_iter():
        weights = deepcopy(model.state_dict())
        outer.zero_grad()
        copy_grad = None
        for task in range(k_tasks):
            inner.zero_grad()
            logits = model(spec_s, tgt_s)
            loss = ce(logits.reshape(-1, vocab_size), tgt_s.reshape(-1))
            loss.backward()
            inner.step()
            logits = model(spec_q, tgt_q)
            vloss = ce(logits.reshape(-1, vocab_size), tgt_q.reshape(-1))
            (vloss / k_tasks).backward()
            grads = [p.grad.detach().clone() for p in model.parameters()]
            copy_grad = grads if copy_grad is None else [
                a + b for a, b in zip(copy_grad, grads)
            ]
            model.load_state_dict(weights)
        for p, g in zip(model.parameters(), copy_grad):
            p.grad = g
        outer.step()

    one_iter()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        one_iter()
    elapsed = (time.perf_counter() - t0) / iters
    utts = k_tasks * (k_train + k_valid)
    print(f"torch CPU: {elapsed:.2f}s/iter -> {utts / elapsed:.3f} utt/s")
    return utts / elapsed


if __name__ == "__main__":
    run_torch_baseline(3, 8, 8, 800, 64, 3765)
