#!/usr/bin/env python
"""Matched-CER benchmark: mtl_tpu vs the ACTUAL PyTorch reference.

Protocol (the honest version of BASELINE.json's north star):

1. One synthetic 3-task corpus (EN-like / ZH-like / code-switched target).
2. ONE set of initial weights: the Flax init is transplanted into the real
   reference model imported from /root/reference (mtl_tpu.parity.torch_ref),
   so both frameworks start from identical parameters.
3. ONE deterministic batch stream: the same seeded sampler yields identical
   support/query numpy batches to both frameworks. Features are precomputed
   once (identical arrays) and excluded from both frameworks' timing, so the
   comparison is purely the meta-transfer training math.
4. Both run the same algorithm — the reference's transient (meta-transfer)
   iteration (transient_trainer.py:150-255): per task support fwd+bwd,
   inner SGD step, query loss at the adapted weights, copy-grad outer
   accumulation, weight restore; one outer Adam step per iteration. The
   torch side drives the reference Transformer directly with a minimal loop
   that mirrors those lines; the mtl_tpu side uses make_meta_step.
5. Every --eval-every iterations both evaluate teacher-forced CER on the
   full target-task valid set with the same scorer (utils.metrics).

Outputs one JSON line with both learning curves (iter, wall_s, cer) and the
iterations/wall-time to --target-cer, plus utt/s for each side. CPU-torch vs
one TPU chip: the reference was a GPU codebase, so BASELINE.md also restates
the ratio against a documented V100 estimate.

Usage:
  python bench_matched_cer.py [--max-iters 300] [--target-cer 0.2]
                              [--skip-torch] [--skip-tpu]
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

K_TASKS = 3
K_TRAIN = 4
K_VALID = 4
INNER_LR = 1e-2
META_LR = 1e-3
SEED = 1234


def tiny_cfg(num_labels: int, scale: int = 1, flagship: bool = False):
    from mtl_tpu.config import Config

    cfg = Config()
    if flagship:
        # the flagship geometry (BASELINE.json configs[0]: 2 enc / 4 dec,
        # d=512, h=8) at the matched-CER protocol's corpus scale — deeper
        # stacks (naive scale=8) diverge on the toy corpus on BOTH sides
        cfg.model.num_enc_layers = 2
        cfg.model.num_dec_layers = 4
        cfg.model.num_heads = 8
        cfg.model.dim_model = 512
        cfg.model.dim_key = 64
        cfg.model.dim_value = 64
        cfg.model.dim_inner = 512
        cfg.model.dim_emb = 512
        cfg.model.dropout = 0.0
        cfg.model.r = 16
        cfg.model.dtype = "float32"
        cfg.model.src_max_len = 512
        cfg.model.tgt_max_len = 64
        cfg.train.lr = INNER_LR
        cfg.train.meta_lr = META_LR
        cfg.train.clip = False
        cfg.train.copy_grad = True
        cfg.finalize()
        return cfg
    cfg.model.num_enc_layers = 1 * scale
    cfg.model.num_dec_layers = 2 * scale
    cfg.model.num_heads = 2 * scale
    cfg.model.dim_model = 64 * scale
    cfg.model.dim_key = 16 * scale
    cfg.model.dim_value = 16 * scale
    cfg.model.dim_inner = 64 * scale
    cfg.model.dim_emb = 64 * scale
    cfg.model.dropout = 0.0
    cfg.model.r = 16
    cfg.model.dtype = "float32"
    cfg.model.src_max_len = 512
    cfg.model.tgt_max_len = 64
    cfg.train.lr = INNER_LR
    cfg.train.meta_lr = META_LR
    cfg.train.clip = False
    cfg.train.copy_grad = True
    cfg.finalize()
    return cfg


def build_data(cfg, utts_per_task: int = 8, max_sec: float = 0.6,
               max_chars: int = 8):
    """Precompute identical features/targets for every utterance of every
    task; returns per-task lists + the static padded shapes."""
    import jax.numpy as jnp

    from mtl_tpu.data.audio import load_audio
    from mtl_tpu.data.dataset import read_manifest
    from mtl_tpu.data.synthetic import make_synthetic_corpus
    from mtl_tpu.data.vocab import Vocab
    from mtl_tpu.ops.frontend import log_spectrogram

    manifests, labels_path = make_synthetic_corpus(
        f"/tmp/cer_corpus_{utts_per_task}_{max_sec}", num_tasks=K_TASKS,
        utts_per_task=utts_per_task, max_sec=max_sec, max_chars=max_chars,
        seed=7,
    )
    vocab = Vocab.from_json(labels_path)

    tasks = []
    for mpath in manifests:
        rows = read_manifest(mpath)
        utts = []
        for audio_path, txt_path in rows:
            wav = load_audio(audio_path)
            with open(txt_path, encoding="utf-8") as fh:
                text = fh.read().strip()
            ids = [i for i in (vocab.label2id.get(ch) for ch in text)
                   if i]  # reference OOV drop quirk
            n_fft = cfg.audio.n_fft
            pad = n_fft // 2
            wavp = np.pad(wav, (pad, pad), mode="reflect")
            feats, flen = log_spectrogram(
                jnp.asarray(wavp[None]),
                jnp.asarray([len(wav)]),
                n_fft=n_fft, hop=cfg.audio.hop_length,
                window=cfg.audio.window, normalize=cfg.audio.normalize,
                prepadded=True,
            )
            t = int(np.asarray(flen)[0])
            utts.append((np.asarray(feats)[0, :t].astype(np.float32),
                         np.asarray(ids, np.int64)))
        tasks.append(utts)

    t_max = max(u[0].shape[0] for task in tasks for u in task)
    t_max = (t_max + 7) // 8 * 8
    l_max = max(len(u[1]) for task in tasks for u in task) + 1
    return tasks, vocab, t_max, l_max


def pad_batch(utts, t_max, l_max):
    b = len(utts)
    f = utts[0][0].shape[1]
    feats = np.zeros((b, t_max, f), np.float32)
    lengths = np.zeros((b,), np.int32)
    targets = np.zeros((b, l_max), np.int64)
    for i, (x, y) in enumerate(utts):
        feats[i, : x.shape[0]] = x
        lengths[i] = x.shape[0]
        targets[i, : len(y)] = y
    return feats, lengths, targets


class BatchStream:
    """Deterministic sampler yielding identical batches to both sides."""

    def __init__(self, tasks, t_max, l_max, seed=SEED):
        self.tasks = tasks
        self.t_max, self.l_max = t_max, l_max
        self.rng = np.random.RandomState(seed)

    def next_iter(self):
        support = []
        for k in range(K_TASKS):
            idx = self.rng.choice(len(self.tasks[k]), K_TRAIN, replace=True)
            support.append(pad_batch([self.tasks[k][i] for i in idx],
                                     self.t_max, self.l_max))
        qidx = self.rng.choice(len(self.tasks[-1]), K_VALID, replace=True)
        query = pad_batch([self.tasks[-1][i] for i in qidx],
                          self.t_max, self.l_max)
        return support, query


def eval_batches(tasks, t_max, l_max, bs=8):
    """Full target-task set as fixed batches."""
    utts = tasks[-1]
    out = []
    for s in range(0, len(utts), bs):
        chunk = utts[s:s + bs]
        while len(chunk) < bs:
            chunk = chunk + chunk[: bs - len(chunk)]
        out.append((pad_batch(chunk, t_max, l_max), min(bs, len(utts) - s)))
    return out


def cer_of(hyps, golds, vocab, n_valid):
    from mtl_tpu.train.trainer import batch_cer

    d, n = batch_cer(np.asarray(hyps)[:n_valid], np.asarray(golds)[:n_valid],
                     vocab)
    return d, max(n, 1)


def gold_strings(targets, vocab):
    from mtl_tpu.data.vocab import post_process

    return [post_process(vocab.decode_ids(row), vocab.special_token_list)
            for row in targets]


def cer_strings(hyp_strs, gold_strs):
    from mtl_tpu.utils.metrics import calculate_cer

    d = n = 0
    for h, g in zip(hyp_strs, gold_strs):
        h, g = h.replace(" ", ""), g.replace(" ", "")
        d += calculate_cer(h, g)
        n += len(g)
    return d, max(n, 1)


# ---------------------------------------------------------------------------
# mtl_tpu side
# ---------------------------------------------------------------------------

def run_tpu(cfg, vocab, tasks, t_max, l_max, args):
    import jax
    import jax.numpy as jnp
    import optax

    from mtl_tpu.models.transformer import build_model
    from mtl_tpu.train.steps import (init_train_state, make_eval_step,
                                     make_meta_step)

    model = build_model(cfg, vocab.size)
    outer_opt = optax.adam(META_LR)
    step = make_meta_step(model, cfg, outer_opt)
    eval_step = make_eval_step(model, cfg)

    stream = BatchStream(tasks, t_max, l_max)
    sup0, q0 = stream.next_iter()

    def to_dev(batch):
        feats, lengths, targets = batch
        return {"features": jnp.asarray(feats),
                "input_lengths": jnp.asarray(lengths),
                "targets": jnp.asarray(targets)}

    def stack_support(sup):
        ds = [to_dev(b) for b in sup]
        return {k: jnp.stack([d[k] for d in ds]) for k in ds[0]}

    ex = to_dev(sup0[0])
    state = init_train_state(model, cfg, outer_opt, jax.random.PRNGKey(11),
                             ex)
    init_params = jax.tree.map(np.asarray, state.params)

    evals = eval_batches(tasks, t_max, l_max)
    decode_steps = args.decode_steps or (l_max + 2)

    def evaluate(params):
        """Teacher-forced CER (the round-2 protocol)."""
        d_tot, n_tot = 0, 0
        for batch, n_valid in evals:
            _, aux = eval_step(params, to_dev(batch))
            d, n = cer_of(aux["hyp"], aux["gold"], vocab, n_valid)
            d_tot += d
            n_tot += n
        return d_tot / n_tot

    def evaluate_decode(params):
        """Free-running greedy decode CER (the paper's metric; VERDICT r2
        #3) — same horizon as the torch mirror."""
        from mtl_tpu.data.vocab import SOS_ID
        from mtl_tpu.decode.greedy import greedy_search

        d_tot, n_tot = 0, 0
        for (feats, lengths, targets), n_valid in evals:
            hyps = greedy_search(model, params, jnp.asarray(feats),
                                 jnp.asarray(lengths), vocab,
                                 max_steps=decode_steps, start_token=SOS_ID)
            golds = gold_strings(targets, vocab)
            d, n = cer_strings(hyps[:n_valid], golds[:n_valid])
            d_tot += d
            n_tot += n
        return d_tot / n_tot

    score = evaluate if args.teacher_forced else evaluate_decode

    # warmup/compile on the first batches (excluded from timing)
    rng = jax.random.PRNGKey(5)
    state_w = state
    rng, sub = jax.random.split(rng)
    state_w, m = step(state_w, stack_support(sup0), to_dev(q0), sub)
    float(m["outer_loss"])
    score(state_w.params)
    # re-init (the warmup step consumed/donated state) and restart the stream
    state = init_train_state(model, cfg, outer_opt, jax.random.PRNGKey(11),
                             ex)
    stream = BatchStream(tasks, t_max, l_max)

    curve = []
    t0 = time.perf_counter()
    eval_spent = 0.0  # eval cost excluded from the training-time curves
    rng = jax.random.PRNGKey(5)
    beam_rtf = None
    for it in range(1, args.max_iters + 1):
        sup, q = stream.next_iter()
        rng, sub = jax.random.split(rng)
        state, m = step(state, stack_support(sup), to_dev(q), sub)
        if it % args.eval_every == 0 or it == args.max_iters:
            float(m["outer_loss"])  # sync
            wall = time.perf_counter() - t0 - eval_spent
            e0 = time.perf_counter()
            cer = score(state.params)
            eval_spent += time.perf_counter() - e0
            curve.append({"iter": it, "wall_s": round(wall, 2),
                          "cer": round(float(cer), 4)})
            print(f"[tpu] iter {it} wall {wall:.1f}s cer {cer:.3f}",
                  flush=True)
            if cer <= args.target_cer:
                break
    if not args.teacher_forced:
        # beam RTF at the parity point (BASELINE.json: "beam-decode RTF at
        # CER parity"): audio seconds decoded per wall second, width 8
        from mtl_tpu.decode.beam import beam_search_grouped
        from mtl_tpu.data.vocab import SOS_ID

        hop_s = cfg.audio.hop_length / cfg.audio.sample_rate
        # compile-warm the beam program before timing
        (wf, wl, _), _ = evals[0]
        beam_search_grouped(model, state.params, jnp.asarray(wf),
                            jnp.asarray(wl), vocab, beam_width=8, nbest=1,
                            max_steps=decode_steps, start_token=SOS_ID,
                            c_weight=0.1)
        b0 = time.perf_counter()
        audio_s = 0.0
        for (feats, lengths, targets), n_valid in evals:
            beam_search_grouped(
                model, state.params, jnp.asarray(feats),
                jnp.asarray(lengths), vocab, beam_width=8, nbest=1,
                max_steps=decode_steps, start_token=SOS_ID, c_weight=0.1,
            )
            audio_s += float(np.sum(lengths[:n_valid])) * hop_s
        beam_rtf = audio_s / (time.perf_counter() - b0)
        print(f"[tpu] beam RTF at parity point: {beam_rtf:.1f}x", flush=True)
    return init_params, curve, beam_rtf


# ---------------------------------------------------------------------------
# torch reference side
# ---------------------------------------------------------------------------

def run_torch(cfg, vocab, tasks, t_max, l_max, init_params, args):
    import torch
    import torch.nn.functional as F

    from mtl_tpu.parity.torch_ref import build_ref_model, load_reference

    torch.set_num_threads(os.cpu_count() or 1)
    ref = load_reference()
    rv = ref.Vocab()
    for lab in vocab.id2label[4:]:
        rv.add_label(lab)
    f_bins = tasks[0][0][0].shape[1]
    torch_model = build_ref_model(ref, rv, cfg, {"params":
                                                 init_params["params"]},
                                  f_prime=f_bins // 4, channels=128)
    torch_model.train()

    inner_opt = torch.optim.SGD(torch_model.parameters(), lr=INNER_LR)
    outer_opt = torch.optim.Adam(torch_model.parameters(), lr=META_LR)

    def fwd(batch):
        feats, lengths, targets = batch
        x = torch.from_numpy(feats).permute(0, 2, 1)[:, None]
        pred, gold, hyp = torch_model(
            x, torch.from_numpy(lengths.astype(np.int64)),
            torch.from_numpy(targets))
        loss = F.cross_entropy(pred.reshape(-1, pred.shape[-1]),
                               gold.reshape(-1), ignore_index=0)
        return loss, pred, gold

    evals = eval_batches(tasks, t_max, l_max)
    decode_steps = args.decode_steps or (l_max + 2)

    def evaluate():
        torch_model.eval()
        d_tot, n_tot = 0, 0
        with torch.no_grad():
            for batch, n_valid in evals:
                _, pred, gold = fwd(batch)
                hyp = pred.argmax(-1).numpy()
                d, n = cer_of(hyp, gold.numpy(), vocab, n_valid)
                d_tot += d
                n_tot += n
        torch_model.train()
        return d_tot / n_tot

    def torch_greedy(enc, steps):
        """The reference greedy loop (modules/decoder.py:131-184) with the
        300-step constant parameterized so both frameworks decode the same
        horizon: full decoder re-forward per step, argmax next token,
        strings cut at the first EOS."""
        import sys as _sys

        _sys.path.append("/root/reference")
        from modules.common_layers import get_subsequent_mask

        dec = torch_model.decoder
        ys = torch.ones(enc.size(0), 1).fill_(1).long()  # SOS
        decoded = []
        for _ in range(steps):
            non_pad_mask = torch.ones_like(ys).float().unsqueeze(-1)
            self_attn_mask = get_subsequent_mask(ys)
            out = dec.dropout(dec.trg_embedding(ys) * dec.x_logit_scale
                              + dec.positional_encoding(ys))
            for layer in dec.layers:
                out, _, _ = layer(out, enc, non_pad_mask=non_pad_mask,
                                  self_attn_mask=self_attn_mask,
                                  dec_enc_attn_mask=None)
            prob = dec.output_linear(out)
            _, next_word = torch.max(prob[:, -1], dim=1)
            decoded.append([
                rv.EOS_TOKEN if ni.item() == rv.EOS_ID
                else rv.id2label[ni.item()] for ni in next_word.view(-1)
            ])
            ys = torch.cat([ys, next_word.unsqueeze(-1)], dim=1)
        sent = []
        for row in np.transpose(decoded):
            st = ""
            for e in row:
                if e == rv.EOS_TOKEN:
                    break
                st += e
            sent.append(st)
        return sent

    def evaluate_decode():
        torch_model.eval()
        d_tot, n_tot = 0, 0
        with torch.no_grad():
            for (feats, lengths, targets), n_valid in evals:
                x = torch.from_numpy(feats).permute(0, 2, 1)[:, None]
                enc = torch_model.encode(
                    x, torch.from_numpy(lengths.astype(np.int64)))
                hyps = torch_greedy(enc, decode_steps)
                golds = gold_strings(targets, vocab)
                d, n = cer_strings(hyps[:n_valid], golds[:n_valid])
                d_tot += d
                n_tot += n
        torch_model.train()
        return d_tot / n_tot

    score = evaluate if args.teacher_forced else evaluate_decode

    stream = BatchStream(tasks, t_max, l_max)
    curve = []
    t0 = time.perf_counter()
    eval_spent = 0.0
    names = [n for n, _ in torch_model.named_parameters()]
    for it in range(1, args.max_iters + 1):
        sup, q = stream.next_iter()
        from copy import deepcopy

        weights_original = deepcopy(torch_model.state_dict())
        acc = {n: 0.0 for n in names}
        for k in range(K_TASKS):
            # inner adaptation on the task support batch
            inner_opt.zero_grad()
            loss, _, _ = fwd(sup[k])
            loss.backward()
            inner_opt.step()
            # query loss at the adapted weights; copy-grad accumulation
            # (transient_trainer.py:225-248)
            inner_opt.zero_grad()
            q_loss, _, _ = fwd(q)
            (q_loss / K_TASKS).backward()
            for n, p in torch_model.named_parameters():
                if p.grad is not None:
                    acc[n] = acc[n] + p.grad.detach().clone()
            torch_model.load_state_dict(weights_original)
        outer_opt.zero_grad()
        for n, p in torch_model.named_parameters():
            if isinstance(acc[n], torch.Tensor):
                p.grad = acc[n]
        outer_opt.step()

        if it % args.eval_every == 0 or it == args.max_iters:
            wall = time.perf_counter() - t0 - eval_spent
            e0 = time.perf_counter()
            cer = score()
            eval_spent += time.perf_counter() - e0
            curve.append({"iter": it, "wall_s": round(wall, 2),
                          "cer": round(float(cer), 4)})
            print(f"[torch] iter {it} wall {wall:.1f}s cer {cer:.3f}",
                  flush=True)
            if cer <= args.target_cer:
                break
        if time.perf_counter() - t0 - eval_spent > args.torch_max_seconds:
            print("[torch] time budget exhausted", flush=True)
            break
    return curve


def summarize(curve, target):
    hit = next((p for p in curve if p["cer"] <= target), None)
    return {
        "curve": curve,
        "reached_target": hit is not None,
        "iters_to_target": hit["iter"] if hit else None,
        "wall_s_to_target": hit["wall_s"] if hit else None,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-iters", type=int, default=300)
    ap.add_argument("--eval-every", type=int, default=20)
    ap.add_argument("--target-cer", type=float, default=0.20)
    ap.add_argument("--torch-max-seconds", type=float, default=2400.0)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    ap.add_argument("--scale", type=int, default=1,
                    help="model-width multiplier (2 = d_model 128 etc.) for "
                         "a second matched-CER data point at larger scale")
    ap.add_argument("--utts-per-task", type=int, default=8)
    ap.add_argument("--max-sec", type=float, default=0.6,
                    help="longest utterance; raise toward real speech "
                         "lengths for the at-scale data point")
    ap.add_argument("--max-chars", type=int, default=8)
    ap.add_argument("--flagship", action="store_true",
                    help="use the flagship geometry (2 enc/4 dec, d=512) "
                         "instead of the width-multiplied tiny stack")
    ap.add_argument("--teacher-forced", action="store_true",
                    help="score teacher-forced CER (round-2 protocol) "
                         "instead of free-running greedy decode CER")
    ap.add_argument("--decode-steps", type=int, default=0,
                    help="decode horizon for both frameworks (0 = max "
                         "transcript length + 2)")
    args = ap.parse_args()

    num_labels_cfg = tiny_cfg(0)
    tasks, vocab, t_max, l_max = build_data(
        num_labels_cfg, utts_per_task=args.utts_per_task,
        max_sec=args.max_sec, max_chars=args.max_chars)
    cfg = tiny_cfg(vocab.size, scale=args.scale, flagship=args.flagship)
    cfg.model.tgt_max_len = max(cfg.model.tgt_max_len, l_max + 2)

    utt_per_iter = K_TASKS * K_TRAIN + K_VALID
    out = {"protocol": {
        "scale": "flagship" if args.flagship else args.scale,
        "utts_per_task": args.utts_per_task, "max_sec": args.max_sec,
        "max_chars": args.max_chars,
        "k_tasks": K_TASKS, "k_train": K_TRAIN, "k_valid": K_VALID,
        "inner_lr": INNER_LR, "meta_lr": META_LR,
        "utt_per_iter": utt_per_iter, "target_cer": args.target_cer,
        "same_init": True, "same_batches": True,
        "cer_metric": ("teacher_forced" if args.teacher_forced
                       else "greedy_decode"),
        "features": "precomputed once, identical arrays, excluded from "
                    "both timings; eval wall time excluded from curves",
    }}

    init_params = None
    if not args.skip_tpu:
        init_params, curve, beam_rtf = run_tpu(cfg, vocab, tasks, t_max,
                                               l_max, args)
        s = summarize(curve, args.target_cer)
        if s["wall_s_to_target"]:
            s["utt_per_sec"] = round(
                s["iters_to_target"] * utt_per_iter / s["wall_s_to_target"],
                2)
        if beam_rtf is not None:
            s["beam_rtf_at_parity"] = round(beam_rtf, 1)
        out["mtl_tpu"] = s
        np.save("/tmp/cer_init_params.npy",
                np.asarray([init_params], dtype=object), allow_pickle=True)
    if not args.skip_torch:
        if init_params is None:
            init_params = np.load("/tmp/cer_init_params.npy",
                                  allow_pickle=True)[0]
        curve = run_torch(cfg, vocab, tasks, t_max, l_max, init_params, args)
        s = summarize(curve, args.target_cer)
        if s["wall_s_to_target"]:
            s["utt_per_sec"] = round(
                s["iters_to_target"] * utt_per_iter / s["wall_s_to_target"],
                2)
        out["torch_reference_cpu"] = s

    print(json.dumps(out))
    # Persist keyed by scale so bench.py can report the measured speedup with
    # provenance instead of a pasted constant (ADVICE r2).
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "matched_cer_results.json")
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    key = "flagship" if args.flagship else f"scale_{args.scale}"
    if (args.utts_per_task, args.max_sec) != (8, 0.6):
        key += f"_u{args.utts_per_task}_s{args.max_sec:g}"
    # merge per side: --skip-torch / --skip-tpu runs measure one framework
    # each and must not clobber the other's half of the entry
    merged = results.get(key, {})
    merged.update(out)
    results[key] = merged
    with open(path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
