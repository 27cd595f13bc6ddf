"""LM training / evaluation loops (plain, joint-ratio, meta-transfer).

Parity targets:
* plain epoch training — lm/main.py:244-321: bptt windows, hidden state
  carried across windows within an epoch and detached per window
  ("repackage"), per-window SGD(lr) with grad clipping, lr/4 anneal on
  validation plateau, patience 5;
* joint — lm/main_joint.py:321-327: per-iteration weighted sum over tasks,
  tasks 0..K-2 weighted (1-ratio)/(K-1), last (code-switched) task weighted
  ratio;
* meta-transfer — lm/main_meta_transfer.py:277-411: per iteration: per task —
  inner SGD step at lr/meta_lr_factor on the task window, query loss on the
  LAST task's (SEAME) window weighted by the joint ratios, weight reset —
  then one outer SGD(lr) step on the summed query loss (first-order: torch's
  graph never flows through inner_opt.step);
* evaluation — lm/test.py:189-368: length-weighted CE -> perplexity, plus the
  code-switch transition breakdown (en->en / en->zh / zh->en / zh->zh token
  losses, skipping <eos> pairs). NOTE the reference's bucket NAMES are
  swapped (True==Chinese fills its "en_en" bucket, lm/test.py:269-312); we
  use correct names.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .data import Corpus, LMDataset, batchify, get_batch
from .model import RNNLM


def make_lm_loss(model: RNNLM):
    def loss_fn(params, data, target, rng=None, deterministic=True,
                carry=None):
        rngs = {"dropout": rng} if rng is not None else None
        logits, new_carry = model.apply(params, jnp.asarray(data), carry,
                                        deterministic=deterministic,
                                        rngs=rngs)
        t, b, v = logits.shape
        flat = logits.reshape(t * b, v)
        tgt = jnp.asarray(target).reshape(-1)
        lp = jax.nn.log_softmax(flat, -1)
        loss = -jnp.mean(jnp.take_along_axis(lp, tgt[:, None], 1))
        return loss, new_carry

    return loss_fn


def make_lm_sgd_step(model: RNNLM, clip: float):
    """One bptt-window SGD step (lm/main.py:256-275), lr as an argument so
    annealing doesn't recompile. The hidden state is carried across windows
    within an epoch and detached per window ("repackage_hidden",
    lm/main.py:157-163)."""
    loss_fn = make_lm_loss(model)

    @jax.jit
    def step(params, data, target, lr, rng, carry):
        (loss, new_carry), grads = jax.value_and_grad(
            lambda p: loss_fn(p, data, target, rng, False, carry),
            has_aux=True,
        )(params)
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        params = jax.tree.map(lambda p, g: p - lr * scale * g, params, grads)
        # detach: the carry re-enters the next step as a constant
        new_carry = jax.lax.stop_gradient(new_carry)
        return params, loss, new_carry

    return step


def make_lm_joint_step(model: RNNLM, clip: float, ratios: Sequence[float]):
    """Ratio-weighted multi-task step (lm/main_joint.py:321-327)."""
    loss_fn = make_lm_loss(model)
    ratios = jnp.asarray(ratios)

    @jax.jit
    def step(params, datas, targets, lr, rng):
        # datas/targets: [K, T, B] / [K, T*B]
        rngs = jax.random.split(rng, datas.shape[0])

        def total_fn(p):
            losses = jax.vmap(
                lambda d, t, r: loss_fn(p, d, t, r, False)[0],
                in_axes=(0, 0, 0),
            )(datas, targets, rngs)
            return jnp.sum(losses * ratios), losses

        (total, losses), grads = jax.value_and_grad(total_fn, has_aux=True)(
            params
        )
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        params = jax.tree.map(lambda p, g: p - lr * scale * g, params, grads)
        return params, total, losses

    return step


def make_lm_meta_step(model: RNNLM, clip: float, ratios: Sequence[float],
                      meta_lr_factor: float, second_order: bool = False):
    """Meta-transfer step (lm/main_meta_transfer.py:299-368):
    outer_grad = d/dp sum_k ratio_k * L_query(p - (lr/meta_lr_factor)
                 * clip(dL_task_k/dp))."""
    loss_fn = make_lm_loss(model)
    ratios = jnp.asarray(ratios)

    @jax.jit
    def step(params, datas, targets, q_data, q_target, lr, rng):
        inner_lr = lr / meta_lr_factor
        rngs = jax.random.split(rng, datas.shape[0] + 1)

        def task_outer(p, d, t, r):
            g = jax.grad(lambda q: loss_fn(q, d, t, r, False)[0])(p)
            gnorm = optax.global_norm(g)
            s = jnp.minimum(1.0, clip / (gnorm + 1e-6))
            g = jax.tree.map(lambda x: x * s, g)
            if not second_order:
                g = jax.lax.stop_gradient(g)
            adapted = jax.tree.map(lambda w, gw: w - inner_lr * gw, p, g)
            return loss_fn(adapted, q_data, q_target, rngs[-1], False)[0]

        def outer(p):
            q_losses = jax.vmap(task_outer, in_axes=(None, 0, 0, 0))(
                p, datas, targets, rngs[:-1]
            )
            return jnp.sum(q_losses * ratios), q_losses

        (total, q_losses), grads = jax.value_and_grad(outer, has_aux=True)(
            params
        )
        gnorm = optax.global_norm(grads)
        scale = jnp.minimum(1.0, clip / (gnorm + 1e-6))
        params = jax.tree.map(lambda p, g: p - lr * scale * g, params, grads)
        return params, total, q_losses

    return step


def make_lm_eval_step(model: RNNLM):
    @jax.jit
    def step(params, data, target, carry):
        logits, carry = model.apply(params, jnp.asarray(data), carry,
                                    deterministic=True)
        t, b, v = logits.shape
        lp = jax.nn.log_softmax(logits.reshape(t * b, v), -1)
        tok_loss = -jnp.take_along_axis(
            lp, jnp.asarray(target).reshape(-1)[:, None], 1
        )[:, 0]
        return jnp.mean(tok_loss), tok_loss, carry

    return step


def evaluate_lm(model: RNNLM, params, stream: np.ndarray, bptt: int,
                eval_batch_size: int = 10) -> float:
    """Length-weighted average CE over the batchified token stream
    (lm/main.py:189-241; eval_batch_size=10 at lm/main.py:122)."""
    eval_batch_size = min(eval_batch_size, max(1, len(stream) // (bptt + 1)))
    source = batchify(np.asarray(stream).reshape(-1), eval_batch_size)
    eval_step = make_lm_eval_step(model)
    carry = model.apply(params, eval_batch_size,
                        method=RNNLM.init_carry)
    total_loss, total_len = 0.0, len(source)
    i = 0
    while i < len(source) - 1:
        data, target = get_batch(source, i, bptt)
        if data.shape[0] != bptt:
            # final ragged window: pad to bptt and weight by true length
            pad = bptt - data.shape[0]
            b = data.shape[1]
            data_p = np.concatenate([data, np.zeros((pad, b), data.dtype)])
            tgt_p = np.concatenate(
                [target.reshape(-1, b),
                 np.zeros((pad, b), target.dtype)]
            ).reshape(-1)
            _, tok_loss, carry = eval_step(params, data_p, tgt_p, carry)
            tok_loss = np.asarray(tok_loss).reshape(bptt, b)[: data.shape[0]]
            total_loss += float(tok_loss.mean()) * data.shape[0]
        else:
            loss, _, carry = eval_step(params, data, target, carry)
            total_loss += float(loss) * data.shape[0]
        i += bptt
    return total_loss / max(total_len, 1)


def evaluate_lm_test(model: RNNLM, params, source: np.ndarray,
                     idx2word: dict, bptt: int,
                     dump_path: Optional[str] = None) -> dict:
    """Perplexity + code-switch transition breakdown (batch_size=1 like the
    reference's test path).

    ``dump_path``: write the reference test loop's per-word probability file
    (lm/main.py:217-250: one ``word\\tnext\\tp(next)\\tlogp(next)`` line per
    position, blank line per stream)."""
    from ..utils.metrics import is_contain_chinese_word

    eval_step = make_lm_eval_step(model)
    data_source = source.reshape(-1, 1)  # eval bs 1 over the raw stream
    carry = model.apply(params, 1, method=RNNLM.init_carry)
    total_loss = 0.0
    buckets = {"en_en": [0.0, 0], "en_zh": [0.0, 0],
               "zh_en": [0.0, 0], "zh_zh": [0.0, 0]}
    dump = open(dump_path, "w", encoding="utf-8") if dump_path else None
    i = 0
    n = len(data_source)
    while i < n - 1:
        data, target = get_batch(data_source, i, bptt)
        loss, tok_loss, carry = eval_step(params, data, target, carry)
        total_loss += float(loss) * data.shape[0]
        tok_loss = np.asarray(tok_loss)
        for j in range(data.shape[0]):
            sw = idx2word[int(data[j, 0])]
            tw = idx2word[int(target[j])]
            if dump is not None:
                # tok_loss[j] = -logp(target_j) -> the reference's
                # word_val / word_val_log pair (lm/main.py:223-234)
                logp = -float(tok_loss[j])
                dump.write(f"{sw}\t{tw}\t{math.exp(logp)}\t{logp}\n")
            if sw == "<eos>" or tw == "<eos>":
                continue
            key = ("zh" if is_contain_chinese_word(sw) else "en") + "_" + (
                "zh" if is_contain_chinese_word(tw) else "en"
            )
            buckets[key][0] += float(tok_loss[j])
            buckets[key][1] += 1
        i += bptt
    if dump is not None:
        dump.write("\n")
        dump.close()
    out = {"loss": total_loss / max(n, 1)}
    out["ppl"] = math.exp(out["loss"])
    for k, (s, c) in buckets.items():
        out[f"{k}_loss"] = s / max(c, 1)
        out[f"{k}_ppl"] = math.exp(s / max(c, 1)) if c else float("nan")
        out[f"{k}_count"] = c
    cs_s = buckets["en_zh"][0] + buckets["zh_en"][0]
    cs_c = buckets["en_zh"][1] + buckets["zh_en"][1]
    out["cs_loss"] = cs_s / max(cs_c, 1)
    out["cs_ppl"] = math.exp(out["cs_loss"]) if cs_c else float("nan")
    return out


def joint_ratios(num_tasks: int, ratio: float) -> List[float]:
    """lm/main_joint.py:321-327: last task gets ``ratio``, the rest split
    (1-ratio) evenly."""
    if num_tasks == 1:
        return [1.0]
    return [(1.0 - ratio) / (num_tasks - 1)] * (num_tasks - 1) + [ratio]
