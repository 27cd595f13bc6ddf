"""Per-iteration divergence diagnostic for the matched-ppl protocol.

Runs the mtl_tpu jitted LM meta step and the reference-semantics torch loop
side by side on IDENTICAL windows from the SAME init (the bench config:
lr=5, clip=0.25) and prints, after every iteration, each side's valid ppl
(both measured with the same torch evaluator on transplanted weights) plus
the effective-parameter distance (torch b_ih+b_hh folded to one bias).

This is the tool that caught the round-5 shared-init violation in
bench_matched_ppl.py (torch received TRAINED params as its "init"): with
the init actually shared, the two frameworks track at ~1% relative param
distance with near-identical ppl curves — the recorded 30-iteration torch
convergence was impossible. Kept as a standing diagnostic: re-run it
whenever the two sides' recorded trajectories diverge by more than ~2x in
iterations-to-target."""
import math
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from bench_matched_ppl import (ARCH, BPTT, CLIP, K_TASKS, LR,
                               META_LR_FACTOR, RATIO, build_data,
                               sample_iter, torch_evaluate)
import jax
import jax.numpy as jnp
import torch

from mtl_tpu.lm.model import RNNLM
from mtl_tpu.lm.train import evaluate_lm, joint_ratios, make_lm_meta_step
from mtl_tpu.parity.torch_ref import (rnnlm_to_torch_state,
                                      stub_missing_native_deps)

stub_missing_native_deps()
sys.path.append("/root/reference/lm")
from model.rnn_model import RNNModel

corpora, dictionary, ds, target_valid = build_data()
ntokens = len(dictionary)

model = RNNLM(ntoken=ntokens, **ARCH)
params = model.init(jax.random.PRNGKey(3), jnp.zeros((2, 1), jnp.int32))
ratios = joint_ratios(K_TASKS, RATIO)
step = make_lm_meta_step(model, CLIP, ratios, META_LR_FACTOR)
rng = jax.random.PRNGKey(0)

tm = RNNModel(ARCH["rnn_type"], ntokens, ARCH["ninp"], ARCH["nhid"],
              ARCH["nlayers"], dropout=0.0, tie_weights=False)
tm.load_state_dict(rnnlm_to_torch_state(params, ARCH["nlayers"]))
tm.train()
crit = torch.nn.CrossEntropyLoss()
from copy import deepcopy


def ce(data, target):
    hidden = tm.init_hidden(data.shape[1])
    out, _ = tm(torch.from_numpy(data.copy()).long(), hidden)
    return crit(out.view(-1, ntokens),
                torch.from_numpy(target.copy()).long())


def torch_iter(datas, targets, q_data, q_target):
    weights_original = deepcopy(tm.state_dict())
    acc = {n: torch.zeros_like(p) for n, p in tm.named_parameters()}
    for i in range(K_TASKS):
        tm.zero_grad()
        ce(datas[i], targets[i]).backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
        torch.optim.SGD(tm.parameters(), lr=LR / META_LR_FACTOR).step()
        tm.zero_grad()
        (ce(q_data, q_target) * ratios[i]).backward()
        for n, p in tm.named_parameters():
            acc[n] += p.grad.detach()
        tm.load_state_dict(weights_original)
    tm.zero_grad()
    for n, p in tm.named_parameters():
        p.grad = acc[n]
    torch.nn.utils.clip_grad_norm_(tm.parameters(), CLIP)
    torch.optim.SGD(tm.parameters(), lr=LR).step()


def eval_torch_of(state_dict):
    probe = RNNModel(ARCH["rnn_type"], ntokens, ARCH["ninp"], ARCH["nhid"],
                     ARCH["nlayers"], dropout=0.0, tie_weights=False)
    probe.load_state_dict(state_dict)
    probe.eval()
    return torch_evaluate(probe, target_valid, ntokens)


def effective(sd):
    """Flatten torch state with b_ih+b_hh folded (the effective bias)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("rnn.bias_ih"):
            continue
        if k.startswith("rnn.bias_hh"):
            ih = sd[k.replace("bias_hh", "bias_ih")]
            out[k] = (v + ih).detach().numpy()
        else:
            out[k] = v.detach().numpy()
    return out


print(f"init ppl torch-eval {math.exp(eval_torch_of(tm.state_dict())):.2f} "
      f"mtl-eval {math.exp(evaluate_lm(model, params, target_valid, BPTT)):.2f}")

for it in range(10):
    datas, targets, q_data, q_target = sample_iter(ds, it)
    rng, sub = jax.random.split(rng)
    params, total, _ = step(params, jnp.asarray(datas), jnp.asarray(targets),
                            jnp.asarray(q_data), jnp.asarray(q_target),
                            LR, sub)
    torch_iter(datas, targets, q_data, q_target)

    ours_sd = rnnlm_to_torch_state(params, ARCH["nlayers"])
    ppl_ours_torcheval = math.exp(min(eval_torch_of(ours_sd), 30))
    ppl_ours_mtleval = math.exp(
        min(evaluate_lm(model, params, target_valid, BPTT), 30))
    ppl_torch = math.exp(min(eval_torch_of(tm.state_dict()), 30))

    a, b = effective(ours_sd), effective(tm.state_dict())
    dist = math.sqrt(sum(float(((a[k] - b[k]) ** 2).sum()) for k in a))
    norm = math.sqrt(sum(float((b[k] ** 2).sum()) for k in b))
    print(f"it {it+1}: ppl ours {ppl_ours_torcheval:.2f} "
          f"(mtl-eval {ppl_ours_mtleval:.2f})  torch {ppl_torch:.2f}  "
          f"param dist {dist:.4f} (rel {dist/norm:.4f})", flush=True)
