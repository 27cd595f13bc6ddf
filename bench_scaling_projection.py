#!/usr/bin/env python
"""Project v5e-8 scaling for the flagship meta-transfer step from the
compiled SHARDED HLO (north-star analysis — multi-chip hardware is not
reachable from this environment, so the 8-chip number is *bounded on paper*
from first principles instead of measured).

Method
------
1. jit-compile the EXACT product meta step (make_meta_step, flagship config,
   3 tasks x (8+8) utts of ~8 s) over an 8-device (task=1, data=8) mesh with
   the trainers' shardings (params replicated, batches sharded over data) on
   the virtual CPU platform — the SPMD partitioner and the collectives it
   inserts are backend-independent.
2. Parse every collective out of the compiled HLO: op kind, element type,
   shape, replica groups -> exact bytes moved per step.
3. Cost the collectives on v5e ICI (ring all-reduce: each chip sends+receives
   2*(N-1)/N * B bytes) and combine with the MEASURED single-chip step time
   (82.6 ms, BENCH_r02) into projected per-chip efficiency and utt/s for
   weak scaling (per-chip batch held at the measured size — the production
   regime) and strong scaling (global batch held).

Run tunnel-free:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python bench_scaling_projection.py
"""

from __future__ import annotations

import json
import os
import re
import sys

# Self-sanitize by RE-EXEC: sitecustomize registers the axon PJRT plugin at
# interpreter startup (before this script runs), so popping the env var here
# is too late — a fresh child process with the var absent is the only way to
# keep a hung tunnel out of this backend-independent analysis.
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS")
    os.execve(sys.executable, [sys.executable] + sys.argv, env)
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
          if "host_platform_device_count" not in f]
os.environ["XLA_FLAGS"] = " ".join(
    _flags + ["--xla_force_host_platform_device_count=8"])

import numpy as np  # noqa: E402

from __graft_entry__ import host_cache_dir  # noqa: E402

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", host_cache_dir())
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

N_DEVICES = 8
UTT_PER_STEP = 48

# Per-lowering measured single-chip step times (ms, flagship shapes: 3 tasks
# x (8 support + 8 query) utts of ~8 s). Primary source: measured_steps.json,
# written by `bench.py` (each driver bench run refreshes vmap_fo/scan_fo;
# `bench.py --variants` adds the second-order rows). The fallbacks are the
# last recorded live-TPU measurements — every projection row states which
# source anchored it, so a projection can never silently mix lowerings again
# (VERDICT r4 weak #2).
FALLBACK_STEP_MS = {
    "vmap_fo_ms": 82.6,   # BENCH_r02, re-verified r3/r4
    "scan_fo_ms": None,   # must be measured (bench.py writes it)
    "vmap_so_ms": 158.3,  # round-2 second-order measurement (encoder remat)
    "scan_so_ms": None,
}


def measured_step_ms():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "measured_steps.json")
    out = dict(FALLBACK_STEP_MS)
    source = {k: ("fallback (BASELINE.md)" if v is not None else "missing")
              for k, v in out.items()}
    if os.path.exists(path):
        with open(path) as f:
            rec = json.load(f)
        for k in FALLBACK_STEP_MS:
            if rec.get(k):
                out[k] = rec[k]
                source[k] = f"measured_steps.json ({rec.get('measured_at')})"
    return out, source

# v5e ICI: 4 links/chip x 400 Gbps signaling = 1600 Gbps/chip aggregate
# (public spec). One-way per-chip payload bandwidth used here:
#   conservative 100 GB/s, optimistic 186 GB/s (marketing aggregate /2,
#   minus protocol overhead ~7%).
ICI_GBPS = {"conservative": 100e9, "optimistic": 186e9}

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "c64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO shape string (handles tuples)."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collect_collectives(hlo_text: str):
    """Every collective op in the compiled (post-SPMD) HLO with its payload
    bytes. Scans line by line — compiled flagship HLO is tens of MB."""
    out = []
    op_re = re.compile(
        r"^\s*(?:ROOT\s+)?%?\S+ = (\([^)]*\)|\S+) "
        r"(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)(?:-start|-done)?\(")
    for line in hlo_text.splitlines():
        m = op_re.match(line)
        if not m:
            continue
        shape_str, kind = m.group(1), m.group(2)
        if "-done(" in line:
            continue  # counted at -start
        out.append({"kind": kind, "bytes": _shape_bytes(shape_str),
                    "shape": shape_str.strip("()")[:120]})
    return out


def build_compiled(scan_tasks: bool, second_order: bool = False):
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from __graft_entry__ import _flagship_cfg
    from bench import FRAMES, K_TASKS, K_TRAIN, K_VALID, TGT_LEN, VOCAB_SIZE
    from bench import make_batches
    from mtl_tpu.models.transformer import build_model
    from mtl_tpu.train.steps import init_train_state, make_meta_step

    cfg = _flagship_cfg()
    if second_order:
        # match bench.py's measured second-order configuration
        cfg.train.second_order = True
        cfg.model.remat = True
    model = build_model(cfg, VOCAB_SIZE)
    outer_opt = optax.adam(cfg.train.meta_lr)
    step = make_meta_step(model, cfg, outer_opt, scan_tasks=scan_tasks)

    devices = jax.devices("cpu")[:N_DEVICES]
    mesh = Mesh(np.asarray(devices).reshape(1, N_DEVICES, 1),
                ("task", "data", "model"))

    support, query = make_batches(cfg)
    print(f"building flagship state (params init) ...", flush=True)
    ex = {k: np.asarray(v[0]) for k, v in support.items()}
    state = init_train_state(model, cfg, outer_opt, jax.random.PRNGKey(0),
                             jax.tree.map(jnp.asarray, ex))
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))

    # the trainers' placements: state replicated, support [K over task, B
    # over data], query [B over data] (mtl_tpu/parallel/mesh.py)
    def sds(x, spec):
        return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype,
                                    sharding=NamedSharding(mesh, spec))

    state_s = jax.tree.map(lambda x: sds(x, P()), state)
    support_s = jax.tree.map(lambda x: sds(x, P("task", "data")), support)
    query_s = jax.tree.map(lambda x: sds(x, P("data")), query)
    rng_s = sds(np.zeros((2,), np.uint32), P())

    print(f"lowering + SPMD-compiling the sharded flagship step "
          f"(scan_tasks={scan_tasks}) ...", flush=True)
    compiled = step.lower(state_s, support_s, query_s, rng_s).compile()
    return compiled, n_params


# per-chip bytes-on-the-wire factor for each collective kind (ring algos):
# all-reduce moves 2(N-1)/N * payload, gather/scatter variants (N-1)/N.
def _wire_factor(kind: str, n: int) -> float:
    if kind == "all-reduce":
        return 2 * (n - 1) / n
    return (n - 1) / n


def analyze(scan_tasks: bool, second_order: bool, step_ms: float,
            step_ms_source: str):
    compiled, n_params = build_compiled(scan_tasks, second_order)
    hlo = compiled.as_text()
    cols = collect_collectives(hlo)
    by_kind = {}
    for c in cols:
        by_kind.setdefault(c["kind"], [0, 0])
        by_kind[c["kind"]][0] += 1
        by_kind[c["kind"]][1] += c["bytes"]
    n = N_DEVICES
    wire_bytes = sum(_wire_factor(c["kind"], n) * c["bytes"] for c in cols)
    variant = {
        "measured_step_ms": step_ms,
        "step_ms_source": step_ms_source,
        "hlo_collectives": {k: {"count": v[0], "payload_bytes": v[1]}
                            for k, v in sorted(by_kind.items())},
        "hlo_total_payload_bytes": sum(c["bytes"] for c in cols),
        "wire_bytes_per_chip": int(wire_bytes),
        "projection": {},
        "top_collectives": [
            f"{c['kind']} {c['bytes'] / 1e6:.2f} MB {c['shape']}"
            for c in sorted(cols, key=lambda c: -c["bytes"])[:6]
        ],
    }
    if step_ms is None:
        variant["projection"] = (
            "no measured single-chip step for this lowering — run "
            "`python bench.py --variants` on the TPU; collective bytes "
            "above are still exact")
        return variant, n_params
    for name, bw in ICI_GBPS.items():
        comm_ms = wire_bytes / bw * 1e3
        weak_step = step_ms + comm_ms  # no compute/comm overlap
        weak_eff = step_ms / weak_step
        strong_step = step_ms / n + comm_ms
        variant["projection"][name] = {
            "ici_oneway_bytes_per_s": bw,
            "comm_ms": round(comm_ms, 2),
            "weak_scaling": {
                "step_ms": round(weak_step, 2),
                "efficiency": round(weak_eff, 4),
                "utt_per_s_total": round(
                    n * UTT_PER_STEP / weak_step * 1e3, 1),
                "utt_per_s_per_chip": round(
                    UTT_PER_STEP / weak_step * 1e3, 1),
            },
            "strong_scaling": {
                "step_ms": round(strong_step, 2),
                "speedup_vs_1chip": round(step_ms / strong_step, 2),
            },
        }
    return variant, n_params


# variant key -> (scan_tasks, second_order, measured-anchor key)
VARIANTS = {
    "vmap_tasks": (False, False, "vmap_fo_ms"),
    "scan_tasks": (True, False, "scan_fo_ms"),
    "vmap_tasks_second_order": (False, True, "vmap_so_ms"),
    "scan_tasks_second_order": (True, True, "scan_so_ms"),
}


def _part_path(key: str) -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f".projection_{key}.part.json")


def run_one(key: str) -> None:
    """Child mode: analyze ONE variant and persist a partial result.

    Isolation matters: the vmap second-order variant ABORTS the XLA SPMD
    partitioner itself (convolution_handler.cc:983 `Check failed:
    new_input_batch_size % new_output_batch_size == 0` while partitioning
    the grad of the feature-group query conv) — a C++ CHECK, not a Python
    exception, so it must not take the other variants' results with it."""
    anchors, sources = measured_step_ms()
    scan, so, anchor = VARIANTS[key]
    variant, n_params = analyze(scan, so, anchors[anchor], sources[anchor])
    variant["params"] = n_params
    with open(_part_path(key), "w") as f:
        json.dump(variant, f, indent=1)
    print(f"{key}: wire {variant['wire_bytes_per_chip']/1e6:.1f} MB/chip"
          f" (anchor {anchors[anchor]} ms, {sources[anchor]})", flush=True)


def main():
    import subprocess

    anchors, _ = measured_step_ms()
    report = {
        "n_devices": N_DEVICES,
        "step_ms_anchors": anchors,
        "variants": {},
    }
    for key in VARIANTS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", key],
            env=os.environ, timeout=3600,
        )
        part = _part_path(key)
        if proc.returncode == 0 and os.path.exists(part):
            with open(part) as f:
                variant = json.load(f)
            report["params"] = variant.pop("params", None)
            if report.get("params"):
                report["outer_grad_bytes_expected"] = report["params"] * 4
            report["variants"][key] = variant
            os.remove(part)
        else:
            # the one known aborter: vmap second-order (see run_one). A
            # structured record beats a silent hole — this IS the result:
            # the data-mesh second-order path must be the scan lowering.
            report["variants"][key] = {
                "error": ("XLA SPMD partitioner hard-abort (rc="
                          f"{proc.returncode}): convolution_handler.cc "
                          "Check failed while partitioning the vmapped "
                          "feature-group conv gradient — this lowering "
                          "cannot be compiled for a data-sharded mesh; "
                          "use scan_tasks (the trainer's auto-select)."),
            }
            print(f"{key}: partitioner abort rc={proc.returncode} "
                  f"(recorded)", flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scaling_projection.json")
    print(json.dumps(report, indent=1))
    with open(path, "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    if "--one" in sys.argv:
        run_one(sys.argv[sys.argv.index("--one") + 1])
    else:
        main()
