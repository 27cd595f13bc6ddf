#!/usr/bin/env python
"""Benchmark: flagship meta-transfer training-step throughput on TPU.

Prints ONE JSON line (always — never a bare traceback):
  {"metric": "meta_train_utt_per_sec_per_chip", "value": N,
   "unit": "utt/s/chip", "vs_baseline": R}
or, when the TPU backend is unreachable after retries,
  {"error": "...", "last_measured": {...}}           (exit code 0)

The measured step is the full meta-transfer iteration of BASELINE.json
configs[2] (3 language tasks, k_train=k_valid=8, vgg_cnn 2-enc/4-dec d=512
Transformer, CE loss) INCLUDING the on-device log-spectrogram front-end —
i.e. everything the reference does per iteration (transient_trainer.py
:150-255: 3x support fwd+bwd + inner SGD + 3x query fwd+bwd + outer Adam)
except host-side CER string scoring.

Utterances/iteration = K*(k_train + k_valid) = 48, matching how the PyTorch
reference consumes data per iteration.

``vs_baseline`` compares against the PyTorch reference-equivalent iteration
measured by bench_baseline_torch.py on this host (value recorded below). Run
with --torch-baseline to re-measure.

Robustness (round-3 post-mortem — BENCH_r03 died rc=1 at the first
device_put when the axon tunnel was hung): the TPU backend is PREFLIGHTED in
a killable subprocess (a hung axon PJRT plugin blocks jax.devices() forever
in-process; only a subprocess deadline can catch it), retried with backoff,
and the measurement itself runs in a subprocess under a deadline. Every
failure path emits the structured error JSON above and exits 0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# Persistent compile cache: the flagship step takes minutes to compile cold;
# repeated driver runs on this host reuse the cache. (TPU cache entries are
# host-independent — the CPU-AOT poisoning issue only affects JAX_PLATFORMS=
# cpu runs, which use the host-fingerprinted dir from __graft_entry__.)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")

_HERE = os.path.dirname(os.path.abspath(__file__))
LAST_GOOD_PATH = os.path.join(_HERE, "bench_last_good.json")

# Deadlines/retries (env-overridable so tests can exercise the error path
# quickly). Worst-case wall before giving up: ~3*120s probes + 30+60s backoff.
PREFLIGHT_TIMEOUT_S = int(os.environ.get("MTL_BENCH_PREFLIGHT_S", "120"))
PREFLIGHT_ATTEMPTS = int(os.environ.get("MTL_BENCH_PREFLIGHT_ATTEMPTS", "3"))
PREFLIGHT_BACKOFF_S = float(os.environ.get("MTL_BENCH_BACKOFF_S", "30"))
# Cold compile of the flagship step through the tunnel can take 5-15 min.
MEASURE_TIMEOUT_S = int(os.environ.get("MTL_BENCH_MEASURE_TIMEOUT_S", "2400"))

# Measured by bench_baseline_torch.py (same shapes, same per-iteration work,
# torch CPU on this host, 2026-08: 83.27 s/iter; see BASELINE.md for
# provenance — CPU-vs-TPU caveat applies). utt/s.
TORCH_CPU_BASELINE_UTT_PER_SEC = 0.576


def _warn(msg: str) -> None:
    print(f"bench WARNING: {msg}", file=sys.stderr, flush=True)


def matched_cer_speedups():
    """Measured matched-CER speedups from bench_matched_cer.py's persisted
    results (one entry per --scale); {} when that bench hasn't run here.
    Warns (never silently) when a metric is omitted — VERDICT r4 #2."""
    path = os.path.join(_HERE, "matched_cer_results.json")
    if not os.path.exists(path):
        _warn("omitting matched_cer_speedup_vs_reference_cpu "
              "(matched_cer_results.json not present — run "
              "bench_matched_cer.py)")
        return {}
    with open(path) as f:
        results = json.load(f)
    out = {}
    for scale, r in sorted(results.items()):
        tpu = r.get("mtl_tpu", {}).get("utt_per_sec")
        ref = r.get("torch_reference_cpu", {}).get("utt_per_sec")
        if tpu and ref:
            out[scale] = round(tpu / ref, 1)
        else:
            _warn(f"matched_cer_results.json[{scale!r}]: "
                  f"{'mtl_tpu' if not tpu else 'torch_reference_cpu'} side "
                  f"has no utt_per_sec — omitting that scale")
    return out


def matched_ppl_speedup():
    """Measured matched-perplexity LM speedup (bench_matched_ppl.py's
    persisted result); None when that bench hasn't run here. Warns (never
    silently) when the metric is omitted — VERDICT r4 #2 flagged exactly
    this silent omission."""
    path = os.path.join(_HERE, "matched_ppl_results.json")
    if not os.path.exists(path):
        _warn("omitting matched_ppl_lm_speedup_vs_reference_cpu "
              "(matched_ppl_results.json not present — run "
              "bench_matched_ppl.py)")
        return None
    with open(path) as f:
        r = json.load(f).get("default", {})
    tpu = r.get("mtl_tpu", {}).get("wall_s_to_target")
    ref = r.get("torch_reference_cpu", {}).get("wall_s_to_target")
    if tpu and ref:
        return round(ref / tpu, 1)
    missing = [side for side, v in
               (("mtl_tpu", tpu), ("torch_reference_cpu", ref)) if not v]
    _warn(f"omitting matched_ppl_lm_speedup_vs_reference_cpu "
          f"({' and '.join(missing)} side(s) of matched_ppl_results.json "
          f"have no wall_s_to_target — run bench_matched_ppl.py)")
    return None

K_TASKS = 3
K_TRAIN = 8
K_VALID = 8
FRAMES = 800  # ~8s utterances at 10ms hop
TGT_LEN = 64
VOCAB_SIZE = 3765  # hkust+seame character inventory (+4 specials)


def make_batches(cfg, seed=0):
    import numpy as np

    from __graft_entry__ import _synthetic_batch

    support = {
        k: np.stack([
            _synthetic_batch(cfg, K_TRAIN, FRAMES, TGT_LEN, VOCAB_SIZE,
                             seed=seed + i)[k]
            for i in range(K_TASKS)
        ])
        for k in ("audio", "audio_lengths", "targets", "src_percentages")
    }
    query = _synthetic_batch(cfg, K_VALID, FRAMES, TGT_LEN, VOCAB_SIZE,
                             seed=seed + 100)
    return support, query


def run_tpu_bench(num_iters=20, warmup=3, scan_tasks=False,
                  second_order=False):
    """Time the flagship meta step under the chosen task-loop lowering.

    ``scan_tasks``: the lax.scan-over-tasks lowering the trainer auto-selects
    on data-sharded meshes (train/steps.py:outer_grads_fo_scan) — measuring
    it single-chip anchors the 8-chip projection on the lowering that
    actually ships there (VERDICT r4 #2). ``second_order``: grad-through-
    inner-SGD (stretch configs[4] training mode), encoder remat on (the
    round-2 measured configuration)."""
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _flagship_cfg
    from mtl_tpu.models.transformer import build_model
    from mtl_tpu.train.steps import init_train_state, make_meta_step

    cfg = _flagship_cfg()
    if second_order:
        cfg.train.second_order = True
        cfg.model.remat = True
    model = build_model(cfg, VOCAB_SIZE)
    outer_opt = optax.adam(cfg.train.meta_lr)
    # donate like the trainers: saves the params+opt-state double-buffer
    step = make_meta_step(model, cfg, outer_opt, donate=True,
                          scan_tasks=scan_tasks)

    support, query = make_batches(cfg)
    support = jax.tree.map(jnp.asarray, support)
    query = jax.tree.map(jnp.asarray, query)
    ex = jax.tree.map(lambda x: x[0], support)
    state = init_train_state(model, cfg, outer_opt, jax.random.PRNGKey(0), ex)

    rng = jax.random.PRNGKey(1)
    for i in range(warmup):
        rng, sub = jax.random.split(rng)
        state, m = step(state, support, query, sub)
    float(m["outer_loss"])  # full sync (block_until_ready is unreliable
    # through the axon remote-device tunnel)

    t0 = time.perf_counter()
    for i in range(num_iters):
        rng, sub = jax.random.split(rng)
        state, m = step(state, support, query, sub)
    float(m["outer_loss"])  # value fetch forces the whole chain
    elapsed = time.perf_counter() - t0

    utts = K_TASKS * (K_TRAIN + K_VALID) * num_iters
    n_chips = max(1, len(jax.devices()))
    return utts / elapsed / n_chips, elapsed / num_iters


def run_stretch_bench(num_iters=5, warmup=3, k=2):
    """BASELINE.json configs[4] single-chip feasibility point: the 17-layer
    d=1024 Conformer encoder under SECOND-ORDER meta-transfer (grad through
    inner SGD), encoder remat, reduced per-task batch k (the full config
    targets v5e-64; one chip proves the training mode runs and yields its
    roofline). Reports step ms + XLA cost-analysis FLOPs/HBM bytes."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _flagship_cfg
    from mtl_tpu.models.transformer import build_model
    from mtl_tpu.train.steps import init_train_state, make_meta_step

    cfg = _flagship_cfg()
    cfg.model.encoder_type = "conformer"
    cfg.model.num_enc_layers = 17
    cfg.model.num_heads = 8
    cfg.model.dim_model = 1024
    cfg.model.dim_key = 128
    cfg.model.dim_value = 128
    cfg.model.dim_inner = 2048
    cfg.model.dim_emb = 1024
    cfg.model.remat = True
    cfg.train.second_order = True
    cfg.finalize()
    model = build_model(cfg, VOCAB_SIZE)
    outer_opt = optax.adam(cfg.train.meta_lr)
    step = make_meta_step(model, cfg, outer_opt, donate=True)

    support = {
        key: np.stack([
            _synth(cfg, k, seed=i)[key] for i in range(K_TASKS)
        ])
        for key in ("audio", "audio_lengths", "targets", "src_percentages")
    }
    query = _synth(cfg, k, seed=100)
    support = jax.tree.map(jnp.asarray, support)
    query = jax.tree.map(jnp.asarray, query)
    ex = jax.tree.map(lambda x: x[0], support)
    state = init_train_state(model, cfg, outer_opt, jax.random.PRNGKey(0), ex)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree.leaves(state.params))

    # roofline from the compiled program
    lowered = step.lower(state, support, query, jax.random.PRNGKey(1))
    cost = lowered.compile().cost_analysis()
    cost = cost[0] if isinstance(cost, (list, tuple)) else cost
    flops = float(cost.get("flops", 0.0))
    hbm = float(cost.get("bytes accessed", 0.0))

    rng = jax.random.PRNGKey(1)
    for _ in range(warmup):
        rng, sub = jax.random.split(rng)
        state, m = step(state, support, query, sub)
    float(m["outer_loss"])
    t0 = time.perf_counter()
    for _ in range(num_iters):
        rng, sub = jax.random.split(rng)
        state, m = step(state, support, query, sub)
    float(m["outer_loss"])
    step_s = (time.perf_counter() - t0) / num_iters
    utts = K_TASKS * k + k
    return {
        "stretch_step_ms": round(step_s * 1e3, 1),
        "stretch_utt_per_s_per_chip": round(utts / step_s, 1),
        "k_per_task": k,
        "params": n_params,
        "tflops_per_step": round(flops / 1e12, 2),
        "hbm_gb_per_step": round(hbm / 1e9, 1),
        "roofline_ms_memory": round(hbm / 819e9 * 1e3, 1),  # v5e ~819 GB/s
        "roofline_ms_compute": round(flops / 197e12 * 1e3, 1),  # bf16 peak
    }


def _synth(cfg, b, seed):
    from __graft_entry__ import _synthetic_batch

    return _synthetic_batch(cfg, b, FRAMES, TGT_LEN, VOCAB_SIZE, seed=seed)


def run_decode_bench(num_iters=5):
    """Greedy-decode real-time factor: seconds of audio decoded per second of
    wall time (batched KV-cache decode; the reference's beam RTF metric's
    greedy counterpart)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _flagship_cfg
    from mtl_tpu.decode.greedy import greedy_decode_ids
    from mtl_tpu.models.transformer import build_model
    from mtl_tpu.ops.targets import make_teacher_forcing
    from mtl_tpu.train.steps import prepare_features

    cfg = _flagship_cfg()
    model = build_model(cfg, VOCAB_SIZE)
    batch = {k: jnp.asarray(v) for k, v in
             make_batches(cfg)[1].items()}  # 8 query utts of ~8 s
    feats, lengths = prepare_features(batch, cfg)
    seq_in, _ = make_teacher_forcing(batch["targets"])
    params = model.init(jax.random.PRNGKey(0), feats, lengths, seq_in)

    def run(f):
        return greedy_decode_ids(model, params, f, lengths, 300, 1, False)

    ids = run(feats)
    np.asarray(ids)  # compile
    for _ in range(6):
        # chained warmup: the tunnel's first ~5 dispatches of a session
        # carry 0.3-1.8 s of ramp (round-5 RTF reconciliation, BASELINE.md)
        ids = run(feats + 1e-9 * jnp.sum(ids).astype(feats.dtype))
    np.asarray(ids)
    t0 = time.perf_counter()
    for _ in range(num_iters):
        # chain through the previous output: identical re-dispatches get
        # deduplicated by the remote-device tunnel and time as ~0
        ids = run(feats + 1e-9 * jnp.sum(ids).astype(feats.dtype))
    np.asarray(ids)
    wall = (time.perf_counter() - t0) / num_iters
    audio_seconds = float(np.sum(np.asarray(batch["audio_lengths"])) / 16000)
    return audio_seconds / wall


# ---------------------------------------------------------------------------
# Robust driver-facing wrapper
# ---------------------------------------------------------------------------

_PREFLIGHT_CODE = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((256, 256));"
    "print('preflight ok', float(jnp.dot(x, x).sum()), jax.default_backend())"
)


def _run_deadline(cmd, timeout_s, capture=False):
    """subprocess.run with a deadline that cannot block past it.

    ``subprocess.run(timeout=...)`` SIGKILLs only the direct child and then
    calls ``communicate()`` with NO timeout — if a hung PJRT plugin left a
    grandchild (or a daemon thread's forked helper) holding the stdout/stderr
    pipes, that post-kill wait blocks unboundedly (observed: a 15s error path
    stretching past 60s). Here the child gets its own process group, the
    whole group is killed on expiry, and the post-kill drain is itself
    bounded.

    Returns (returncode|None, stdout, stderr); returncode None = deadline.
    """
    pipe = subprocess.PIPE if capture else None
    proc = subprocess.Popen(cmd, env=os.environ, cwd=_HERE, stdout=pipe,
                            stderr=pipe, text=True, start_new_session=True)
    try:
        out, errout = proc.communicate(timeout=timeout_s)
        return proc.returncode, out or "", errout or ""
    except subprocess.TimeoutExpired:
        import signal

        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            proc.kill()
        try:
            out, errout = proc.communicate(timeout=15)
        except subprocess.TimeoutExpired:
            out, errout = "", ""
        return None, out or "", errout or ""


def preflight_backend():
    """Probe the default backend with a tiny matmul in a SUBPROCESS under a
    deadline, retrying with backoff. Returns (ok, error_message)."""
    err = "unknown"
    for attempt in range(PREFLIGHT_ATTEMPTS):
        rc, _, errout = _run_deadline(
            [sys.executable, "-c", _PREFLIGHT_CODE], PREFLIGHT_TIMEOUT_S,
            capture=True,
        )
        if rc == 0:
            return True, None
        if rc is None:
            err = (f"preflight matmul exceeded {PREFLIGHT_TIMEOUT_S}s "
                   f"(TPU tunnel hung)")
        else:
            tail = errout.strip().splitlines()
            err = tail[-1] if tail else f"preflight rc={rc}"
        print(f"bench preflight attempt {attempt + 1}/{PREFLIGHT_ATTEMPTS} "
              f"failed: {err}", file=sys.stderr, flush=True)
        if attempt + 1 < PREFLIGHT_ATTEMPTS:
            time.sleep(PREFLIGHT_BACKOFF_S * (2 ** attempt))
    return False, err


def _last_measured():
    """Most recent successful result: this host's persisted last-good run,
    else the last green driver record (BENCH_r02.json)."""
    if os.path.exists(LAST_GOOD_PATH):
        try:
            with open(LAST_GOOD_PATH) as f:
                return json.load(f)
        except (OSError, ValueError):
            pass
    for name in ("BENCH_r02.json", "BENCH_r01.json"):
        path = os.path.join(_HERE, name)
        if os.path.exists(path):
            try:
                with open(path) as f:
                    parsed = json.load(f).get("parsed")
                if parsed:
                    parsed["source"] = name
                    return parsed
            except (OSError, ValueError):
                pass
    return None


def _emit_error(msg: str) -> None:
    out = {"error": msg}
    last = _last_measured()
    if last is not None:
        out["last_measured"] = last
    print(json.dumps(out))


MEASURED_STEPS_PATH = os.path.join(_HERE, "measured_steps.json")


def _persist_measured_steps(update: dict) -> None:
    """Merge per-lowering measured step times into measured_steps.json —
    the single record bench_scaling_projection.py anchors on."""
    record = {}
    if os.path.exists(MEASURED_STEPS_PATH):
        try:
            with open(MEASURED_STEPS_PATH) as f:
                record = json.load(f)
        except (OSError, ValueError):
            pass
    record.update(update)
    record["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open(MEASURED_STEPS_PATH, "w") as f:
        json.dump(record, f, indent=1)


def _read_measured_steps() -> dict:
    if not os.path.exists(MEASURED_STEPS_PATH):
        return {}
    try:
        with open(MEASURED_STEPS_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def measure_and_print():
    """Child mode: run the actual benchmark and print the one JSON line."""
    value, step_ms = run_tpu_bench()
    # The production data-parallel lowering (lax.scan over tasks — what the
    # 8-chip projection models). Fewer iters: it differs from vmap by loop
    # structure only; measuring it here keeps the projection anchored on the
    # lowering that actually runs multi-chip (VERDICT r4 #2).
    scan_value, scan_step_ms = run_tpu_bench(num_iters=10, scan_tasks=True)
    rtf = run_decode_bench()
    _persist_measured_steps({
        "vmap_fo_ms": round(step_ms * 1000.0, 1),
        "scan_fo_ms": round(scan_step_ms * 1000.0, 1),
    })
    baseline = TORCH_CPU_BASELINE_UTT_PER_SEC
    out = {
        "metric": "meta_train_utt_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "utt/s/chip",
        "vs_baseline": round(value / baseline, 2) if baseline else None,
        "meta_step_ms": round(step_ms * 1000.0, 1),
        "meta_step_ms_scan_tasks": round(scan_step_ms * 1000.0, 1),
        "utt_per_sec_scan_tasks": round(scan_value, 3),
        "greedy_decode_rtf": round(rtf, 2),
    }
    # measured by bench_matched_cer.py (same transplanted init, same batch
    # stream, same transient algorithm vs the real /root/reference model) —
    # read from its persisted results, omitted if that bench hasn't run here
    speedups = matched_cer_speedups()
    if speedups:
        out["matched_cer_speedup_vs_reference_cpu"] = speedups
    ppl_speedup = matched_ppl_speedup()
    if ppl_speedup:
        out["matched_ppl_lm_speedup_vs_reference_cpu"] = ppl_speedup
    stretch = _read_measured_steps().get("stretch_so")
    if stretch:
        # measured by `bench.py --stretch` (BASELINE configs[4] second-order
        # Conformer feasibility point); persisted, not re-run every bench
        out["stretch_so_step_ms"] = stretch.get("stretch_step_ms")
    else:
        _warn("omitting stretch_so_step_ms (run bench.py --stretch)")
    print(json.dumps(out))


def main():
    if "--torch-baseline" in sys.argv:
        from bench_baseline_torch import run_torch_baseline

        utt_per_sec = run_torch_baseline(K_TASKS, K_TRAIN, K_VALID, FRAMES,
                                         TGT_LEN, VOCAB_SIZE)
        print(json.dumps({"torch_cpu_utt_per_sec": utt_per_sec}))
        return

    if "--measure" in sys.argv:
        # Child mode (also usable directly when the backend is known-good).
        measure_and_print()
        return

    if "--stretch" in sys.argv:
        result = run_stretch_bench()
        print(json.dumps(result))
        _persist_measured_steps({"stretch_so": result})
        return

    if "--variants" in sys.argv:
        # Manual mode: measure ALL four task-loop lowerings (vmap/scan x
        # first/second-order) and persist them for the scaling projection.
        results = {}
        for name, kw in (
            ("vmap_fo_ms", {}),
            ("scan_fo_ms", {"scan_tasks": True}),
            ("vmap_so_ms", {"second_order": True}),
            ("scan_so_ms", {"scan_tasks": True, "second_order": True}),
        ):
            value, step_ms = run_tpu_bench(num_iters=10, **kw)
            results[name] = round(step_ms * 1000.0, 1)
            print(json.dumps({name: results[name],
                              "utt_per_sec": round(value, 1)}), flush=True)
        _persist_measured_steps(results)
        return

    ok, err = preflight_backend()
    if not ok:
        _emit_error(f"TPU backend unavailable after {PREFLIGHT_ATTEMPTS} "
                    f"preflight attempts: {err}")
        return

    # Measure in a subprocess under a deadline: the tunnel can die BETWEEN
    # preflight and measurement, and an in-process hang is uncatchable.
    rc, out, errout = _run_deadline(
        [sys.executable, os.path.abspath(__file__), "--measure"],
        MEASURE_TIMEOUT_S, capture=True,
    )
    if errout:
        sys.stderr.write(errout)
    if rc is None:
        _emit_error(f"benchmark exceeded {MEASURE_TIMEOUT_S}s deadline "
                    f"(backend passed preflight but hung mid-measurement)")
        return
    lines = [ln for ln in out.strip().splitlines() if ln.startswith("{")]
    if rc != 0 or not lines:
        _emit_error(f"benchmark subprocess failed rc={rc} (stderr above)")
        return
    result = lines[-1]
    try:
        with open(LAST_GOOD_PATH, "w") as f:
            parsed = json.loads(result)
            parsed["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
            json.dump(parsed, f, indent=1)
    except (OSError, ValueError):
        pass
    print(result)


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — driver contract: JSON, rc=0
        _emit_error(f"{type(e).__name__}: {e}")
