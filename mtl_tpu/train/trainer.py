"""Training-loop orchestration (host side).

Four trainers mirroring the reference layer L4 (SURVEY.md §1):

* ``TransientTrainer`` — meta-transfer (trainer/asr/transient_trainer.py):
  per-iteration inner-SGD-per-task + shared code-switched query, outer Adam.
* ``MetaTrainer`` — standard MAML (trainer/asr/meta_trainer.py): per-task
  query batches.
* ``JointTrainer`` — iteration-based multi-task training
  (trainer/asr/joint_trainer.py) incl. adversarial/multitask discriminator
  heads; also serves finetune.py.
* ``EpochTrainer`` — classic epoch loop (trainer/asr/trainer.py) with the
  Noam schedule.

All device work happens inside the jitted steps (train/steps.py); the host
loop does data prefetch (double-buffer thread, reference parity
transient_trainer.py:127-139), metric bookkeeping (moving windows, history),
checkpointing, early stopping, and logging with the reference's line formats.
"""

from __future__ import annotations

import threading
import time
from collections import deque
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data.dataset import SpectrogramDataset
from ..data.vocab import Vocab, post_process
from ..utils.checkpoint import save_checkpoint
from ..utils.logger import log_print
from ..utils.metrics import calculate_cer_batch, calculate_wer
from .optim import make_joint_optimizer, make_meta_optimizers, noam_schedule
from .steps import (
    TrainState,
    init_train_state,
    make_eval_step,
    make_joint_step,
    make_meta_step,
)


def batch_cer(hyp_ids, gold_ids, vocab: Vocab):
    """(total_cer, total_char) from id arrays, reference post-processing
    (forward_one_batch, transient_trainer.py:55-64)."""
    hyp_ids = np.asarray(hyp_ids).reshape(-1, np.asarray(hyp_ids).shape[-1])
    gold_ids = np.asarray(gold_ids).reshape(-1, np.asarray(gold_ids).shape[-1])
    pairs = []
    total_char = 0
    for h, g in zip(hyp_ids, gold_ids):
        hs = post_process(vocab.decode_ids(h), vocab.special_token_list)
        gs = post_process(vocab.decode_ids(g), vocab.special_token_list)
        pairs.append((hs.replace(" ", ""), gs.replace(" ", "")))
        total_char += len(gs.replace(" ", ""))
    dists = calculate_cer_batch(pairs)
    return int(sum(dists)), int(total_char)


class Prefetcher:
    """Double-buffered background fetch (transient_trainer.py:127-139).

    A fetch exception is captured in the worker thread and re-raised from
    ``get()`` (after re-arming the next fetch) — never silently replayed as
    stale data. The trainers' in-loop recovery then drops the batch and
    continues, mirroring the reference's blanket except-refetch
    (transient_trainer.py:366-377)."""

    def __init__(self, fetch_fn):
        self.fetch_fn = fetch_fn
        self._result = None
        self._error = None
        self._thread = None
        self.start()

    def start(self):
        def run():
            try:
                self._result = self.fetch_fn()
                self._error = None
            except BaseException as e:  # re-raised on the consumer thread
                self._result = None
                self._error = e

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def get(self):
        self._thread.join()
        out, err = self._result, self._error
        self.start()
        if err is not None:
            raise err
        return out


class MultiWorkerPrefetcher:
    """Ordered N-worker prefetch for host-feed weak scaling.

    The reference's single double-buffer thread feeds one chip's batches
    (~23 ms warm per flagship chip-batch, BASELINE.md); on an 8-chip weak-
    scaling step the host must produce 8x the utterances inside the same
    ~85 ms step, so one thread is host-bound (VERDICT r4 weak #6 /
    bench_host_pipeline.py measures this). Here ``fetch_at(i)`` must be a
    PURE function of the iteration index (the trainers pass a per-iteration
    ``np.random.RandomState(seed, i)`` into ``sample_meta_batch``), so
    workers compute future iterations concurrently and ``get()`` delivers
    them strictly in order — the batch stream is identical for any worker
    count. Worker exceptions re-raise from ``get()`` for that iteration
    only; the pipeline keeps running (reference except-refetch parity).
    """

    def __init__(self, fetch_at, num_workers: int, start: int = 0,
                 depth: Optional[int] = None):
        from concurrent.futures import ThreadPoolExecutor

        self.fetch_at = fetch_at
        self.pool = ThreadPoolExecutor(max_workers=max(1, num_workers),
                                       thread_name_prefix="prefetch")
        self.depth = depth or max(2, 2 * num_workers)
        self._futures: dict = {}
        self._next = start
        self._head = start
        for _ in range(self.depth):
            self._submit()

    def _submit(self):
        self._futures[self._next] = self.pool.submit(self.fetch_at,
                                                     self._next)
        self._next += 1

    def get(self):
        fut = self._futures.pop(self._head)
        self._head += 1
        self._submit()
        return fut.result()


class EarlyStopper:
    """`criterion,patience` parsing + best-value tracking
    (transient_trainer.py:93,337-360)."""

    def __init__(self, early_stop: str):
        crit, val = early_stop.split(",")
        self.criterion = crit
        self.patience = int(val)
        self.best = 1e9
        self.count = 0

    def update(self, avg_loss: float, avg_cer: float) -> bool:
        """Returns True if this is a new best."""
        value = avg_cer if self.criterion == "cer" else avg_loss
        if value < self.best:
            self.best = value
            self.count = 0
            return True
        self.count += 1
        return False

    @property
    def should_stop(self) -> bool:
        return self.count >= self.patience


class TrainerBase:
    # reference-parity in-loop recovery (transient_trainer.py:366-377,
    # joint_trainer.py:391-405) retries forever; we cap consecutive failures
    # so a persistent error (bad config, dead filesystem) cannot spin a
    # multi-day run silently.
    MAX_CONSECUTIVE_FAILURES = 20

    def __init__(self, model, cfg: Config, vocab: Vocab):
        self.model = model
        self.cfg = cfg
        self.vocab = vocab
        self.eval_step = make_eval_step(model, cfg)
        # Multi-device path: --mesh-task/-data/-model build a (task, data,
        # model) mesh; state is replicated (params TP-sharded when model>1)
        # and batches are sharded below — XLA inserts the ICI collectives
        # (SURVEY §2.6: the mesh is a first-class component). None = the
        # single-device path, byte-identical to round 2.
        from ..parallel.mesh import maybe_make_mesh

        self.mesh = maybe_make_mesh(cfg)
        if self.mesh is not None:
            log_print(
                "MESH: task={task} data={data} model={model} over {n} "
                "{plat} device(s)".format(
                    **dict(self.mesh.shape),
                    n=self.mesh.devices.size,
                    plat=self.mesh.devices.flat[0].platform,
                )
            )
        if (cfg.train.save_every % max(cfg.train.evaluate_every, 1) != 0
                and cfg.train.evaluate_every % max(cfg.train.save_every, 1)
                != 0):
            # reference parity: periodic saves fire only on iterations where
            # BOTH (it+1) % evaluate_every == 0 and (it+1) % save_every == 0
            # (transient_trainer.py:311,333) — warn when that never aligns
            log_print(
                "WARNING: --save-every {} is not a multiple of "
                "--evaluate-every {}; periodic checkpoints only happen on "
                "iterations divisible by both".format(
                    cfg.train.save_every, cfg.train.evaluate_every
                )
            )

    def _shard(self, tree, prefix):
        """Shard a host batch's leading dims over the mesh (identity when
        single-device)."""
        if self.mesh is None:
            return tree
        from ..parallel.mesh import shard_batch_prefix

        return shard_batch_prefix(tree, self.mesh, prefix)

    def _place_state(self, state, optimizer=None):
        if self.mesh is None:
            return state
        from ..parallel.mesh import shard_train_state

        return shard_train_state(state, self.mesh, optimizer)

    def evaluate(self, params, valid_sets: Sequence[SpectrogramDataset],
                 it: int):
        """No-grad eval over the valid loaders (transient_trainer.py:280-331).

        The final ragged batch is statically padded with duplicate rows;
        loss/CER here are computed over the ``num_valid`` real rows only, so
        reported metrics equal per-sample scoring (the reference achieves the
        same by emitting a smaller final batch)."""
        final_losses, final_cers = [], []
        for ind, ds in enumerate(valid_sets):
            total_loss, total_cer, total_char, n_batches = 0.0, 0, 0, 0
            for batch, num_valid in ds.iter_batches(
                    self.cfg.train.k_valid, shuffle=False,
                    with_valid_count=True):
                _, aux = self.eval_step(params, batch)
                row_loss = np.asarray(aux["row_loss"])[:num_valid]
                row_tok = np.asarray(aux["row_tokens"])[:num_valid]
                cer, nchar = batch_cer(np.asarray(aux["hyp"])[:num_valid],
                                       np.asarray(aux["gold"])[:num_valid],
                                       self.vocab)
                total_loss += float(row_loss.sum()) / max(float(row_tok.sum()),
                                                          1.0)
                total_cer += cer
                total_char += max(nchar, 1) if nchar else 1
                n_batches += 1
            if n_batches == 0:
                continue
            vloss = total_loss / n_batches
            vcer = total_cer * 100.0 / max(total_char, 1)
            final_losses.append(vloss)
            final_cers.append(vcer)
            log_print(
                "(Iteration {}) VALID SET {} LOSS:{:.4f} CER:{:.2f}%".format(
                    it + 1, ind, vloss, vcer
                )
            )
        avg_loss = sum(final_losses) / max(len(final_losses), 1)
        avg_cer = sum(final_cers) / max(len(final_cers), 1)
        log_print(
            "(Iteration {}) AVG VALID LOSS:{:.4f} AVG CER:{:.2f}%".format(
                it + 1, avg_loss, avg_cer
            )
        )
        return avg_loss, avg_cer, final_losses, final_cers


class TransientTrainer(TrainerBase):
    """Meta-transfer trainer (transient_trainer.py:79-377)."""

    per_task_query = False

    def train(
        self,
        train_dataset: SpectrogramDataset,
        valid_sets: Sequence[SpectrogramDataset],
        start_it: int = 0,
        num_it: int = 1000,
        state: Optional[TrainState] = None,
        last_metrics: Optional[dict] = None,
        discriminator=None,
    ) -> TrainState:
        cfg = self.cfg
        inner_lr, outer_opt = make_meta_optimizers(cfg)
        use_disc = discriminator is not None
        if use_disc:
            # adversarial/multitask head inside meta-validation
            # (meta_trainer.py:243-263) — VERDICT r2 #7b
            from .steps_disc import make_meta_step_disc

            step_fn = make_meta_step_disc(self.model, discriminator, cfg,
                                          outer_opt,
                                          per_task_query=self.per_task_query)
        else:
            scan_tasks = cfg.train.scan_tasks
            if scan_tasks and self.mesh is not None \
                    and self.mesh.shape["task"] > 1:
                raise ValueError(
                    "--scan-tasks serializes the task axis; it cannot be "
                    "combined with --mesh-task > 1 (tasks are sharded there)")
            if scan_tasks is None:
                # auto: on a DATA-only sharded mesh the vmapped task loop is
                # ICI-bound (activation all-gathers — steps.py:
                # outer_grads_fo_scan). A task-sharded mesh needs vmap (scan
                # would serialize the sharded axis); single-device keeps
                # vmap (marginally better fusion).
                scan_tasks = (self.mesh is not None
                              and self.mesh.shape["task"] == 1
                              and self.mesh.shape["data"] > 1)
            step_fn = make_meta_step(self.model, cfg, outer_opt,
                                     per_task_query=self.per_task_query,
                                     space_id=self.vocab.label2id.get(" "),
                                     donate=True,
                                     scan_tasks=bool(scan_tasks))

        fetch = lambda: train_dataset.sample_meta_batch(
            cfg.train.k_train, cfg.train.k_valid,
            per_task_query=self.per_task_query,
        )

        rng = jax.random.PRNGKey(cfg.train.seed)
        if state is None:
            support, query = fetch()
            ex = jax.tree.map(lambda x: x[0], support)
            state = init_train_state(self.model, cfg, outer_opt,
                                     jax.random.PRNGKey(cfg.train.seed), ex)
            if use_disc:
                from .steps_disc import init_disc_state

                state = init_disc_state(self.model, discriminator, cfg,
                                        state, ex)
            if cfg.continue_from:
                from ..utils.checkpoint import load_checkpoint

                try:
                    _, _, state, _, _ = load_checkpoint(cfg.continue_from,
                                                        target=state)
                except Exception:
                    # checkpoint without disc state: restore params only
                    from flax import serialization

                    _, _, raw, _, _ = load_checkpoint(cfg.continue_from)
                    base = state.base if use_disc else state
                    params = serialization.from_state_dict(
                        base.params, raw["params"]
                    )
                    base = base.replace(params=params)
                    state = state.replace(base=base) if use_disc else base
                log_print(f"RESTORED STATE from {cfg.continue_from}")
            from ..utils.params import compute_num_params

            log_print("Parameters: {}(trainable), {}(non-trainable)".format(
                *compute_num_params(state.base.params if use_disc
                                    else state.params)))

        if self.mesh is not None:
            from ..parallel.mesh import validate_mesh_divisibility

            validate_mesh_divisibility(
                self.mesh, len(train_dataset.ids_list), cfg.train.k_train,
                cfg.train.k_valid,
            )
            state = self._place_state(state, None if use_disc else outer_opt)

        # Start the double-buffer AFTER the state-init fetch: two threads
        # drawing from the dataset's RandomState concurrently made the batch
        # sequence nondeterministic (caught by the mesh-vs-single e2e test).
        if cfg.train.prefetch_workers > 1:
            # per-iteration seeded draws -> same stream for any worker count
            def fetch_at(i):
                r = np.random.RandomState(
                    (cfg.train.seed * 1_000_003 + i) % (2 ** 32))
                return train_dataset.sample_meta_batch(
                    cfg.train.k_train, cfg.train.k_valid,
                    per_task_query=self.per_task_query, rng=r)

            prefetch = MultiWorkerPrefetcher(
                fetch_at, cfg.train.prefetch_workers, start=start_it)
        else:
            prefetch = Prefetcher(fetch)

        stopper = EarlyStopper(cfg.train.early_stop)
        history: List[dict] = (last_metrics or {}).get("history", [])
        window = 100
        last_sum_loss, last_sum_cer, last_sum_char = (
            deque(maxlen=window), deque(maxlen=window), deque(maxlen=window)
        )
        total_time = 0.0
        num_tasks = len(train_dataset.ids_list)
        beta = 1.0

        profiling = False
        failures = 0
        it = start_it
        while it < num_it:
            # profiling hook (SURVEY §5: the reference has no tracing at all)
            if cfg.train.profile_dir:
                if it == start_it + 3 and not profiling:
                    jax.profiler.start_trace(cfg.train.profile_dir)
                    profiling = True
                elif profiling and it == start_it + 8:
                    jax.profiler.stop_trace()
                    profiling = False
                    log_print(f"PROFILE written to {cfg.train.profile_dir}")
            # In-loop fault recovery (reference parity,
            # transient_trainer.py:364-377): a host/data error drops the
            # batch, refetches and continues without advancing `it`.
            try:
                support, query = prefetch.get()
            except Exception as e:
                failures += 1
                log_print(f"Error: {e!r}, fetching new data...")
                if failures >= self.MAX_CONSECUTIVE_FAILURES:
                    raise
                continue
            failures = 0
            start_time = time.time()
            rng, sub = jax.random.split(rng)
            support = self._shard(support, ("task", "data"))
            query = self._shard(
                query, ("task", "data") if self.per_task_query else ("data",)
            )
            if use_disc:
                if cfg.train.beta_decay:  # meta_trainer.py:258-260
                    beta = beta * 0.99997
                    cur_beta = beta
                else:
                    cur_beta = 0.5
                state, m = step_fn(state, support, query, sub,
                                   jnp.asarray(cur_beta))
            else:
                state, m = step_fn(state, support, query, sub)
            outer_loss = float(m["outer_loss"])
            if cfg.train.device_cer and "cer_dist" in m:
                cer, nchar = int(m["cer_dist"]), max(int(m["cer_chars"]), 1)
            elif (it + 1) % max(cfg.train.train_cer_every, 1) == 0:
                cer, nchar = batch_cer(m["support_hyp"], m["support_gold"],
                                       self.vocab)
            else:
                cer, nchar = 0, 1
            total_time += time.time() - start_time
            last_sum_loss.append(outer_loss)
            last_sum_cer.append(cer)
            last_sum_char.append(max(nchar, 1))

            log_print(
                "(Iteration {}) TRAIN LOSS:{:.4f} CER:{:.2f}% "
                "LR:{:.7f} TOTAL TIME:{:.7f}".format(
                    it + 1, outer_loss, cer * 100.0 / max(nchar, 1),
                    cfg.train.meta_lr, total_time
                )
            )
            if (it + 1) % 1000 == 0:
                log_print(
                    "(Summary Iteration {} | MA {}) TRAIN LOSS:{:.4f} "
                    "CER:{:.2f}%".format(
                        it + 1, window,
                        sum(last_sum_loss) / len(last_sum_loss),
                        sum(last_sum_cer) * 100.0 / max(sum(last_sum_char), 1),
                    )
                )

            if (it + 1) % cfg.train.evaluate_every == 0:
                avg_loss, avg_cer, vlosses, vcers = self.evaluate(
                    state.base.params if use_disc else state.params,
                    valid_sets, it
                )
                metrics = {
                    "avg_valid_loss": avg_loss,
                    "avg_valid_cer": avg_cer,
                    "valid_loss": vlosses,
                    "valid_cer": vcers,
                    "history": history,
                }
                history.append(dict(metrics, history=None))
                if (it + 1) % cfg.train.save_every == 0:
                    save_checkpoint(cfg, self.vocab, state, it + 1, metrics)
                if stopper.update(avg_loss, avg_cer):
                    save_checkpoint(cfg, self.vocab, state, it + 1, metrics,
                                    best_model=True)
                else:
                    log_print(f"count_stop: {stopper.count}")
                if stopper.should_stop:
                    log_print("EARLY STOP")
                    break
            it += 1
        return state


class MetaTrainer(TransientTrainer):
    """Standard MAML (trainer/asr/meta_trainer.py): per-task query batches."""

    per_task_query = True


def make_adapt_fn(model, cfg: Config):
    """One inner-SGD adaptation step (the meta-test protocol of
    meta_trainer.py:330-458: adapt on a support batch, then evaluate)."""
    from .steps import make_forward_fn, _clip_tree

    forward = make_forward_fn(model, cfg)

    @jax.jit
    def adapt(params, batch, rng):
        (_, _), g = jax.value_and_grad(forward, has_aux=True)(
            params, batch, rng, False
        )
        if cfg.train.clip:
            g = _clip_tree(g, cfg.train.max_norm)
        return jax.tree.map(lambda w, gw: w - cfg.train.lr * gw, params, g)

    return adapt


def meta_evaluate(
    trainer: TrainerBase,
    params,
    train_dataset: SpectrogramDataset,
    valid_sets: Sequence[SpectrogramDataset],
    num_meta_test: int = 1,
    adapt_manifest_id: int = -1,
) -> Tuple[float, float]:
    """Meta-test: inner-adapt on support draws from the (default: target)
    manifest, then no-grad validate — averaged over num_meta_test trials."""
    adapt = make_adapt_fn(trainer.model, trainer.cfg)
    rng = jax.random.PRNGKey(trainer.cfg.train.seed + 7)
    losses, cers = [], []
    num_tasks = len(train_dataset.ids_list)
    mid = adapt_manifest_id % num_tasks
    for trial in range(max(1, num_meta_test)):
        support, _ = train_dataset.sample_meta_batch(
            trainer.cfg.train.k_train, 1, query_manifest_id=mid
        )
        batch = jax.tree.map(lambda x: jnp.asarray(x[mid]), support)
        rng, sub = jax.random.split(rng)
        adapted = adapt(params, batch, sub)
        avg_loss, avg_cer, _, _ = trainer.evaluate(adapted, valid_sets, trial)
        losses.append(avg_loss)
        cers.append(avg_cer)
    n = len(losses)
    log_print(
        "(Meta-test) trials={} AVG LOSS:{:.4f} AVG CER:{:.2f}%".format(
            n, sum(losses) / n, sum(cers) / n
        )
    )
    return sum(losses) / n, sum(cers) / n


class JointTrainer(TrainerBase):
    """Iteration-based multi-task trainer (trainer/asr/joint_trainer.py),
    optional adversarial/multitask discriminator heads. Also the finetune
    path (finetune.py:199-200)."""

    def train(
        self,
        train_dataset: SpectrogramDataset,
        valid_sets: Sequence[SpectrogramDataset],
        start_it: int = 0,
        num_it: int = 1000,
        state: Optional[TrainState] = None,
        last_metrics: Optional[dict] = None,
        discriminator=None,
    ) -> TrainState:
        cfg = self.cfg
        opt = make_joint_optimizer(cfg)
        use_disc = discriminator is not None
        if use_disc:
            from .steps_disc import make_joint_step_disc

            step_fn = make_joint_step_disc(self.model, discriminator, cfg, opt)
        else:
            # no donation here: the per-batch skip-on-error recovery below
            # re-uses the input state after a failed step, and a donated
            # input is already consumed by the time an execution error
            # surfaces (the transient trainer's step runs outside its
            # recovery try, so it donates safely)
            step_fn = make_joint_step(self.model, cfg, opt,
                                      space_id=self.vocab.label2id.get(" "))

        num_tasks = len(train_dataset.ids_list)

        def fetch():
            support, _ = train_dataset.sample_meta_batch(
                cfg.train.k_train, 1, per_task_query=False
            )
            return support

        rng = jax.random.PRNGKey(cfg.train.seed)
        if state is None:
            support = fetch()
            ex = jax.tree.map(lambda x: x[0], support)
            state = init_train_state(self.model, cfg, opt,
                                     jax.random.PRNGKey(cfg.train.seed), ex)
            if use_disc:
                from .steps_disc import init_disc_state

                state = init_disc_state(self.model, discriminator, cfg, state,
                                        ex)
            if cfg.continue_from:
                from ..utils.checkpoint import load_checkpoint

                # finetune.py semantics: load the (meta or joint) checkpoint
                # params/opt into a freshly-built state of the SAME model.
                try:
                    _, _, state, _, _ = load_checkpoint(cfg.continue_from,
                                                        target=state)
                except Exception:
                    # optimizer structures differ (e.g. meta checkpoint into
                    # an SGD finetune): restore params only, by name
                    from flax import serialization

                    _, _, raw, _, _ = load_checkpoint(cfg.continue_from)
                    base = state.base if use_disc else state
                    params = serialization.from_state_dict(
                        base.params, raw["params"]
                    )
                    base = base.replace(params=params)
                    state = state.replace(base=base) if use_disc else base
                log_print(f"RESTORED STATE from {cfg.continue_from}")

        if self.mesh is not None:
            from ..parallel.mesh import validate_mesh_divisibility

            validate_mesh_divisibility(
                self.mesh, len(train_dataset.ids_list), cfg.train.k_train,
                cfg.train.k_valid,
            )
            # disc state is a wrapper pytree; TP is not composed with the
            # discriminator heads — replicate in that case
            state = self._place_state(state, None if use_disc else opt)

        # start after the state-init fetch (deterministic batch sequence)
        if cfg.train.prefetch_workers > 1:
            def fetch_at(i):
                r = np.random.RandomState(
                    (cfg.train.seed * 1_000_003 + i) % (2 ** 32))
                support, _ = train_dataset.sample_meta_batch(
                    cfg.train.k_train, 1, per_task_query=False, rng=r)
                return support

            prefetch = MultiWorkerPrefetcher(
                fetch_at, cfg.train.prefetch_workers, start=start_it)
        else:
            prefetch = Prefetcher(fetch)

        stopper = EarlyStopper(cfg.train.early_stop)
        history: List[dict] = (last_metrics or {}).get("history", [])
        window = 100
        last_sum_loss, last_sum_cer, last_sum_char = (
            deque(maxlen=window), deque(maxlen=window), deque(maxlen=window)
        )
        total_time = 0.0
        beta = 1.0

        failures = 0
        it = start_it
        while it < num_it:
            # In-loop fault recovery (joint_trainer.py:391-405 parity):
            # drop the bad batch, refetch, continue.
            try:
                support = prefetch.get()
            except Exception as e:
                failures += 1
                log_print(f"Error: {e!r}, fetching new data...")
                if failures >= self.MAX_CONSECUTIVE_FAILURES:
                    raise
                continue
            failures = 0
            t0 = time.time()
            rng, sub = jax.random.split(rng)
            support = self._shard(support, ("task", "data"))
            if use_disc:
                if cfg.train.beta_decay:
                    beta = beta * 0.99997  # joint_trainer.py:155-156,230-232
                    cur_beta = beta
                else:
                    cur_beta = 0.5
                state, loss, aux = step_fn(state, support, sub,
                                           jnp.asarray(cur_beta))
            else:
                state, loss, aux = step_fn(state, support, sub)
            # same gating as the transient trainer: --device-cer scores on
            # device; otherwise host string CER only every --train-cer-every
            # iterations (each host decode is a full device sync)
            if cfg.train.device_cer and "cer_dist" in aux:
                cer, nchar = int(aux["cer_dist"]), max(int(aux["cer_chars"]), 1)
            elif (it + 1) % max(cfg.train.train_cer_every, 1) == 0:
                cer, nchar = batch_cer(aux["hyp"], aux["gold"], self.vocab)
            else:
                cer, nchar = 0, 1
            total_time += time.time() - t0
            # reference logs the SUM of per-task losses / num_tasks
            log_loss = float(loss)
            last_sum_loss.append(log_loss)
            last_sum_cer.append(cer)
            last_sum_char.append(max(nchar, 1))
            log_print(
                "(Iteration {}) TRAIN LOSS:{:.4f} CER:{:.2f}% LR:{:.7f} "
                "TOTAL TIME:{:.7f}".format(
                    it + 1, log_loss, cer * 100.0 / max(nchar, 1),
                    cfg.train.lr, total_time
                )
            )
            if (it + 1) % 1000 == 0:
                log_print(
                    "(Summary Iteration {} | MA {}) TRAIN LOSS:{:.4f} "
                    "CER:{:.2f}%".format(
                        it + 1, window,
                        sum(last_sum_loss) / len(last_sum_loss),
                        sum(last_sum_cer) * 100.0 / max(sum(last_sum_char), 1),
                    )
                )
            if (it + 1) % cfg.train.evaluate_every == 0:
                eval_params = state.base.params if use_disc else state.params
                avg_loss, avg_cer, vlosses, vcers = self.evaluate(
                    eval_params, valid_sets, it
                )
                metrics = {
                    "avg_valid_loss": avg_loss,
                    "avg_valid_cer": avg_cer,
                    "valid_loss": vlosses,
                    "valid_cer": vcers,
                    "history": history,
                }
                history.append(dict(metrics, history=None))
                if (it + 1) % cfg.train.save_every == 0:
                    save_checkpoint(cfg, self.vocab, state, it + 1, metrics)
                if stopper.update(avg_loss, avg_cer):
                    save_checkpoint(cfg, self.vocab, state, it + 1, metrics,
                                    best_model=True)
                else:
                    log_print(f"count_stop: {stopper.count}")
                if stopper.should_stop:
                    log_print("EARLY STOP")
                    break
            it += 1
        return state


class EpochTrainer(TrainerBase):
    """Classic epoch loop (trainer/asr/trainer.py) with the Noam schedule."""

    def train(
        self,
        train_dataset: SpectrogramDataset,
        valid_sets: Sequence[SpectrogramDataset],
        start_epoch: int = 0,
        num_epochs: int = 10,
        state: Optional[TrainState] = None,
    ) -> TrainState:
        cfg = self.cfg
        from .optim import make_epoch_optimizer

        opt = make_epoch_optimizer(cfg)
        # no donation: the epoch loop's skip-on-error path re-uses the input
        # state after a failed step (see JointTrainer)
        step_fn = make_joint_step(self.model, cfg, opt,
                                  space_id=self.vocab.label2id.get(" "))
        rng = jax.random.PRNGKey(cfg.train.seed)
        stopper = EarlyStopper(cfg.train.early_stop)

        if state is None:
            ex = next(train_dataset.iter_batches(cfg.data.batch_size))
            state = init_train_state(self.model, cfg, opt,
                                     jax.random.PRNGKey(cfg.train.seed), ex)
            if cfg.continue_from:
                # reference train.py:145-157 restores model + NoamOpt via
                # --continue-from (utils/functions.py:220-265); the optax
                # Noam schedule state (step count) rides in opt_state
                from ..utils.checkpoint import load_checkpoint

                _, _, state, _, _ = load_checkpoint(cfg.continue_from,
                                                    target=state)
                log_print(f"RESTORED STATE from {cfg.continue_from}")

        if self.mesh is not None:
            if self.mesh.shape["task"] > 1:
                raise ValueError(
                    "--mesh-task > 1 is a meta/joint-trainer axis; the epoch "
                    "trainer shards over --mesh-data only"
                )
            if cfg.data.batch_size % self.mesh.shape["data"]:
                raise ValueError(
                    f"--mesh-data {self.mesh.shape['data']} must divide "
                    f"--batch-size ({cfg.data.batch_size})"
                )
            state = self._place_state(state, opt)

        for epoch in range(start_epoch, num_epochs):
            total_loss, total_cer, total_char, n = 0.0, 0, 0, 0
            failures = 0
            for batch in train_dataset.iter_batches(cfg.data.batch_size):
                # per-batch skip on error (reference trainer.py:132-171 —
                # its OOM autosplit is obsolete under static-shape jit, the
                # skip-and-continue half is kept)
                try:
                    rng, sub = jax.random.split(rng)
                    batches = jax.tree.map(lambda x: x[None], batch)
                    batches = self._shard(batches, (None, "data"))
                    state, loss, aux = step_fn(state, batches, sub)
                    # --device-cer / --train-cer-every gating (see
                    # JointTrainer; n counts completed batches this epoch)
                    if cfg.train.device_cer and "cer_dist" in aux:
                        cer, nchar = (int(aux["cer_dist"]),
                                      max(int(aux["cer_chars"]), 1))
                    elif (n + 1) % max(cfg.train.train_cer_every, 1) == 0:
                        cer, nchar = batch_cer(aux["hyp"], aux["gold"],
                                               self.vocab)
                    else:
                        cer, nchar = 0, 1
                except Exception as e:
                    failures += 1
                    log_print(f"Error: {e!r}, skipping batch...")
                    if failures >= self.MAX_CONSECUTIVE_FAILURES:
                        raise
                    continue
                failures = 0
                total_loss += float(loss)
                total_cer += cer
                total_char += max(nchar, 1)
                n += 1
            log_print(
                "(Epoch {}) TRAIN LOSS:{:.4f} CER:{:.2f}%".format(
                    epoch, total_loss / max(n, 1),
                    total_cer * 100.0 / max(total_char, 1),
                )
            )
            avg_loss, avg_cer, _, _ = self.evaluate(state.params, valid_sets,
                                                    epoch)
            # per-epoch checkpoint (reference trainer.py saves each epoch via
            # save_model, utils/functions.py:128-156) -> the --continue-from
            # resume target; epoch+1 so resume restarts AFTER this epoch
            save_checkpoint(cfg, self.vocab, state, epoch + 1,
                            {"avg_valid_loss": avg_loss,
                             "avg_valid_cer": avg_cer})
            if stopper.update(avg_loss, avg_cer):
                save_checkpoint(cfg, self.vocab, state, epoch, best_model=True)
            if stopper.should_stop:
                log_print("EARLY STOP")
                break
        return state
