"""Training-loop robustness + eval-metric correctness.

* Prefetcher must PROPAGATE fetch exceptions (never silently replay the
  previous batch) — round-1 weakness #3.
* Trainers must survive a corrupt wav mid-run: drop the batch, refetch,
  continue with a logged warning (reference in-loop recovery,
  trainer/asr/transient_trainer.py:366-377) — round-1 missing #2.
* Eval metrics on ragged final batches must equal per-sample scoring (the
  static padding duplicates rows; they must be trimmed from loss/CER) —
  round-1 weakness #4.
* --wave-cache-size / --train-cer-every CLI flags are wired — weakness #7.
"""

import numpy as np
import pytest

from mtl_tpu.config import Config, build_parser, config_from_args
from mtl_tpu.data.dataset import SpectrogramDataset
from mtl_tpu.data.synthetic import make_synthetic_corpus
from mtl_tpu.data.vocab import Vocab
from mtl_tpu.train.trainer import Prefetcher, TrainerBase, TransientTrainer


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("corpus_robust"))
    manifests, labels = make_synthetic_corpus(
        root, num_tasks=3, utts_per_task=7, max_sec=0.4, max_chars=6
    )
    return manifests, labels


@pytest.fixture(scope="module")
def tiny_cfg(corpus):
    manifests, labels = corpus
    cfg = Config()
    cfg.data.train_manifest_list = manifests
    cfg.data.valid_manifest_list = [manifests[-1]]
    cfg.data.labels_path = labels
    cfg.data.src_bucket_frames = (64,)
    cfg.data.tgt_bucket_len = (16,)
    cfg.model.num_enc_layers = 1
    cfg.model.num_dec_layers = 1
    cfg.model.num_heads = 2
    cfg.model.dim_model = 16
    cfg.model.dim_key = 8
    cfg.model.dim_value = 8
    cfg.model.dim_inner = 16
    cfg.model.dim_emb = 16
    cfg.model.dropout = 0.0
    cfg.model.r = 4
    cfg.model.dtype = "float32"
    cfg.model.src_max_len = 64
    cfg.model.tgt_max_len = 32
    cfg.train.k_train = 2
    cfg.train.k_valid = 2
    cfg.train.lr = 1e-2
    cfg.train.meta_lr = 1e-3
    cfg.train.evaluate_every = 1000
    cfg.finalize()
    return cfg


# --------------------------------------------------------------------------
# Prefetcher
# --------------------------------------------------------------------------

def test_prefetcher_propagates_fetch_error():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 2:
            raise ValueError("corrupt batch")
        return calls["n"]

    p = Prefetcher(flaky)
    assert p.get() == 1
    with pytest.raises(ValueError, match="corrupt batch"):
        p.get()
    # after the failure the next (re-armed) fetch delivers fresh data —
    # never a stale replay of batch 1
    assert p.get() == 3


def test_prefetcher_first_fetch_error():
    def always_bad():
        raise OSError("io error")

    p = Prefetcher(always_bad)
    with pytest.raises(OSError):
        p.get()


def test_multiworker_prefetcher_order_and_worker_invariance():
    """MultiWorkerPrefetcher delivers iterations strictly in order and the
    stream is IDENTICAL for any worker count (host-feed weak scaling,
    VERDICT r4 #5); a failing iteration re-raises from its own get() while
    later iterations keep flowing."""
    import time as _time

    from mtl_tpu.train.trainer import MultiWorkerPrefetcher

    def fetch_at(i):
        _time.sleep(0.001 * ((i * 7) % 5))  # scramble completion order
        if i == 4:
            raise ValueError("corrupt batch 4")
        return i * i

    streams = {}
    for workers in (1, 3):
        p = MultiWorkerPrefetcher(fetch_at, workers)
        got = []
        for i in range(8):
            if i == 4:
                with pytest.raises(ValueError, match="corrupt batch 4"):
                    p.get()
                got.append("err")
            else:
                got.append(p.get())
        streams[workers] = got
    assert streams[1] == streams[3]
    assert streams[1] == [0, 1, 4, 9, "err", 25, 36, 49]

    # resume: start=5 delivers 25 first
    p = MultiWorkerPrefetcher(fetch_at, 2, start=5)
    assert p.get() == 25


def test_sample_meta_batch_seeded_rng_is_pure(tiny_cfg):
    """sample_meta_batch(rng=RandomState(seed, it)) is a pure function of
    the seed — same seed twice gives identical batches, and the draw leaves
    the dataset's own RandomState untouched (single-thread stream parity)."""
    vocab = Vocab.from_json(tiny_cfg.data.labels_path)
    ds = SpectrogramDataset(vocab, tiny_cfg, tiny_cfg.data.train_manifest_list,
                            is_train=True)
    before = ds.rng.get_state()[1].copy()
    s1, q1 = ds.sample_meta_batch(2, 2, rng=np.random.RandomState(77))
    s2, q2 = ds.sample_meta_batch(2, 2, rng=np.random.RandomState(77))
    for a, b in zip((s1, q1), (s2, q2)):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
    assert np.array_equal(before, ds.rng.get_state()[1])


# --------------------------------------------------------------------------
# iter_batches valid counts
# --------------------------------------------------------------------------

def test_iter_batches_valid_count(tiny_cfg):
    vocab = Vocab.from_json(tiny_cfg.data.labels_path)
    ds = SpectrogramDataset(vocab, tiny_cfg,
                            [tiny_cfg.data.valid_manifest_list[0]])
    assert len(ds) == 7
    out = list(ds.iter_batches(4, shuffle=False, with_valid_count=True))
    assert [nv for _, nv in out] == [4, 3]
    # static shapes: the ragged final batch is padded to full size
    assert all(b["audio"].shape[0] == 4 for b, _ in out)


def test_iter_batches_small_set_tiles(tiny_cfg):
    """batch_size > dataset size must tile cyclically, not crash."""
    vocab = Vocab.from_json(tiny_cfg.data.labels_path)
    ds = SpectrogramDataset(vocab, tiny_cfg,
                            [tiny_cfg.data.valid_manifest_list[0]])
    out = list(ds.iter_batches(16, shuffle=False, with_valid_count=True))
    assert len(out) == 1
    batch, nv = out[0]
    assert nv == 7 and batch["audio"].shape[0] == 16


# --------------------------------------------------------------------------
# Ragged-final-batch eval == per-sample scoring
# --------------------------------------------------------------------------

def test_eval_cer_matches_per_sample_on_ragged_set(tiny_cfg):
    from mtl_tpu.models.transformer import build_model

    vocab = Vocab.from_json(tiny_cfg.data.labels_path)
    model = build_model(tiny_cfg, len(vocab))
    valid_ds = SpectrogramDataset(vocab, tiny_cfg,
                                  [tiny_cfg.data.valid_manifest_list[0]])

    import jax

    from mtl_tpu.train.steps import init_train_state
    import optax

    support, _ = SpectrogramDataset(
        vocab, tiny_cfg, tiny_cfg.data.train_manifest_list, is_train=True
    ).sample_meta_batch(2, 1)
    ex = jax.tree.map(lambda x: x[0], support)
    state = init_train_state(model, tiny_cfg, optax.adam(1e-3),
                             jax.random.PRNGKey(0), ex)

    # batched eval over the 7-utterance set with k_valid=4 (ragged final)
    cfg4 = tiny_cfg
    cfg4.train.k_valid = 4
    trainer = TrainerBase(model, cfg4, vocab)
    _, cer_batched, _, _ = trainer.evaluate(state.params, [valid_ds], 0)

    # per-sample scoring: batch size 1 (no padding rows anywhere)
    from mtl_tpu.train.trainer import batch_cer

    total_cer = total_char = 0
    for batch in valid_ds.iter_batches(1, shuffle=False):
        _, aux = trainer.eval_step(state.params, batch)
        c, n = batch_cer(aux["hyp"], aux["gold"], vocab)
        total_cer += c
        total_char += max(n, 1) if n else 1
    cer_per_sample = total_cer * 100.0 / max(total_char, 1)

    assert cer_batched == pytest.approx(cer_per_sample, abs=1e-9)


# --------------------------------------------------------------------------
# In-loop recovery from a corrupt wav mid-run
# --------------------------------------------------------------------------

def test_trainer_recovers_from_corrupt_wav(tiny_cfg, capsys):
    import jax
    import optax

    from mtl_tpu.models.transformer import build_model
    from mtl_tpu.train.optim import make_meta_optimizers
    from mtl_tpu.train.steps import init_train_state

    vocab = Vocab.from_json(tiny_cfg.data.labels_path)
    ds = SpectrogramDataset(vocab, tiny_cfg, tiny_cfg.data.train_manifest_list,
                            is_train=True, seed=3)

    # inject: wave loads 9..16 (= the 2nd prefetched meta batch; each batch
    # loads 3 tasks x k_train + k_valid = 8 waves) raise like a corrupt file
    calls = {"n": 0}
    orig = ds._load_wave

    def flaky(path, rng=None):
        calls["n"] += 1
        if 9 <= calls["n"] <= 16:
            raise ValueError(f"corrupt wav: {path}")
        return orig(path, rng)

    ds._load_wave = flaky

    model = build_model(tiny_cfg, len(vocab))
    _, outer_opt = make_meta_optimizers(tiny_cfg)
    support, _ = ds.sample_meta_batch(2, 2)  # loads 1..8 (pre-injection ok)
    calls["n"] = 8  # align counter: next fetch is the poisoned one
    ex = jax.tree.map(lambda x: x[0], support)
    state = init_train_state(model, tiny_cfg, outer_opt,
                             jax.random.PRNGKey(0), ex)

    trainer = TransientTrainer(model, tiny_cfg, vocab)
    out_state = trainer.train(ds, [], start_it=0, num_it=3, state=state)
    captured = capsys.readouterr().out
    assert "fetching new data" in captured, captured
    # all 3 iterations completed despite the poisoned fetch
    assert captured.count("TRAIN LOSS") == 3, captured
    assert int(out_state.step) == 3


def test_trainer_gives_up_after_persistent_failures(tiny_cfg, capsys):
    import jax
    import optax

    from mtl_tpu.models.transformer import build_model
    from mtl_tpu.train.optim import make_meta_optimizers
    from mtl_tpu.train.steps import init_train_state

    vocab = Vocab.from_json(tiny_cfg.data.labels_path)
    ds = SpectrogramDataset(vocab, tiny_cfg, tiny_cfg.data.train_manifest_list,
                            is_train=True, seed=4)
    model = build_model(tiny_cfg, len(vocab))
    _, outer_opt = make_meta_optimizers(tiny_cfg)
    support, _ = ds.sample_meta_batch(2, 2)
    ex = jax.tree.map(lambda x: x[0], support)
    state = init_train_state(model, tiny_cfg, outer_opt,
                             jax.random.PRNGKey(0), ex)

    def dead(*a, **k):
        raise OSError("filesystem gone")

    ds.sample_meta_batch = dead
    trainer = TransientTrainer(model, tiny_cfg, vocab)
    with pytest.raises(OSError, match="filesystem gone"):
        trainer.train(ds, [], start_it=0, num_it=10, state=state)


# --------------------------------------------------------------------------
# CLI flags
# --------------------------------------------------------------------------

def test_cache_and_cer_flags_wired():
    p = build_parser("t")
    args = p.parse_args(["--wave-cache-size", "7", "--train-cer-every", "3"])
    cfg = config_from_args(args)
    assert cfg.data.wave_cache_size == 7
    assert cfg.train.train_cer_every == 3


def test_save_cadence_warning(tiny_cfg, capsys):
    from mtl_tpu.models.transformer import build_model

    vocab = Vocab.from_json(tiny_cfg.data.labels_path)
    model = build_model(tiny_cfg, len(vocab))
    import copy

    cfg = copy.deepcopy(tiny_cfg)
    cfg.train.save_every = 5
    cfg.train.evaluate_every = 2
    TrainerBase(model, cfg, vocab)
    assert "not a multiple" in capsys.readouterr().out


# --------------------------------------------------------------------------
# Audio decode robustness (float-WAV fallback, clear errors)
# --------------------------------------------------------------------------

def _write_float_wav(path, y, rate=16000, bits=32):
    import struct

    data = y.astype("<f4" if bits == 32 else "<f8").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * bits // 8, bits // 8, bits)
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
                + b"WAVE")
        f.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        f.write(b"data" + struct.pack("<I", len(data)) + data)


def test_load_audio_float_wav(tmp_path):
    from mtl_tpu.data.audio import load_audio

    y = (np.sin(np.linspace(0, 20, 1600)) * 0.3).astype(np.float32)
    p = str(tmp_path / "f32.wav")
    _write_float_wav(p, y)
    out = load_audio(p)
    np.testing.assert_allclose(out, y, atol=1e-7)

    p64 = str(tmp_path / "f64.wav")
    _write_float_wav(p64, y.astype(np.float64), bits=64)
    np.testing.assert_allclose(load_audio(p64), y, atol=1e-7)


def test_load_audio_unsupported_container_message(tmp_path):
    from mtl_tpu.data.audio import load_audio

    # genuinely unsupported container (midi) -> actionable guidance
    p = str(tmp_path / "tune.mid")
    with open(p, "wb") as f:
        f.write(b"MThd\x00\x02" + b"\x00" * 64)
    with pytest.raises(ValueError, match="convert"):
        load_audio(p)
    # supported container (ogg by OggS magic) but a corrupt stream
    p = str(tmp_path / "clip.ogg")
    with open(p, "wb") as f:
        f.write(b"OggS\x00\x02" + b"\x00" * 64)
    with pytest.raises(ValueError, match="ogg"):
        load_audio(p)
    # supported container (mp3 by ID3 magic) but a corrupt stream -> a
    # clear decode error, not silence/garbage
    p = str(tmp_path / "fake.mp3.wav")
    with open(p, "wb") as f:
        f.write(b"ID3\x04\x00" + b"\x00" * 64)
    with pytest.raises(ValueError, match="mp3"):
        load_audio(p)
