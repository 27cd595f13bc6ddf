"""Sequence-parallel (SP) long-form encoding over the device mesh.

The reference is strictly single-device and caps utterances at
``src_max_len`` frames (models/asr/transformer.py reads whole utterances;
SURVEY.md §2.6 lists no SP). Long-form audio (lectures, meeting recordings)
blows past one chip's HBM at encoder resolution, so scale-out along TIME is
the natural TPU extension: shard the spectrogram time axis over the mesh's
``model`` axis (Megatron-style sequence parallelism reuses the tensor
parallel group exactly this way) and let XLA's SPMD partitioner do the rest:

* the VGG front-end is a spatial conv stack — XLA inserts halo exchanges
  (``collective-permute`` of the 1-2 boundary frames) so each chip convolves
  only its time slice;
* layer norms, FFNs, residuals and the positional-encoding add are
  elementwise over time — they stay fully sharded, each chip touching
  ``T/model`` frames;
* self-attention needs the full key/value sequence — XLA inserts exactly the
  ``all-gather`` over ICI there and nowhere else.

No hand-written collectives; the sharding constraint on the input is the
entire program. This mirrors the scaling-book recipe: annotate, let the
compiler insert collectives, verify the HLO.

Usage (eval/decode-time; training SP is unnecessary at the reference's
2500-frame cap):

    mesh = make_mesh(cfg)          # (task, data, model)
    enc = encode_sp(model, params, feats, lengths, mesh)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sp_input_sharding(mesh: Mesh) -> NamedSharding:
    """[B, T, F] spectrogram frames: batch over ``data``, TIME over
    ``model``."""
    return NamedSharding(mesh, P("data", "model", None))


@functools.lru_cache(maxsize=16)
def _sp_encode_jit(model, mesh: Mesh):
    """ONE jitted encode per (model, mesh) — shared by ``encode_sp`` and
    ``lower_encode_sp`` so (a) repeated long-form encode calls at decode
    time reuse the compiled executable instead of retracing a fresh closure
    per call, and (b) the HLO the tests/dryrun assert on is the exact
    program that executes (ADVICE r4). Flax modules and Mesh are hashable
    frozen dataclasses, so lru_cache keys them directly."""

    @jax.jit
    def run(p, feats, lens):
        feats = jax.lax.with_sharding_constraint(
            feats, sp_input_sharding(mesh))
        lens = jax.lax.with_sharding_constraint(
            lens, NamedSharding(mesh, P("data")))
        return model.apply(p, feats, lens, method=model.encode)

    return run


def encode_sp(model, params, features, lengths, mesh: Mesh):
    """Run ``model.encode`` with the time axis sharded over ``model``.

    ``features``: [B, T, F] log-spectrogram frames (the output of
    ``ops.frontend``); ``lengths``: [B] raw frame counts (the reference's
    raw-length mask quirk applies downstream as usual). Returns the encoder
    output [B, T', D] gathered per the compiler's layout — numerically equal
    to the unsharded ``model.encode`` (tests/test_parallel.py).
    """
    with mesh:
        return _sp_encode_jit(model, mesh)(
            params, jnp.asarray(features), jnp.asarray(lengths))


def lower_encode_sp(model, params, features, lengths, mesh: Mesh):
    """Compiled-artifact access for tests/analysis: returns the jitted
    lowering (the SAME program ``encode_sp`` executes) so callers can
    inspect the post-SPMD HLO (all-gather at attention, halo exchange at
    the convs) without executing."""
    with mesh:
        return _sp_encode_jit(model, mesh).lower(
            params, jnp.asarray(features), jnp.asarray(lengths))


def greedy_search_sp(model, params, features, lengths, vocab, max_steps,
                     start_token, mesh: Mesh):
    """Long-form greedy decode with a sequence-parallel encode — the
    product path behind ``test.py --mesh-model M`` (cli/asr.py:test_main).

    The encode (the HBM-heavy stage: VGG convs + encoder self-attention at
    full time resolution) runs with the TIME axis sharded over the mesh's
    ``model`` axis; the decoder then runs UNSHARDED from the gathered
    encoder output. Memory boundary (documented, not hidden): the decoder's
    cross-attention K/V are materialized for the FULL encoder length on
    every chip — at d_model=512 that is ~4 MB per 1000 encoder frames per
    utterance, so the gathered-decode regime holds to hour-scale audio;
    sharding the cross-attention itself is future work.
    """
    import numpy as np

    from ..decode.greedy import greedy_decode_from_kv, ids_to_strings

    enc = encode_sp(model, params, features, lengths, mesh)
    # gather: bring the time-sharded encoder output to one addressable
    # array, then decode outside the mesh (single-device decode program)
    enc = jnp.asarray(np.asarray(enc))
    enc_kvs = model.apply(params, enc, method=type(model).precompute_enc_kv)
    ids = greedy_decode_from_kv(model, params, enc_kvs, max_steps,
                                start_token, True)
    return ids_to_strings(ids, vocab)
