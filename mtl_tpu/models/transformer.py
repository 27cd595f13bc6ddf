"""Top-level ASR Transformer.

Parity: models/asr/transformer.py:14-240 — conv feature extractor -> reshape
to frames -> encoder -> decoder (teacher-forced) -> logits; plus pure `encode`
for the decoding paths. The reference's copy-grad buffers (:205-240) have no
JAX analogue: parameters are immutable pytrees, so first-order/second-order
meta gradients are expressed functionally in mtl_tpu.train.steps.

Construction from config mirrors init_transformer_model
(utils/functions.py:307-351), including the derived ``dim_input``.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..config import Config
from .decoder import Decoder, LayerKV
from .encoder import Encoder
from .subsampler import FeatureExtractor, subsampled_length


class ASRTransformer(nn.Module):
    vocab_size: int
    feat_extractor: str = "vgg_cnn"
    num_enc_layers: int = 2
    num_dec_layers: int = 4
    num_heads: int = 8
    dim_model: int = 512
    dim_key: int = 64
    dim_value: int = 64
    dim_input: int = 5120
    dim_inner: int = 512
    dim_emb: int = 512
    dropout: float = 0.1
    src_max_length: int = 2500
    trg_max_length: int = 1000
    emb_trg_sharing: bool = False
    is_factorized: bool = False
    r: int = 100
    dtype: jnp.dtype = jnp.bfloat16
    remat: bool = False
    remat_conv: bool = False
    fused_vgg: bool = False  # channel-leading Pallas VGG kernels (TPU)
    encoder_type: str = "transformer"  # transformer | conformer

    def setup(self):
        conv_cls = FeatureExtractor
        if self.remat_conv:
            conv_cls = nn.remat(FeatureExtractor)
        self.conv = conv_cls(self.feat_extractor, dtype=self.dtype,
                             fused=self.fused_vgg)
        if self.encoder_type == "conformer":
            from .conformer import ConformerEncoder

            self.encoder = ConformerEncoder(
                num_layers=self.num_enc_layers, num_heads=self.num_heads,
                dim_model=self.dim_model, dim_input=self.dim_input,
                dropout=self.dropout, dtype=self.dtype, remat=self.remat,
            )
        else:
            self.encoder = Encoder(
                num_layers=self.num_enc_layers, num_heads=self.num_heads,
                dim_model=self.dim_model, dim_key=self.dim_key,
                dim_value=self.dim_value, dim_input=self.dim_input,
                dim_inner=self.dim_inner, dropout=self.dropout,
                src_max_length=self.src_max_length,
                is_factorized=self.is_factorized, r=self.r, dtype=self.dtype,
                remat=self.remat,
            )
        self.decoder = Decoder(
            vocab_size=self.vocab_size, num_layers=self.num_dec_layers,
            num_heads=self.num_heads, dim_emb=self.dim_emb,
            dim_model=self.dim_model, dim_inner=self.dim_inner,
            dim_key=self.dim_key, dim_value=self.dim_value,
            dropout=self.dropout, trg_max_length=self.trg_max_length,
            emb_trg_sharing=self.emb_trg_sharing,
            is_factorized=self.is_factorized, r=self.r, dtype=self.dtype,
        )

    def encode(
        self,
        features: jnp.ndarray,  # B x T x F log-spectrogram frames
        input_lengths: jnp.ndarray,  # B — raw frame counts
        deterministic: bool = True,
        train_conv: bool = False,
    ) -> jnp.ndarray:
        if self.remat_conv:
            # avoid threading the python bool through the remat boundary;
            # emb_cnn's BatchNorm then always uses running averages
            frames = self.conv(features)
        else:
            frames = self.conv(features, train=train_conv)  # B x T' x D_input
        # Reference quirk (SURVEY.md §3.3): encoder masks use the raw,
        # un-downsampled lengths against downsampled time.
        return self.encoder(frames, input_lengths, deterministic)

    def __call__(
        self,
        features: jnp.ndarray,  # B x T x F
        input_lengths: jnp.ndarray,  # B
        seq_in: jnp.ndarray,  # B x L teacher-forcing input (EOS-padded)
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """Teacher-forced forward; returns logits B x L x V."""
        enc = self.encode(features, input_lengths, deterministic,
                          train_conv=not deterministic)
        return self.decoder(seq_in, enc, input_lengths, deterministic)

    def forward_with_encoder(
        self,
        features: jnp.ndarray,
        input_lengths: jnp.ndarray,
        seq_in: jnp.ndarray,
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(logits, encoder output) — the adversarial/multitask path needs
        the encoder output for the discriminator (joint_trainer.py:29-31)."""
        enc = self.encode(features, input_lengths, deterministic,
                          train_conv=not deterministic)
        logits = self.decoder(seq_in, enc, input_lengths, deterministic)
        return logits, enc

    # ---- decoding entry points (used via nn.apply with method=...) --------
    def prepare_decode(
        self, features: jnp.ndarray, input_lengths: jnp.ndarray
    ) -> Tuple[jnp.ndarray, List[LayerKV]]:
        enc = self.encode(features, input_lengths, deterministic=True)
        return enc, self.decoder.precompute_enc_kv(enc)

    def precompute_enc_kv(self, enc: jnp.ndarray) -> List[LayerKV]:
        """Cross-attention K/V from a precomputed encoder output — the
        decode entry for encoder outputs produced elsewhere (e.g. the
        sequence-parallel long-form encode, parallel/sp.py)."""
        return self.decoder.precompute_enc_kv(enc)

    def decode_step(self, y_t, t, enc_kvs, caches):
        return self.decoder.decode_step(y_t, t, enc_kvs, caches)

    def init_cache(self, batch: int, max_steps: int):
        return self.decoder.init_cache(batch, max_steps)


def build_model(cfg: Config, vocab_size: int) -> ASRTransformer:
    """Construct the model from config (init_transformer_model parity)."""
    cfg.finalize()
    m = cfg.model
    return ASRTransformer(
        vocab_size=vocab_size,
        feat_extractor=m.feat_extractor,
        num_enc_layers=m.num_enc_layers,
        num_dec_layers=m.num_dec_layers,
        num_heads=m.num_heads,
        dim_model=m.dim_model,
        dim_key=m.dim_key,
        dim_value=m.dim_value,
        dim_input=m.dim_input,
        dim_inner=m.dim_inner,
        dim_emb=m.dim_emb,
        dropout=m.dropout,
        src_max_length=m.src_max_len,
        trg_max_length=m.tgt_max_len,
        emb_trg_sharing=m.emb_trg_sharing,
        is_factorized=m.is_factorized,
        r=m.r,
        dtype=jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32,
        remat=m.remat,
        remat_conv=m.remat_conv,
        # fused VGG is opt-in (--fused-vgg): the channel-leading kernels
        # compile and match the XLA path numerically, but measured end-to-end
        # they lose to XLA's conv on this hardware (BASELINE.md round-2
        # notes), so the default stays off. custom_vjp also cannot nest under
        # grad-of-grad, so --second-order forces the XLA path.
        fused_vgg=bool(m.fused_vgg) and not cfg.train.second_order,
        encoder_type=m.encoder_type,
    )
