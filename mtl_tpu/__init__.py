"""mtl_tpu — a TPU-native meta-transfer-learning framework for code-switched
speech recognition.

A ground-up JAX/Flax/optax/Pallas rebuild of the capabilities of the PyTorch
reference `audioku/meta-transfer-learning` (ACL 2020, "Meta-Transfer Learning
for Code-Switched Speech Recognition"):

* ASR: VGG-CNN subsampler -> Transformer encoder -> autoregressive character
  decoder, trained with plain / joint / MAML / meta-transfer regimes and
  evaluated with greedy / beam decoding (+ LSTM-LM shallow fusion) and
  CER / WER / per-language CER metrics.
* LM: word-level LSTM language model with its own plain / joint /
  meta-transfer / finetune / test / convert pipeline.

Everything is designed TPU-first: static shapes, device-resident fused
log-spectrogram front-end, jitted train steps, `jax.vmap` task parallelism for
the meta loops, and `jax.sharding` meshes for scale-out.
"""

__version__ = "0.1.0"
