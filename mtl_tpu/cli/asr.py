"""ASR CLI entry implementations (reference entry-point parity).

* ``meta_transfer_train`` — meta_transfer_train.py (TransientTrainer)
* ``joint_train`` — joint_train.py (JointTrainer, +adversarial/multitask)
* ``train`` — train.py (EpochTrainer; note the reference's train.py is stale,
  SURVEY.md §1 — this one works)
* ``finetune`` — finetune.py (JointTrainer from a checkpoint)
* ``test`` — test.py (beam/greedy decode + CER/WER/EN-ZH CER report)
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import numpy as np

from ..config import Config, build_parser, config_from_args
from ..data.vocab import post_process
from ..models.discriminator import Discriminator
from ..train.trainer import (
    EpochTrainer,
    JointTrainer,
    MetaTrainer,
    TransientTrainer,
    batch_cer,
)
from ..utils.logger import log_print
from ..utils.metrics import calculate_cer, calculate_cer_en_zh, calculate_wer
from .common import (
    build_asr_model,
    build_datasets,
    build_vocab,
    maybe_resume,
    setup,
)


def _prepare(cfg: Config):
    setup(cfg)
    cfg, vocab, state, start_it, metrics = maybe_resume(cfg)
    if vocab is None:
        vocab = build_vocab(cfg)
    train_ds, valid_sets = build_datasets(cfg, vocab)
    model = build_asr_model(cfg, vocab)
    return cfg, vocab, model, train_ds, valid_sets, state, start_it, metrics


def meta_transfer_train_main(argv=None, trainer_cls=TransientTrainer):
    parser = build_parser("Transformer ASR meta training (TPU)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    cfg, vocab, model, train_ds, valid_sets, state, start_it, metrics = (
        _prepare(cfg)
    )
    trainer = trainer_cls(model, cfg, vocab)
    log_print("Transient Trainer is initialized" if
              trainer_cls is TransientTrainer else "Meta Trainer is initialized")
    disc = None
    if cfg.train.adversarial or cfg.train.multitask:
        # adversarial/multitask head in meta-validation
        # (meta_trainer.py:243-263)
        disc = Discriminator(cfg.train.num_class)
    state = trainer.train(train_ds, valid_sets, start_it=start_it,
                          num_it=cfg.train.epochs, last_metrics=metrics,
                          discriminator=disc)
    num_meta_test = getattr(args, "num_meta_test", 0)
    if num_meta_test and valid_sets:
        from ..train.trainer import meta_evaluate

        params = state.base.params if disc is not None else state.params
        meta_evaluate(trainer, params, train_ds, valid_sets,
                      num_meta_test=num_meta_test)
    return state


def meta_train_main(argv=None):
    """MAML variant (trainer/asr/meta_trainer.py — not wired to an entry
    point in the reference; exposed here as a first-class mode)."""
    return meta_transfer_train_main(argv, trainer_cls=MetaTrainer)


def joint_train_main(argv=None):
    parser = build_parser("Transformer ASR joint training (TPU)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    cfg, vocab, model, train_ds, valid_sets, state, start_it, metrics = (
        _prepare(cfg)
    )
    trainer = JointTrainer(model, cfg, vocab)
    disc = None
    if cfg.train.adversarial or cfg.train.multitask:
        disc = Discriminator(cfg.train.num_class)
    return trainer.train(train_ds, valid_sets, start_it=start_it,
                         num_it=cfg.train.epochs, last_metrics=metrics,
                         discriminator=disc)


def train_main(argv=None):
    parser = build_parser("Transformer ASR epoch training (TPU)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    cfg, vocab, model, train_ds, valid_sets, state, start_it, metrics = (
        _prepare(cfg)
    )
    trainer = EpochTrainer(model, cfg, vocab)
    return trainer.train(train_ds, valid_sets, start_epoch=start_it,
                         num_epochs=cfg.train.epochs)


def finetune_main(argv=None):
    """finetune.py parity: load checkpoint (meta or joint — our checkpoints
    are format-identical), then JointTrainer."""
    parser = build_parser("Transformer ASR finetuning (TPU)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    assert cfg.continue_from, "--continue-from is required for finetune"
    return joint_train_main(argv)


def test_main(argv=None):
    """test.py parity: load best model, decode the test manifests with
    greedy or beam (+ optional LM fusion), report CER/WER + EN/ZH CER."""
    parser = build_parser("Transformer ASR evaluation (TPU)")
    args = parser.parse_args(argv)
    cfg = config_from_args(args)
    setup(cfg)
    assert cfg.continue_from, "--continue-from is required for test"

    from ..data.dataset import SpectrogramDataset
    from ..decode.beam import beam_search_grouped
    from ..decode.greedy import greedy_search
    from ..train.steps import init_train_state, make_eval_step, prepare_features
    from ..train.optim import make_joint_optimizer
    from ..utils.checkpoint import load_checkpoint
    import jax.numpy as jnp

    saved_cfg, vocab, raw_state, step, _ = load_checkpoint(cfg.continue_from)
    # decode/audio settings come from the CLI, model arch from the checkpoint
    saved_cfg.decode = cfg.decode
    saved_cfg.data = cfg.data
    # Sequence-parallel long-form eval (`--mesh-model M`): the encode runs
    # with its TIME axis sharded over the mesh's model axis
    # (parallel/sp.py:greedy_search_sp); the decoder runs unsharded from the
    # gathered encoder output (cross-attention K/V are NOT sharded — the
    # documented memory boundary). Long-form utterances exceed the
    # checkpoint's trained src cap, so the CLI's --src-max-len wins when
    # larger (the sinusoidal PE table extends losslessly; param shapes are
    # unaffected).
    sp_mesh = None
    if cfg.mesh.model > 1:
        from ..parallel.mesh import maybe_make_mesh

        if cfg.decode.beam_search:
            raise ValueError(
                "--mesh-model (sequence-parallel encode) currently supports "
                "greedy decode only; drop --beam-search or --mesh-model")
        sp_mesh = maybe_make_mesh(cfg)
        saved_cfg.model.src_max_len = max(saved_cfg.model.src_max_len,
                                          cfg.model.src_max_len)
        log_print(f"sequence-parallel encode: time axis over "
                  f"model={sp_mesh.shape['model']} "
                  f"(src_max_len={saved_cfg.model.src_max_len})")
    model = build_asr_model(saved_cfg, vocab)
    params = raw_state["params"]

    lm = None
    if cfg.decode.lm_rescoring:
        from ..lm.fusion import LMScorer

        lm = LMScorer.load(cfg.decode.lm_path)

    test_sets = [
        SpectrogramDataset(vocab, saved_cfg, [m], normalize=True)
        for m in cfg.data.test_manifest_list
    ]
    total_cer = total_wer = total_char = total_word = 0
    total_en_cer = total_zh_cer = total_en_char = total_zh_char = 0
    start = time.time()
    k_test = getattr(args, "k_test", None) or cfg.train.k_valid
    nbest = max(1, cfg.decode.beam_nbest)
    for ds in test_sets:
        for batch, num_valid in ds.iter_batches(k_test, shuffle=False,
                                                with_valid_count=True):
            feats, lengths = prepare_features(
                jax.tree.map(jnp.asarray, batch), saved_cfg
            )
            nbest_lists = None
            if cfg.decode.beam_search:
                from ..models.subsampler import subsampled_length

                # reference horizon: the beam loops --tgt-max-len (from the
                # TEST CLI, not the checkpoint — test.py:65) iterations but
                # force-retires every survivor with EOS at the ENCODER
                # length (modules/decoder.py:215,253-255), so the effective
                # horizon is min(tgt_max_len, enc_len); --max-steps stays
                # the fixed-size-bank memory cap
                enc_len = int(subsampled_length(
                    saved_cfg.model.feat_extractor,
                    np.asarray(feats.shape[1])))
                horizon = min(cfg.model.tgt_max_len, max(enc_len, 1))
                grouped = beam_search_grouped(
                    model, params, feats, lengths, vocab,
                    beam_width=cfg.decode.beam_width,
                    nbest=nbest,
                    max_steps=min(cfg.decode.max_steps, horizon),
                    start_token=vocab.SOS_ID,
                    c_weight=cfg.decode.c_weight,
                    lm=lm, lm_rescoring=cfg.decode.lm_rescoring,
                    lm_weight=cfg.decode.lm_weight,
                )
                hyps = [g[0][2] if g else "" for g in grouped]
                nbest_lists = grouped
                if len(hyps) == 0 or len(hyps[0].strip()) == 0:
                    # reference fallback-to-greedy rule
                    # (models/asr/transformer.py:190-197)
                    log_print(">>>>>>> switch to greedy")
                    hyps = greedy_search(model, params, feats, lengths, vocab,
                                         cfg.decode.max_steps, vocab.SOS_ID)
                    nbest_lists = None
            elif sp_mesh is not None:
                from ..parallel.sp import greedy_search_sp

                hyps = greedy_search_sp(model, params, feats, lengths, vocab,
                                        cfg.decode.max_steps, vocab.SOS_ID,
                                        sp_mesh)
            else:
                hyps = greedy_search(model, params, feats, lengths, vocab,
                                     cfg.decode.max_steps, vocab.SOS_ID)
            golds = [
                post_process(vocab.decode_ids(row), vocab.special_token_list)
                for row in batch["targets"]
            ]
            # score only the real rows; the final ragged batch is padded with
            # duplicate utterances to keep shapes static
            hyps, golds = hyps[:num_valid], golds[:num_valid]
            for ind, (hyp, gold) in enumerate(zip(hyps, golds)):
                hyp = post_process(hyp, vocab.special_token_list)
                # reference-exact scoring (test.py:138-158): CER over the
                # STRIPPED strings (interior spaces count as characters),
                # total chars include spaces, words split on single spaces
                cer = calculate_cer(hyp.strip(), gold.strip())
                wer = calculate_wer(hyp, gold)
                en_d, zh_d, en_n, zh_n = calculate_cer_en_zh(hyp, gold)
                total_cer += cer
                total_wer += wer
                total_char += len(gold)
                total_word += len(gold.split(" "))
                total_en_cer += en_d
                total_zh_cer += zh_d
                total_en_char += en_n
                total_zh_char += zh_n
                log_print(f"PRED: {hyp}")
                log_print(f"GOLD: {gold}")
                # n-best reporting (reference appends all n-best per
                # utterance, modules/decoder.py:286-291; --beam-nbest)
                if nbest_lists is not None and nbest > 1:
                    for rank, (score, _, s) in enumerate(nbest_lists[ind]):
                        log_print(
                            f"NBEST {rank + 1}: {score:.4f} "
                            f"{post_process(s, vocab.special_token_list)}"
                        )
    log_print(
        "TOTAL CER: {:.2f}% WER: {:.2f}% EN CER: {:.2f}% ZH CER: {:.2f}% "
        "TIME: {:.2f}s".format(
            total_cer * 100.0 / max(total_char, 1),
            total_wer * 100.0 / max(total_word, 1),
            total_en_cer * 100.0 / max(total_en_char, 1),
            total_zh_cer * 100.0 / max(total_zh_char, 1),
            time.time() - start,
        )
    )
    return {
        "cer": total_cer * 100.0 / max(total_char, 1),
        "wer": total_wer * 100.0 / max(total_word, 1),
        "en_cer": total_en_cer * 100.0 / max(total_en_char, 1),
        "zh_cer": total_zh_cer * 100.0 / max(total_zh_char, 1),
    }
