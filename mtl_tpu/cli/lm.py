"""LM CLI entry implementations.

Parity with the reference lm/ entry points (lm/main.py, lm/main_joint.py,
lm/main_meta_transfer.py, lm/finetune.py, lm/test.py, lm/convert.py) and
their flags (--model/--emsize/--nhid/--nlayers/--lr/--clip/--epochs/
--batch_size/--bptt/--dropout/--tied/--ratio/--meta_lr_factor/--seed/--save).
Where the reference hardcodes the CV/HKUST/SEAME corpus paths
(lm/main_meta_transfer.py:118-140), these take ``--train-path-list`` etc.;
the last listed corpus is the code-switched target. The shared growing
dictionary is chained across corpora in listed order.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..lm.data import Corpus, LMDataset, batchify, get_batch
from ..lm.fusion import save_lm_fusion
from ..lm.model import RNNLM
from ..lm.train import (
    evaluate_lm,
    evaluate_lm_test,
    joint_ratios,
    make_lm_joint_step,
    make_lm_meta_step,
    make_lm_sgd_step,
)
from ..utils.logger import log_print, setup_logging


def lm_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--name", type=str, default="")
    p.add_argument("--train_path", type=str, default=None)
    p.add_argument("--valid_path", type=str, default=None)
    p.add_argument("--test_path", type=str, default=None)
    p.add_argument("--train-path-list", nargs="+", type=str, default=None)
    p.add_argument("--valid-path-list", nargs="+", type=str, default=None)
    p.add_argument("--test-path-list", nargs="+", type=str, default=None)
    p.add_argument("--model", type=str, default="LSTM")
    p.add_argument("--emsize", type=int, default=200)
    p.add_argument("--nhid", type=int, default=200)
    p.add_argument("--nlayers", type=int, default=2)
    p.add_argument("--lr", type=float, default=20)
    p.add_argument("--meta_lr_factor", type=float, default=3)
    p.add_argument("--clip", type=float, default=0.25)
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--batch_size", type=int, default=20)
    p.add_argument("--bptt", type=int, default=35)
    p.add_argument("--dropout", type=float, default=0.2)
    p.add_argument("--ratio", type=float, default=0.8)
    p.add_argument("--tied", action="store_true")
    p.add_argument("--pad", action="store_true")
    p.add_argument("--seed", type=int, default=1111)
    p.add_argument("--cuda", action="store_true")
    p.add_argument("--log_path", type=str, default="./log")
    p.add_argument("--log-interval", type=int, default=200)
    # Reference cadence (lm/main_joint.py:385-391): train-loss log every 200
    # its, validation/anneal every 600 its — decoupled knobs.
    p.add_argument("--valid-interval", type=int, default=600)
    # The reference runs joint/meta LM training on a fixed 1,000,000-
    # iteration budget with patience-5 early stop (its --epochs is unused
    # there). 0 keeps this CLI's legacy mapping num_it = epochs * 100 for
    # bounded runs; pass --num-iterations 1000000 for exact parity.
    p.add_argument("--num-iterations", type=int, default=0)
    p.add_argument("--save", type=str, default="./model")
    p.add_argument("--load", type=str, default=None)
    p.add_argument("--second-order", action="store_true")
    return p


def _log_name(args, extra: str = "") -> str:
    return (f"{args.name}_model{args.model}_bptt{args.bptt}_lr{args.lr}"
            f"_drop{args.dropout}_layers{args.nlayers}_nhid{args.nhid}"
            f"_emsize{args.emsize}{extra}")


def build_lm(args, ntokens: int) -> RNNLM:
    return RNNLM(rnn_type=args.model, ntoken=ntokens, ninp=args.emsize,
                 nhid=args.nhid, nlayers=args.nlayers, dropout=args.dropout,
                 tie_weights=args.tied)


def _arch_dict(args, ntokens: int) -> dict:
    return {"rnn_type": args.model, "ntoken": ntokens, "ninp": args.emsize,
            "nhid": args.nhid, "nlayers": args.nlayers,
            "dropout": args.dropout, "tie_weights": args.tied}


def save_lm_ckpt(path: str, params, dictionary, args, ntokens: int) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "meta.json"), "w", encoding="utf-8") as f:
        json.dump({
            "arch": _arch_dict(args, ntokens),
            "word2idx": dictionary.word2idx,
        }, f, ensure_ascii=False)
    with open(os.path.join(path, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(params))


def load_lm_ckpt(path: str):
    with open(os.path.join(path, "meta.json"), encoding="utf-8") as f:
        meta = json.load(f)
    arch = meta["arch"]
    model = RNNLM(rnn_type=arch["rnn_type"], ntoken=arch["ntoken"],
                  ninp=arch["ninp"], nhid=arch["nhid"],
                  nlayers=arch["nlayers"], dropout=arch["dropout"],
                  tie_weights=arch["tie_weights"])
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 1), jnp.int32))
    with open(os.path.join(path, "params.msgpack"), "rb") as f:
        params = serialization.from_bytes(params, f.read())
    return model, params, meta["word2idx"], arch


def _train_epochs(model, params, train_data, val_data, args, save_path):
    """Plain epoch loop with lr/4 anneal + patience 5 (lm/main.py:292-321)."""
    step = make_lm_sgd_step(model, args.clip)
    rng = jax.random.PRNGKey(args.seed)
    lr = args.lr
    best_val, counter = None, 0
    best_params = params
    for epoch in range(1, args.epochs + 1):
        t0 = time.time()
        i, total_loss, nb = 0, 0.0, 0
        carry = model.apply(params, train_data.shape[1],
                            method="init_carry")
        while i < len(train_data) - 1:
            data, target = get_batch(train_data, i, args.bptt)
            if data.shape[0] < args.bptt:
                break  # reference trains on full windows; tail skipped
            rng, sub = jax.random.split(rng)
            params, loss, carry = step(params, data, target, lr, sub, carry)
            total_loss += float(loss)
            nb += 1
            i += args.bptt
        val_loss = evaluate_lm(model, params, val_data,
                               args.bptt) if val_data is not None else 0.0
        log_print(
            "| end of epoch {:3d} | time: {:5.2f}s | train loss {:5.2f} | "
            "valid loss {:5.2f} | valid ppl {:8.2f}".format(
                epoch, time.time() - t0, total_loss / max(nb, 1), val_loss,
                math.exp(min(val_loss, 30)),
            )
        )
        if best_val is None or val_loss < best_val:
            best_val, counter = val_loss, 0
            best_params = params
        else:
            lr /= 4.0
            counter += 1
        if counter == 5:
            break
    return best_params, best_val


def main_main(argv=None):
    """lm/main.py: plain LM train/valid/test."""
    args = lm_parser("RNN/LSTM LM (TPU)").parse_args(argv)
    setup_logging("lm_" + _log_name(args))
    corpus = Corpus(args.train_path, args.valid_path, args.test_path,
                    None, args.seed)
    ntokens = len(corpus.dictionary)
    train_data = batchify(corpus.train, args.batch_size)
    model = build_lm(args, ntokens)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((2, 1), jnp.int32))
    best_params, best_val = _train_epochs(model, params, train_data,
                                          corpus.valid, args, args.save)
    save_path = os.path.join(args.save, _log_name(args))
    save_lm_ckpt(save_path, best_params, corpus.dictionary, args, ntokens)
    if corpus.test is not None:
        idx2word = {v: k for k, v in corpus.dictionary.word2idx.items()}
        # per-word probability dump (lm/main.py:199,217-250 writes
        # predictions/<log_name> during test evaluation)
        os.makedirs("predictions", exist_ok=True)
        dump_path = os.path.join("predictions", "lm_" + _log_name(args))
        res = evaluate_lm_test(model, best_params, corpus.test, idx2word,
                               args.bptt, dump_path=dump_path)
        log_print("| End of training | test loss {:5.2f} | test ppl {:8.2f}"
                  .format(res["loss"], res["ppl"]))
        log_print(f"PER-WORD PROBS: {dump_path}")
    log_print(f"SAVED {save_path}")
    return save_path


def _load_chained_corpora(args):
    """Chained dictionary across listed corpora; last = code-switched target
    (lm/main_meta_transfer.py:131-140 order semantics)."""
    train_list = args.train_path_list or [args.train_path]
    valid_list = args.valid_path_list or ([args.valid_path]
                                          if args.valid_path else [])
    test_list = args.test_path_list or ([args.test_path]
                                        if args.test_path else [])
    corpora: List[Corpus] = []
    dictionary = None
    for i, tr in enumerate(train_list):
        c = Corpus(
            tr,
            valid_list[i] if i < len(valid_list) else None,
            test_list[i] if i < len(test_list) else None,
            dictionary, args.seed,
        )
        dictionary = c.dictionary
        corpora.append(c)
    return corpora, dictionary


def _corpus_label(path: Optional[str], i: int) -> str:
    """Human corpus tag from its train path (the reference hardcodes
    SEAME/CV/HKUST; these CLIs take arbitrary paths)."""
    if not path:
        return f"TASK{i}"
    parent = os.path.basename(os.path.dirname(os.path.normpath(path)))
    stem = os.path.splitext(os.path.basename(path))[0]
    return (parent or stem or f"task{i}").upper()


def _end_of_training_report(model, best_params, corpora, labels, bptt):
    """End-of-training test evaluation over ALL corpora with the best model
    (lm/main_joint.py:398-415 — reload best, report test loss/ppl per
    corpus; best_params here IS the reloaded best)."""
    results = {}
    for label, c in zip(labels, corpora):
        if c.test is None:
            continue
        loss = evaluate_lm(model, best_params, c.test, bptt)
        log_print("{} {}| End of training | test loss {:5.2f} | test ppl "
                  "{:8.2f}{}".format(label, "=" * 89, loss,
                                     math.exp(min(loss, 30)), "=" * 89))
        results[label] = loss
    return results


class _LMValidator:
    """Shared valid/anneal/patience state for the iteration-based LM mains
    (lm/main_joint.py:340-378): validate every --valid-interval, per-valid
    target test line, keep best params, lr/4 on plateau, stop at patience 5."""

    def __init__(self, model, args, target_valid, target_test, init_params):
        self.model, self.args = model, args
        self.target_valid, self.target_test = target_valid, target_test
        self.lr = args.lr
        self.best_val, self.counter = None, 0
        self.best_params = init_params
        self.window_loss = 0.0  # train loss since the last validation
        self.t_log = time.time()

    def after_step(self, it: int, params, total_loss: float,
                   tag: str = "word_loss") -> bool:
        """Returns True when training should stop (patience exhausted)."""
        args = self.args
        self.window_loss += total_loss
        log_interval = max(1, args.log_interval)
        valid_interval = max(1, args.valid_interval)
        if it % log_interval == 0:
            denom = it % valid_interval or valid_interval
            cur = self.window_loss / denom
            elapsed = time.time() - self.t_log
            log_print("| it {:5d} | lr {:02.2f} | ms/batch {:5.2f} | {} "
                      "{:5.2f} | avg ppl {:8.2f}".format(
                          it, self.lr, elapsed * 1000 / log_interval, tag,
                          cur, math.exp(min(cur, 30))))
            self.t_log = time.time()
        if it % valid_interval:
            return False
        if self.target_valid is not None:
            val_loss = evaluate_lm(self.model, params, self.target_valid,
                                   args.bptt)
        else:
            val_loss = total_loss
        log_print("it {} | val loss {:5f} | ppl {:5f}".format(
            it, val_loss, math.exp(min(val_loss, 30))))
        if self.target_test is not None:  # lm/main_joint.py:360-361
            test_loss = evaluate_lm(self.model, params, self.target_test,
                                    args.bptt)
            log_print("it {} | test loss {:5f} | ppl {:5f}".format(
                it, test_loss, math.exp(min(test_loss, 30))))
        if self.best_val is None or val_loss < self.best_val:
            self.best_val, self.counter = val_loss, 0
            self.best_params = params
        else:
            self.lr /= 4.0
            self.counter += 1
        self.window_loss = 0.0
        return self.counter == 5


def main_joint_main(argv=None):
    """lm/main_joint.py: ratio-weighted multi-corpus training."""
    args = lm_parser("Joint LM (TPU)").parse_args(argv)
    setup_logging("lm_joint_" + _log_name(args, f"_ratio{args.ratio}"))
    corpora, dictionary = _load_chained_corpora(args)
    ntokens = len(dictionary)
    ds = LMDataset([c.train for c in corpora], args.bptt, args.batch_size)
    model = build_lm(args, ntokens)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((2, 1), jnp.int32))
    ratios = joint_ratios(len(corpora), args.ratio)
    step = make_lm_joint_step(model, args.clip, ratios)
    target_valid = next(
        (c.valid for c in reversed(corpora) if c.valid is not None), None
    )
    target_test = next(
        (c.test for c in reversed(corpora) if c.test is not None), None
    )

    rng = jax.random.PRNGKey(args.seed)
    num_it = args.num_iterations or args.epochs * 100
    val = _LMValidator(model, args, target_valid, target_test, params)
    for it in range(1, num_it + 1):
        samples = [ds.sample(i, it - 1) for i in range(len(corpora))]
        datas = np.stack([s[0] for s in samples])
        targets = np.stack([s[1] for s in samples])
        rng, sub = jax.random.split(rng)
        params, total, losses = step(params, datas, targets, val.lr, sub)
        if val.after_step(it, params, float(total)):
            break
    save_path = os.path.join(args.save,
                             "joint_" + _log_name(args, f"_ratio{args.ratio}"))
    save_lm_ckpt(save_path, val.best_params, dictionary, args, ntokens)
    labels = [_corpus_label(p, i)
              for i, p in enumerate(args.train_path_list
                                    or [args.train_path])]
    _end_of_training_report(model, val.best_params, corpora, labels,
                            args.bptt)
    log_print(f"SAVED {save_path}")
    return save_path


def main_meta_transfer_main(argv=None):
    """lm/main_meta_transfer.py: meta-transfer for the LM."""
    args = lm_parser("Meta-transfer LM (TPU)").parse_args(argv)
    setup_logging("lm_meta_" + _log_name(
        args, f"_meta_lr_factor{args.meta_lr_factor}_ratio{args.ratio}"))
    corpora, dictionary = _load_chained_corpora(args)
    ntokens = len(dictionary)
    ds = LMDataset([c.train for c in corpora], args.bptt, args.batch_size)
    model = build_lm(args, ntokens)
    params = model.init(jax.random.PRNGKey(args.seed),
                        jnp.zeros((2, 1), jnp.int32))
    ratios = joint_ratios(len(corpora), args.ratio)
    step = make_lm_meta_step(model, args.clip, ratios, args.meta_lr_factor,
                             second_order=args.second_order)
    target_valid = next(
        (c.valid for c in reversed(corpora) if c.valid is not None), None
    )
    target_test = next(
        (c.test for c in reversed(corpora) if c.test is not None), None
    )

    rng = jax.random.PRNGKey(args.seed)
    num_it = args.num_iterations or args.epochs * 100
    val = _LMValidator(model, args, target_valid, target_test, params)
    for it in range(1, num_it + 1):
        # query = the LAST task's window (lm/main_meta_transfer.py:302)
        _, _, q_data, q_target = ds.sample(-1, it - 1)
        samples = [ds.sample(i, it - 1) for i in range(len(corpora))]
        datas = np.stack([s[0] for s in samples])
        targets = np.stack([s[1] for s in samples])
        rng, sub = jax.random.split(rng)
        params, total, q_losses = step(params, datas, targets, q_data,
                                       q_target, val.lr, sub)
        if val.after_step(it, params, float(total), tag="meta loss"):
            break
    save_path = os.path.join(
        args.save, "meta_" + _log_name(
            args, f"_meta_lr_factor{args.meta_lr_factor}_ratio{args.ratio}"))
    save_lm_ckpt(save_path, val.best_params, dictionary, args, ntokens)
    labels = [_corpus_label(p, i)
              for i, p in enumerate(args.train_path_list
                                    or [args.train_path])]
    _end_of_training_report(model, val.best_params, corpora, labels,
                            args.bptt)
    log_print(f"SAVED {save_path}")
    return save_path


def finetune_main(argv=None):
    """lm/finetune.py: load a saved LM, fine-tune on the target corpus."""
    args = lm_parser("Finetune LM (TPU)").parse_args(argv)
    assert args.load, "--load is required for finetune"
    setup_logging("lm_finetune_" + _log_name(args))
    model, params, word2idx, arch = load_lm_ckpt(args.load)
    from ..lm.data import Dictionary

    dictionary = Dictionary()
    for w, i in sorted(word2idx.items(), key=lambda kv: kv[1]):
        dictionary.add_word(w)
    corpus = Corpus(args.train_path, args.valid_path, args.test_path,
                    dictionary, args.seed)
    train_data = batchify(corpus.train, args.batch_size)
    best_params, best_val = _train_epochs(model, params, train_data,
                                          corpus.valid, args, args.save)
    save_path = os.path.join(args.save, "finetune_" + _log_name(args))
    save_lm_ckpt(save_path, best_params, dictionary, args,
                 arch["ntoken"])
    log_print(f"SAVED {save_path}")
    return save_path


def test_main(argv=None):
    """lm/test.py: perplexity + code-switch transition breakdown."""
    args = lm_parser("Test LM (TPU)").parse_args(argv)
    assert args.load, "--load is required for test"
    setup_logging("lm_test_" + _log_name(args))
    model, params, word2idx, arch = load_lm_ckpt(args.load)
    from ..lm.data import Dictionary

    dictionary = Dictionary()
    for w, i in sorted(word2idx.items(), key=lambda kv: kv[1]):
        dictionary.add_word(w)
    corpus = Corpus(args.test_path or args.train_path, None, None,
                    dictionary, args.seed)
    idx2word = {v: k for k, v in word2idx.items()}
    os.makedirs("predictions", exist_ok=True)
    dump_path = os.path.join("predictions", "lm_test_" + _log_name(args))
    res = evaluate_lm_test(model, params, corpus.train, idx2word, args.bptt,
                           dump_path=dump_path)
    log_print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                          for k, v in res.items()}, ensure_ascii=False))
    log_print(f"PER-WORD PROBS: {dump_path}")
    return res


def convert_main(argv=None):
    """lm/convert.py: re-save a trained LM in the fusion-scorer format."""
    args = lm_parser("Convert LM (TPU)").parse_args(argv)
    assert args.load, "--load is required for convert"
    model, params, word2idx, arch = load_lm_ckpt(args.load)
    out = args.save
    save_lm_fusion(out, params, word2idx, arch)
    print(f"CONVERTED -> {out}")
    return out
