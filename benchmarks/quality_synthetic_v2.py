"""Discriminative quality benchmark: a synthetic extraction task hard enough
that the production decode path's parameters MOVE the score.

VERDICT.md round-2 weak #2: `quality_synthetic.py` saturates at 100.0 — a
ceiling score cannot detect regressions in the decode path the headline
depends on (threshold / min_span / merge_gap in `models/highlighter.py`),
and torch-parity at the ceiling is weak evidence of equivalence. This v2
keeps the same production path (train with `training/trainer.py`, score
through `ModelSpanExtractor` + `training/eval_f1.py`) but makes the task
discriminative four ways:

1. **Near-duplicate distractors** — for every gold sentence there are
   same-topic sentences that differ only in a negation ("did not … after
   all") or a weak-salience marker; surface overlap with gold is ~90%.
2. **Lexical-trap distractors** — sentences about OTHER topics that mention
   the question topic's keyword in a comparison clause, with the salient
   marker present; bag-of-words matching scores these wrong.
3. **Clause-level gold spans** — gold is the mid-sentence finding clause,
   not the whole sentence, so span BOUNDARIES (not just detection) are
   scored; threshold perturbations shift where the decode cuts.
4. **OCR-style noise** — length-preserving char corruptions (o→0, i→1,
   e→3, l→1) hit 35% of sentences, so some tokens of the eval rows were
   never seen in training.

Two properties make the eval rows irreducibly out-of-distribution, so the
score band is set by TASK design rather than by how long you train (a
fully-converged model still cannot saturate):

5. **Held-out keyword forms** — each topic's keyword list is split: train
   rows draw subjects/tails from keywords 0–2, dev rows ONLY from keywords
   3–4, which never appear in training (HashTokenizer gives them ids the
   model has never weighted).
6. **Dev-only noise alphabet** — a second length-preserving corruption
   pass (a→4, s→5, t→7, u→v; disjoint from the train-time table) hits 60%
   of dev sentences at a 35% word rate, corrupting salience markers and
   subjects into token forms no training step ever produced.

Both are rng-stream-neutral: train rows are byte-identical to the pre-5/6
dataset, so checkpoints trained before the hardening rescore comparably.

Reported: trained F1 (target band: 60–90), random-init floor, and the
decode-sensitivity probe — F1 at threshold ±0.1 and with span filters off.
A decode regression (wrong threshold semantics, off-by-one merge, dropped
min-length filter) shows up as a shifted sensitivity profile even when the
headline F1 looks plausible.

Run: JAX_PLATFORMS=cpu python benchmarks/quality_synthetic_v2.py   (~8 min)
"""

from __future__ import annotations

import json
import os

import numpy as np

TOPICS = {
    "solar": ["panel", "inverter", "irradiance", "photovoltaic", "rooftop"],
    "wind": ["turbine", "blade", "offshore", "gearbox", "rotor"],
    "rivers": ["delta", "estuary", "tributary", "floodplain", "watershed"],
    "metals": ["alloy", "smelter", "corrosion", "tensile", "anneal"],
    "birds": ["plumage", "migration", "nesting", "raptor", "songbird"],
}
FILLER = ["report", "figure", "chapter", "survey", "appendix", "archive"]

_OCR = str.maketrans({"o": "0", "i": "1", "e": "3", "l": "1"})
# Dev-only corruption alphabet — disjoint from _OCR so every corrupted form
# is a token the model never saw during training (docstring property 6).
_OCR_DEV = str.maketrans({"a": "4", "s": "5", "t": "7", "u": "v"})


def _ocr_noise(sentence: str, rng) -> str:
    """Length-preserving OCR-style corruption of ~25% of the words."""
    words = sentence.split(" ")
    for j in range(len(words)):
        if rng.random() < 0.25:
            words[j] = words[j].translate(_OCR)
    return " ".join(words)


def _dev_noise(sentence: str, rng) -> str:
    """Length-preserving dev-only corruption: unseen char forms (35% words)."""
    words = sentence.split(" ")
    for j in range(len(words)):
        if rng.random() < 0.35:
            words[j] = words[j].translate(_OCR_DEV)
    return " ".join(words)


def _sentence(
    kind: str, q_topic: str, other: str, rng, dev: bool = False
) -> tuple[str, tuple[int, int] | None]:
    """Build one sentence; returns (text, gold-clause char span or None).

    Kinds:
      gold     — subject is the question topic, salient finding clause (gold)
      neardup  — same shape, negated finding ("did not …, after all")
      weak     — same shape, weak marker ("nominally")
      trap     — subject is ANOTHER topic, mentions the question topic's
                 keyword in the comparison tail, salient marker present
      filler   — unrelated topic, weak marker
    """
    # One rng draw per keyword regardless of split (stream-neutral); the
    # VALUE is remapped so train rows only ever see keywords 0-2 and dev
    # rows only ever see the held-out keywords 3-4 (docstring property 5).
    kq = int(rng.integers(len(TOPICS[q_topic])))
    ko = int(rng.integers(len(TOPICS[other])))
    word_q = TOPICS[q_topic][3 + kq % 2 if dev else kq % 3]
    word_o = TOPICS[other][3 + ko % 2 if dev else ko % 3]
    filler = FILLER[int(rng.integers(len(FILLER)))]
    n = int(rng.integers(100))

    if kind == "gold":
        subject, marker, tail = q_topic + " " + word_q, "crucially", f"though {other} {word_o} benchmarks lagged"
    elif kind == "neardup":
        subject, marker, tail = q_topic + " " + word_q, "crucially not", f"though {other} {word_o} benchmarks lagged"
    elif kind == "weak":
        subject, marker, tail = q_topic + " " + word_q, "nominally", f"though {other} {word_o} benchmarks lagged"
    elif kind == "trap":
        subject, marker, tail = other + " " + word_o, "crucially", f"compared with {q_topic} {word_q} baselines"
    else:
        subject, marker, tail = other + " " + word_o, "nominally", f"per the {filler} notes"

    pre = f"The {filler} states that "
    clause = f"{subject} output {marker} shifted by {n} units"
    text = f"{pre}{clause}, {tail}. "
    if kind == "gold":
        return text, (len(pre), len(pre) + len(clause))
    return text, None


def make_dataset(n: int, seed: int):
    from verbatim_rag_tpu.training.token_dataset import TokenSpanExample

    rng = np.random.default_rng(seed)
    names = list(TOPICS)
    kinds = ["gold", "neardup", "weak", "trap", "filler"]
    out = []
    for i in range(n):
        is_dev = i % 13 == 0
        # Side rng for dev-only corruption: keeps the main stream identical
        # to the pre-hardening dataset so train rows are byte-stable.
        side = np.random.default_rng(seed * 100003 + i) if is_dev else None
        ctx_topics = list(rng.choice(names, size=3, replace=False))
        q_topic = ctx_topics[0]
        parts, spans, pos = [], [], 0
        # Guarantee at least one gold and one near-duplicate per context.
        order = ["gold", "neardup"] + [
            kinds[int(rng.integers(len(kinds)))] for _ in range(6)
        ]
        rng.shuffle(order)
        for kind in order:
            other = ctx_topics[1 + int(rng.integers(2))]
            text, gold = _sentence(kind, q_topic, other, rng, dev=is_dev)
            if rng.random() < 0.35:
                text = _ocr_noise(text, rng)  # length-preserving: spans hold
            if is_dev and side.random() < 0.6:
                text = _dev_noise(text, side)  # unseen alphabet: spans hold
            if gold is not None:
                spans.append((pos + gold[0], pos + gold[1]))
            parts.append(text)
            pos += len(text)
        out.append(
            TokenSpanExample(
                question=f"what changed crucially for {q_topic}?",
                context="".join(parts),
                spans=spans,
                split="train" if i % 13 else "dev",
            )
        )
    return out


def main() -> None:
    import argparse

    import jax

    parser = argparse.ArgumentParser()
    parser.add_argument("--epochs", type=int, default=60)
    parser.add_argument(
        "--score-checkpoint",
        default=None,
        metavar="DIR",
        help="Skip training; score the params.npz under DIR (e.g. the "
        "best-F1 checkpoint of an interrupted run) through the same "
        "dataset/decode pipeline.",
    )
    parser.add_argument(
        "--full-size",
        action="store_true",
        help="Train the PRODUCTION 150M ModernBERT config end to end "
        "(VERDICT r3 #7: validates the full-scale train->decode pipeline "
        "on-chip, not just the tiny config). Defaults tuned for a short "
        "on-TPU run: pass --epochs 3-6.",
    )
    args = parser.parse_args()

    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from verbatim_rag_tpu.models.config import TrainingConfig, tiny_test_config
    from verbatim_rag_tpu.models.highlighter import (
        ModelSpanExtractor,
        init_highlighter_params,
    )
    from verbatim_rag_tpu.models.tokenizer import HashTokenizer
    from verbatim_rag_tpu.training.eval_f1 import evaluate_extractor
    from verbatim_rag_tpu.training.model import token_loss
    from verbatim_rag_tpu.training.token_dataset import TokenDatasetEncoder
    from verbatim_rag_tpu.training.trainer import Trainer

    if args.full_size:
        from verbatim_rag_tpu.models.config import modernbert_base_config

        # The production highlighter backbone (22 layers, 768 hidden,
        # flash attention) trained from scratch on the v2 task — a short
        # run can't reach the tiny config's converged band on held-out
        # OOD rows, but it must clear the random floor decisively and the
        # decode sensitivity must move; both validate the full-scale
        # train->decode pipeline on real hardware.
        config = modernbert_base_config(max_position_embeddings=512)
    else:
        config = tiny_test_config(
            vocab_size=4096,
            hidden_size=64,
            num_layers=3,
            num_heads=4,
            intermediate_size=128,
            max_position_embeddings=512,
        )
    data = make_dataset(6000, seed=11)
    train = [e for e in data if e.split == "train"]
    dev = [e for e in data if e.split == "dev"][:100]
    print(f"train={len(train)} eval={len(dev)}")

    tokenizer = HashTokenizer(vocab_size=config.vocab_size)
    encoder = TokenDatasetEncoder(tokenizer, max_length=384, doc_stride=64)

    params = init_highlighter_params(jax.random.PRNGKey(0), config)
    if args.score_checkpoint:
        trained_params = Trainer.load_checkpoint(args.score_checkpoint, params)
    else:
        lr = 3e-4 if args.full_size else 1e-3
        trainer = Trainer(
            params,
            config,
            TrainingConfig(
                learning_rate=lr,
                num_epochs=args.epochs,
                batch_size=16,
                warmup_steps=min(500, args.epochs * 4),
            ),
            output_dir="/tmp/quality_synth_v2_ckpt"
            + ("_full" if args.full_size else ""),
            loss_fn=token_loss,
            total_steps=args.epochs * (len(train) // 16 + 1),
        )
        trainer.train(
            [],
            dev_batches=list(encoder.iter_batches(dev, 16)),
            make_train_iter=lambda epoch: encoder.iter_batches(
                train, 16, shuffle=True, seed=epoch
            ),
        )
        trained_params = trainer.params

    examples = [
        {
            "question": e.question,
            "context": e.context,
            "answers": [e.context[s:t] for s, t in e.spans],
        }
        for e in dev
    ]

    def score(model_params, threshold=0.5, min_span_chars=20, merge_gap_chars=2) -> float:
        extractor = ModelSpanExtractor(
            params=model_params,
            config=config,
            tokenizer=tokenizer,
            threshold=threshold,
            min_span_chars=min_span_chars,
            merge_gap_chars=merge_gap_chars,
            max_length=384,
            doc_stride=64,
        )

        def extract(question, context):
            class _R:
                pass

            r = _R()
            r.text = context
            r.metadata = {}
            return extractor.extract_spans(question, [r]).get(context, [])

        return round(evaluate_extractor(extract, examples)["micro_word_f1"], 4)

    f1 = score(trained_params)
    result = {
        "metric": "micro_word_f1_synthetic_v2_100row"
        + ("_150m" if args.full_size else ""),
        "trained": f1,
        "random_init_control": score(init_highlighter_params(jax.random.PRNGKey(1), config)),
        # Decode-sensitivity probe: these MUST differ from `trained` on a
        # healthy pipeline; a flat profile means the decode path regressed
        # into insensitivity (or the task saturated again).
        "sensitivity": {
            "threshold_0.3": score(trained_params, threshold=0.3),
            "threshold_0.7": score(trained_params, threshold=0.7),
            "no_min_span": score(trained_params, min_span_chars=1),
            "merge_gap_40": score(trained_params, merge_gap_chars=40),
        },
        "examples": len(examples),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
