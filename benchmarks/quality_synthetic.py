"""Quality proof: train the token-classifier highlighter end-to-end and score
micro Word-F1 through the FULL production extraction path.

Context (VERDICT.md round-1 #2): the reference's headline is 53.6 micro
Word-F1 with `KRLabsOrg/verbatim-rag-modern-bert-v2` on ACL-Verbatim
(`/root/reference/README.md:32-34`). That checkpoint is unobtainable here —
zero-egress environment, no HuggingFace cache on disk (verified:
``~/.cache`` holds no ``huggingface/``) — so, per the VERDICT's fallback,
this benchmark proves the quality pipeline end to end instead:

1. a synthetic *question-conditioned* extraction task — contexts mix
   sentences about several topics, only salient sentences about the
   QUESTION's topic are gold, so a model scoring well must attend
   question↔context (position or lexical salience alone is not enough);
2. train the token classifier (`training/train.py token` path: windowed
   encoding identical to inference, `token_loss`, optax AdamW);
3. score held-out rows with `ModelSpanExtractor` — the same windowing,
   thresholding, span merge and min-length logic production uses — via the
   micro Word-F1 harness (`training/eval_f1.py`), against a random-init
   control.

The HF→JAX weight conversion for the real checkpoint
(`models/hf_convert.py:210`) exists and is numerics-pinned against torch on
random weights (`tests/test_models.py`); when network access exists, point
``--model-path`` at the downloaded checkpoint and run
``python -m verbatim_rag_tpu.training.eval_f1`` on the ACL-Verbatim file.

Run: JAX_PLATFORMS=cpu python benchmarks/quality_synthetic.py   (~8 min)
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


def make_dataset(n: int, seed: int):
    """Question-conditioned extraction examples.

    Each context holds 8 sentences across 2–3 topics; a sentence is gold iff
    it is about the question's topic AND carries the 'crucially' salience
    marker. Distractors: salient sentences about OTHER topics, and non-
    salient sentences about the question topic.
    """
    from verbatim_rag_tpu.training.token_dataset import TokenSpanExample

    rng = np.random.default_rng(seed)
    names = list(TOPICS)
    out = []
    for i in range(n):
        ctx_topics = list(rng.choice(names, size=int(rng.integers(2, 4)), replace=False))
        q_topic = ctx_topics[0]
        parts, spans, pos = [], [], 0
        for _ in range(8):
            topic = ctx_topics[int(rng.integers(len(ctx_topics)))]
            salient = bool(rng.random() < 0.45)
            word = TOPICS[topic][int(rng.integers(len(TOPICS[topic])))]
            filler = FILLER[int(rng.integers(len(FILLER)))]
            marker = "crucially" if salient else "incidentally"
            sentence = (
                f"The {filler} notes that {topic} {word} systems {marker} "
                f"shifted by {int(rng.integers(100))} units this cycle. "
            )
            if salient and topic == q_topic:
                spans.append((pos, pos + len(sentence.rstrip())))
            parts.append(sentence)
            pos += len(sentence)
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
    parser.add_argument(
        "--epochs",
        type=int,
        default=120,
        help="training epochs; the headline 100.0-F1 config is 120 — lower "
        "it on slow/shared hosts (the run scales linearly)",
    )
    args = parser.parse_args()

    # The env var alone does not override a plugin backend (e.g. a tunneled
    # TPU); pin explicitly when the caller asked for CPU.
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

    config = tiny_test_config(
        vocab_size=4096,
        hidden_size=64,
        num_layers=3,
        num_heads=4,
        intermediate_size=128,
        max_position_embeddings=512,
    )
    data = make_dataset(6000, seed=7)
    train = [e for e in data if e.split == "train"]
    dev = [e for e in data if e.split == "dev"][:100]  # 100-row eval, like ACL-Verbatim
    print(f"train={len(train)} eval={len(dev)}")

    tokenizer = HashTokenizer(vocab_size=config.vocab_size)
    encoder = TokenDatasetEncoder(tokenizer, max_length=320, doc_stride=64)

    params = init_highlighter_params(jax.random.PRNGKey(0), config)
    trainer = Trainer(
        params,
        config,
        TrainingConfig(
            learning_rate=1e-3,
            num_epochs=args.epochs,
            batch_size=16,
            # The recorded headline run used exactly 500; only shrink the
            # warmup when a shortened run couldn't fit it.
            warmup_steps=500 if args.epochs >= 120 else min(500, args.epochs * 4),
        ),
        output_dir="/tmp/quality_synth_ckpt",
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

    examples = [
        {
            "question": e.question,
            "context": e.context,
            "answers": [e.context[s:t] for s, t in e.spans],
        }
        for e in dev
    ]

    def score(model_params) -> float:
        extractor = ModelSpanExtractor(
            params=model_params,
            config=config,
            tokenizer=tokenizer,
            threshold=0.5,
            min_span_chars=30,
            merge_gap_chars=2,
            max_length=320,
            doc_stride=64,
        )

        def extract(question, context):
            class _R:
                pass

            r = _R()
            r.text = context
            r.metadata = {}
            return extractor.extract_spans(question, [r]).get(context, [])

        return evaluate_extractor(extract, examples)["micro_word_f1"]

    f1_trained = score(trainer.params)
    f1_random = score(init_highlighter_params(jax.random.PRNGKey(1), config))
    print(
        json.dumps(
            {
                "metric": "micro_word_f1_synthetic_100row",
                "trained": round(f1_trained, 4),
                "random_init_control": round(f1_random, 4),
                "examples": len(examples),
            }
        )
    )


if __name__ == "__main__":
    main()
