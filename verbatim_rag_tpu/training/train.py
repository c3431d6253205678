"""Training CLI for the sentence-relevance extractor.

Parity: reference `extractor_models/train.py:34-216` — argparse over
data_path/output_dir/max_seq_length(4096)/batch(8)/lr(2e-5)/epochs(3)/seed,
split filtering, final test evaluation written to test_metrics.json.

Run: ``python -m verbatim_rag_tpu.training.train --data-path data.json``.
Use ``--dp/--tp`` to train on a sharded mesh.
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--data-path", required=True, help="QAData JSON file")
    parser.add_argument("--output-dir", default="./qa_model_out")
    parser.add_argument("--max-seq-length", type=int, default=4096)
    parser.add_argument("--max-sentences", type=int, default=64)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--learning-rate", type=float, default=2e-5)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--dp", type=int, default=None, help="data-parallel mesh size")
    parser.add_argument("--tp", type=int, default=1, help="tensor-parallel mesh size")
    parser.add_argument("--tiny", action="store_true", help="tiny config (smoke test)")
    parser.add_argument("--init-from", help="checkpoint dir to warm-start from")
    parser.add_argument(
        "--mode",
        default="sentence",
        choices=["sentence", "token"],
        help="sentence = legacy v1 classifier over QAData; "
        "token = v2 highlighter over {question, context, answers} records",
    )
    parser.add_argument("--doc-stride", type=int, default=128, help="token mode windows")
    args = parser.parse_args(argv)

    # Both modes want INFO logging and the persistent XLA compile cache —
    # set them up BEFORE the token-mode dispatch, or token runs recompile
    # the full train/eval programs every invocation and log nothing.
    logging.basicConfig(level=logging.INFO)

    from verbatim_rag_tpu.utils.jax_cache import (
        enable_persistent_compilation_cache,
        pin_platform_from_env,
    )

    pin_platform_from_env()
    enable_persistent_compilation_cache()

    if args.mode == "token":
        return _train_token(args)

    import jax

    from verbatim_rag_tpu.models.config import (
        TrainingConfig,
        modernbert_base_config,
        tiny_test_config,
    )
    from verbatim_rag_tpu.models.tokenizer import HashTokenizer
    from verbatim_rag_tpu.parallel.mesh import make_mesh
    from verbatim_rag_tpu.training.dataset import QAData, QADatasetEncoder
    from verbatim_rag_tpu.training.model import init_qa_model_params
    from verbatim_rag_tpu.training.trainer import Trainer

    config = tiny_test_config() if args.tiny else modernbert_base_config()
    tc = TrainingConfig(
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        max_seq_length=args.max_seq_length,
        seed=args.seed,
    )

    data = QAData.from_json(args.data_path)
    train_samples = data.filter_split("train")
    dev_samples = data.filter_split("dev") or train_samples[: max(1, len(train_samples) // 10)]
    test_samples = data.filter_split("test")

    tokenizer = HashTokenizer(vocab_size=config.vocab_size)
    encoder = QADatasetEncoder(
        tokenizer, max_length=args.max_seq_length, max_sentences=args.max_sentences
    )

    params = init_qa_model_params(jax.random.PRNGKey(args.seed), config)
    mesh = make_mesh(dp=args.dp, tp=args.tp) if (args.dp or args.tp > 1) else None
    trainer = Trainer(params, config, tc, output_dir=args.output_dir, mesh=mesh)
    if args.init_from:
        trainer.params = Trainer.load_checkpoint(args.init_from, trainer.params)

    dev_batches = list(encoder.iter_batches(dev_samples, args.batch_size))
    result = trainer.train(
        [],
        dev_batches=dev_batches,
        make_train_iter=lambda epoch: encoder.iter_batches(
            train_samples, args.batch_size, shuffle=True, seed=args.seed + epoch
        ),
    )
    print(f"best dev F1: {result['best_f1']:.4f}")

    if test_samples:
        test_metrics = trainer.evaluate(list(encoder.iter_batches(test_samples, args.batch_size)))
        with open(os.path.join(args.output_dir, "test_metrics.json"), "w") as f:
            json.dump(test_metrics, f, indent=2)
        print(f"test: {test_metrics}")
    return 0


def _train_token(args) -> int:
    """Token-classification training: produces params consumable by
    `ModelSpanExtractor` (the v2 highlighter path)."""
    import jax

    from verbatim_rag_tpu.models.config import (
        TrainingConfig,
        modernbert_base_config,
        tiny_test_config,
    )
    from verbatim_rag_tpu.models.highlighter import init_highlighter_params
    from verbatim_rag_tpu.models.tokenizer import HashTokenizer
    from verbatim_rag_tpu.parallel.mesh import make_mesh
    from verbatim_rag_tpu.training.model import token_loss
    from verbatim_rag_tpu.training.token_dataset import (
        TokenDatasetEncoder,
        load_token_examples,
    )
    from verbatim_rag_tpu.training.trainer import Trainer

    config = tiny_test_config() if args.tiny else modernbert_base_config()
    tc = TrainingConfig(
        learning_rate=args.learning_rate,
        batch_size=args.batch_size,
        num_epochs=args.epochs,
        max_seq_length=args.max_seq_length,
        seed=args.seed,
    )
    examples = load_token_examples(args.data_path)
    train = [e for e in examples if e.split == "train"]
    dev = [e for e in examples if e.split == "dev"] or train[: max(1, len(train) // 10)]

    tokenizer = HashTokenizer(vocab_size=config.vocab_size)
    encoder = TokenDatasetEncoder(
        tokenizer, max_length=args.max_seq_length, doc_stride=args.doc_stride
    )
    params = init_highlighter_params(jax.random.PRNGKey(args.seed), config)
    mesh = make_mesh(dp=args.dp, tp=args.tp) if (args.dp or args.tp > 1) else None
    trainer = Trainer(
        params, config, tc, output_dir=args.output_dir, mesh=mesh, loss_fn=token_loss
    )
    if args.init_from:
        trainer.params = Trainer.load_checkpoint(args.init_from, trainer.params)

    result = trainer.train(
        [],
        dev_batches=list(encoder.iter_batches(dev, args.batch_size)),
        make_train_iter=lambda epoch: encoder.iter_batches(
            train, args.batch_size, shuffle=True, seed=args.seed + epoch
        ),
    )
    print(f"best dev token-F1: {result['best_f1']:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
