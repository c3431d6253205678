"""Token-level highlighter training: encode, learn, extract spans."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from verbatim_rag_tpu.models.config import TrainingConfig, tiny_test_config
from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor, init_highlighter_params
from verbatim_rag_tpu.models.tokenizer import HashTokenizer
from verbatim_rag_tpu.training.model import token_loss
from verbatim_rag_tpu.training.token_dataset import (
    TokenDatasetEncoder,
    TokenSpanExample,
    make_synthetic_token_data,
)
from verbatim_rag_tpu.training.trainer import Trainer

CONFIG = tiny_test_config(
    vocab_size=2048,
    hidden_size=64,
    num_layers=2,
    num_heads=4,
    intermediate_size=128,
    max_position_embeddings=512,
)


@pytest.fixture(scope="module")
def tokenizer():
    return HashTokenizer(vocab_size=CONFIG.vocab_size)


class TestTokenEncoding:
    def test_labels_align_with_spans(self, tokenizer):
        context = "alpha beta gamma delta"
        ex = TokenSpanExample(question="q?", context=context, spans=[(6, 16)])  # "beta gamma"
        encoder = TokenDatasetEncoder(tokenizer, max_length=64)
        batch = encoder.encode([ex])
        labeled = batch.labels[0][batch.label_mask[0] == 1]
        assert labeled.tolist() == [0, 1, 1, 0]  # alpha beta gamma delta

    def test_from_dict_string_answers(self):
        ex = TokenSpanExample.from_dict(
            {"question": "q", "context": "the cat sat", "answers": ["cat sat"]}
        )
        assert ex.spans == [(4, 11)]

    def test_windowing_covers_long_context(self, tokenizer):
        long_ctx = " ".join(f"word{i}" for i in range(200))
        ex = TokenSpanExample(question="q?", context=long_ctx, spans=[])
        encoder = TokenDatasetEncoder(tokenizer, max_length=64, doc_stride=16)
        batch = encoder.encode([ex])
        assert batch.input_ids.shape[0] > 1  # multiple windows
        assert int(batch.label_mask.sum()) >= 200


class TestTokenTraining:
    @pytest.mark.slow
    def test_token_training_produces_working_extractor(self, tokenizer, tmp_path):
        data = make_synthetic_token_data(n_examples=200, seed=1)
        train = [e for e in data if e.split == "train"]
        dev = [e for e in data if e.split == "dev"]
        encoder = TokenDatasetEncoder(tokenizer, max_length=256)

        params = init_highlighter_params(jax.random.PRNGKey(0), CONFIG)
        trainer = Trainer(
            params,
            CONFIG,
            TrainingConfig(learning_rate=3e-3, num_epochs=15, batch_size=16),
            output_dir=str(tmp_path),
            loss_fn=token_loss,
        )
        result = trainer.train(
            list(encoder.iter_batches(train, 16)),
            dev_batches=list(encoder.iter_batches(dev, 16)),
        )
        assert result["best_f1"] > 0.8, result["history"][-1]

        # The trained params drop straight into the inference extractor.
        extractor = ModelSpanExtractor(
            params=trainer.params,
            config=CONFIG,
            tokenizer=tokenizer,
            threshold=0.5,
            min_span_chars=10,
            merge_gap_chars=5,
            max_length=256,
            doc_stride=32,
        )
        ex = dev[0]
        spans = extractor.process(ex.question, ex.context)
        assert spans, "trained extractor found no spans"
        predicted = " ".join(ex.context[s:e] for s, e in spans)
        assert "noteworthy" in predicted


class TestTrainSaveServe:
    """The full loop: Trainer checkpoint → ModelSpanExtractor serving it."""

    def test_trained_checkpoint_loads_into_extractor(self, tmp_path):
        from verbatim_rag_tpu.models.config import TrainingConfig, tiny_test_config
        from verbatim_rag_tpu.models.hf_convert import (
            detect_checkpoint_format,
            load_span_extractor,
        )
        from verbatim_rag_tpu.models.highlighter import init_highlighter_params
        from verbatim_rag_tpu.models.tokenizer import HashTokenizer
        from verbatim_rag_tpu.training.model import token_loss
        from verbatim_rag_tpu.training.token_dataset import (
            TokenDatasetEncoder,
            make_synthetic_token_data,
        )
        from verbatim_rag_tpu.training.trainer import Trainer

        config = tiny_test_config(vocab_size=512, max_position_embeddings=256)
        tokenizer = HashTokenizer(vocab_size=config.vocab_size)
        encoder = TokenDatasetEncoder(tokenizer, max_length=128, doc_stride=32)
        data = make_synthetic_token_data(n_examples=24, seed=2)

        trainer = Trainer(
            init_highlighter_params(jax.random.PRNGKey(0), config),
            config,
            TrainingConfig(learning_rate=2e-3, num_epochs=2, batch_size=8),
            output_dir=str(tmp_path / "out"),
            loss_fn=token_loss,
            tokenizer=tokenizer,
        )
        trainer.train(list(encoder.iter_batches(data, 8)))

        ckpt = str(tmp_path / "out" / "final")
        assert detect_checkpoint_format(ckpt) == "highlighter_v2"
        extractor = load_span_extractor(ckpt, threshold=0.3, min_span_chars=5)
        # Weights actually came from the checkpoint, not a fresh init.
        got = np.asarray(
            jax.tree.leaves(extractor.params)[0], np.float32
        )
        want = np.asarray(jax.tree.leaves(trainer.params)[0], np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-6)
        # And the extractor runs end to end on raw text.
        class R:
            text = "Clause 0 is noteworthy about solar item 3. Clause 1 is ordinary."
            metadata = {}

        spans = extractor.extract_spans("what about solar?", [R()])
        assert isinstance(spans, dict)
