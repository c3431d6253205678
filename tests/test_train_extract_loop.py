"""Integration: train the sentence classifier → extract → Word-F1 improves.

Closes the loop the reference's training pipeline feeds (SURVEY.md §2.6 →
§2.3): a model trained on a synthetic keyword-relevance task must beat its
random initialization at extraction, measured with the micro Word-F1 harness.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from verbatim_rag_tpu.models.config import tiny_test_config
from verbatim_rag_tpu.models.sentence_extractor import SentenceModelExtractor, split_sentences
from verbatim_rag_tpu.models.tokenizer import HashTokenizer
from verbatim_rag_tpu.training.dataset import QADatasetEncoder, make_synthetic_qadata
from verbatim_rag_tpu.training.eval_f1 import evaluate_extractor
from verbatim_rag_tpu.training.model import init_qa_model_params
from verbatim_rag_tpu.training.trainer import Trainer
from verbatim_rag_tpu.models.config import TrainingConfig

CONFIG = tiny_test_config(
    vocab_size=2048,
    hidden_size=64,
    num_layers=3,
    num_heads=4,
    intermediate_size=128,
    max_position_embeddings=512,
)


class TestSplitSentences:
    def test_spans_are_verbatim(self):
        text = "First one. Second here! Third?\nFourth line"
        spans = split_sentences(text)
        assert [text[s:e] for s, e in spans] == [
            "First one.",
            "Second here!",
            "Third?",
            "Fourth line",
        ]


class TestTrainedExtraction:
    @pytest.mark.slow
    def test_training_improves_word_f1(self, tmp_path):
        data = make_synthetic_qadata(n_samples=300, sentences_per_doc=6, seed=3)
        tokenizer = HashTokenizer(vocab_size=CONFIG.vocab_size)
        encoder = QADatasetEncoder(tokenizer, max_length=256, max_sentences=8)

        params = init_qa_model_params(jax.random.PRNGKey(0), CONFIG)
        trainer = Trainer(
            params,
            CONFIG,
            TrainingConfig(learning_rate=2e-3, num_epochs=8, batch_size=16),
            output_dir=str(tmp_path),
        )
        train_batches = list(encoder.iter_batches(data.filter_split("train"), 16))
        trainer.train(train_batches)

        # Build eval examples from the dev split.
        examples = []
        for sample in data.filter_split("dev"):
            doc = sample.documents[0]
            context = " ".join(s.text for s in doc.sentences)
            answers = [s.text for s in doc.sentences if s.relevant]
            examples.append(
                {"question": sample.question, "context": context, "answers": answers}
            )

        def make_eval(params):
            extractor = SentenceModelExtractor(
                params=params, config=CONFIG, tokenizer=tokenizer, threshold=0.5
            )

            def extract(question, context):
                class R:
                    pass

                r = R()
                r.text = context
                return extractor.extract_spans(question, [r])[context]

            return extract

        random_params = init_qa_model_params(jax.random.PRNGKey(99), CONFIG)
        random_f1 = evaluate_extractor(make_eval(random_params), examples)["micro_word_f1"]
        trained_f1 = evaluate_extractor(make_eval(trainer.params), examples)["micro_word_f1"]
        assert trained_f1 > random_f1 + 5, (random_f1, trained_f1)

    def test_extractor_returns_verbatim_sentences(self):
        extractor = SentenceModelExtractor(config=CONFIG, threshold=0.0)

        class R:
            text = "Alpha sentence here. Beta sentence there."

        spans = extractor.extract_spans("anything", [R()])[R.text]
        for span in spans:
            assert span in R.text


class TestSentenceAlignmentWithEmptyTokenSentences:
    def test_separator_sentence_does_not_shift_probabilities(self):
        """A sentence that tokenizes to zero tokens ('___' (underscore is \\w but matches neither token pattern)) is skipped by
        the dataset encoder; the extractor must skip it identically or every
        later sentence's probability is attributed one sentence off."""
        import numpy as np

        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.sentence_extractor import SentenceModelExtractor

        config = tiny_test_config()
        extractor = SentenceModelExtractor(config=config, threshold=-1.0)

        class R:
            text = "Alpha sentence here.\n___\nBeta is the relevant answer."

        out = extractor.extract_spans("what is relevant", [R()])
        spans = out[R.text]
        # threshold=-1: every ENCODED sentence is returned. '___' (underscore is \\w but matches neither token pattern) has no
        # tokens and must not appear; Beta must (it would be lost if the
        # alignment shifted).
        assert any("Beta is the relevant answer" in s for s in spans)
        assert all(s.strip() != "___" for s in spans)
