"""Real HF-checkpoint seam: a genuine `save_pretrained` ModernBERT
token-classification checkpoint + a genuinely-built tokenizer.json must load
through `load_span_extractor` and produce torch-identical probabilities and
correct char spans.

The published extractor family (`KRLabsOrg/verbatim-rag-modern-bert-v2`,
ref `extractors.py:55-160`) ships exactly this format: HF config.json +
model.safetensors + tokenizer.json. The checkpoint itself is unobtainable
offline, but the *format* is constructible locally — this file builds one
with torch + tokenizers and drives the whole seam: format detection, weight
conversion (incl. the ModernBertPredictionHead), HFTokenizer offsets, and
the char-span provenance contract.
"""

import dataclasses
import json
import os

import numpy as np
import pytest

pytest.importorskip("jax")
torch = pytest.importorskip("torch")
pytest.importorskip("tokenizers")
pytest.importorskip("transformers")
pytest.importorskip("safetensors")

CORPUS = [
    "Solar panels convert sunlight directly into electricity using photovoltaic cells.",
    "Wind turbines capture kinetic energy from moving air and turn it into power.",
    "Hydroelectric dams exploit falling water to spin turbines connected to generators.",
    "Batteries store electrical energy chemically for later discharge on demand.",
    "The efficiency of modern photovoltaic cells exceeds twenty percent in production.",
]


@pytest.fixture(scope="module")
def checkpoint_dir(tmp_path_factory):
    """Build a genuine HF-format highlighter checkpoint, fully offline."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, processors, trainers
    from transformers import ModernBertConfig, ModernBertForTokenClassification

    out = tmp_path_factory.mktemp("hf_ckpt")

    # 1. A real trained WordPiece tokenizer (not a hand-rolled vocab dict).
    tok = Tokenizer(models.WordPiece(unk_token="[UNK]"))
    tok.normalizer = normalizers.BertNormalizer(lowercase=True)
    tok.pre_tokenizer = pre_tokenizers.BertPreTokenizer()
    trainer = trainers.WordPieceTrainer(
        vocab_size=400, special_tokens=["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    )
    tok.train_from_iterator(CORPUS, trainer)
    cls_id = tok.token_to_id("[CLS]")
    sep_id = tok.token_to_id("[SEP]")
    tok.post_processor = processors.TemplateProcessing(
        single="[CLS] $A [SEP]",
        pair="[CLS] $A [SEP] $B [SEP]",
        special_tokens=[("[CLS]", cls_id), ("[SEP]", sep_id)],
    )
    tok.save(str(out / "tokenizer.json"))

    # 2. A real `save_pretrained` ModernBERT token classifier.
    config = ModernBertConfig(
        vocab_size=tok.get_vocab_size(),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=48,
        max_position_embeddings=128,
        global_attn_every_n_layers=2,
        local_attention=8,
        pad_token_id=tok.token_to_id("[PAD]"),
        bos_token_id=cls_id,
        eos_token_id=sep_id,
        cls_token_id=cls_id,
        sep_token_id=sep_id,
        num_labels=2,
        attention_dropout=0.0,
        mlp_dropout=0.0,
        embedding_dropout=0.0,
        classifier_dropout=0.0,
    )
    torch.manual_seed(7)
    model = ModernBertForTokenClassification(config).eval()
    model.save_pretrained(str(out), safe_serialization=True)
    return str(out), model


class TestFormatDetection:
    def test_detects_highlighter_v2(self, checkpoint_dir):
        from verbatim_rag_tpu.models.hf_convert import detect_checkpoint_format

        path, _ = checkpoint_dir
        assert detect_checkpoint_format(path) == "highlighter_v2"
        with open(os.path.join(path, "config.json")) as f:
            archs = json.load(f)["architectures"]
        assert any("TokenClassification" in a for a in archs)


class TestWeightConversionParity:
    def test_probs_match_torch_exactly(self, checkpoint_dir):
        """Converted params (backbone + prediction head + classifier) must
        reproduce torch's label-1 probabilities on real tokenized input."""
        from verbatim_rag_tpu.models.hf_convert import load_highlighter_checkpoint
        from verbatim_rag_tpu.models.highlighter import token_relevance_probs

        path, hf_model = checkpoint_dir
        params, config, tokenizer = load_highlighter_checkpoint(path)
        assert "cls_head" in params  # the prediction head was converted
        config = dataclasses.replace(
            config, compute_dtype="float32", use_flash_attention=False
        )

        enc = tokenizer.encode_batch(
            ["how efficient are solar panels"],
            max_length=128,
            pair=[CORPUS[0] + " " + CORPUS[4]],
        )
        ids, mask = enc.input_ids, enc.attention_mask

        with torch.no_grad():
            logits = hf_model(
                input_ids=torch.tensor(ids, dtype=torch.long),
                attention_mask=torch.tensor(mask, dtype=torch.long),
            ).logits
            expected = torch.softmax(logits.float(), dim=-1)[..., 1].numpy() * mask

        import jax.numpy as jnp

        got = np.asarray(
            token_relevance_probs(
                params, config, jnp.asarray(ids), jnp.asarray(mask)
            )
        )
        np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-3)


class TestTokenizerOffsets:
    def test_offsets_index_original_text(self, checkpoint_dir):
        """Every HFTokenizer offset must slice the original (pre-lowercase)
        text to the token's surface form — the provenance contract."""
        from verbatim_rag_tpu.models.tokenizer import HFTokenizer

        path, _ = checkpoint_dir
        tok = HFTokenizer(os.path.join(path, "tokenizer.json"))
        text = "Solar panels convert Sunlight into electricity, efficiently."
        enc = tok.encode_batch([text], max_length=128, with_offsets=True)
        surfaces = []
        for (s, e), tid, m in zip(enc.offsets[0], enc.input_ids[0], enc.attention_mask[0]):
            if not m or e <= s:
                continue
            piece = text[s:e]
            assert piece.strip() == piece and piece != ""
            surfaces.append(piece)
        # Reconstructable: concatenated surfaces cover the words of the text.
        assert "".join(surfaces).lower() == text.replace(" ", "").lower()

    def test_pad_cls_sep_ids_resolved(self, checkpoint_dir):
        from verbatim_rag_tpu.models.tokenizer import HFTokenizer

        path, _ = checkpoint_dir
        tok = HFTokenizer(os.path.join(path, "tokenizer.json"))
        assert tok.pad_id == 0 and tok.cls_id == 2 and tok.sep_id == 3
        assert tok.vocab_size > 100  # trained vocab (trainer may stop < 400)


class TestEndToEndSpans:
    def test_load_span_extractor_char_span_provenance(self, checkpoint_dir):
        """`load_span_extractor(dir)` end-to-end: with threshold 0 every
        context token is selected, so the decoded span must run from the
        first context char to the last — any offset drift through the
        window/aggregation path breaks the equality."""
        from verbatim_rag_tpu.models.hf_convert import load_span_extractor
        from verbatim_rag_tpu.models.highlighter import ModelSpanExtractor

        path, _ = checkpoint_dir
        extractor = load_span_extractor(
            path, threshold=0.0, min_span_chars=1, merge_gap_chars=10_000
        )
        assert isinstance(extractor, ModelSpanExtractor)
        context = CORPUS[1]
        spans = extractor.process("what do wind turbines do", context)
        assert spans == [(0, len(context))]

    def test_spans_are_verbatim_substrings(self, checkpoint_dir):
        from verbatim_rag_tpu.models.hf_convert import load_span_extractor

        path, _ = checkpoint_dir
        extractor = load_span_extractor(path, threshold=0.1, min_span_chars=5)

        class R:
            def __init__(self, text):
                self.text = text

        results = [R(c) for c in CORPUS[:3]]
        out = extractor.extract_spans("solar power", results)
        for text, spans in out.items():
            for s in spans:
                assert s in text

    def test_sliding_windows_cover_long_context(self, checkpoint_dir):
        """A context longer than max_length exercises the window planner +
        max-aggregation with REAL tokenizer offsets."""
        from verbatim_rag_tpu.models.hf_convert import load_span_extractor

        path, _ = checkpoint_dir
        long_context = " ".join(CORPUS * 6)
        extractor = load_span_extractor(
            path,
            threshold=0.0,
            min_span_chars=1,
            merge_gap_chars=10_000,
            max_length=64,
            doc_stride=8,
        )
        spans = extractor.process("energy", long_context)
        assert spans == [(0, len(long_context))]


class TestInverseConversionRoundTrip:
    def test_jax_tree_inverts_to_original_state_dict(self, checkpoint_dir):
        """modernbert_params_to_hf_state_dict must reproduce the torch
        checkpoint bit-for-bit (same keys, same values) — the publishing
        seam for upload_to_hub."""
        from safetensors.numpy import load_file

        from verbatim_rag_tpu.models.hf_convert import (
            load_highlighter_checkpoint,
            modernbert_params_to_hf_state_dict,
        )

        path, _ = checkpoint_dir
        params, config, _tok = load_highlighter_checkpoint(path)
        inverted = modernbert_params_to_hf_state_dict(params, config)
        original = load_file(os.path.join(path, "model.safetensors"))
        assert set(inverted) == set(original)
        for k in original:
            np.testing.assert_allclose(
                inverted[k], np.asarray(original[k], np.float32),
                rtol=1e-6, atol=1e-6, err_msg=k,
            )

    def test_hub_staging_is_loadable_by_both_loaders(self, tmp_path):
        """upload_to_hub's staging dir must round-trip through BOTH loaders:
        the native path (params.npz + verbatim_config.json) and the HF path
        (config.json + model.safetensors)."""
        import dataclasses as dc

        import jax

        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.hf_convert import (
            load_highlighter_checkpoint,
            load_span_extractor,
        )
        from verbatim_rag_tpu.models.highlighter import (
            ModelSpanExtractor,
            init_highlighter_params,
        )
        from verbatim_rag_tpu.training.trainer import Trainer
        from verbatim_rag_tpu.training.model import token_loss
        from verbatim_rag_tpu.utils.upload_to_hub import jax_checkpoint_to_hf_dir

        config = tiny_test_config(
            position_embedding_type="rope",
            norm_location="pre",
            activation="geglu",
            use_bias=False,
            final_norm=True,
            type_vocab_size=0,
            first_layer_no_attn_norm=True,
            global_attn_every_n_layers=2,
            local_attention_window=8,
            num_layers=2,
        )
        params = init_highlighter_params(jax.random.PRNGKey(3), config)
        ckpt = str(tmp_path / "ckpt")
        trainer = Trainer(
            params, config, output_dir=ckpt, loss_fn=token_loss, total_steps=10
        )
        trainer.save_checkpoint(ckpt)

        staging = str(tmp_path / "staging")
        jax_checkpoint_to_hf_dir(ckpt, staging)

        # Native loader path (exactly what a downloader of the repo gets).
        extractor = load_span_extractor(staging, threshold=0.0, min_span_chars=1)
        assert isinstance(extractor, ModelSpanExtractor)
        spans = extractor.process("q", "some context words here to score fully")
        assert spans

        # HF side: config.json + model.safetensors must convert back to the
        # same tree (a HashTokenizer checkpoint ships no tokenizer.json, so
        # the full HF loader correctly refuses — the torch-facing files are
        # what we verify here).
        import json as _json

        from safetensors.numpy import load_file

        from verbatim_rag_tpu.models.hf_convert import (
            config_from_hf,
            convert_modernbert_state_dict,
        )

        hf_cfg = _json.load(open(os.path.join(staging, "config.json")))
        assert hf_cfg["model_type"] == "modernbert"
        sd = load_file(os.path.join(staging, "model.safetensors"))
        config2 = config_from_hf(hf_cfg)
        params2 = convert_modernbert_state_dict(sd, config2, prefix="model.")
        got = np.asarray(params2["layers"]["attn"]["q"]["kernel"])
        want = np.asarray(params["layers"]["attn"]["q"]["kernel"])
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        got_cls = np.asarray(sd["classifier.weight"]).T
        want_cls = np.asarray(params["classifier"]["kernel"])
        np.testing.assert_allclose(got_cls, want_cls, rtol=1e-6, atol=1e-6)
