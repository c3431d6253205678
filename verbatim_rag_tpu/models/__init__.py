"""JAX model zoo: encoders, SPLADE, highlighter, cross-encoder."""

from .config import (
    EncoderConfig,
    TrainingConfig,
    bert_base_config,
    minilm_config,
    modernbert_base_config,
    tiny_test_config,
)
from .encoder import embed_texts, encoder_forward, init_encoder_params, mean_pool
from .highlighter import (
    ModelSpanExtractor,
    SemanticHighlightExtractor,
    init_highlighter_params,
    select_spans_from_token_probs,
    token_relevance_probs,
)
from .providers import JaxDenseProvider, JaxSpladeProvider
from .reranker import JaxCrossEncoder, cross_encoder_scores, init_cross_encoder_params
from .splade import init_splade_params, splade_forward, splade_topk_terms
from .tokenizer import HashTokenizer, HFTokenizer, TokenizedBatch

__all__ = [
    "EncoderConfig",
    "HFTokenizer",
    "HashTokenizer",
    "JaxCrossEncoder",
    "JaxDenseProvider",
    "JaxSpladeProvider",
    "ModelSpanExtractor",
    "SemanticHighlightExtractor",
    "TokenizedBatch",
    "TrainingConfig",
    "bert_base_config",
    "cross_encoder_scores",
    "embed_texts",
    "encoder_forward",
    "init_cross_encoder_params",
    "init_encoder_params",
    "init_highlighter_params",
    "init_splade_params",
    "mean_pool",
    "minilm_config",
    "modernbert_base_config",
    "select_spans_from_token_probs",
    "splade_forward",
    "splade_topk_terms",
    "tiny_test_config",
    "token_relevance_probs",
]
