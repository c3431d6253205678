"""Train → save → stage-for-hub → serve: the checkpoint publishing loop.

Parity: the reference publishes trained extractors to the HuggingFace Hub
(`verbatim_rag/tools/upload_to_hub.py`) and serves them back via
`ModelSpanExtractor(model_path=...)`. This demo runs the whole loop offline:

1. train a tiny token-classification highlighter for a few steps,
2. save a framework-native checkpoint (params.npz + verbatim_config.json),
3. stage it for upload (`jax_checkpoint_to_hf_dir`) — native files verbatim
   PLUS an HF-format `model.safetensors`/`config.json` produced by the
   JAX→HF inverse conversion (`modernbert_params_to_hf_state_dict`),
4. load the staged artifact back with `load_span_extractor` and answer a
   query through the production extraction path.

The only thing skipped is the actual network upload (HF_TOKEN + HfApi).
"""

from _backend import use_cpu_unless_overridden  # noqa: E402

use_cpu_unless_overridden()

import json
import os
import tempfile

import jax
import numpy as np


def main() -> None:
    from verbatim_rag_tpu.models.config import tiny_test_config
    from verbatim_rag_tpu.models.hf_convert import load_span_extractor
    from verbatim_rag_tpu.models.highlighter import init_highlighter_params
    from verbatim_rag_tpu.models.tokenizer import HashTokenizer
    from verbatim_rag_tpu.training.model import token_loss
    from verbatim_rag_tpu.training.token_dataset import (
        TokenDatasetEncoder,
        TokenSpanExample,
    )
    from verbatim_rag_tpu.training.trainer import Trainer
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
    tokenizer = HashTokenizer(vocab_size=config.vocab_size)

    # 1. A few training steps on a toy span task.
    records = [
        {
            "question": "what color is the sky",
            "context": "The sky is blue today. Grass is green as always.",
            "answers": ["The sky is blue today."],
        },
        {
            "question": "what color is grass",
            "context": "The sky is blue today. Grass is green as always.",
            "answers": ["Grass is green as always."],
        },
    ] * 4
    encoder = TokenDatasetEncoder(tokenizer, max_length=64)
    batch = encoder.encode([TokenSpanExample.from_dict(r) for r in records])
    params = init_highlighter_params(jax.random.PRNGKey(0), config)
    workdir = tempfile.mkdtemp(prefix="publish_demo_")
    ckpt = os.path.join(workdir, "ckpt")
    trainer = Trainer(
        params, config, output_dir=ckpt, loss_fn=token_loss,
        total_steps=30, tokenizer=tokenizer,
    )
    trainer.train([batch] * 10, num_epochs=3)
    trainer.save_checkpoint(ckpt)
    print(f"checkpoint: {sorted(os.listdir(ckpt))}")

    # 2-3. Stage for the hub: native + HF-format files.
    staging = os.path.join(workdir, "staging")
    jax_checkpoint_to_hf_dir(ckpt, staging)
    print(f"staged:     {sorted(os.listdir(staging))}")
    hf_cfg = json.load(open(os.path.join(staging, "config.json")))
    print(f"hf config:  model_type={hf_cfg['model_type']} "
          f"architectures={hf_cfg['architectures']}")

    # 4. Serve the staged artifact (exactly what a hub downloader would do).
    extractor = load_span_extractor(staging, threshold=0.3, min_span_chars=10)
    context = "The sky is blue today. Grass is green as always."
    spans = extractor.process("what color is the sky", context)
    print(f"query spans: {[(context[s:e]) for s, e in spans]}")
    assert all(0 <= s < e <= len(context) for s, e in spans)  # offsets in-bounds
    assert spans, "the trained extractor should select at least one span"
    print("publish loop OK (upload step = HfApi.upload_folder(staging, repo_id))")


if __name__ == "__main__":
    main()
