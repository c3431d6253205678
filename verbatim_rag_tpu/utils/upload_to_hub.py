"""Push a trained extractor checkpoint to the HuggingFace Hub.

Parity: reference `verbatim_rag/tools/upload_to_hub.py` — packages a trained
model + tokenizer and uploads under a repo id (HF_TOKEN env). Staging makes
the artifact loadable by BOTH stacks:

- the native files (`params.npz` + `verbatim_config.json`) are copied
  verbatim, so `models.hf_convert.load_span_extractor(download_dir)` serves
  the checkpoint directly;
- for ModernBERT-family token heads, the JAX tree is inverted to an HF
  `ModernBertForTokenClassification` state dict
  (`modernbert_params_to_hf_state_dict`) and written as model.safetensors +
  config.json, so torch/transformers and this repo's HF loader can read it.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def jax_checkpoint_to_hf_dir(
    checkpoint_dir: str, out_dir: str, config: dict | None = None
) -> None:
    """Materialize an upload-ready model dir from a trainer checkpoint."""
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)

    # 1. Native files verbatim — the train→save→publish→serve loop must not
    #    depend on the HF inversion below succeeding.
    for name in ("params.npz", "verbatim_config.json", "metrics.json"):
        src = os.path.join(checkpoint_dir, name)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(out_dir, name))

    meta_path = os.path.join(checkpoint_dir, "verbatim_config.json")
    meta = json.load(open(meta_path)) if os.path.exists(meta_path) else {}

    # 2. HF-format export (ModernBERT token head): invert the JAX tree to
    #    HF key names / [out, in] layout. Raw tree-path keys in a
    #    model.safetensors would be loadable by NEITHER stack.
    hf_config: dict | None = None
    state_dict: dict[str, np.ndarray] | None = None
    enc_cfg = meta.get("encoder_config")
    if enc_cfg and meta.get("head") == "token":
        from verbatim_rag_tpu.models.config import EncoderConfig
        from verbatim_rag_tpu.models.hf_convert import (
            hf_config_from_encoder,
            modernbert_params_to_hf_state_dict,
        )
        from verbatim_rag_tpu.models.highlighter import init_highlighter_params
        from verbatim_rag_tpu.training.trainer import Trainer

        config_obj = EncoderConfig(**enc_cfg)
        if config_obj.position_embedding_type == "rope":
            import jax

            template = init_highlighter_params(jax.random.PRNGKey(0), config_obj)
            params = Trainer.load_checkpoint(checkpoint_dir, template)
            state_dict = modernbert_params_to_hf_state_dict(params, config_obj)
            hf_config = hf_config_from_encoder(config_obj)

    if hf_config is not None:
        hf_config.update(config or {})
    elif config:
        hf_config = config
    if hf_config:
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(hf_config, f, indent=2)

    if state_dict is not None:
        try:
            from safetensors.numpy import save_file

            save_file(state_dict, os.path.join(out_dir, "model.safetensors"))
        except ImportError:
            np.savez(os.path.join(out_dir, "model.npz"), **state_dict)

    # 3. Tokenizer file, when the checkpoint used a real one.
    tok = (meta.get("tokenizer") or {})
    tok_path = tok.get("path")
    if tok_path and os.path.exists(tok_path):
        shutil.copy2(tok_path, os.path.join(out_dir, "tokenizer.json"))


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir", help="Trainer checkpoint dir (contains params.npz)")
    parser.add_argument("repo_id", help="e.g. your-org/verbatim-highlighter-tpu")
    parser.add_argument("--config", default="{}", help="extra config JSON string or file")
    parser.add_argument("--private", action="store_true")
    args = parser.parse_args(argv)

    config = (
        json.load(open(args.config)) if os.path.exists(args.config) else json.loads(args.config)
    )
    staging = os.path.join(args.checkpoint_dir, "_hub_staging")
    jax_checkpoint_to_hf_dir(args.checkpoint_dir, staging, config)

    token = os.environ.get("HF_TOKEN")
    if not token:
        print("HF_TOKEN not set — staged locally at", staging)
        return 1
    from huggingface_hub import HfApi

    api = HfApi(token=token)
    api.create_repo(args.repo_id, private=args.private, exist_ok=True)
    api.upload_folder(folder_path=staging, repo_id=args.repo_id)
    print(f"Uploaded {staging} → {args.repo_id}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
