"""Push a trained extractor checkpoint to the HuggingFace Hub.

Parity: reference `verbatim_rag/tools/upload_to_hub.py` — packages a trained
model + tokenizer and uploads under a repo id (HF_TOKEN env). The JAX
checkpoint (`params.npz`) is converted back to a torch-style state dict so
the published artifact is loadable by either stack.
"""

from __future__ import annotations

import argparse
import json
import os


def jax_checkpoint_to_hf_dir(checkpoint_dir: str, out_dir: str, config: dict) -> None:
    """Materialize an HF-style model dir (config.json + safetensors/npz)."""
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    data = np.load(os.path.join(checkpoint_dir, "params.npz"))
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
    try:
        from safetensors.numpy import save_file

        save_file({k: data[k] for k in data.files}, os.path.join(out_dir, "model.safetensors"))
    except ImportError:
        np.savez(os.path.join(out_dir, "model.npz"), **{k: data[k] for k in data.files})


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_dir", help="Trainer checkpoint dir (contains params.npz)")
    parser.add_argument("repo_id", help="e.g. your-org/verbatim-highlighter-tpu")
    parser.add_argument("--config", default="{}", help="model config JSON string or file")
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
