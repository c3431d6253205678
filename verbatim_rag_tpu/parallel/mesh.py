"""Device meshes + sharding rules.

SURVEY.md §2.9: the reference is single-process/single-device; every
parallelism strategy here is the TPU-native replacement design:

- **DP** — batch dimension sharded over the ``dp`` mesh axis (encode,
  extract, training).
- **TP** — encoder weight matrices sharded over ``tp``: attention QKV/O by
  heads, MLP Wi/Wo by intermediate dim. XLA inserts the all-reduces.
- **SP** — sequence dimension of activations sharded over ``tp`` between
  blocks (annotated via `with_sharding_constraint`), the long-context path.
- **Index sharding** — corpus rows sharded over the full mesh; per-shard
  top-k + all_gather merge (see `sharded_search.py`).
- **PP / EP** — not applicable at this model scale (≤150M encoder, no MoE);
  recorded as deliberate no-ops, matching SURVEY.md §2.9.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    dp: int | None = None, tp: int = 1, devices: list | None = None
) -> Mesh:
    """Build a ('dp', 'tp') mesh. Defaults: all devices on dp."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp({dp}) * tp({tp}) != device count ({n})")
    grid = np.asarray(devices).reshape(dp, tp)
    return Mesh(grid, axis_names=("dp", "tp"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for inputs: [B, ...] over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def row_sharding(mesh: Mesh) -> NamedSharding:
    """Index rows sharded over every device (dp×tp flattened)."""
    return NamedSharding(mesh, P(("dp", "tp")))


def encoder_param_specs(params) -> dict:
    """PartitionSpec tree for the encoder parameter pytree (TP sharding).

    Rules (path-based):
    - attention q/k/v kernels: shard output dim (heads) over tp → P(None, 'tp')
    - attention o kernel: shard input dim over tp → P('tp', None)
    - mlp wi kernel: shard output (intermediate) over tp
    - mlp wo kernel: shard input (intermediate) over tp
    - embeddings / layernorms / biases: replicated
    Layer-stacked params carry a leading layer axis (never sharded).
    """

    def spec_for(path, leaf) -> P:
        names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
        joined = "/".join(str(n) for n in names)
        ndim = np.ndim(leaf)
        if "attn" in joined and joined.endswith("kernel"):
            if "/o/" in joined or joined.endswith("o/kernel"):
                # [L, h, h] — input dim sharded.
                return P(*( [None] * (ndim - 2) + ["tp", None] ))
            return P(*([None] * (ndim - 2) + [None, "tp"]))
        if "mlp" in joined and joined.endswith("kernel"):
            if "/wi/" in joined or "wi" in joined.split("/"):
                return P(*([None] * (ndim - 2) + [None, "tp"]))
            return P(*([None] * (ndim - 2) + ["tp", None]))
        if "mlp" in joined and joined.endswith("bias") and "wi" in joined.split("/"):
            return P(*([None] * (ndim - 1) + ["tp"]))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree on the mesh per `encoder_param_specs`."""
    specs = encoder_param_specs(params)
    return jax.tree.map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params,
        specs,
    )
