"""Tensor-parallel encoder forward vs the single-device forward.

VERDICT r3 weak #6: the dryrun exercises tp=2 inside the train step, but
no test pinned the TP-sharded encoder FORWARD numerically against the
single-device forward (the SP path has `test_encoder_sp.py`; this is the
TP analog). The encoder is pure jnp, so sharding the parameter pytree per
`parallel.mesh.encoder_param_specs` and jitting the same function must
reproduce the unsharded numerics — XLA inserts the all-reduces over the
'tp' axis (attention heads and MLP intermediate dim are the sharded
contractions).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.models.config import tiny_test_config  # noqa: E402
from verbatim_rag_tpu.models.encoder import (  # noqa: E402
    encoder_forward,
    init_encoder_params,
)
from verbatim_rag_tpu.parallel.mesh import make_mesh, shard_params  # noqa: E402

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

RNG = np.random.default_rng(21)


def _batch(config, batch=2, seq=32):
    ids = RNG.integers(3, config.vocab_size, size=(batch, seq)).astype(np.int32)
    mask = np.ones((batch, seq), np.int32)
    mask[-1, seq - 7 :] = 0
    ids[-1, seq - 7 :] = 0
    return ids, mask


def _tp_parity(config, tp: int, rtol=1e-5, atol=1e-6):
    params = init_encoder_params(jax.random.PRNGKey(0), config)
    ids_np, mask_np = _batch(config)
    ids, mask = jnp.asarray(ids_np), jnp.asarray(mask_np)

    expected = np.asarray(encoder_forward(params, config, ids, mask))

    mesh = make_mesh(dp=len(jax.devices()) // tp, tp=tp)
    sharded = shard_params(params, mesh)
    got = np.asarray(jax.jit(encoder_forward, static_argnums=1)(
        sharded, config, ids, mask
    ))

    live = mask_np.astype(bool)
    np.testing.assert_allclose(got[live], expected[live], rtol=rtol, atol=atol)


def test_tp2_bert_forward_matches_single_device():
    _tp_parity(tiny_test_config(), tp=2)


def test_tp8_bert_forward_matches_single_device():
    """All-tp mesh: every sharded contraction crosses all 8 devices."""
    _tp_parity(tiny_test_config(), tp=8)


def test_tp2_modernbert_local_global_matches_single_device():
    config = tiny_test_config(
        position_embedding_type="rope",
        norm_location="pre",
        activation="geglu",
        use_bias=False,
        final_norm=True,
        type_vocab_size=0,
        first_layer_no_attn_norm=True,
        global_attn_every_n_layers=2,
        local_attention_window=16,
        num_layers=4,
    )
    _tp_parity(config, tp=2)
