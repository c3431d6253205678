"""Sequence-parallel encoder forward vs the single-device forward."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from verbatim_rag_tpu.models.config import tiny_test_config  # noqa: E402
from verbatim_rag_tpu.models.encoder import (  # noqa: E402
    encoder_forward,
    encoder_forward_sp,
    init_encoder_params,
)
from verbatim_rag_tpu.parallel.mesh import make_mesh  # noqa: E402

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")

RNG = np.random.default_rng(13)


def test_sp_forward_matches_single_device():
    config = tiny_test_config(type_vocab_size=0)
    params = init_encoder_params(jax.random.PRNGKey(0), config)
    mesh = make_mesh(dp=1, tp=8)

    seq = 64  # 8 tokens per device
    ids_np = RNG.integers(3, config.vocab_size, size=(2, seq)).astype(np.int32)
    mask_np = np.ones((2, seq), np.int32)
    mask_np[1, 50:] = 0
    ids_np[1, 50:] = 0

    expected = np.asarray(
        encoder_forward(params, config, jnp.asarray(ids_np), jnp.asarray(mask_np))
    )

    shard = NamedSharding(mesh, P(None, "tp"))
    ids_sp = jax.device_put(jnp.asarray(ids_np), shard)
    mask_sp = jax.device_put(jnp.asarray(mask_np), shard)
    got = np.asarray(encoder_forward_sp(params, config, ids_sp, mask_sp, mesh))

    np.testing.assert_allclose(got[0], expected[0], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(got[1, :50], expected[1, :50], rtol=3e-4, atol=3e-4)


def test_sp_rejects_local_attention_models():
    config = tiny_test_config(
        position_embedding_type="rope", global_attn_every_n_layers=2, type_vocab_size=0
    )
    params = init_encoder_params(jax.random.PRNGKey(0), config)
    mesh = make_mesh(dp=1, tp=8)
    with pytest.raises(NotImplementedError):
        encoder_forward_sp(
            params,
            config,
            jnp.zeros((1, 64), jnp.int32),
            jnp.ones((1, 64), jnp.int32),
            mesh,
        )
