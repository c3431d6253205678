"""Ring attention vs single-device reference on the 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.ops.flash_attention import attention_reference  # noqa: E402
from verbatim_rag_tpu.ops.ring_attention import ring_attention, shard_sequence  # noqa: E402
from verbatim_rag_tpu.parallel.mesh import make_mesh  # noqa: E402

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=1, tp=8)


class TestRingAttention:
    def test_matches_reference(self, mesh):
        batch, seq, heads, head_dim = 2, 64, 2, 16
        shape = (batch, seq, heads, head_dim)
        q = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        k = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        v = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        lengths = jnp.asarray([64, 45], jnp.int32)

        expected = np.asarray(attention_reference(q, k, v, lengths))
        got = np.asarray(
            ring_attention(
                shard_sequence(q, mesh),
                shard_sequence(k, mesh),
                shard_sequence(v, mesh),
                lengths,
                mesh,
            )
        )
        np.testing.assert_allclose(got[0], expected[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got[1, :45], expected[1, :45], rtol=2e-4, atol=2e-4)

    def test_long_sequence_memory_shape(self, mesh):
        """One 8-device pass over a sequence none of the devices could hold
        as a full [S, S] score matrix."""
        batch, seq, heads, head_dim = 1, 512, 1, 8
        shape = (batch, seq, heads, head_dim)
        q = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        lengths = jnp.asarray([512], jnp.int32)
        out = ring_attention(
            shard_sequence(q, mesh),
            shard_sequence(q, mesh),
            shard_sequence(q, mesh),
            lengths,
            mesh,
        )
        assert out.shape == shape
        assert np.isfinite(np.asarray(out)).all()
