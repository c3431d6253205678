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


class TestRingFlash:
    """Ring steps computed with the Pallas flash-partial kernel (interpret
    mode on CPU) must match the jnp block path and the reference."""

    def test_flash_ring_matches_reference(self, mesh):
        shape = (2, 64, 2, 16)
        q = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        k = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        v = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        lengths = jnp.asarray([64, 47], jnp.int32)

        ref = np.asarray(attention_reference(q, k, v, lengths))
        out_flash = np.asarray(
            ring_attention(
                shard_sequence(q, mesh),
                shard_sequence(k, mesh),
                shard_sequence(v, mesh),
                lengths,
                mesh,
                use_flash=True,
            )
        )
        out_jnp = np.asarray(
            ring_attention(
                shard_sequence(q, mesh),
                shard_sequence(k, mesh),
                shard_sequence(v, mesh),
                lengths,
                mesh,
                use_flash=False,
            )
        )
        valid = np.zeros(shape, bool)
        valid[0, :64] = True
        valid[1, :47] = True
        np.testing.assert_allclose(out_flash[valid], ref[valid], rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(out_flash[valid], out_jnp[valid], rtol=2e-4, atol=2e-5)

    def test_flash_partial_matches_block_attend(self):
        from verbatim_rag_tpu.ops.flash_attention import flash_attention_partial
        from verbatim_rag_tpu.ops.ring_attention import _block_attend

        b, sq, sk, h, d = 2, 32, 48, 2, 16
        q = jnp.asarray(RNG.normal(size=(b, sq, h, d)), jnp.float32)
        k = jnp.asarray(RNG.normal(size=(b, sk, h, d)), jnp.float32)
        v = jnp.asarray(RNG.normal(size=(b, sk, h, d)), jnp.float32)
        lengths = jnp.asarray([70, 55], jnp.int32)
        k_offset = 24

        numer_f, m_f, l_f = flash_attention_partial(
            q, k, v, lengths, jnp.int32(k_offset), interpret=True
        )
        numer_r, m_r, l_r = _block_attend(q, k, v, k_offset, lengths, seq_len=128)
        np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_r), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(l_f), np.asarray(l_r), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(numer_f), np.asarray(numer_r), rtol=1e-4, atol=1e-5
        )


class TestRingGradient:
    """The flash ring path is differentiable (custom VJP on the partial
    kernel) — long-context SP training."""

    def test_ring_grad_flash_matches_jnp(self, mesh):
        shape = (1, 32, 2, 8)
        q = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        lengths = jnp.asarray([32], jnp.int32)

        def loss(x, use_flash):
            out = ring_attention(
                shard_sequence(x, mesh), shard_sequence(x, mesh),
                shard_sequence(x, mesh), lengths, mesh, use_flash=use_flash,
            )
            return (out.astype(jnp.float32) ** 2).sum()

        g_flash = np.asarray(jax.grad(lambda x: loss(x, True))(q))
        g_jnp = np.asarray(jax.grad(lambda x: loss(x, False))(q))
        np.testing.assert_allclose(g_flash, g_jnp, rtol=2e-4, atol=2e-5)
        assert np.abs(g_flash).max() > 0


class TestHaloPrecondition:
    def test_halo_matches_reference(self, mesh):
        from verbatim_rag_tpu.ops.ring_attention import halo_attention

        batch, seq, heads, head_dim = 2, 64, 2, 16
        shape = (batch, seq, heads, head_dim)
        q = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        k = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        v = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        lengths = jnp.asarray([64, 50], jnp.int32)
        window = 16  # halo 8 == shard_len 8: boundary-legal
        expected = np.asarray(attention_reference(q, k, v, lengths, window=window))
        got = np.asarray(
            halo_attention(
                shard_sequence(q, mesh), shard_sequence(k, mesh),
                shard_sequence(v, mesh), lengths, window, mesh,
            )
        )
        np.testing.assert_allclose(got[0], expected[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got[1, :50], expected[1, :50], rtol=2e-4, atol=2e-4)

    def test_oversized_window_raises_clear_error(self, mesh):
        """window//2 > shard length: must raise up front with a readable
        message, not crash deep inside shard_map on a slice shape."""
        from verbatim_rag_tpu.ops.ring_attention import halo_attention

        shape = (1, 64, 1, 8)  # shard_len 8 over 8 devices
        q = jnp.asarray(RNG.normal(size=shape), jnp.float32)
        lengths = jnp.asarray([64], jnp.int32)
        with pytest.raises(ValueError, match="halo_attention requires"):
            halo_attention(
                shard_sequence(q, mesh), shard_sequence(q, mesh),
                shard_sequence(q, mesh), lengths, 32, mesh,
            )

    def test_uneven_shard_raises(self, mesh):
        from verbatim_rag_tpu.ops.ring_attention import halo_attention

        shape = (1, 60, 1, 8)  # 60 does not divide over 8 devices
        q = jnp.zeros(shape, jnp.float32)
        lengths = jnp.asarray([60], jnp.int32)
        with pytest.raises(ValueError, match="divide evenly"):
            halo_attention(q, q, q, lengths, 8, mesh)
