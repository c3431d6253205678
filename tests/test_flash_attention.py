"""Pallas flash attention vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.ops.flash_attention import (  # noqa: E402
    attention_reference,
    flash_attention,
    flash_attention_tpu,
)

RNG = np.random.default_rng(3)


def _qkv(batch=2, seq=256, heads=2, head_dim=64):
    shape = (batch, seq, heads, head_dim)
    return (
        jnp.asarray(RNG.normal(size=shape), jnp.float32),
        jnp.asarray(RNG.normal(size=shape), jnp.float32),
        jnp.asarray(RNG.normal(size=shape), jnp.float32),
    )


class TestFlashAttention:
    @pytest.mark.parametrize("window", [None, 64])
    def test_matches_reference(self, window):
        q, k, v = _qkv()
        lengths = jnp.asarray([256, 173], jnp.int32)
        expected = np.asarray(attention_reference(q, k, v, lengths, window))
        got = np.asarray(
            flash_attention_tpu(
                q, k, v, lengths, window=window, q_block=64, k_block=64, interpret=True
            )
        )
        # Padded query rows are don't-care; compare valid rows only.
        np.testing.assert_allclose(got[0], expected[0], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(got[1, :173], expected[1, :173], rtol=2e-4, atol=2e-4)

    def test_uneven_blocks(self):
        q, k, v = _qkv(batch=1, seq=192)
        lengths = jnp.asarray([192], jnp.int32)
        expected = np.asarray(attention_reference(q, k, v, lengths))
        got = np.asarray(
            flash_attention_tpu(q, k, v, lengths, q_block=128, k_block=128, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


class TestFlashGradient:
    """flash_attention is differentiable (custom VJP with reference backward)
    — training the flash-enabled 150M config previously raised
    NotImplementedError (pallas_call has no JVP rule)."""

    def test_grad_matches_reference(self):
        rng = np.random.default_rng(4)
        b, s, h, d = 2, 64, 2, 16
        q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        lengths = jnp.asarray([64, 40], jnp.int32)

        def loss_flash(q, k, v):
            return (flash_attention(q, k, v, lengths) ** 2).sum()

        def loss_ref(q, k, v):
            return (attention_reference(q, k, v, lengths) ** 2).sum()

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-5)

    def test_grad_with_window(self):
        rng = np.random.default_rng(5)
        q = jnp.asarray(rng.normal(size=(1, 32, 2, 8)), jnp.float32)
        lengths = jnp.asarray([32], jnp.int32)
        g = jax.grad(lambda x: flash_attention(x, q, q, lengths, 8).sum())(q)
        assert np.isfinite(np.asarray(g)).all()


class TestNonDividingBlocks:
    def test_k_block_not_dividing_q_block_padding(self):
        """q_block=128, k_block=96: padding must go to lcm=384, not max=128 —
        a max-padded length leaves the final K pl.ds slice clamping OOB and
        silently double-counting keys."""
        q, k, v = _qkv(batch=1, seq=200)
        lengths = jnp.asarray([200], jnp.int32)
        expected = np.asarray(attention_reference(q, k, v, lengths))
        got = np.asarray(
            flash_attention_tpu(q, k, v, lengths, q_block=128, k_block=96, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)

    def test_q_block_not_dividing_k_block_padding(self):
        q, k, v = _qkv(batch=1, seq=150)
        lengths = jnp.asarray([150], jnp.int32)
        expected = np.asarray(attention_reference(q, k, v, lengths))
        got = np.asarray(
            flash_attention_tpu(q, k, v, lengths, q_block=96, k_block=128, interpret=True)
        )
        np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)
