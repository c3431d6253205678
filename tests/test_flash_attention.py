"""Pallas flash attention vs jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.ops.flash_attention import (  # noqa: E402
    attention_reference,
    flash_attention,
    flash_attention_bwd_tpu,
    flash_attention_tpu,
    flash_attention_tpu_lse,
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


class TestPallasBackward:
    """The Pallas FlashAttention-2 backward (dq + dk/dv kernels, interpret
    mode) against the jnp reference's derived VJP — the TPU training path no
    longer materializes [S, S] probability matrices in HBM."""

    def _case(self, window, seq=256, lengths_list=(256, 173), q_block=64, k_block=64):
        rng = np.random.default_rng(11)
        b, h, d = len(lengths_list), 2, 64
        shape = (b, seq, h, d)
        q = jnp.asarray(rng.normal(size=shape), jnp.float32)
        k = jnp.asarray(rng.normal(size=shape), jnp.float32)
        v = jnp.asarray(rng.normal(size=shape), jnp.float32)
        g = jnp.asarray(rng.normal(size=shape), jnp.float32)
        lengths = jnp.asarray(lengths_list, jnp.int32)
        # Zero the cotangent at padded query rows — the loss never reads
        # them (the encoder masks labels/pooling). A windowed q row whose
        # whole band is padded is degenerate in the reference (softmax of
        # all -1e30 logits → uniform), while the kernel correctly treats it
        # as dead; with g=0 there both agree on zero grads.
        valid = (np.arange(seq)[None, :] < np.asarray(lengths)[:, None]).astype(
            np.float32
        )
        g = g * jnp.asarray(valid)[:, :, None, None]

        out, lse = flash_attention_tpu_lse(
            q, k, v, lengths, window=window, q_block=q_block, k_block=k_block,
            interpret=True,
        )
        dq, dk, dv = flash_attention_bwd_tpu(
            q, k, v, lengths, out, lse, g, window=window,
            q_block=q_block, k_block=k_block, interpret=True,
        )
        _, vjp = jax.vjp(
            lambda q_, k_, v_: attention_reference(q_, k_, v_, lengths, window), q, k, v
        )
        rdq, rdk, rdv = vjp(g)
        return (dq, dk, dv), (rdq, rdk, rdv), lengths_list

    @pytest.mark.parametrize("window", [None, 64])
    def test_grads_match_reference_vjp(self, window):
        got, want, lengths_list = self._case(window)
        for a, b_ in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
            )

    def test_nondividing_seq_padding(self):
        """seq=192 with 128-blocks: the lcm seq padding must stay masked in
        the backward too (padded keys contribute zero grads)."""
        got, want, _ = self._case(
            None, seq=192, lengths_list=(192, 100), q_block=128, k_block=128
        )
        for a, b_ in zip(got, want):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
            )

    def test_fwd_lse_matches_reference_logsumexp(self):
        rng = np.random.default_rng(12)
        b, s, h, d = 2, 128, 2, 32
        q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        lengths = jnp.asarray([128, 77], jnp.int32)
        out, lse = flash_attention_tpu_lse(
            q, k, v, lengths, q_block=64, k_block=64, interpret=True
        )
        scale = 1.0 / np.sqrt(d)
        logits = np.einsum("bqhd,bkhd->bhqk", q, k) * scale
        kidx = np.arange(s)
        logits = np.where(
            (kidx[None, None, None, :] < np.asarray(lengths)[:, None, None, None]),
            logits,
            -1e30,
        )
        want = np.log(np.sum(np.exp(logits - logits.max(-1, keepdims=True)), -1)) + (
            logits.max(-1, keepdims=True)[..., 0]
        )
        got = np.asarray(lse)
        np.testing.assert_allclose(got[0], want[0], rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(got[1, :, :77], want[1, :, :77], rtol=1e-4, atol=1e-4)

    def test_zero_length_row_finite(self):
        """A fully-padded batch row must produce finite (zero) grads, not NaN
        from exp(s - lse) on a dead row."""
        rng = np.random.default_rng(13)
        b, s, h, d = 2, 128, 1, 32
        q = jnp.asarray(rng.normal(size=(b, s, h, d)), jnp.float32)
        lengths = jnp.asarray([128, 0], jnp.int32)
        g = jnp.ones((b, s, h, d), jnp.float32)
        out, lse = flash_attention_tpu_lse(
            q, q, q, lengths, q_block=64, k_block=64, interpret=True
        )
        dq, dk, dv = flash_attention_bwd_tpu(
            q, q, q, lengths, out, lse, g, q_block=64, k_block=64, interpret=True
        )
        for a in (dq, dk, dv):
            assert np.isfinite(np.asarray(a)).all()
        # Dead row: nothing attends to it and it attends to nothing.
        np.testing.assert_allclose(np.asarray(dk)[1], 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dv)[1], 0.0, atol=1e-6)


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
