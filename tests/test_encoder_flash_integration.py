"""Encoder with use_flash_attention matches the plain-attention encoder.

On CPU the flash path dispatches to the jnp reference, so this validates the
wiring (lengths, per-layer window cond) rather than the kernel itself — the
kernel is covered by test_flash_attention.py in interpret mode.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.models.config import tiny_test_config  # noqa: E402
from verbatim_rag_tpu.models.encoder import encoder_forward, init_encoder_params  # noqa: E402

RNG = np.random.default_rng(5)


@pytest.mark.parametrize("family", ["bert", "modernbert"])
def test_flash_wiring_matches_plain(family):
    kwargs = {}
    if family == "modernbert":
        kwargs = dict(
            position_embedding_type="rope",
            norm_location="pre",
            activation="geglu",
            use_bias=False,
            final_norm=True,
            type_vocab_size=0,
            first_layer_no_attn_norm=True,
            global_attn_every_n_layers=2,
            local_attention_window=8,
        )
    config_plain = tiny_test_config(**kwargs)
    config_flash = tiny_test_config(use_flash_attention=True, **kwargs)

    params = init_encoder_params(jax.random.PRNGKey(0), config_plain)
    ids = jnp.asarray(RNG.integers(3, config_plain.vocab_size, size=(2, 24)), jnp.int32)
    mask = np.ones((2, 24), np.int32)
    mask[1, 17:] = 0
    mask = jnp.asarray(mask)

    plain = np.asarray(encoder_forward(params, config_plain, ids, mask))
    flash = np.asarray(encoder_forward(params, config_flash, ids, mask))
    np.testing.assert_allclose(flash[0], plain[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(flash[1, :17], plain[1, :17], rtol=2e-4, atol=2e-4)
