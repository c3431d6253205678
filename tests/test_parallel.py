"""Sharded search + param sharding on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from verbatim_rag_tpu.parallel.mesh import (  # noqa: E402
    encoder_param_specs,
    make_mesh,
    shard_params,
)
from verbatim_rag_tpu.parallel.sharded_search import (  # noqa: E402
    replicate,
    shard_rows,
    sharded_dense_topk,
    sharded_sparse_topk,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(dp=4, tp=2)


class TestShardedDense:
    def test_matches_single_device(self, mesh):
        n, d, b, k = 1024, 64, 4, 10
        corpus = RNG.normal(size=(n, d)).astype(np.float32)
        corpus /= np.linalg.norm(corpus, axis=1, keepdims=True)
        queries = RNG.normal(size=(b, d)).astype(np.float32)
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)
        mask = np.ones(n, bool)
        mask[::17] = False

        corpus_sharded = shard_rows(jnp.asarray(corpus), mesh)
        queries_rep = replicate(jnp.asarray(queries), mesh)
        mask_sharded = shard_rows(jnp.asarray(mask), mesh)

        scores, idx = sharded_dense_topk(corpus_sharded, queries_rep, k, mask_sharded, mesh)
        scores, idx = np.asarray(scores), np.asarray(idx)

        full = queries @ corpus.T
        full[:, ~mask] = -np.inf
        expected_scores = -np.sort(-full, axis=1)[:, :k]
        np.testing.assert_allclose(scores, expected_scores, rtol=5e-3, atol=1e-3)
        # Indices consistent with their scores.
        gathered = np.take_along_axis(full, idx, axis=1)
        np.testing.assert_allclose(scores, gathered, rtol=5e-3, atol=1e-3)
        assert not np.isin(idx, np.flatnonzero(~mask)).any()


class TestShardedSparse:
    def test_matches_single_device(self, mesh):
        n, m, vocab, b, k = 512, 8, 64, 2, 8
        ids = RNG.integers(1, vocab, size=(n, m)).astype(np.int32)
        weights = RNG.random(size=(n, m)).astype(np.float32)
        q = np.zeros((b, vocab), np.float32)
        q[0, [3, 9]] = [1.0, 2.0]
        q[1, [5]] = [1.5]
        mask = np.ones(n, bool)

        scores, idx = sharded_sparse_topk(
            shard_rows(jnp.asarray(ids), mesh),
            shard_rows(jnp.asarray(weights), mesh),
            replicate(jnp.asarray(q), mesh),
            k,
            shard_rows(jnp.asarray(mask), mesh),
            mesh,
            block=64,
        )
        scores = np.asarray(scores)

        expected = np.zeros((b, n))
        for bi in range(b):
            for ni in range(n):
                expected[bi, ni] = np.sum(weights[ni] * q[bi, ids[ni]])
        expected_top = -np.sort(-expected, axis=1)[:, :k]
        np.testing.assert_allclose(scores, expected_top, rtol=1e-4)


class TestParamSharding:
    def test_specs_cover_tree(self):
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.encoder import init_encoder_params

        config = tiny_test_config()
        params = init_encoder_params(jax.random.PRNGKey(0), config)
        specs = encoder_param_specs(params)
        assert jax.tree.structure(specs) == jax.tree.structure(params)

    def test_shard_params_places_on_mesh(self, mesh):
        from verbatim_rag_tpu.models.config import tiny_test_config
        from verbatim_rag_tpu.models.encoder import encoder_forward, init_encoder_params

        config = tiny_test_config(num_heads=2, intermediate_size=64)
        params = init_encoder_params(jax.random.PRNGKey(0), config)
        sharded = shard_params(params, mesh)

        # TP-sharded kernel really is distributed over tp axis.
        wi = sharded["layers"]["mlp"]["wi"]["kernel"]
        assert len(wi.sharding.device_set) >= 2

        # Forward still gives identical numerics.
        ids = jnp.asarray(RNG.integers(3, config.vocab_size, size=(2, 16)), jnp.int32)
        mask = jnp.ones((2, 16), jnp.int32)
        ref = np.asarray(encoder_forward(params, config, ids, mask))
        got = np.asarray(encoder_forward(sharded, config, ids, mask))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


class TestDistributedHelpers:
    def test_single_process_noop(self):
        from verbatim_rag_tpu.parallel.distributed import (
            initialize,
            process_local_batch_slice,
        )

        assert initialize() is False  # no coordinator configured
        assert process_local_batch_slice(32) == slice(0, 32)
