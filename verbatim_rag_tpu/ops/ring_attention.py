"""Ring attention: sequence-sharded exact attention over the device mesh.

SURVEY.md §2.9/§5: the reference handles >8k contexts with host-side sliding
windows (`max_length=8192, doc_stride=256`, `extractors.py:103-104`) — an
approximation. The TPU-native replacement scores a whole document in one
sequence-sharded pass: the sequence dimension is split over the mesh, each
device holds its Q/K/V shard, and K/V shards rotate around the ring via
`jax.lax.ppermute` while an online-softmax accumulator merges each block's
contribution. After `n_devices` steps every query row has attended to the
full sequence exactly — compute per device is O(S²/n) and memory O(S/n).

Built on `shard_map` + XLA collectives so the same code runs on a TPU pod
slice or the virtual CPU mesh in tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, k_offset, lengths, seq_len):
    """One KV block's contribution with masking: returns (numerator
    [B, Sq, H, D], max [B, H, Sq], denom [B, H, Sq])."""
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(jnp.float32)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    )  # [B, H, Sq, Sk]
    k_idx = k_offset + jnp.arange(k.shape[1])
    valid = (k_idx[None, :] < lengths[:, None]) & (k_idx[None, :] < seq_len)
    logits = jnp.where(valid[:, None, None, :], logits, NEG_INF)
    block_max = jnp.max(logits, axis=-1)  # [B, H, Sq]
    probs = jnp.exp(logits - block_max[..., None])
    probs = jnp.where(valid[:, None, None, :], probs, 0.0)
    denom = jnp.sum(probs, axis=-1)
    numer = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    return numer, block_max, denom


@partial(jax.jit, static_argnames=("mesh", "axis", "use_flash"))
def ring_attention(
    q: jax.Array,  # [B, S, H, D] — S sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,  # [B] valid lengths (global positions)
    mesh: Mesh,
    axis: str = "tp",
    use_flash: bool | None = None,
) -> jax.Array:
    """Exact sequence-sharded attention; returns [B, S, H, D] sharded like q.

    ``use_flash`` computes each ring step's block contribution with the
    Pallas flash kernel (`flash_attention_partial`) — the [Sq, Sk] score
    matrix stays in VMEM instead of materializing per step. Defaults to on
    for TPU backends, off elsewhere (CPU tests can force it; the kernel runs
    in interpret mode there).
    """
    platform = jax.devices()[0].platform
    on_tpu = platform in ("tpu", "axon")
    if use_flash is None:
        use_flash = on_tpu
    seq_len = q.shape[1]

    def local_fn(q_shard, k_shard, v_shard, lengths_rep):
        n_dev = jax.lax.axis_size(axis)
        my_idx = jax.lax.axis_index(axis)
        shard_len = q_shard.shape[1]

        def step(i, carry):
            acc, m_run, l_run, k_cur, v_cur = carry
            # Blocks rotate j→j+1, so after i steps we hold (my_idx − i)'s block.
            block_owner = jnp.mod(my_idx - i, n_dev)
            k_offset = block_owner * shard_len
            if use_flash:
                from .flash_attention import flash_attention_partial

                numer, block_max, denom = flash_attention_partial(
                    q_shard, k_cur, v_cur, lengths_rep, k_offset,
                    interpret=not on_tpu,
                )
            else:
                numer, block_max, denom = _block_attend(
                    q_shard, k_cur, v_cur, k_offset, lengths_rep, seq_len
                )
            m_new = jnp.maximum(m_run, block_max)
            scale_old = jnp.exp(m_run - m_new)
            scale_blk = jnp.exp(block_max - m_new)
            acc = (
                acc * scale_old.transpose(0, 2, 1)[..., None]
                + numer * scale_blk.transpose(0, 2, 1)[..., None]
            )
            l_run = l_run * scale_old + denom * scale_blk
            # Rotate KV to the next device in the ring.
            perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
            k_next = jax.lax.ppermute(k_cur, axis, perm)
            v_next = jax.lax.ppermute(v_cur, axis, perm)
            return acc, m_new, l_run, k_next, v_next

        batch, _, heads, head_dim = q_shard.shape
        init = (
            jnp.zeros((batch, shard_len, heads, head_dim), jnp.float32),
            jnp.full((batch, heads, shard_len), NEG_INF, jnp.float32),
            jnp.zeros((batch, heads, shard_len), jnp.float32),
            k_shard.astype(jnp.float32),
            v_shard.astype(jnp.float32),
        )
        if use_flash:
            # Unrolled ring: pallas_call inside lax.fori_loop crashes the TPU
            # compile helper; the step count (n_dev) is static under
            # shard_map, so a Python loop traces the same program unrolled.
            carry = init
            for i in range(mesh.shape[axis] if axis in mesh.shape else 1):
                carry = step(jnp.int32(i), carry)
            acc, _m, l_run, _k, _v = carry
        else:
            acc, _m, l_run, _k, _v = jax.lax.fori_loop(0, n_dev, step, init)
        denom = jnp.maximum(l_run, 1e-20).transpose(0, 2, 1)[..., None]
        return (acc / denom).astype(q_shard.dtype)

    shard = P(None, axis, None, None)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(shard, shard, shard, P()),
        out_specs=shard,
        check_vma=False,
    )
    return fn(q, k, v, lengths)


@partial(jax.jit, static_argnames=("window", "mesh", "axis"))
def halo_attention(
    q: jax.Array,  # [B, S, H, D] — S sharded over `axis`
    k: jax.Array,
    v: jax.Array,
    lengths: jax.Array,  # [B]
    window: int,  # full window width: attend iff |i−j| ≤ window//2
    mesh: Mesh,
    axis: str = "tp",
) -> jax.Array:
    """Sequence-sharded LOCAL attention via halo exchange.

    The companion to :func:`ring_attention` for ModernBERT's sliding-window
    layers: each device ppermutes only ``window//2`` boundary tokens from its
    neighbors instead of rotating full KV shards, so local layers stay
    O(S·window) even under sequence parallelism. Edge devices receive
    wrap-around halos whose (global-position) mask kills them — correctness
    never depends on ring topology.

    Requires ``S / n_devices ≥ window//2``.
    """
    halo = window // 2
    seq_len = q.shape[1]
    n_dev = mesh.shape[axis]
    if seq_len % n_dev != 0:
        raise ValueError(
            f"halo_attention: sequence length {seq_len} must divide evenly "
            f"over {n_dev} devices on mesh axis {axis!r}"
        )
    if seq_len // n_dev < halo:
        # Validate the documented precondition up front — violating it
        # would otherwise surface as a cryptic shape mismatch inside
        # shard_map (the k_s[:, -halo:] slice spans a whole shard).
        raise ValueError(
            f"halo_attention requires shard length (S/n_devices = "
            f"{seq_len // n_dev}) >= window//2 = {halo}; shorten the window, "
            "use fewer devices on the sequence axis, or fall back to "
            "ring_attention for this layer"
        )

    def local_fn(q_s, k_s, v_s, lengths_rep):
        n_dev = jax.lax.axis_size(axis)
        my = jax.lax.axis_index(axis)
        shard_len = q_s.shape[1]

        right = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        left = [(j, (j - 1) % n_dev) for j in range(n_dev)]
        # Halo from the LEFT neighbor = its last `halo` tokens sent rightward.
        k_lh = jax.lax.ppermute(k_s[:, -halo:], axis, right)
        v_lh = jax.lax.ppermute(v_s[:, -halo:], axis, right)
        # Halo from the RIGHT neighbor = its first `halo` tokens sent leftward.
        k_rh = jax.lax.ppermute(k_s[:, :halo], axis, left)
        v_rh = jax.lax.ppermute(v_s[:, :halo], axis, left)
        k_ext = jnp.concatenate([k_lh, k_s, k_rh], axis=1)  # [B, shard+2h, H, D]
        v_ext = jnp.concatenate([v_lh, v_s, v_rh], axis=1)

        q_pos = my * shard_len + jnp.arange(shard_len)  # global positions
        k_pos = my * shard_len - halo + jnp.arange(shard_len + 2 * halo)

        scale = 1.0 / jnp.sqrt(q_s.shape[-1]).astype(jnp.float32)
        logits = (
            jnp.einsum(
                "bqhd,bkhd->bhqk", q_s, k_ext, preferred_element_type=jnp.float32
            )
            * scale
        )
        in_band = jnp.abs(q_pos[:, None] - k_pos[None, :]) <= halo
        in_range = (k_pos[None, :] >= 0) & (k_pos[None, :] < seq_len)
        valid = in_band[None, :, :] & in_range & (
            k_pos[None, None, :] < lengths_rep[:, None, None]
        )
        logits = jnp.where(valid[:, None, :, :], logits, NEG_INF)
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bhqk,bkhd->bqhd",
            probs,
            v_ext.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return out.astype(q_s.dtype)

    shard = P(None, axis, None, None)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(shard, shard, shard, P()),
        out_specs=shard,
        check_vma=False,
    )
    return fn(q, k, v, lengths)


def shard_sequence(x: jax.Array, mesh: Mesh, axis: str = "tp") -> jax.Array:
    """Place [B, S, ...] with the sequence dim sharded over `axis`."""
    spec = [None] * x.ndim
    spec[1] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
