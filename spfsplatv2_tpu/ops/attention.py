"""Scaled-dot-product attention with a fused TPU flash path.

Dense materialized attention is optimal on TPU for the short sequences of
the flagship config (~0.5-2.6k tokens: the (n_q, n_k) logits tile straight
onto the MXU).  For the long-context configs (10-view training, 512^2
inputs: 5-10k tokens) the O(n^2) f32 logits buffer dominates HBM, so
`sdpa` switches to the Pallas TPU flash-attention kernel that ships with
JAX (jax.experimental.pallas.ops.tpu.flash_attention) above a key-length
threshold.  Sequences are padded to the kernel's block granularity and
fenced with segment ids so padding never leaks into the softmax.

Parity surface: reference torch.nn.functional.scaled_dot_product_attention
uses (src/model/encoder/backbone/croco/blocks.py:82-115); this module is
the TPU-native equivalent of torch's fused-SDPA dispatch.

Masked (view-block) attentions stay dense: the context/target mask depends
on a traced num_target, which no static block-sparse kernel layout can
express; at the token counts where that mask is used the dense form is
MXU-bound anyway.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Below this many KEY tokens the dense form is faster (one big MXU matmul,
# no kernel launch or padding overhead) and uses negligible memory.
FLASH_MIN_KV = 4096
_BLOCK = 512


def _dense(q, k, v, scale):
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def sdpa(q, k, v, scale, *, flash_min_kv: int = FLASH_MIN_KV):
    """Attention over (b, h, n, d) tensors; no mask.

    Uses the fused flash kernel when on TPU and n_k >= flash_min_kv,
    otherwise the dense MXU form.  Outputs match the dense form to
    f32-accumulation tolerance; both paths are differentiable (the flash
    kernel ships its own custom VJP).
    """
    n_k = k.shape[2]
    if jax.default_backend() != "tpu" or n_k < flash_min_kv:
        return _dense(q, k, v, scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    b, h, n_q, d = q.shape
    nq_p = -(-n_q // _BLOCK) * _BLOCK
    nk_p = -(-n_k // _BLOCK) * _BLOCK
    qp = _pad_to(q, nq_p, 2)
    kp = _pad_to(k, nk_p, 2)
    vp = _pad_to(v, nk_p, 2)
    # Segment ids: real tokens 0, padding 1 — padding only attends padding.
    q_seg = (jnp.arange(nq_p) >= n_q).astype(jnp.int32)[None, :]
    kv_seg = (jnp.arange(nk_p) >= n_k).astype(jnp.int32)[None, :]
    seg = SegmentIds(
        q=jnp.broadcast_to(q_seg, (b, nq_p)),
        kv=jnp.broadcast_to(kv_seg, (b, nk_p)),
    )
    out = flash_attention(qp, kp, vp, segment_ids=seg, sm_scale=scale)
    return out[:, :, :n_q].astype(v.dtype)


def sdpa_view_masked(
    q, k, v, scale, view_mask, tokens_per_view: int,
    *, chunk_q: int = 512, chunked_min_kv: int = FLASH_MIN_KV,
):
    """View-block-masked attention over (b, h, n, d) tensors.

    view_mask (vq, vk) is the ADDITIVE cross-view mask (0 / -inf at view
    granularity, possibly built from traced values); token r belongs to
    view r // tokens_per_view.  Below chunked_min_kv key tokens this is
    the dense einsum-softmax.  Above it, queries are processed in chunks
    of chunk_q with the mask expanded per chunk, so peak logits memory is
    O(chunk_q * n_k) instead of O(n_q * n_k) — at the 10-view 512^2
    stretch the dense form would materialize tens of GB.  Exact (softmax
    rows are independent), differentiable through lax.map.
    """
    b, h, n_q, d = q.shape
    n_k = k.shape[2]
    l = tokens_per_view

    if n_k < chunked_min_kv or n_q % chunk_q != 0:
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32)
        logits = logits * scale
        mask = jnp.repeat(jnp.repeat(view_mask, l, axis=0), l, axis=1)
        logits = logits + mask[None, None]
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    kmask = jnp.repeat(view_mask, l, axis=1)          # (vq, n_k)
    n_ch = n_q // chunk_q
    qc = q.reshape(b, h, n_ch, chunk_q, d).transpose(2, 0, 1, 3, 4)
    rows = jnp.arange(n_q, dtype=jnp.int32).reshape(n_ch, chunk_q) // l

    def one_chunk(args):
        qi, rows_i = args
        logits = jnp.einsum("bhqd,bhkd->bhqk", qi, k).astype(jnp.float32)
        logits = logits * scale + kmask[rows_i][None, None]
        probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    out = jax.lax.map(one_chunk, (qc, rows))          # (n_ch, b, h, cq, d)
    return out.transpose(1, 2, 0, 3, 4).reshape(b, h, n_q, d)
