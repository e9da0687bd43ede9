"""Pallas TPU kernel: batched smallest-k selection (values + indices).

XLA lowers `lax.top_k` on TPU to a full stable sort of the row (plus an iota
payload sort) — measured 0.5-0.8 ms for the solver's [2048, 64..256] selection
shapes, which made candidate ranking the single largest line item of the ADMM
step.  The solver only ever needs the k SMALLEST entries for small k
(GJK-slot selection, plane candidate ranking, partner ranking), which an
iterative min-extraction does in k fused VPU reductions with no sort at all.

Layout (as `pallas_gjk.py`): the ROW axis lives on the 128-wide lane
dimension, the reduction axis n on sublanes; each of the k extraction steps is
a sublane reduce + compare + mask over an [n, 128] tile.

Semantics: ties resolve to the lowest index (like `lax.top_k` on negated
inputs); +inf entries sort last; outputs are (vals [..., k], idx [..., k]).
vmap-safe: batch axes flatten into the lane grid (custom_vmap), so vmapped
callers still get ONE kernel dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_N = 1024   # largest reduction axis routed to the kernel ([n,128] VMEM tile)
MAX_K = 64
MAX_CHUNKS = 16  # hierarchical path handles n <= MAX_N * MAX_CHUNKS


def use_pallas_topk(dtype, n: int, k: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and 1 < n <= MAX_N
        and k <= min(n, MAX_K)
    )


def use_pallas_topk_chunked(dtype, n: int, k: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and MAX_N < n <= MAX_N * MAX_CHUNKS
        and k <= MAX_K
    )


def _select_kernel(x_ref, vals_ref, idx_ref, *, k: int, n: int):
    x = x_ref[:]                                         # [n, L]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, LANES), 0)
    for j in range(k):
        m = jnp.min(x, axis=0, keepdims=True)            # [1, L]
        ids = jnp.where(x <= m, row_ids, jnp.int32(n))
        first = jnp.min(ids, axis=0, keepdims=True)      # [1, L]
        vals_ref[j, :] = m[0]
        idx_ref[j, :] = jnp.minimum(first[0], jnp.int32(n - 1))
        x = jnp.where(row_ids == first, jnp.float32(jnp.inf), x)


@functools.partial(jax.jit, static_argnames=("k",))
def _smallest_k_flat(x: jnp.ndarray, k: int):
    """x: [B, n] f32 -> (vals [B, k], idx [B, k])."""
    b, n = x.shape
    bp = -(-b // LANES) * LANES
    xp = jnp.pad(x, ((0, bp - b), (0, 0))) if bp != b else x
    xt = xp.T                                            # [n, Bp]
    grid = bp // LANES
    spec_in = pl.BlockSpec((n, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((k, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    vals_t, idx_t = pl.pallas_call(
        functools.partial(_select_kernel, k=k, n=n),
        grid=(grid,),
        in_specs=[spec_in],
        out_specs=[spec_v, spec_v],
        out_shape=[
            jax.ShapeDtypeStruct((k, bp), jnp.float32),
            jax.ShapeDtypeStruct((k, bp), jnp.int32),
        ],
    )(xt)
    return vals_t.T[:b], idx_t.T[:b]


_ND_CACHE: dict = {}


def _smallest_k_nd(k: int):
    """Per-k wrapped fn (custom_vmap has no static args; k is closed over)."""
    if k not in _ND_CACHE:

        @jax.custom_batching.custom_vmap
        @jax.jit
        def nd(x):
            flat = x.reshape((-1, x.shape[-1]))
            vals, idx = _smallest_k_flat(flat, k)
            out_shape = x.shape[:-1] + (k,)
            return vals.reshape(out_shape), idx.reshape(out_shape)

        @nd.def_vmap
        def _nd_vmap(axis_size, in_batched, x):
            # flatten the vmap axis into the kernel's lane grid
            return nd(x), (True, True)

        _ND_CACHE[k] = nd
    return _ND_CACHE[k]


def _smallest_k_chunked(x: jnp.ndarray, k: int):
    """Hierarchical selection for MAX_N < n <= MAX_N*MAX_CHUNKS: per-chunk
    k-smallest (one kernel dispatch over all chunks), then an exact merge of
    the c*k survivors (a second tiny dispatch).  Exact: the global k smallest
    of a row is a subset of the union of its chunks' k smallest.  Tie
    semantics match `smallest_k` (first occurrence): chunk-major merge order
    is global-index order, and the kernel resolves ties to the lowest
    position at both levels."""
    n = x.shape[-1]
    c = -(-n // MAX_N)
    chunk = -(-n // c)
    pad = c * chunk - n
    if pad:
        x = jnp.concatenate(
            [x, jnp.full(x.shape[:-1] + (pad,), jnp.inf, x.dtype)], axis=-1
        )
    xr = x.reshape(x.shape[:-1] + (c, chunk))
    v, i = _smallest_k_nd(k)(xr)                         # [..., c, k]
    i = i + (jnp.arange(c, dtype=i.dtype) * chunk)[:, None]
    v2, j = _smallest_k_nd(k)(v.reshape(v.shape[:-2] + (c * k,)))
    idx = jnp.take_along_axis(i.reshape(i.shape[:-2] + (c * k,)), j, axis=-1)
    return v2, jnp.minimum(idx, n - 1)                   # clamp padded slots


def smallest_k(x: jnp.ndarray, k: int):
    """k smallest entries along the last axis: (vals [..., k], idx [..., k]).

    Drop-in for ``(lambda neg, i: (-neg, i))(*lax.top_k(-x, k))`` — same
    first-occurrence tie semantics — but one fused Pallas dispatch on TPU
    (two for n > MAX_N, via the exact chunked merge: XLA's `top_k` lowers to
    a FULL row sort on TPU — 2.6 ms/iter at the 64-robot bench's [2048,4000]
    CCD shape, the single largest op of round 4's fused-step profile).
    Falls back to `lax.top_k` off-TPU / for unsupported shapes or dtypes.
    """
    n = x.shape[-1]
    if use_pallas_topk(x.dtype, n, k):
        return _smallest_k_nd(k)(x)
    if use_pallas_topk_chunked(x.dtype, n, k):
        return _smallest_k_chunked(x, k)
    neg, idx = jax.lax.top_k(-x, k)
    return -neg, idx
