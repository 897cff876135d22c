"""Batched Smith-Waterman (affine gaps, score-only) as a Pallas TPU kernel.

Replaces reference ksw.c's SSE2 striping with the layout the TPU VPU wants:
the TARGET axis lives across vector lanes (one [1, TMAX] register row per DP
row) and the query walks sequentially, so each DP row is a handful of
elementwise ops plus one prefix-max (the exact lazy-F closed form used by
algos/ksw.sw_score — a gap opened from a cell that itself came from a
horizontal gap is dominated by extending the original gap, so F is a single
left-to-right prefix max). One grid program per alignment pair; thousands of
pairs run as independent programs with no host round-trips.

Scores match algos.ksw.sw_score (and through it reference bubble.c:230-233)
exactly; parity is tested in tests/test_sw_pallas.py. On CPU hosts the
kernel runs in Pallas interpret mode, so the same code path is exercised
everywhere.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fermi_tpu import jaxcfg  # noqa: F401  (x64 + platform config)

try:  # pallas import is cheap; guard only for exotic builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

NEG = -(10 ** 6)


def _shift_right(v, k, fill):
    """[1, T] -> [1, T] shifted right by static k, left-filled with fill.
    pltpu.roll is the lane-shift Mosaic supports natively (slice+concat and
    jnp.roll both fail to lower); the wrapped tail is masked with fill."""
    if pltpu is not None:
        rolled = pltpu.roll(v, shift=jnp.int32(k), axis=1)
    else:  # pragma: no cover
        rolled = jnp.roll(v, k, axis=-1)
    col = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.where(col >= k, rolled, jnp.asarray(fill, v.dtype))


def _cummax_row(v):
    """Prefix max along the last axis of a [1, T] row, log-shift form
    (T static power-of-two-ish; works for any static T)."""
    T = v.shape[-1]
    k = 1
    while k < T:
        v = jnp.maximum(v, _shift_right(v, k, NEG))
        k <<= 1
    return v


def _sw_kernel(match, mismatch, gapo, gape, qmax,
               q_ref, t_ref, qlen_ref, tlen_ref, out_ref):
    go_e = gapo + gape
    t_row = t_ref[0]                              # [1, TM] int32
    TM = t_row.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, TM), 1)
    # note the order: the vector jj must be built BEFORE the SMEM scalar
    # loads — with the loads first, Mosaic's layout inference fails to
    # legalize func.return (empirically bisected; same jaxpr modulo order)
    jj = (gape * col).astype(jnp.int32)
    qlen = qlen_ref[0, 0, 0]
    tlen = tlen_ref[0, 0, 0]
    valid_t = col < tlen

    def body(i, A):
        # A stacks (H, E, best) as one (3, TM) carry — with three separate
        # row carries plus the dynamic SMEM query read, Mosaic's layout
        # inference demands an impossible concrete->replicated relayout
        H, E, best = A[0:1], A[1:2], A[2:3]
        qc = q_ref[0, 0, i]
        active = i < qlen
        s = jnp.where(t_row == qc, jnp.int32(match), jnp.int32(mismatch))
        E2 = jnp.maximum(E - gape, H - go_e)
        Hm1 = _shift_right(H, 1, 0)
        H_pre = jnp.maximum(jnp.maximum(Hm1 + s, E2), 0)
        M = _cummax_row(H_pre + jj)
        F = _shift_right(M, 1, NEG) - gapo - jj
        H_new = jnp.maximum(jnp.maximum(H_pre, F), 0)
        masked = jnp.where(valid_t & active, H_new, jnp.int32(0))
        H = jnp.where(active, H_new, H)
        E = jnp.where(active, E2, E)
        best = jnp.maximum(best, masked)   # [1, TM]; reduced once at the end
        return jnp.concatenate([H, E, best], axis=0)

    # carry init derives from t_row (not constants): Mosaic gives constant
    # vectors a replicated layout the loop body's concrete vectors cannot
    # relayout back to. int32 loop bounds: with jax_enable_x64 python-int
    # bounds make the induction variable int64, which Mosaic cannot lower.
    # best is carried as a full row — scalar stores to VMEM are rejected,
    # so it reduces once into SMEM at the end.
    # three distinct zero-row expressions on purpose: concatenating the
    # SAME traced value twice makes Mosaic fail to legalize func.return
    A0 = jnp.concatenate([t_row * 0, t_row * 0 + NEG, t_row * 0], axis=0)
    A = jax.lax.fori_loop(jnp.int32(0), jnp.int32(qmax), body, A0)
    out_ref[0, 0, 0] = jnp.max(A[2:3])


def _pad_to(x, size, fill):
    # int32 on purpose: Mosaic's vector int8->int32 conversion is a trap
    out = np.full((len(x), size), fill, np.int32)
    for i, s in enumerate(x):
        out[i, : len(s)] = s
    return out


@partial(jax.jit, static_argnames=("match", "mismatch", "gapo", "gape",
                                   "qmax", "tmax", "interpret"))
def _sw_call(q, t, qlen, tlen, match, mismatch, gapo, gape, qmax, tmax,
             interpret):
    kernel = partial(_sw_kernel, match, mismatch, gapo, gape, qmax)
    B = q.shape[0]
    # arrays are [B, 1, L] so each program's block (1, 1, L) matches the
    # trailing array dims exactly (TPU lowering's block-shape rule)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            # query + lengths in SMEM: the kernel reads them at dynamic
            # scalar offsets, which VMEM lanes don't allow
            pl.BlockSpec((1, 1, qmax), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, tmax), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, 1), jnp.int32),
        interpret=interpret,
    )(q[:, None, :], t[:, None, :], qlen[:, :, None], tlen[:, :, None])


def sw_score_batch(queries, targets, match=5, mismatch=-4, gapo=5, gape=2):
    """Local-alignment scores for pairs (queries[i], targets[i]) of nt4
    sequences. Returns int32 [B]. Matches algos.ksw.sw_score per pair."""
    assert len(queries) == len(targets)
    if not queries:
        return np.zeros(0, np.int32)
    if pl is None:  # pragma: no cover - fallback for pallas-less builds
        from fermi_tpu.algos.ksw import sw_score
        return np.array([sw_score(q, t, match, mismatch, gapo, gape)
                         for q, t in zip(queries, targets)], np.int32)
    qmax = max(1, max(len(q) for q in queries))
    tmax = max(1, max(len(t) for t in targets))
    tmax = (tmax + 127) // 128 * 128  # lane-align the vectorized axis
    q = _pad_to(queries, max(qmax, 1), -1)
    t = _pad_to(targets, tmax, -2)    # distinct pads: padding never matches
    qlen = np.array([[len(s)] for s in queries], np.int32)
    tlen = np.array([[len(s)] for s in targets], np.int32)
    interpret = jax.default_backend() != "tpu"
    # x64 must be OFF around the pallas_call: with jax_enable_x64 even a
    # trivial kernel fails Mosaic legalization (int64 grid/index machinery).
    # The kernel itself is pure int32.
    with jax.enable_x64(False):
        out = _sw_call(jnp.asarray(q), jnp.asarray(t), jnp.asarray(qlen),
                       jnp.asarray(tlen), match, mismatch, gapo, gape,
                       qmax, tmax, interpret)
    return np.asarray(out)[:, 0, 0]
