"""Device (TPU) multi-string BWT construction by prefix doubling.

Same algorithm as construct.suffix (position-ranked sentinels, Manber–Myers
doubling) expressed as jitted jax: each round one lax.sort over the whole
text — the construction is a handful of large device sorts, which is exactly
what scales on TPU (vs. the reference's pointer-heavy BCR, bcr.c). Converges
after ceil(log2(max_read_len+2)) rounds; the loop exits early once all ranks
are distinct.

Keys stay int32 whenever the text fits (n < 2^31): the TPU emulates int64
arithmetic, so the (rank, next-rank) pair is sorted lexicographically with
lax.sort(num_keys=2) instead of being packed into one 64-bit key.
"""

from functools import partial

import numpy as np

from fermi_tpu import jaxcfg  # noqa: F401

import jax
import jax.numpy as jnp


def _tiled_cumsum(x, tile=1 << 13):
    """Inclusive cumsum that tiles the scan (XLA's reduce-window cumsum blows
    scoped VMEM for multi-million-element arrays on TPU)."""
    n = x.shape[0]
    pad = (-n) % tile
    xp = jnp.pad(x, (0, pad)).reshape(-1, tile)
    rows = jnp.cumsum(xp, axis=1)
    tails = rows[:, -1]
    offs = jnp.cumsum(tails) - tails
    return (rows + offs[:, None]).reshape(-1)[:n]


@partial(jax.jit, static_argnames=("max_iters", "dt"))
def _suffix_ranks(text: jnp.ndarray, max_iters: int, dt):
    n = text.shape[0]
    is_sent = text == 0
    n_sent = jnp.sum(is_sent).astype(dt)
    sent_ord = _tiled_cumsum(is_sent.astype(dt)) - 1
    rank = jnp.where(is_sent, sent_ord, n_sent - 1 + text.astype(dt))
    idx = jnp.arange(n, dtype=dt)

    def distinct(rank):
        return jnp.max(rank) == n - 1

    def cond(carry):
        i, rank = carry
        return (i < max_iters) & ~distinct(rank)

    def body(carry):
        i, rank = carry
        h = dt(1) << i
        key2 = jnp.where(idx + h < n, jnp.roll(rank, -h), dt(-1))
        # lexicographic (rank, key2) sort; iota rides along as the order
        r1, r2, order = jax.lax.sort((rank, key2, idx), num_keys=2)
        changed = jnp.concatenate(
            [jnp.zeros(1, dt),
             ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(dt)])
        new_sorted = _tiled_cumsum(changed)
        rank = jnp.zeros_like(rank).at[order].set(new_sorted)
        return i + 1, rank

    _, rank = jax.lax.while_loop(cond, body, (dt(0), rank))
    return rank


def multistring_bwt_device(text: np.ndarray) -> np.ndarray:
    """BWT of a 0-terminated multi-sentinel text, computed on device."""
    text = np.asarray(text, dtype=np.uint8)
    n = text.size
    if n == 0:
        return np.zeros(0, np.uint8)
    # jnp.roll with traced shift needs the shift < n; rounds needed =
    # ceil(log2(longest suffix comparison)) <= ceil(log2(n))
    max_iters = max(1, int(np.ceil(np.log2(n))))
    dt = jnp.int32 if n < 2 ** 31 - 8 else jnp.int64
    rank = _suffix_ranks(jnp.asarray(text.astype(np.int32)), max_iters, dt)
    rank = np.asarray(rank)
    sa = np.empty(n, np.int64)
    sa[rank] = np.arange(n)
    return np.where(sa > 0, text[sa - 1], 0).astype(np.uint8)
