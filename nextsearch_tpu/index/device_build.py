"""On-device index finalization: dense rows + bucket tables from postings.

The hybrid posting representation needs three derived structures per corpus:
the heavy dense score rows (bf16 [ND+1pad, n_slots]), the heavy bucket-
position table (int32 [ND+1pad, NBh+1]) and the light bucket-position table
(int32 [NL+1, NBl+1]). Building them host-side at 1M-doc scale materializes
a 12GB f32 matrix and ships ~6.6GB through the host->device link — ~45 min
through the tunneled TPU this repo benches on. All three are pure functions
of the (already device-resident) posting arrays plus a few KB of per-row
(start, df) metadata, so this module computes them on device instead:
expand per-row posting ranges with a searchsorted-over-cumsum (the same
trick ops/bm25.expand_chunks uses), then one scatter for the dense rows and
one scatter-add + cumsum per bucket table. ~30M scatter updates ≈ seconds;
the upload shrinks to the posting arrays the index needs anyway.

Returns match the host path bit-for-bit: dense values are the f32 eager
scores cast to bf16 (round-to-nearest-even both sides), bucket positions
are prefix sums of bucket occupancy counts = np.searchsorted of the bucket
bounds. A regression test asserts equality against the host builder.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.bm25_sparse import BUCKET_LOG2, LIGHT_BUCKET_LOG2


def _expand_rows(row_starts, row_dfs, total_pad):
    """Per-posting (row id, global posting index, valid) for concatenated
    per-row ranges [start_r, start_r + df_r), padded to total_pad."""
    cum = jnp.cumsum(row_dfs)
    total = cum[-1] if row_dfs.shape[0] else jnp.int32(0)
    iota = lax.broadcasted_iota(jnp.int32, (total_pad,), 0)
    row = jnp.searchsorted(cum, iota, side="right").astype(jnp.int32)
    rown = jnp.clip(row, 0, max(row_dfs.shape[0] - 1, 0))
    within = iota - (cum[rown] - row_dfs[rown])
    pos = row_starts[rown] + within
    valid = iota < total
    return rown, pos, valid


@functools.partial(
    jax.jit,
    static_argnames=("n_rows_pad", "n_slots", "total_pad", "bucket_log2",
                     "out_dtype"),
)
def _build_rows_and_buckets(
    post_doc,
    post_score,
    row_starts,  # int32 [R]
    row_dfs,  # int32 [R]
    *,
    n_rows_pad: int,
    n_slots: int,
    total_pad: int,
    bucket_log2: int,
    out_dtype,
):
    """(dense bf16 [n_rows_pad, n_slots] | None, bucket_pos int32
    [n_rows_pad, NB+1], max bucket occupancy int32)."""
    nb = (n_slots + (1 << bucket_log2) - 1) >> bucket_log2
    P = post_doc.shape[0]
    row, pos, valid = _expand_rows(row_starts, row_dfs, total_pad)
    pos = jnp.clip(pos, 0, max(P - 1, 0))
    doc = post_doc[pos]
    safe_doc = jnp.clip(doc, 0, n_slots - 1)
    srow = jnp.where(valid, row, n_rows_pad - 1)  # padding -> sacrificial row
    sdoc = jnp.where(valid, safe_doc, n_slots - 1)

    cnt = jnp.zeros((n_rows_pad, nb), jnp.int32)
    cnt = cnt.at[srow, sdoc >> bucket_log2].add(
        jnp.where(valid, 1, 0).astype(jnp.int32)
    )
    bucket_pos = jnp.concatenate(
        [jnp.zeros((n_rows_pad, 1), jnp.int32), jnp.cumsum(cnt, axis=1)],
        axis=1,
    )
    # The sacrificial row absorbed the padding writes; keep it all-zero
    # (the kernels' sentinel row) and out of the occupancy maximum.
    bucket_pos = bucket_pos.at[n_rows_pad - 1, :].set(0)
    max_occ = jnp.max(cnt[: n_rows_pad - 1]) if n_rows_pad > 1 else jnp.int32(0)

    dense = None
    if out_dtype is not None:
        score = jnp.where(valid, post_score[pos], jnp.float32(0.0))
        dense = jnp.zeros((n_rows_pad, n_slots), out_dtype)
        dense = dense.at[srow, sdoc].set(score.astype(out_dtype))
        # Padding writes landed on the sacrificial last row; real rows are
        # < R <= n_rows_pad - 1 (caller guarantees one spare row, the
        # all-zero sentinel the kernels rely on).
        dense = dense.at[n_rows_pad - 1, :].set(jnp.asarray(0, out_dtype))
    return dense, bucket_pos, max_occ


def _round_pad(n: int, m: int = 1 << 20) -> int:
    return max(((n + m - 1) // m) * m, m)


def build_heavy_on_device(post_doc, post_score, starts, dfs, *, n_rows_pad,
                          n_slots, bf16: bool):
    """Dense rows + heavy bucket table on device.

    starts/dfs: host int32 arrays, one entry per dense row (row id order).
    n_rows_pad must leave the final row unused (zero sentinel row).
    """
    nb = (n_slots + (1 << BUCKET_LOG2) - 1) >> BUCKET_LOG2
    if dfs.size == 0:
        dt = jnp.bfloat16 if bf16 else jnp.float32
        return (
            jnp.zeros((n_rows_pad, n_slots), dt),
            jnp.zeros((n_rows_pad, nb + 1), jnp.int32),
            0,
        )
    total = int(dfs.sum())
    dense, bucket_pos, occ = _build_rows_and_buckets(
        post_doc,
        post_score,
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(dfs, jnp.int32),
        n_rows_pad=n_rows_pad,
        n_slots=n_slots,
        total_pad=_round_pad(total),
        bucket_log2=BUCKET_LOG2,
        out_dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    return dense, bucket_pos, int(occ)


def build_light_on_device(post_doc, starts, dfs, *, n_rows_pad, n_slots):
    """Light bucket-position table on device (no dense materialization)."""
    nb = (n_slots + (1 << LIGHT_BUCKET_LOG2) - 1) >> LIGHT_BUCKET_LOG2
    if dfs.size == 0:
        return jnp.zeros((n_rows_pad, nb + 1), jnp.int32), 0
    total = int(dfs.sum())
    _dense, bucket_pos, occ = _build_rows_and_buckets(
        post_doc,
        post_doc,  # unused (out_dtype None) but must match signature
        jnp.asarray(starts, jnp.int32),
        jnp.asarray(dfs, jnp.int32),
        n_rows_pad=n_rows_pad,
        n_slots=n_slots,
        total_pad=_round_pad(total),
        bucket_log2=LIGHT_BUCKET_LOG2,
        out_dtype=None,
    )
    return bucket_pos, int(occ)
