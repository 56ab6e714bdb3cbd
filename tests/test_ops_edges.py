"""Edge-case tests for the kernel building blocks."""

import numpy as np

import jax.numpy as jnp

from nextsearch_tpu.ops.bm25 import (
    canonical_sort,
    exact_rescore,
    expand_chunks,
    heavy_scores,
)


def test_expand_chunks_empty_plan():
    starts = jnp.zeros((2, 4), jnp.int32)
    dfs = jnp.zeros((2, 4), jnp.int32)
    w = jnp.zeros((2, 4), jnp.float32)
    cs, cl, cq, cw = expand_chunks(starts, dfs, w, C=16, block=8)
    assert np.all(np.asarray(cl) == 0)
    assert np.all(np.asarray(cq) == 2)  # all dropped


def test_expand_chunks_exact_boundaries():
    # df exactly equal to block, one more, one less
    starts = jnp.asarray([[0, 100, 200, 0]], jnp.int32)
    dfs = jnp.asarray([[8, 9, 7, 0]], jnp.int32)
    w = jnp.asarray([[1.0, 1.0, 1.0, 0.0]], jnp.float32)
    cs, cl, cq, cw = expand_chunks(starts, dfs, w, C=8, block=8)
    cs, cl, cq = np.asarray(cs), np.asarray(cl), np.asarray(cq)
    live = cl > 0
    # 1 + 2 + 1 = 4 chunks
    assert live.sum() == 4
    assert sorted(cl[live].tolist()) == [1, 7, 8, 8]
    assert np.all(cq[live] == 0)


def test_canonical_sort_all_dead():
    scores = jnp.zeros((2, 5), jnp.float32)
    docs = jnp.arange(10, dtype=jnp.int32).reshape(2, 5)
    v, d = canonical_sort(scores, docs)
    assert np.all(np.asarray(v) == 0)
    assert np.all(np.asarray(d) == 2**30)


def test_exact_rescore_candidate_not_in_postings():
    post_doc = jnp.asarray([2, 5, 9], jnp.int32)
    post_score = jnp.asarray([1.0, 2.0, 3.0], jnp.float32)
    starts = jnp.asarray([[0]], jnp.int32)
    dfs = jnp.asarray([[3]], jnp.int32)
    w = jnp.asarray([[1.0]], jnp.float32)
    cand = jnp.asarray([[5, 4, 9, 11]], jnp.int32)
    out = np.asarray(
        exact_rescore(post_doc, post_score, starts, dfs, w, cand, bs_steps=8)
    )
    assert out.tolist() == [[2.0, 0.0, 3.0, 0.0]]


def test_heavy_scores_zero_padding_row():
    dense = jnp.asarray(
        [[1.0, 0.0, 2.0], [0.5, 0.5, 0.0], [0.0, 0.0, 0.0]], jnp.float32
    )  # row 2 = padding
    uh = jnp.asarray([0, 2], jnp.int32)
    mix = jnp.asarray([[2.0, 99.0]], jnp.float32)  # 99 hits only the zero row
    out = np.asarray(heavy_scores(dense, uh, mix))
    assert out.tolist() == [[2.0, 0.0, 4.0]]
