"""Pallas DP kernel must reproduce the XLA reference scores exactly."""
import jax.numpy as jnp
import numpy as np
import pytest

from kir_graph_tpu.align.dp import AlignParams, bandedScore
from kir_graph_tpu.ops.dp_pallas import bandedScorePallas, pallasAvailable


@pytest.mark.skipif(not pallasAvailable(), reason="pallas unavailable")
def test_pallas_matches_xla_scores():
    p = AlignParams()
    rng = np.random.default_rng(3)
    J = 200  # forces padding to 256
    W, RL = p.window, p.read_len

    wbase = rng.integers(0, 4, (J, W)).astype(np.int8)
    walt = rng.integers(0, 16, (J, W)).astype(np.uint8)
    wdel = np.where(rng.random((J, W)) < 0.1, p.del_eps, p.del_cost).astype(
        np.float32
    )
    # reads partially copied from the window (so costs vary meaningfully)
    reads = rng.integers(0, 4, (J, RL)).astype(np.int8)
    for j in range(J):
        off = rng.integers(0, 40)
        L = 150
        reads[j, :L] = wbase[j, off : off + L]
        errs = rng.integers(0, L, size=3)
        reads[j, errs] = (reads[j, errs] + 1) % 4
    read_len = np.full(J, 150, np.int32)

    c_ref, o_ref, l_ref = bandedScore(
        jnp.asarray(wbase), jnp.asarray(walt), jnp.asarray(wdel),
        jnp.asarray(reads), jnp.asarray(read_len), p,
    )
    c_pal, o_pal, l_pal = bandedScorePallas(
        jnp.asarray(wbase), jnp.asarray(walt), jnp.asarray(wdel),
        jnp.asarray(reads), jnp.asarray(read_len), p,
        interpret=True,  # CPU tests run the interpreter; TPU compiles
    )
    np.testing.assert_allclose(np.asarray(c_pal), np.asarray(c_ref), atol=1e-4)
    # end offsets (and the diagonal cost at them) agree wherever the best
    # cost is unique
    same_end = np.asarray(o_pal) == np.asarray(o_ref)
    assert same_end.mean() > 0.95
    np.testing.assert_allclose(
        np.asarray(l_pal)[same_end], np.asarray(l_ref)[same_end], atol=1e-4
    )
    # the easy/gapless decision derived from (cost, lin) must agree even
    # where ties pick different ends
    easy_ref = np.asarray(l_ref) <= np.asarray(c_ref) + 1e-4
    easy_pal = np.asarray(l_pal) <= np.asarray(c_pal) + 1e-4
    assert (easy_ref == easy_pal)[same_end].all()


@pytest.mark.skipif(not pallasAvailable(), reason="pallas unavailable")
def test_pallas_want_lin_false_same_cost_end():
    """The want_lin=False kernel variant (cohort path) must produce the
    same costs/ends as the full variant."""
    from kir_graph_tpu.ops.dp_pallas import bandedScorePallasBytes, packWindowBytes

    p = AlignParams()
    rng = np.random.default_rng(11)
    J, W, RL = 130, p.window, p.read_len
    wbase = rng.integers(0, 4, (J, W)).astype(np.int8)
    walt = rng.integers(0, 16, (J, W)).astype(np.uint8)
    is_del = rng.random((J, W)) < 0.1
    reads = rng.integers(0, 5, (J, RL)).astype(np.int8)
    read_len = np.full(J, 150, np.int32)
    wbytes = packWindowBytes(
        jnp.asarray(wbase), jnp.asarray(walt), jnp.asarray(is_del)
    )
    c1, e1, l1 = bandedScorePallasBytes(
        wbytes, jnp.asarray(reads), jnp.asarray(read_len), p, interpret=True
    )
    c0, e0, l0 = bandedScorePallasBytes(
        wbytes, jnp.asarray(reads), jnp.asarray(read_len), p,
        interpret=True, want_lin=False,
    )
    assert l0 is None and l1 is not None
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
