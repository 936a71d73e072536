"""Native C++ annotate core vs the numpy oracle: bit-identical outputs
on realistic batches (novel SNVs, catalogued deletions, N bases, error
correction, exon-only)."""
import os

import numpy as np
import pytest

from kir_graph_tpu.align import GraphAligner, encodeReads
from kir_graph_tpu.align.annotate import VariantAnnotator
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


@pytest.fixture(scope="module")
def batch(synth_genes, synth_index):
    seqs = {}
    for gname in synth_index.gene_names:
        g = synth_index.genes[gname]
        msa = synth_genes[gname.split("*")[0]]
        for ai in (0, 3):
            seqs[g.alleles[ai]] = alleleUngappedSeq(msa, g.alleles[ai])
    sim = simulatePairedReads(seqs, depth=6, seed=17, error_rate=0.01)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    aligner = GraphAligner(synth_index)
    return aligner.alignPairs(c1, l1, c2, l2)


def _assertSame(a, b):
    ev_a, depth_a, pile_a = a
    ev_b, depth_b, pile_b = b
    np.testing.assert_array_equal(depth_a, depth_b)
    np.testing.assert_array_equal(pile_a, pile_b)
    np.testing.assert_array_equal(ev_a.nm, ev_b.nm)
    np.testing.assert_array_equal(ev_a.pass_mask, ev_b.pass_mask)
    np.testing.assert_array_equal(ev_a.pos_indptr, ev_b.pos_indptr)
    np.testing.assert_array_equal(ev_a.pos_idx, ev_b.pos_idx)
    np.testing.assert_array_equal(ev_a.neg_indptr, ev_b.neg_indptr)
    np.testing.assert_array_equal(ev_a.neg_idx, ev_b.neg_idx)
    assert list(ev_a.ids) == list(ev_b.ids)
    assert len(ev_a.novel_variants) == len(ev_b.novel_variants)
    for va, vb in zip(ev_a.novel_variants, ev_b.novel_variants):
        assert (va.pos, va.typ, va.ref, va.val, va.id) == (
            vb.pos, vb.typ, vb.ref, vb.val, vb.id
        )


@pytest.mark.parametrize(
    "exon_only,error_correction",
    [(False, False), (True, False), (False, True), (True, True)],
)
def test_native_matches_oracle(batch, synth_index, exon_only,
                               error_correction):
    ann = VariantAnnotator(synth_index)
    if ann._nativeTables() is None:
        pytest.skip("native lib not built")
    got = ann.annotateArraysNative(
        batch, exon_only=exon_only, error_correction=error_correction
    )
    want = ann.annotateArrays(
        batch, exon_only=exon_only, error_correction=error_correction
    )
    _assertSame(got, want)


def test_annotate_dispatches_native(batch, synth_index, monkeypatch):
    ann = VariantAnnotator(synth_index)
    if ann._nativeTables() is None:
        pytest.skip("native lib not built")
    reads_n, depth_n, _, pass_n = ann.annotate(batch)
    monkeypatch.setenv("KGT_NO_NATIVE", "1")
    reads_o, depth_o, _, pass_o = ann.annotate(batch)
    np.testing.assert_array_equal(depth_n, depth_o)
    np.testing.assert_array_equal(pass_n, pass_o)
    assert len(reads_n["reads"]) == len(reads_o["reads"])
    for rn, ro in zip(reads_n["reads"], reads_o["reads"]):
        assert (rn.lpv, rn.lnv, rn.rpv, rn.rnv) == (
            ro.lpv, ro.lnv, ro.rpv, ro.rnv
        )


def test_native_small_caps_regrow(batch, synth_index):
    """Arena overflow path: tiny initial caps must regrow and still match."""
    ann = VariantAnnotator(synth_index)
    nt = ann._nativeTables()
    if nt is None:
        pytest.skip("native lib not built")
    nt["pos_cap"], nt["neg_cap"], nt["novel_cap"] = 8, 8, 2
    nt["bufs"].clear()
    got = ann.annotateArraysNative(batch)
    want = ann.annotateArrays(batch)
    _assertSame(got, want)


@pytest.mark.parametrize("error_correction", [False, True])
def test_native_threaded_matches_oracle(batch, synth_index, monkeypatch,
                                        error_correction):
    """Force the threaded row-split path (KGT_MIN_ROWS=2) on the small
    fixture and require bit-identical output, including across thread
    counts (row splits must not affect CSR order) and with the
    per-thread error-correction pileup histograms."""
    ann = VariantAnnotator(synth_index)
    if ann._nativeTables() is None:
        pytest.skip("native lib not built")
    want = ann.annotateArrays(batch, error_correction=error_correction)
    monkeypatch.setenv("KGT_MIN_ROWS", "2")
    for threads in ("3", "8"):
        monkeypatch.setenv("KGT_THREADS", threads)
        _assertSame(
            ann.annotateArraysNative(
                batch, error_correction=error_correction
            ),
            want,
        )


def test_native_finalize_cols_matches_numpy(synth_genes, synth_index,
                                            monkeypatch):
    """alignPairs' traceback-column finalize: the threaded native path
    (kgt_finalize_cols) must produce bit-identical AlignResult arrays to
    the numpy fallback."""
    from kir_graph_tpu import native_io

    if not native_io.nativeAvailable():
        pytest.skip("native lib not built")
    seqs = {}
    for gname in synth_index.gene_names:
        g = synth_index.genes[gname]
        msa = synth_genes[gname.split("*")[0]]
        for ai in (1, 2):
            seqs[g.alleles[ai]] = alleleUngappedSeq(msa, g.alleles[ai])
    sim = simulatePairedReads(seqs, depth=4, seed=23, error_rate=0.02)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    aligner = GraphAligner(synth_index)
    monkeypatch.setenv("KGT_MIN_ROWS", "2")
    monkeypatch.setenv("KGT_THREADS", "3")
    got = aligner.alignPairs(c1, l1, c2, l2)
    # results are views of the aligner's persistent scratch: copy before
    # the second call overwrites them
    fields = list(type(got).__dataclass_fields__)
    keep = {k: getattr(got, k).copy() for k in fields}
    monkeypatch.setenv("KGT_NO_NATIVE", "1")
    want = aligner.alignPairs(c1, l1, c2, l2)
    assert keep["gene"].sum() and (keep["cols_l"] >= 0).any()
    for k in fields:
        np.testing.assert_array_equal(keep[k], getattr(want, k), err_msg=k)


def test_orient_rows_native_matches_numpy(monkeypatch):
    """kgt_orient_rows == copy + revCompCodes on the rc rows, including
    N bases, mixed lengths and tail padding."""
    import numpy as np

    from kir_graph_tpu.align.encode import revCompCodes
    from kir_graph_tpu.native_io import orientRowsNative

    monkeypatch.setenv("KGT_MIN_ROWS", "1")  # force the threaded path
    rng = np.random.default_rng(5)
    n, L = 257, 24
    codes = np.full((n, L), 4, np.int8)
    lens = rng.integers(8, L + 1, n).astype(np.int32)
    for r in range(n):
        codes[r, : lens[r]] = rng.integers(0, 5, lens[r])  # incl. N (4)
    flags = (rng.random(n) < 0.5).astype(np.uint8)
    out = np.empty_like(codes)
    assert orientRowsNative(codes, lens, flags, out)

    want = codes.copy()
    m = flags.astype(bool)
    want[m] = revCompCodes(codes[m], lens[m])
    np.testing.assert_array_equal(out, want)


def test_pack2bit_native_matches_numpy():
    """kgt_pack_reads2 == numpy pack + N-scan (buffer bytes and the
    exception SET — thread append order is unspecified)."""
    from kir_graph_tpu.align.encode import packCodes2bit
    from kir_graph_tpu.native_io import packUpload2bitNative

    rng = np.random.default_rng(9)
    n, L = 257, 160
    c1 = rng.integers(0, 5, (n, L)).astype(np.int8)
    c2 = rng.integers(0, 5, (n, L)).astype(np.int8)
    l1 = rng.integers(40, L + 1, n).astype(np.int32)
    l2 = rng.integers(40, L + 1, n).astype(np.int32)
    Wb = L // 4
    buf = np.zeros((2 * n, Wb + 2), np.uint8)
    exc = np.full(2 * n * L, -1, np.int32)
    total = packUpload2bitNative(c1, c2, l1, l2, buf, exc)
    if total < 0:
        pytest.skip("native lib unavailable")

    ref = np.zeros_like(buf)
    ref[:n, :Wb] = packCodes2bit(c1)
    ref[n:, :Wb] = packCodes2bit(c2)
    lens = np.concatenate([l1, l2])
    ref[:, -2] = (lens & 0xFF).astype(np.uint8)
    ref[:, -1] = (lens >> 8).astype(np.uint8)
    np.testing.assert_array_equal(buf, ref)

    want = set()
    for half, (cc, ll) in enumerate(((c1, l1), (c2, l2))):
        rows, cols = np.nonzero(cc == 4)
        keep = cols < ll[rows]
        want |= set(
            ((rows[keep] + half * n).astype(np.int64) * L + cols[keep])
            .tolist()
        )
    assert total == len(want)
    assert set(exc[exc >= 0].tolist()) == want
