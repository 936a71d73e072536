import numpy as np
import pytest

from kir_graph_tpu.align import (
    AlignParams,
    GraphAligner,
    VariantAnnotator,
    encodeReads,
)
from kir_graph_tpu.align.pipeline import AlignResult
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq


@pytest.fixture(scope="module")
def aligner(synth_index):
    return GraphAligner(synth_index)


def simulateSample(synth_genes, synth_index, allele_specs, depth=10, seed=0, error_rate=0.0):
    """allele_specs: list of (gene_key, allele_idx). Returns encoded mates + truth."""
    seqs = {}
    copies = {}
    for gene_key, ai in allele_specs:
        msa = synth_genes[gene_key]
        g = synth_index.genes[f"{gene_key}*BACKBONE"]
        allele = g.alleles[ai]
        seqs[allele] = alleleUngappedSeq(msa, allele)
        copies[allele] = copies.get(allele, 0) + 1
    sim = simulatePairedReads(
        seqs, depth=depth, seed=seed, error_rate=error_rate, allele_copies=copies
    )
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    return sim, c1, l1, c2, l2


def test_perfect_reads_map_to_right_gene(synth_genes, synth_index, aligner):
    gene_key = list(synth_genes)[0]
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(gene_key, 0)], depth=4, seed=1
    )
    res = aligner.alignPairs(c1, l1, c2, l2)
    gi = synth_index.gene_names.index(f"{gene_key}*BACKBONE")
    assert (res.gene >= 0).mean() > 0.95
    mapped = res.gene >= 0
    assert (res.gene[mapped] == gi).mean() > 0.95
    # error-free reads from a catalogued allele align at ~zero cost
    assert np.median(res.cost[mapped]) < 0.5


def test_annotation_recovers_allele_variants(synth_genes, synth_index, aligner):
    gene_key = list(synth_genes)[1]
    g = synth_index.genes[f"{gene_key}*BACKBONE"]
    ai = 0
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(gene_key, ai)], depth=8, seed=2
    )
    res = aligner.alignPairs(c1, l1, c2, l2)
    ann = VariantAnnotator(synth_index)
    reads_data, depth, pileup, passed = ann.annotate(res)
    assert passed.sum() > 0.9 * len(c1)

    # positives observed across reads == variants of the source allele
    expected = {
        str(v.id)
        for i, v in enumerate(g.variants)
        if g.membership[i, g.alleles.index(g.alleles[ai])]
    }
    observed = set()
    for r in reads_data["reads"]:
        observed.update(r.lpv)
        observed.update(r.rpv)
    # every expected variant with coverage should be seen; no novel junk
    nv = {v for v in observed if v.startswith("nv")}
    assert not nv
    assert expected <= observed


def test_depth_matches_simulated_coverage(synth_genes, synth_index, aligner):
    gene_key = list(synth_genes)[0]
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(gene_key, 2)], depth=10, seed=3
    )
    res = aligner.alignPairs(c1, l1, c2, l2)
    ann = VariantAnnotator(synth_index)
    _, depth, _, _ = ann.annotate(res)
    gi = synth_index.gene_names.index(f"{gene_key}*BACKBONE")
    L = synth_index.genes[f"{gene_key}*BACKBONE"].length
    mid = depth[gi, L // 4 : 3 * L // 4]
    assert 6 <= np.median(mid) <= 14  # ~10x target
    # other genes see (almost) nothing unique-mapped
    other = depth[[i for i in range(len(synth_index.gene_names)) if i != gi]]
    assert other.sum() < depth[gi].sum() * 0.05


def test_reads_with_errors_still_map(synth_genes, synth_index, aligner):
    gene_key = list(synth_genes)[2]
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(gene_key, 1)], depth=5, seed=4, error_rate=0.005
    )
    res = aligner.alignPairs(c1, l1, c2, l2)
    ann = VariantAnnotator(synth_index)
    reads_data, _, _, passed = ann.annotate(res)
    assert passed.mean() > 0.85
    # sequencing errors become either novel SNVs or nothing, never positives
    # of the wrong catalogued allele family en masse
    nv_count = sum(
        1 for r in reads_data["reads"] for v in r.lpv + r.rpv if v.startswith("nv")
    )
    assert nv_count > 0  # errors produced some novel SNVs


def test_end_to_end_typing_cn2(synth_genes, synth_index, aligner):
    from kir_graph_tpu.typing import TypingWithPosNegAllele

    gene_key = list(synth_genes)[0]
    g = synth_index.genes[f"{gene_key}*BACKBONE"]
    a1, a2 = 0, 5
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes,
        synth_index,
        [(gene_key, a1), (gene_key, a2)],
        depth=15,
        seed=5,
        error_rate=0.002,
    )
    res = aligner.alignPairs(c1, l1, c2, l2)
    ann = VariantAnnotator(synth_index)
    reads_data, _, _, _ = ann.annotate(res)
    t = TypingWithPosNegAllele(reads_data=reads_data, top_n=100, variant_correction=True)
    alleles, _ = t.typing({g.name: 2})
    assert sorted(alleles) == sorted([g.alleles[a1], g.alleles[a2]])


def test_canonical_seeding_orientation(synth_genes, synth_index):
    """A read that IS a reference segment seeds with orient 0 at the
    right diagonal; its reverse-complement seeds the SAME placement with
    orient 1 (canonical k-mers fold orientation into the posting)."""
    from kir_graph_tpu.align.encode import revCompCodes
    from kir_graph_tpu.align.seeding import DIAG_BUCKET, SeedTable, findCandidates
    from kir_graph_tpu.sim.synth_db import alleleUngappedSeq

    gname = synth_index.gene_names[0]
    gi = synth_index.gene_names.index(gname)
    seq = synth_index.genes[gname].seq
    start = 2000
    frag = "".join("ACGTN"[c] for c in seq[start : start + 150])
    codes, lens = encodeReads([frag])
    rc = revCompCodes(codes, lens)
    table = SeedTable.fromIndex(synth_index)
    md = table.max_diag

    def bestPlacement(c):
        cand, votes = findCandidates(table, c, lens, top_c=2)
        key = int(cand[0, 0])
        assert key >= 0
        return key // (2 * md), (key // md) % 2, (key % md) * DIAG_BUCKET

    g_f, o_f, d_f = bestPlacement(codes)
    assert (g_f, o_f) == (gi, 0)
    assert abs(d_f - start) <= 2 * DIAG_BUCKET
    g_r, o_r, d_r = bestPlacement(np.asarray(rc))
    assert (g_r, o_r) == (gi, 1)
    assert abs(d_r - start) <= 2 * DIAG_BUCKET


def test_chunked_align_results_stable(synth_genes, synth_index, monkeypatch):
    """Chunked alignPairs must COPY each chunk out of the persistent
    scratch before the next chunk overwrites it (regression: all chunks
    used to return views of the same buffers)."""
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(list(synth_genes)[0], 0),
                                   (list(synth_genes)[1], 1)],
        depth=4, seed=9,
    )
    aligner = GraphAligner(synth_index)
    whole = aligner.alignPairs(c1, l1, c2, l2)
    whole_cols = whole.cols_l.copy()
    whole_gene = whole.gene.copy()
    monkeypatch.setattr(GraphAligner, "CHUNK_PAIRS", 64)
    chunked = aligner.alignPairs(c1, l1, c2, l2)
    np.testing.assert_array_equal(chunked.gene, whole_gene)
    np.testing.assert_array_equal(chunked.cols_l, whole_cols)


def test_pack4bit_roundtrip():
    """Nibble packing is lossless for codes 0..4 (N base included) at odd
    and even row widths."""
    import numpy as np

    from kir_graph_tpu.align.encode import packCodes4bit
    from kir_graph_tpu.parallel.cohort import unpackCodes4bit

    rng = np.random.default_rng(0)
    for L in (150, 160, 151):
        codes = rng.integers(0, 5, size=(7, L)).astype(np.int8)
        out = np.asarray(unpackCodes4bit(packCodes4bit(codes), L))
        assert (out == codes).all()


def test_revcomp_uniform_fast_path_bit_identical():
    """revCompDevice(uniform_len=l) equals the per-row take_along path on
    uniform batches, with bucket-padding sentinel rows (all-PAD, len 1)
    mixed in; _uniformLen detects exactly the eligible batches."""
    import numpy as np

    from kir_graph_tpu.align.pipeline import _uniformLen
    from kir_graph_tpu.parallel.cohort import revCompDevice

    rng = np.random.default_rng(3)
    L, l = 160, 150
    codes = np.full((9, L), 4, np.int8)
    lens = np.full(9, 1, np.int32)
    for r in range(7):  # rows 7..8 stay padding sentinels
        codes[r, :l] = rng.integers(0, 5, l)
        lens[r] = l
    slow = np.asarray(revCompDevice(codes, lens))
    fast = np.asarray(revCompDevice(codes, lens, uniform_len=l))
    assert (slow == fast).all()
    # oracle on one real row
    comp = np.array([3, 2, 1, 0, 4], np.int8)
    want = comp[codes[0, :l][::-1]]
    assert (fast[0, :l] == want).all() and (fast[0, l:] == 4).all()

    assert _uniformLen(lens[:4], lens[4:]) == l
    assert _uniformLen(np.full(3, 151, np.int32), np.full(3, 151, np.int32)) == 151
    mixed = np.array([150, 151, 150], np.int32)
    assert _uniformLen(mixed, mixed) is None


def test_fused_traceback_overflow_falls_back(synth_genes, synth_index, monkeypatch):
    """When the monolith's hard-job count exceeds the static HB cap the
    host must re-dispatch the old traceback path — force an overflow by
    rewriting the downloaded count and assert identical columns."""
    import jax.numpy as jnp

    al = GraphAligner(synth_index)
    gene_key = list(synth_genes)[0]
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(gene_key, 0), (gene_key, 1)],
        depth=6, seed=3, error_rate=0.01,
    )
    ref = al.alignPairs(c1, l1, c2, l2)
    ref_cols = (ref.cols_l.copy(), ref.cols_r.copy(), ref.gene.copy())

    orig = al._device_mono_tb

    def overflowed(buf, RL, ul=None, exc=None):
        w, pkx = orig(buf, RL, ul, exc=exc)
        from kir_graph_tpu.align.pipeline import tracebackLayout

        pkx = np.asarray(pkx).copy()
        HB, mrows = tracebackLayout(buf.shape[0] // 2, RL)
        meta = np.frombuffer(
            pkx[:mrows].tobytes()[: 4 * (HB + 1)], np.int32
        ).copy()
        meta[-1] = HB + 1  # lie: "more hard jobs than slots"
        mb = meta.view(np.int8)
        flat = np.zeros(mrows * (RL + 2), np.int8)
        flat[: len(mb)] = mb
        pkx[:mrows] = flat.reshape(mrows, RL + 2)
        return w, jnp.asarray(pkx)

    monkeypatch.setattr(al, "_device_mono_tb", overflowed)
    got = al.alignPairs(c1, l1, c2, l2)
    np.testing.assert_array_equal(got.gene, ref_cols[2])
    np.testing.assert_array_equal(got.cols_l, ref_cols[0])
    np.testing.assert_array_equal(got.cols_r, ref_cols[1])


def test_prepare_upload_path_bit_identical(synth_genes, synth_index):
    """alignPairs(prepared=prepareUpload(...)) == plain alignPairs."""
    al = GraphAligner(synth_index)
    gene_key = list(synth_genes)[1]
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(gene_key, 0), (gene_key, 2)],
        depth=5, seed=9, error_rate=0.005,
    )
    ref = al.alignPairs(c1, l1, c2, l2)
    ref_snap = {
        k: getattr(ref, k).copy() for k in AlignResult.__dataclass_fields__
    }
    prepared = al.prepareUpload(c1, l1, c2, l2)
    got = al.alignPairs(c1, l1, c2, l2, prepared=prepared)
    for k, v in ref_snap.items():
        np.testing.assert_array_equal(getattr(got, k), v, err_msg=k)


def test_fused_traceback_order_mismatch_falls_back(
    synth_genes, synth_index, monkeypatch
):
    """A device/host hard-job order disagreement must trigger the
    re-dispatch fallback (not silently mis-assign delta streams)."""
    import jax.numpy as jnp

    al = GraphAligner(synth_index)
    gene_key = list(synth_genes)[1]
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(gene_key, 0), (gene_key, 1)],
        depth=6, seed=4, error_rate=0.01,
    )
    ref = al.alignPairs(c1, l1, c2, l2)
    ref_cols = (ref.cols_l.copy(), ref.cols_r.copy())

    from kir_graph_tpu.align.pipeline import tracebackLayout

    orig = al._device_mono_tb
    scrambled_hard = []

    def scrambled(buf, RL, ul=None, exc=None):
        w, pkx = orig(buf, RL, ul, exc=exc)
        pkx = np.asarray(pkx).copy()
        HB, mrows = tracebackLayout(buf.shape[0] // 2, RL)
        meta = np.frombuffer(
            pkx[:mrows].tobytes()[: 4 * (HB + 1)], np.int32
        ).copy()
        scrambled_hard.append(int(meta[-1]))
        if int(meta[-1]) >= 2:
            meta[0], meta[1] = meta[1], meta[0]  # corrupt the job order
        mb = meta.view(np.int8)
        flat = np.zeros(mrows * (RL + 2), np.int8)
        flat[: len(mb)] = mb
        pkx[:mrows] = flat.reshape(mrows, RL + 2)
        return w, jnp.asarray(pkx)

    monkeypatch.setattr(al, "_device_mono_tb", scrambled)
    got = al.alignPairs(c1, l1, c2, l2)
    # the fixture must actually produce >= 2 hard jobs, else nothing
    # was scrambled and this test silently proves nothing
    assert scrambled_hard and scrambled_hard[0] >= 2
    np.testing.assert_array_equal(got.cols_l, ref_cols[0])
    np.testing.assert_array_equal(got.cols_r, ref_cols[1])


def _resultsEqual(a: AlignResult, b: AlignResult):
    for k in AlignResult.__dataclass_fields__:
        np.testing.assert_array_equal(
            getattr(a, k), getattr(b, k), err_msg=k
        )


def test_2bit_upload_bit_identical(
    synth_genes, synth_index, monkeypatch
):
    """The 2-bit + N-exception upload layout reconstructs the exact
    same AlignResult as the lossless nibble layout, including reads
    carrying real N bases."""
    gene_key = list(synth_genes)[2]
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(gene_key, 0), (gene_key, 2)],
        depth=6, seed=11, error_rate=0.01,
    )
    # inject N bases (code 4) inside read lengths, incl. two in one
    # read and one at a length boundary
    rng = np.random.default_rng(5)
    for cc, ll in ((c1, l1), (c2, l2)):
        rows = rng.choice(len(cc), size=max(3, len(cc) // 10), replace=False)
        for r in rows:
            cc[r, int(rng.integers(0, ll[r]))] = 4
    c1[0, 0] = 4
    c1[0, 1] = 4
    c2[1, l2[1] - 1] = 4

    monkeypatch.setenv("KGT_UPLOAD_2BIT", "0")
    al_nib = GraphAligner(synth_index)
    ref = al_nib.alignPairs(c1, l1, c2, l2)
    ref = AlignResult(**{
        k: np.array(getattr(ref, k))
        for k in AlignResult.__dataclass_fields__
    })

    monkeypatch.setenv("KGT_UPLOAD_2BIT", "1")
    al2 = GraphAligner(synth_index)
    got = al2.alignPairs(c1, l1, c2, l2)
    _resultsEqual(got, ref)

    # prepared-upload handle rides the same 2-bit layout
    h = al2.prepareUpload(c1, l1, c2, l2)
    assert h["exc_dev"] is not None
    got2 = al2.alignPairs(c1, l1, c2, l2, prepared=h)
    _resultsEqual(got2, ref)


def test_2bit_upload_overflow_falls_back(synth_genes, synth_index):
    """An N-count past the exception bucket silently uses nibbles."""
    gene_key = list(synth_genes)[0]
    sim, c1, l1, c2, l2 = simulateSample(
        synth_genes, synth_index, [(gene_key, 0)], depth=4, seed=12
    )
    al = GraphAligner(synth_index)
    ref = al.alignPairs(c1, l1, c2, l2)
    ref_gene = np.array(ref.gene)
    # saturate mate 1 with N: exceptions overflow max(1024, pairs)
    c1n = c1.copy()
    c1n[:, :] = 4
    got_pack = al._packUpload2bit(c1n, l1, c2, l2)
    assert got_pack is None
    buf, exc, _, _ = al._packAny(c1n, l1, c2, l2)
    assert exc is None  # fell back to the nibble layout
    # and the all-N batch still aligns (mate 1 unmappable, no crash)
    res = al.alignPairs(c1n, l1, c2, l2)
    assert res.gene.shape == ref_gene.shape
