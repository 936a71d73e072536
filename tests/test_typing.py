import numpy as np
import pytest

from kir_graph_tpu.typing import (
    AlleleTyping,
    AlleleTypingExonFirst,
    PairRead,
    TypingWithPosNegAllele,
    TypingWithReport,
    hisatEMnp,
    isHomozygous,
    selectKirTypingModel,
)


def makeReads(gene_index, source_allele, n_reads=200, span=400, seed=0, multiple=1):
    """Ground-truth PairReads: positives = source allele's variants in span,
    negatives = other catalogued variants in span."""
    rng = np.random.Generator(np.random.Philox(seed))
    g = gene_index
    ai = g.alleles.index(source_allele)
    L = g.length
    reads = []
    for _ in range(n_reads):
        s = int(rng.integers(0, max(L - span, 1)))
        e = s + span
        in_span = (g.var_pos >= s) & (g.var_pos < e)
        pos_ids = [
            str(g.variants[i].id)
            for i in np.nonzero(in_span & g.membership[:, ai])[0]
        ]
        neg_ids = [
            str(g.variants[i].id)
            for i in np.nonzero(in_span & ~g.membership[:, ai])[0]
        ]
        half = len(pos_ids) // 2
        reads.append(
            PairRead(
                backbone=g.name,
                multiple=multiple,
                lpv=pos_ids[:half],
                rpv=pos_ids[half:],
                lnv=neg_ids[: len(neg_ids) // 2],
                rnv=neg_ids[len(neg_ids) // 2 :],
            )
        )
    return reads


@pytest.fixture(scope="module")
def gene(synth_index):
    return synth_index.genes[synth_index.gene_names[0]]


def test_cn1_typing(gene):
    a1 = gene.alleles[0]
    reads = makeReads(gene, a1, n_reads=150)
    t = AlleleTyping(reads, gene.variants, top_n=50)
    res = t.typing(1)
    assert res.selectBest() == [a1]


def test_cn2_heterozygous(gene):
    a1, a2 = gene.alleles[0], gene.alleles[5]
    reads = makeReads(gene, a1, n_reads=150, seed=1) + makeReads(
        gene, a2, n_reads=150, seed=2
    )
    t = AlleleTyping(reads, gene.variants, top_n=100)
    res = t.typing(2)
    assert sorted(res.selectBest()) == sorted([a1, a2])


def test_cn2_homozygous_detected(gene):
    a1 = gene.alleles[3]
    reads = makeReads(gene, a1, n_reads=300, seed=3)
    assert isHomozygous(reads, {str(v.id): v for v in gene.variants}, 2)
    t = AlleleTyping(reads, gene.variants, top_n=50)
    res = t.typing(2)
    assert res.selectBest() == [a1, a1]


def test_heterozygous_not_flagged_homo(gene):
    a1, a2 = gene.alleles[0], gene.alleles[5]
    reads = makeReads(gene, a1, n_reads=200, seed=4) + makeReads(
        gene, a2, n_reads=200, seed=5
    )
    assert not isHomozygous(reads, {str(v.id): v for v in gene.variants}, 2)


def test_error_correction_drops_rare_variants(gene):
    a1 = gene.alleles[0]
    reads = makeReads(gene, a1, n_reads=100, seed=6)
    # inject a junk variant seen once positively
    junk = str(gene.variants[0].id)
    reads[0].lpv = reads[0].lpv + [junk] if junk not in reads[0].lpv else reads[0].lpv
    corrected = AlleleTyping.errorCorrection(
        [PairRead(backbone=gene.name, lpv=[junk])]
    )
    assert corrected[0].lpv == []  # support 1 < 3 -> dropped


def test_exonfirst_matches_full(gene):
    a1, a2 = gene.alleles[1], gene.alleles[6]
    reads = makeReads(gene, a1, n_reads=200, seed=7) + makeReads(
        gene, a2, n_reads=200, seed=8
    )
    full = AlleleTyping(reads, gene.variants, top_n=100).typing(2).selectBest()
    ef = AlleleTypingExonFirst(reads, gene.variants, top_n=100).typing(2).selectBest()
    assert sorted(ef) == sorted(full) == sorted([a1, a2])


def test_em_abundance():
    reads = [["a1"], ["a1"], ["a1", "a2"], ["a2"]] * 30
    prob = hisatEMnp(reads)
    assert set(prob) == {"a1", "a2"}
    assert abs(sum(prob.values()) - 1) < 1e-6
    assert prob["a1"] > prob["a2"]


def test_facade_full_and_em(gene, tmp_path):
    from kir_graph_tpu.typing import writeReadsAndVariantsData

    a1 = gene.alleles[2]
    reads = makeReads(gene, a1, n_reads=200, seed=9)
    data = {"variants": gene.variants, "reads": reads}
    fn = str(tmp_path / "rv.json")
    writeReadsAndVariantsData(data, fn)

    t = selectKirTypingModel("full", fn, top_n=50)
    alleles, warn = t.typing({gene.name: 2})
    assert alleles == [a1, a1]

    t2 = selectKirTypingModel("em", fn)
    alleles2, _ = t2.typing({gene.name: 1})
    assert alleles2 == [a1]

    possible = t.getAllPossibleTyping()
    assert possible and possible[0]["gene"] == gene.name


def test_multiple_mapped_removed(gene):
    a1 = gene.alleles[0]
    reads = makeReads(gene, a1, n_reads=50, seed=10) + makeReads(
        gene, a1, n_reads=50, seed=11, multiple=3
    )
    t = TypingWithPosNegAllele(
        reads_data={"variants": gene.variants, "reads": reads}, top_n=50
    )
    # only NH==1 reads enter typing
    assert len(t._src.per_gene[gene.name]) == 50


def test_beam_extend_matches_bruteforce():
    """beamExtend's on-device dedup + top-k reproduces the host logic:
    score all T*A multiset extensions, drop duplicate unordered sets
    (first flat occurrence kept), take the best k."""
    import jax.numpy as jnp

    from kir_graph_tpu.typing.kernels import beamExtend

    rng = np.random.Generator(np.random.Philox(3))
    R, A, T, n_prev = 40, 6, 5, 2
    log_probs = rng.normal(size=(R, A)).astype(np.float32)
    prev_id = rng.integers(0, A, size=(T, n_prev))
    prev_prob = np.max(log_probs[:, prev_id], axis=2).astype(np.float32)
    h1 = rng.integers(0, 1 << 32, A, dtype=np.uint32)
    h2 = rng.integers(0, 1 << 32, A, dtype=np.uint32)
    ph1 = h1[prev_id].sum(axis=1, dtype=np.uint32)
    ph2 = h2[prev_id].sum(axis=1, dtype=np.uint32)

    k = 8
    value, idx, new_prob = beamExtend(
        jnp.asarray(log_probs), jnp.asarray(prev_prob),
        jnp.asarray(ph1), jnp.asarray(ph2),
        jnp.asarray(h1), jnp.asarray(h2), k,
    )
    value, idx, new_prob = map(np.asarray, (value, idx, new_prob))

    # brute force: scores + set-dedup (first flat occurrence) + sort
    scores = np.array(
        [
            [np.maximum(log_probs[:, a], prev_prob[:, t]).sum()
             for a in range(A)]
            for t in range(T)
        ],
        dtype=np.float32,
    ).reshape(-1)
    seen = set()
    keep = np.zeros(T * A, dtype=bool)
    for f in range(T * A):
        key = tuple(sorted(list(prev_id[f // A]) + [f % A]))
        if key not in seen:
            seen.add(key)
            keep[f] = True
    valid = value > -1e30
    want = np.sort(scores[keep])[::-1][: valid.sum()]
    np.testing.assert_allclose(np.sort(value[valid])[::-1], want, rtol=1e-5)
    # new_prob rows are the kept sets' per-read maxima
    for j in np.nonzero(valid)[0]:
        t, a = idx[j] // A, idx[j] % A
        np.testing.assert_allclose(
            new_prob[:, j],
            np.maximum(prev_prob[:, t], log_probs[:, a]),
            rtol=1e-6,
        )


def test_homo_typing_with_all_reads_corrected_away_returns_fail():
    """CN>=2 homo branch on reads whose variants all fail the <3-
    observation filter: must return CN fail alleles, not crash in
    createHomoResult's np.repeat."""
    from kir_graph_tpu.index.variants import Variant
    from kir_graph_tpu.typing.allele_typing import AlleleTyping
    from kir_graph_tpu.typing.pairread import PairRead

    v = Variant(pos=10, typ="single", val="C", ref="G*BACKBONE",
                allele=["G*0101"], id="hv1")
    reads = [
        PairRead(backbone="G*BACKBONE", lpv=["hv1"], lnv=[], rpv=[], rnv=[])
    ]  # one observation < min-depth 3 -> stripped by errorCorrection
    t = AlleleTyping(reads, [v], variant_correction=True, force_homo=True)
    res = t.typing(2)
    assert res.selectBest() == ["fail", "fail"]


def test_typing_venue_host_matches_device(gene, monkeypatch):
    """The host beam twins (kernels.py *Host) must call the same alleles
    as the device path — KGT_TYPING_DEVICE forces each venue.  top_n
    exceeds the distinct-set count so the beam never truncates: any
    f32 reduction-order difference between venues is then erased by the
    shared f64 rescore and the results must agree exactly."""
    a1, a2 = gene.alleles[0], gene.alleles[5]
    reads = makeReads(gene, a1, n_reads=120, seed=21) + makeReads(
        gene, a2, n_reads=120, seed=22
    )
    n_sets = len(gene.alleles) * (len(gene.alleles) + 1) // 2
    results = {}
    for venue in ("0", "1"):
        monkeypatch.setenv("KGT_TYPING_DEVICE", venue)
        t = AlleleTyping(reads, gene.variants, top_n=n_sets + 1)
        assert t._on_device == (venue == "1")
        res = t.typing(2)
        results[venue] = (
            res.selectBest(),
            res.value.round(6).tolist(),
            [tuple(ids) for ids in res.allele_id],
        )
    assert results["0"][0] == results["1"][0] == sorted([a1, a2])
    assert results["0"][2] == results["1"][2]  # full survivor order


def test_exonfirst_threshold_parsing(gene):
    """Pins the reference's field-count rule (kir_typing.py:215-219):
    one numeric tail parses, multi-underscore tails fall back to 0.0
    (Python float() would otherwise read '1_5' as 15.0 via PEP 515)."""
    a1 = gene.alleles[0]
    reads = makeReads(gene, a1, n_reads=30, seed=30)
    data = {"variants": gene.variants, "reads": reads}
    for method, want in (
        ("exonfirst_0.9", 0.9),
        ("exonfirst_1", 1.0),
        ("exonfirst_1_5", 0.0),
        ("exonfirst", 0.0),
    ):
        t = selectKirTypingModel(method, reads_data=data, top_n=10)
        assert t._model_opts["candidate_set_threshold"] == want, method
