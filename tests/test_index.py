import numpy as np

from kir_graph_tpu.index.build import (
    buildIndexFromMsa,
    encodeSeq,
    loadIndex,
    saveIndex,
)
from kir_graph_tpu.index.variants import IdAllocator, diffAlleleVsBackbone
from kir_graph_tpu.msa.genemsa import Block, Genemsa


def test_diff_snp_and_deletion():
    ref = "ACGTACGTAC"
    alt = "ACTTAC--AC"
    vs = diffAlleleVsBackbone(ref, alt, "G*BACKBONE")
    assert [(v.typ, v.pos, v.val) for v in vs] == [
        ("single", 2, "T"),
        ("deletion", 6, 2),
    ]


def test_adjacent_deletions_merge():
    vs = diffAlleleVsBackbone("AAAAAA", "A---AA", "r")
    assert len(vs) == 1 and vs[0].val == 3 and vs[0].pos == 1


def test_build_index(synth_genes, synth_index):
    idx = synth_index
    assert len(idx.gene_names) == len(synth_genes)
    g = idx.genes[idx.gene_names[0]]
    # every variant links at least one allele
    assert all(v.allele for v in g.variants)
    assert g.membership.shape == (len(g.variants), len(g.alleles))
    # membership row sums equal allele-link counts
    assert (g.membership.sum(axis=1) == [len(v.allele) for v in g.variants]).all()
    # hv ids unique and global
    all_ids = [v.id for gn in idx.gene_names for v in idx.genes[gn].variants]
    assert len(set(all_ids)) == len(all_ids)


def test_alt_and_del_masks(synth_index):
    g = synth_index.genes[synth_index.gene_names[0]]
    alt = g.altMask()
    for v in g.variants:
        if v.typ == "single" and not v.ignore:
            code = int(encodeSeq(str(v.val))[0])
            assert alt[v.pos] & (1 << code)
    dm = g.delOkMask()
    for v in g.variants:
        if v.typ == "deletion":
            assert dm[v.pos : v.pos + int(v.val)].all()


def test_kmer_table_finds_allele_kmers(synth_genes, synth_index):
    from kir_graph_tpu.index.build import canonHashKmerWindows

    idx = synth_index
    k = idx.kmer
    gname = idx.gene_names[0]
    g = idx.genes[gname]
    gi = idx.gene_names.index(gname)
    allele = g.alleles[0]
    gapped = synth_genes[g.name.split("*")[0]].get(allele)
    ungapped = gapped.replace("-", "")
    # take a k-mer from the middle of the allele and look it up
    window = encodeSeq(ungapped[1000 : 1000 + k])[None, :]
    key, flip = canonHashKmerWindows(window)
    i = np.searchsorted(idx.kmer_keys, key[0])
    assert idx.kmer_keys[i] == key[0]
    genes = idx.kmer_gene[idx.kmer_start[i] : idx.kmer_start[i + 1]]
    assert gi in genes
    # canonical hashing: the revcomp window hits the SAME key with the
    # opposite flip
    rc = (3 - window)[:, ::-1]
    key_rc, flip_rc = canonHashKmerWindows(rc)
    assert key_rc[0] == key[0]
    assert bool(flip_rc[0]) != bool(flip[0])


def test_index_save_load_roundtrip(tmp_path, synth_index):
    prefix = str(tmp_path / "idx")
    saveIndex(synth_index, prefix)
    loaded = loadIndex(prefix)
    assert loaded.gene_names == synth_index.gene_names
    np.testing.assert_array_equal(loaded.backbone, synth_index.backbone)
    np.testing.assert_array_equal(loaded.kmer_keys, synth_index.kmer_keys)
    g0 = synth_index.gene_names[0]
    assert [v.id for v in loaded.genes[g0].variants] == [
        v.id for v in synth_index.genes[g0].variants
    ]
    np.testing.assert_array_equal(
        loaded.genes[g0].membership, synth_index.genes[g0].membership
    )


def test_simulated_reads(synth_genes):
    from kir_graph_tpu.sim.reads import simulatePairedReads, revComp

    g = synth_genes[list(synth_genes)[0]]
    allele = [n for n in g.get_sequence_names() if "BACKBONE" not in n][0]
    seqs = {allele: g.get(allele).replace("-", "")}
    sim = simulatePairedReads(seqs, depth=5, seed=1, error_rate=0.0)
    assert len(sim.r1) == len(sim.r2) > 0
    # one mate must be the forward strand subsequence
    src = seqs[allele]
    r1, r2 = sim.r1[0], sim.r2[0]
    assert r1 in src or revComp(r1) in src
