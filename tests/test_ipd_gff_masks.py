"""Exon-mask fidelity through gff ingestion (VERDICT round-1 item 10).

`--cn-exon` depth filtering and exonfirst typing both key off per-variant
exon flags, which come from the gff block table of a real IPD checkout.
Round-trip a synthetic DB through the on-disk IPD-KIR layout
(msf gen + nuc + gff, sim/ipd_checkout.py) and require that block
structure, per-column exon masks, and the index's var_in_exon flags all
survive identically — i.e. a cold gff-driven build is trustworthy.
Mirrors reference msa2hisat.py exon handling (msa2hisat.py:116-189).
"""
import numpy as np
import pytest

from kir_graph_tpu.index.build import buildIndexFromMsa
from kir_graph_tpu.msa.ipd import readIpdKirDB
from kir_graph_tpu.sim.ipd_checkout import writeIpdCheckout
from kir_graph_tpu.sim.synth_db import SynthConfig, makeSyntheticDB


@pytest.fixture(scope="module")
def roundtrip(tmp_path_factory):
    db = tmp_path_factory.mktemp("ipd")
    genes = makeSyntheticDB(
        SynthConfig(seed=5, n_genes=4, n_alleles_per_gene=8, gene_length=3000)
    )
    writeIpdCheckout(genes, str(db))
    back = readIpdKirDB(str(db), full_length_only=False)
    return genes, back


def exonColMask(msa) -> np.ndarray:
    mask = np.zeros(msa.get_length(), dtype=bool)
    pos = 0
    for b in msa.blocks:
        if b.type == "exon":
            mask[pos : pos + b.length] = True
        pos += b.length
    return mask


def test_blocks_survive_gff(roundtrip):
    genes, back = roundtrip
    for gname, msa in genes.items():
        assert gname in back, f"{gname} lost in checkout round-trip"
        got = back[gname]
        want_blocks = [(b.type, b.length) for b in msa.blocks]
        got_blocks = [(b.type, b.length) for b in got.blocks]
        assert got_blocks == want_blocks, gname


def test_exon_column_masks_survive(roundtrip):
    genes, back = roundtrip
    for gname, msa in genes.items():
        np.testing.assert_array_equal(
            exonColMask(back[gname]), exonColMask(msa), err_msg=gname
        )


def test_var_in_exon_flags_survive(roundtrip):
    """The cold gff-driven index must flag exactly the same variants
    exonic as an index built from the in-memory source MSAs."""
    genes, back = roundtrip
    # read-back MSAs have no backbone row: re-derive it the same way
    for gname, msa in back.items():
        shrunk = msa
        bb = f"{gname}*BACKBONE"
        if bb not in msa.alleles:
            shrunk.append(bb, shrunk.get_consensus(include_gap=False))
            shrunk.set_reference(bb)
    want = buildIndexFromMsa(genes)
    got = buildIndexFromMsa(back)
    assert list(got.gene_names) == list(want.gene_names)
    for name in want.gene_names:
        gw, gg = want.genes[name], got.genes[name]
        kw = [(v.pos, v.typ, str(v.val)) for v in gw.variants]
        kg = [(v.pos, v.typ, str(v.val)) for v in gg.variants]
        assert kg == kw, f"{name}: variant catalogs differ"
        np.testing.assert_array_equal(
            gg.var_in_exon, gw.var_in_exon, err_msg=name
        )
