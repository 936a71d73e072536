"""Long catalogued deletions (beyond the DP band) bridged via spliced
pseudo-references."""
import numpy as np
import pytest

from kir_graph_tpu.align import GraphAligner, VariantAnnotator, encodeReads
from kir_graph_tpu.index.build import buildIndexFromMsa
from kir_graph_tpu.msa.genemsa import Block, Genemsa
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.typing import TypingWithPosNegAllele


@pytest.fixture(scope="module")
def longdel_world():
    rng = np.random.default_rng(17)
    L = 6000
    base = "".join("ACGT"[c] for c in rng.integers(0, 4, L))
    DEL_POS, DEL_LEN = 2500, 200

    msa = Genemsa(
        gene_name="KIR3DP1", blocks=[Block("gene", "gene_fragment", L)]
    )

    def mut(s, n, seed):
        r = np.random.default_rng(seed)
        arr = list(s)
        for p in r.integers(0, L, n):
            arr[p] = "ACGT"[("ACGT".index(arr[p]) + 1) % 4]
        return "".join(arr)

    full_a = mut(base, 6, 1)
    full_b = mut(base, 9, 2)
    carrier = mut(base, 5, 3)
    carrier = carrier[:DEL_POS] + "-" * DEL_LEN + carrier[DEL_POS + DEL_LEN :]
    msa.append("KIR3DP1*0010101", full_a)
    msa.append("KIR3DP1*0020101", full_b)
    msa.append("KIR3DP1*0040101", carrier)
    msa.append("KIR3DP1*BACKBONE", msa.get_consensus(include_gap=False))
    msa.set_reference("KIR3DP1*BACKBONE")
    index = buildIndexFromMsa({"KIR3DP1": msa})
    return msa, index, DEL_POS, DEL_LEN


def test_pseudo_ref_created(longdel_world):
    msa, index, DEL_POS, DEL_LEN = longdel_world
    assert len(index.pseudo_refs) == 1
    tgi, pos, dlen = index.pseudo_refs[0]
    assert (pos, dlen) == (DEL_POS, DEL_LEN)
    # padded arrays have the extra spliced row
    assert index.backbone.shape[0] == 2
    assert index.lengths[1] == index.lengths[0] - DEL_LEN


def test_junction_reads_map_and_type(longdel_world):
    msa, index, DEL_POS, DEL_LEN = longdel_world
    carrier = "KIR3DP1*0040101"
    seq = msa.get(carrier).replace("-", "")
    sim = simulatePairedReads({carrier: seq}, depth=25, seed=7, error_rate=0.0)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    res = GraphAligner(index).alignPairs(c1, l1, c2, l2)
    ann = VariantAnnotator(index)
    reads_data, depth, _, passed = ann.annotate(res)

    # junction-spanning reads must survive (without pseudo-refs they die)
    assert passed.mean() > 0.9
    # all placements report the TRUE gene row
    assert set(res.gene[res.gene >= 0]) == {0}
    # the long deletion appears as a positive catalogued variant
    del_id = next(
        str(v.id)
        for v in index.genes["KIR3DP1*BACKBONE"].variants
        if v.typ == "deletion" and int(v.val) == DEL_LEN
    )
    n_del_pos = sum(
        1 for r in reads_data["reads"] if del_id in r.lpv + r.rpv
    )
    assert n_del_pos >= 3
    # depth inside the deletion stays near zero (reads skip it)
    inside = depth[0, DEL_POS : DEL_POS + DEL_LEN]
    outside = depth[0, DEL_POS - 300 : DEL_POS - 100]
    assert inside.mean() < 0.2 * max(outside.mean(), 1)

    # typing recovers the carrier allele (homozygous CN2)
    t = TypingWithPosNegAllele(reads_data=reads_data, top_n=50)
    alleles, _ = t.typing({"KIR3DP1*BACKBONE": 2})
    assert alleles == [carrier, carrier]


def test_device_path_remaps_pseudo_placements(longdel_world):
    """Pure-device cohort step: junction reads placed on the spliced
    pseudo-reference must scatter their evidence into the PARENT gene's
    coordinates (with the deletion gap), leaving the pseudo row zero."""
    import jax.numpy as jnp

    from kir_graph_tpu.align.encode import revCompCodes
    from kir_graph_tpu.parallel.cohort import buildDeviceArrays, cohortStep

    msa, index, DEL_POS, DEL_LEN = longdel_world
    carrier = "KIR3DP1*0040101"
    seq = msa.get(carrier).replace("-", "")
    sim = simulatePairedReads({carrier: seq}, depth=20, seed=11, error_rate=0.0)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    rc1 = revCompCodes(c1, l1)
    rc2 = revCompCodes(c2, l2)
    arr = buildDeviceArrays(index)
    assert arr.n_true == 1 and arr.n_genes == 2
    depth, hist, _ = cohortStep(
        arr,
        jnp.asarray(c1), jnp.asarray(l1.astype(np.int32)),
        jnp.asarray(c2), jnp.asarray(l2.astype(np.int32)),
        jnp.asarray(rc1), jnp.asarray(rc2),
        axis_name=None,
    )
    depth = np.asarray(depth)
    # pseudo row contributes nothing; all evidence is on the parent
    assert depth[1].sum() == 0
    assert depth[0].sum() > 0
    # coverage continues PAST the splice point in parent coordinates
    after = depth[0, DEL_POS + DEL_LEN + 50 : DEL_POS + DEL_LEN + 250]
    before = depth[0, DEL_POS - 250 : DEL_POS - 50]
    inside = depth[0, DEL_POS + 10 : DEL_POS + DEL_LEN - 10]
    assert after.mean() > 0.5 * max(before.mean(), 1.0)
    assert inside.mean() < 0.2 * max(before.mean(), 1.0)
