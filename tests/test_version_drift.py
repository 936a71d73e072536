"""DB-version drift: samples carry alleles missing from the typing index
(reference kg_create_version_diff_allele.py scenario).  The pipeline must
degrade gracefully — calling the nearest catalogued relative, not
crashing or hallucinating distant alleles."""
import numpy as np
import pytest

from kir_graph_tpu.align import GraphAligner, VariantAnnotator, encodeReads
from kir_graph_tpu.index.build import buildIndexFromMsa
from kir_graph_tpu.sim.reads import simulatePairedReads
from kir_graph_tpu.sim.synth_db import alleleUngappedSeq
from kir_graph_tpu.typing import TypingWithPosNegAllele
from kir_graph_tpu.utils import getAlleleField


def test_unknown_allele_calls_family_relative(synth_genes, synth_index):
    gname = synth_index.gene_names[0]
    gene_key = gname.split("*")[0]
    full_msa = synth_genes[gene_key]
    g_full = synth_index.genes[gname]
    victim = g_full.alleles[0]

    # "old-DB" index: rebuild without the victim allele
    old_msa = full_msa.copy()
    old_msa.remove_allele([victim])
    old_index = buildIndexFromMsa({gene_key: old_msa})

    seq = alleleUngappedSeq(full_msa, victim)
    sim = simulatePairedReads({victim: seq}, depth=25, seed=41, error_rate=0.0)
    c1, l1 = encodeReads(sim.r1)
    c2, l2 = encodeReads(sim.r2)
    res = GraphAligner(old_index).alignPairs(c1, l1, c2, l2)
    reads_data, _, _, passed = VariantAnnotator(old_index).annotate(res)
    assert passed.mean() > 0.8  # private SNPs cost <=2 NM, reads survive

    t = TypingWithPosNegAllele(reads_data=reads_data, top_n=50)
    called, _ = t.typing({f"{gene_key}*BACKBONE": 2})
    assert all(c != victim for c in called)
    # nearest relative: same 3-digit family
    assert any(
        getAlleleField(c, 3) == getAlleleField(victim, 3) for c in called
    )
