"""Regression tests for the round-1 advisor findings (ADVICE.md)."""
import numpy as np
import pytest

from kir_graph_tpu.index.variants import Variant
from kir_graph_tpu.typing import (
    PairRead,
    TypingWithPosNegAllele,
    TypingWithReport,
)


def test_zero_read_gene_degrades_to_fail(synth_index):
    """CN>0 but no reads for a gene must yield GENE*, not KeyError
    (reference kir_typing.py uses defaultdicts -> empty -> fail)."""
    g = synth_index.genes[synth_index.gene_names[0]]
    other = "KIRX*BACKBONE"
    reads = [
        PairRead(backbone=g.name, multiple=1,
                 lpv=[str(g.variants[0].id)], rpv=[], lnv=[], rnv=[])
    ]
    t = TypingWithPosNegAllele(
        reads_data={"variants": g.variants, "reads": reads}, top_n=10
    )
    alleles, warn = t.typing({other: 2, g.name: 0})
    assert alleles == ["KIRX*", "KIRX*"]
    assert other in warn

    t2 = TypingWithReport(
        reads_data={"variants": g.variants, "reads": reads}
    )
    alleles2, _ = t2.typing({other: 1})
    assert alleles2 == ["KIRX*"]


def test_local_minima_matches_scipy_clip():
    from scipy.signal import argrelextrema

    from kir_graph_tpu.cn.models import _localMinima

    rng = np.random.Generator(np.random.Philox(3))
    for trial in range(20):
        y = rng.normal(size=50)
        # craft edge dips that clip-mode must NOT flag
        y[0] = y.min() - 1.0
        y[-1] = y.min() - 2.0
        for order in (1, 3, 5):
            ours = _localMinima(y, order)
            ref = argrelextrema(y, np.less, order=order, mode="clip")[0]
            assert np.array_equal(ours, ref), (trial, order)
        assert 0 not in _localMinima(y, 5)
        assert len(y) - 1 not in _localMinima(y, 5)


def test_variant_sortkey_numeric_deletions():
    d2 = Variant(pos=10, typ="deletion", ref="G*BACKBONE", val=2)
    d10 = Variant(pos=10, typ="deletion", ref="G*BACKBONE", val=10)
    assert d2 < d10  # '10' < '2' lexicographically; must sort numerically
    assert sorted([d10, d2]) == [d2, d10]


def test_harness_runshell_metachar_safe(tmp_path):
    from kir_graph_tpu.harness.pipe import Executor

    ex = Executor(engine_type="local")
    weird = tmp_path / "a;b $(x).txt"
    ex.runShell(f"touch '{weird}'")
    assert weird.exists()
    # command substitution is NOT interpreted (no shell)
    marker = tmp_path / "pwned"
    ex.runShell(f"echo '$(touch {marker})'")
    assert not marker.exists()
