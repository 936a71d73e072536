"""art-like 'hiseq' simulator profile: position-dependent error + quals."""
import numpy as np

from kir_graph_tpu.sim.reads import (
    _hiseqQuals,
    simulatePairedReads,
    qualString,
)


def _randSeq(rng, n):
    return "".join("ACGT"[c] for c in rng.integers(0, 4, size=n))


def test_quals_degrade_toward_3prime():
    rng = np.random.Generator(np.random.Philox(1))
    q = np.stack([_hiseqQuals(rng, 150, 0.002) for _ in range(200)])
    assert q.shape == (200, 150)
    assert q[:, :30].mean() - q[:, -30:].mean() > 8  # clear 3' degradation
    assert (q >= 2).all() and (q <= 41).all()


def test_mean_error_calibrated():
    rng = np.random.Generator(np.random.Philox(2))
    rate = 0.002
    q = np.stack([_hiseqQuals(rng, 150, rate) for _ in range(500)])
    p = 10.0 ** (-q / 10.0)
    assert 0.5 * rate < p.mean() < 2.5 * rate


def test_hiseq_reads_position_dependent_errors():
    rng = np.random.Generator(np.random.Philox(3))
    ref = _randSeq(rng, 8000)
    sim = simulatePairedReads(
        {"G*1": ref}, depth=60, seed=5, error_rate=0.004, profile="hiseq"
    )
    assert len(sim.q1) == len(sim.r1) > 50
    # measure per-position mismatch vs truth on forward-oriented mate 1
    errs = np.zeros(150)
    tot = 0
    for r1, allele, pos, q in zip(
        sim.r1, sim.truth_allele, sim.truth_pos, sim.q1
    ):
        truth = ref[pos : pos + 150]
        # keep only forward-oriented read1 (head matches truth head);
        # reverse-oriented read1s and early-error heads are skipped
        if len(r1) != 150 or truth[:5] != r1[:5]:
            continue
        a = np.frombuffer(r1.encode(), np.uint8)
        b = np.frombuffer(truth.encode(), np.uint8)
        errs += a != b
        tot += 1
    assert tot > 20
    head = errs[:50].sum() / tot
    tail = errs[100:].sum() / tot
    assert tail > 2 * head  # 3' tail clearly noisier


def test_qual_string_roundtrip():
    q = np.array([2, 20, 41])
    s = qualString(q)
    assert [ord(c) - 33 for c in s] == [2, 20, 41]


def test_uniform_profile_unchanged_by_default():
    rng = np.random.Generator(np.random.Philox(4))
    ref = _randSeq(rng, 4000)
    a = simulatePairedReads({"G*1": ref}, depth=10, seed=9, error_rate=0.002)
    b = simulatePairedReads({"G*1": ref}, depth=10, seed=9, error_rate=0.002)
    assert a.r1 == b.r1 and a.r2 == b.r2 and not a.q1
