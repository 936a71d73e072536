"""
Deterministic paired-end read simulator (art_illumina stand-in).

Reference fixture generation: research/kg_create_data.py:96-144 runs
art_illumina at 30x / 2x150bp with a truth SAM.  This simulator reproduces
the workload shape (fragment-sampled FR pairs, per-base error, known truth)
without the external binary, and is fully seeded.

Two error profiles:

* ``uniform``  — flat per-base substitution rate (the round-1 fixture
  model; kept for seed-stable tests)
* ``hiseq``    — art-like position-dependent quality: Q starts ~38 and
  degrades quadratically toward the 3' end with per-base noise, the
  substitution probability is 10^(-Q/10), and bases below Q10 become N.
  Mean error over a 150 bp read lands near the requested ``error_rate``;
  the 3' tail is several-fold noisier than the 5' end — the property the
  uniform model lacks and the NM<=4 filter is sensitive to.
"""
from __future__ import annotations

import gzip
from dataclasses import dataclass, field

import numpy as np

_COMP = str.maketrans("ACGTN", "TGCAN")


def revComp(seq: str) -> str:
    return seq.translate(_COMP)[::-1]


@dataclass
class SimReads:
    r1: list[str] = field(default_factory=list)
    r2: list[str] = field(default_factory=list)
    names: list[str] = field(default_factory=list)
    # truth: (source allele, fragment start in allele-ungapped coords)
    truth_allele: list[str] = field(default_factory=list)
    truth_pos: list[int] = field(default_factory=list)
    # per-base phred qualities (only for profile="hiseq"; else empty)
    q1: list[str] = field(default_factory=list)
    q2: list[str] = field(default_factory=list)


def _hiseqQuals(
    rng: np.random.Generator, read_len: int, error_rate: float
) -> np.ndarray:
    """Position-dependent phred qualities, int array [read_len].

    Shape: Q(pos) = q0 - span * (pos / L)^2 + N(0, 2), clipped to [2, 41].
    q0 is solved so the mean of 10^(-Q/10) matches error_rate.
    """
    pos = np.arange(read_len) / max(read_len - 1, 1)
    span = 14.0
    base = -span * pos * pos
    # calibrate q0: mean(10^-((q0+base)/10)) == error_rate
    mean_shape = float(np.mean(10 ** (-base / 10)))
    q0 = -10 * np.log10(error_rate / mean_shape)
    q = q0 + base + rng.normal(0.0, 2.0, size=read_len)
    return np.clip(q, 2, 41).astype(np.int64)


def _applyQualErrors(
    rng: np.random.Generator, seq: str, quals: np.ndarray
) -> str:
    arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    p_err = 10.0 ** (-quals[: len(arr)] / 10.0)
    hit = np.nonzero(rng.random(len(arr)) < p_err)[0]
    subs = {ord(c): [ord(x) for x in "ACGT" if x != c] for c in "ACGT"}
    for i in hit:
        if arr[i] in subs:
            arr[i] = subs[arr[i]][rng.integers(0, 3)]
    # unreliable bases read as N
    arr[quals[: len(arr)] < 10] = ord("N")
    return arr.tobytes().decode()


def qualString(quals: np.ndarray) -> str:
    return "".join(chr(33 + int(q)) for q in quals)


def simulatePairedReads(
    allele_seqs: dict[str, str],
    depth: float = 30.0,
    read_len: int = 150,
    frag_mean: float = 400.0,
    frag_sd: float = 50.0,
    error_rate: float = 0.002,
    seed: int = 0,
    sample_name: str = "sim",
    allele_copies: dict[str, int] | None = None,
    profile: str = "uniform",
) -> SimReads:
    """Sample FR pairs at the given depth from each (copy of each) allele."""
    assert profile in ("uniform", "hiseq"), profile
    rng = np.random.Generator(np.random.Philox(seed))
    out = SimReads()
    ridx = 0
    for allele, seq in allele_seqs.items():
        copies = (allele_copies or {}).get(allele, 1)
        L = len(seq)
        n_pairs = int(L * depth * copies / (2 * read_len))
        if L < read_len + 2:
            continue
        for _ in range(n_pairs):
            frag = int(np.clip(rng.normal(frag_mean, frag_sd), read_len, L))
            start = int(rng.integers(0, L - frag + 1))
            fwd = seq[start : start + read_len]
            rev = revComp(seq[start + frag - read_len : start + frag])
            if profile == "hiseq":
                qf = _hiseqQuals(rng, read_len, error_rate)
                qr = _hiseqQuals(rng, read_len, error_rate)
                fwd = _applyQualErrors(rng, fwd, qf)
                rev = _applyQualErrors(rng, rev, qr)
            else:
                fwd = _addErrors(rng, fwd, error_rate)
                rev = _addErrors(rng, rev, error_rate)
                qf = qr = None
            # random mate order (which physical read is read1)
            if rng.random() < 0.5:
                a, b, qa, qb = fwd, rev, qf, qr
            else:
                a, b, qa, qb = rev, fwd, qr, qf
            out.r1.append(a)
            out.r2.append(b)
            if qa is not None:
                out.q1.append(qualString(qa[: len(a)]))
                out.q2.append(qualString(qb[: len(b)]))
            out.names.append(f"{sample_name}:{allele}:{ridx}")
            out.truth_allele.append(allele)
            out.truth_pos.append(start)
            ridx += 1
    return out


def _addErrors(rng: np.random.Generator, seq: str, rate: float) -> str:
    if rate <= 0:
        return seq
    arr = np.frombuffer(seq.encode(), dtype=np.uint8).copy()
    hit = np.nonzero(rng.random(len(arr)) < rate)[0]
    if len(hit) == 0:
        return seq
    subs = {ord(c): [ord(x) for x in "ACGT" if x != c] for c in "ACGT"}
    for i in hit:
        if arr[i] in subs:
            arr[i] = subs[arr[i]][rng.integers(0, 3)]
    return arr.tobytes().decode()


def writeFastq(
    path: str,
    names: list[str],
    seqs: list[str],
    quals: list[str] | None = None,
) -> None:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as f:
        for i, (name, seq) in enumerate(zip(names, seqs)):
            q = quals[i] if quals else "I" * len(seq)
            f.write(f"@{name}\n{seq}\n+\n{q}\n")


def readFastq(path: str) -> tuple[list[str], list[str]]:
    names, seqs = [], []
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        while True:
            h = f.readline()
            if not h:
                break
            seq = f.readline().strip()
            f.readline()
            f.readline()
            names.append(h.strip()[1:].split()[0])
            seqs.append(seq)
    return names, seqs
