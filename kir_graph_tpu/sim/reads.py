"""
Deterministic paired-end read simulator (art_illumina stand-in).

Reference fixture generation: research/kg_create_data.py:96-144 runs
art_illumina at 30x / 2x150bp with a truth SAM.  This simulator reproduces
the workload shape (fragment-sampled FR pairs, per-base error, known truth)
without the external binary, and is fully seeded.
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
) -> SimReads:
    """Sample FR pairs at the given depth from each (copy of each) allele."""
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
            fwd = _addErrors(rng, fwd, error_rate)
            rev = _addErrors(rng, rev, error_rate)
            # random mate order (which physical read is read1)
            if rng.random() < 0.5:
                a, b = fwd, rev
            else:
                a, b = rev, fwd
            out.r1.append(a)
            out.r2.append(b)
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


def writeFastq(path: str, names: list[str], seqs: list[str]) -> None:
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt") as f:
        for name, seq in zip(names, seqs):
            f.write(f"@{name}\n{seq}\n+\n{'I' * len(seq)}\n")


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
