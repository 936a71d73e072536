"""
Variant catalog: diff every allele of a gene MSA against its BACKBONE.

The reference encodes the same information across ten HISAT2 sidecar files
(.snp/.link/.haplotype/..., graphkir/msa2hisat.py:197-306) and re-parses them
at alignment time (graphkir/hisat2.py:121-203).  Here the catalog is built
once, in memory, as numpy-friendly records.

Because the BACKBONE is a gap-free consensus over every MSA column
(reference kir_msa.py:58, asserted at msa2hisat.py:348-350), MSA columns and
backbone coordinates coincide and the catalog contains only ``single`` (SNP)
and ``deletion`` variants — never insertions.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable

import numpy as np

from ..msa.genemsa import Genemsa

_TYPE_ORDER = {"insertion": 0, "single": 1, "deletion": 2, "match": 3}
MIN_FREQ_THRESHOLD = 0.1  # SNPs rarer than this are left out of the
#                           alignment graph (reference msa2hisat.py:31,336)


@dataclass
class Variant:
    """One known (or novel) variant on a gene backbone.

    Mirrors the semantics of reference msa2hisat.py:15-63: equality/hash on
    (pos, ref, typ, val); ordering by (ref, pos, type-rank, val).
    """

    pos: int
    typ: str                      # "single" | "deletion" | "insertion" | "match"
    ref: str                      # backbone name, e.g. KIR2DL1*BACKBONE
    val: None | int | str = None  # alt base / deletion length / inserted seq
    id: None | str = None         # hv{n} catalog id or nv{n} novel id
    length: int = 0
    allele: list[str] = field(default_factory=list)
    freq: None | float = None
    ignore: bool = False          # excluded from the alignment graph
    in_exon: bool = False

    def sortKey(self) -> tuple:
        # Type-stable val key: deletion lengths stay numeric so same-position
        # deletions order 2 < 10 (the reference compares val natively; only
        # same-type variants ever reach the val comparison).
        if self.val is None:
            vkey: tuple = (0, 0, "")
        elif isinstance(self.val, int):
            vkey = (1, self.val, "")
        else:
            vkey = (2, 0, str(self.val))
        return (self.ref, self.pos, _TYPE_ORDER[self.typ], vkey)

    def __lt__(self, other: "Variant") -> bool:
        return self.sortKey() < other.sortKey()

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, Variant):
            return NotImplemented
        return (self.pos, self.ref, self.typ, self.val) == (
            other.pos,
            other.ref,
            other.typ,
            other.val,
        )

    def __hash__(self) -> int:
        return hash((self.pos, self.ref, self.typ, self.val))


class IdAllocator:
    """Monotone id factory for hv/ht/nv ids.

    The reference keeps these as mutable ClassVar counters on Variant
    (msa2hisat.py:36-37) — flagged as a shared-state footgun in SURVEY §5;
    here they are explicit instances threaded through the build.
    """

    def __init__(self) -> None:
        self.variant = 0
        self.haplo = 0
        self.novel = 0

    def nextVariant(self) -> str:
        self.variant += 1
        return f"hv{self.variant - 1}"

    def nextNovel(self) -> str:
        self.novel += 1
        return f"nv{self.novel - 1}"


def diffAlleleVsBackbone(ref_seq: str, allele_seq: str, ref_name: str) -> list[Variant]:
    """Variants of one allele against the (gap-free) backbone.

    Vectorised re-formulation of reference msa2hisat.py:81-113: SNP where
    both have bases that differ; deletion runs where the allele is gapped.
    Adjacent deletion columns merge into one variant; a SNP column never
    merges with anything.
    """
    a = np.frombuffer(ref_seq.encode(), dtype=np.uint8)
    b = np.frombuffer(allele_seq.encode(), dtype=np.uint8)
    assert len(a) == len(b)
    gap = ord("-")
    is_del = b == gap
    is_snp = (~is_del) & (a != b)

    variants: list[Variant] = []
    for pos in np.nonzero(is_snp)[0]:
        variants.append(
            Variant(typ="single", pos=int(pos), val=chr(b[pos]), ref=ref_name)
        )
    # deletion run starts/lengths
    if is_del.any():
        padded = np.concatenate([[False], is_del, [False]])
        starts = np.nonzero(padded[1:] & ~padded[:-1])[0]
        ends = np.nonzero(~padded[1:] & padded[:-1])[0]
        for s, e in zip(starts, ends):
            variants.append(
                Variant(typ="deletion", pos=int(s), val=int(e - s), ref=ref_name)
            )
    variants.sort()
    return variants


def isInExon(exons: list[tuple[int, int]], variant: Variant) -> bool:
    """Exon membership incl. the deletion-from-the-left rule
    (reference hisat2.py:206-225, off-by-ones preserved for parity)."""
    for start, end in exons:
        if start <= variant.pos < end:
            return True
        if (
            variant.typ == "deletion"
            and variant.pos < start
            and variant.pos + int(variant.val) >= start  # type: ignore[arg-type]
        ):
            return True
    return False


def exonIntervals(msa: Genemsa) -> list[tuple[int, int]]:
    """[start, end) column intervals of exon blocks."""
    out = []
    for b in msa.list_blocks():
        if b.type == "exon":
            out.append(msa.get_block_interval(b.name))
    return out


def msaToVariants(
    msa: Genemsa, ids: IdAllocator
) -> tuple[list[Variant], dict[str, list[Variant]]]:
    """Full catalog for one gene MSA.

    Returns the unique sorted variants (with allele links, frequency, ignore
    flag, exon flag, hv ids) and the per-allele variant lists.
    Equivalent information to reference msa2hisat.py:116-189.
    """
    ref_name, ref_seq = msa.get_reference()
    assert set(ref_seq) <= set("ACGT"), "backbone must be gap-free"

    per_allele: dict[str, list[Variant]] = {}
    for allele_name, allele_seq in msa.items():
        if allele_name == ref_name:
            continue
        per_allele[allele_name] = diffAlleleVsBackbone(ref_seq, allele_seq, ref_name)

    uniq: dict[Variant, Variant] = {}
    for allele_name, vs in per_allele.items():
        for v in vs:
            if v not in uniq:
                uniq[v] = v
            uniq[v].allele.append(allele_name)

    variants = sorted(uniq.values())

    # allele frequency per variant from MSA column counts
    counts = np.array(msa.calculate_frequency()).reshape(-1, 5)  # [col, ACGT-]
    base_index = {c: i for i, c in enumerate("ACGT-")}
    totals = counts.sum(axis=1)
    for v in variants:
        base = "-" if v.typ == "deletion" else str(v.val)[0]
        v.freq = float(counts[v.pos, base_index[base]] / max(totals[v.pos], 1))
        v.ignore = v.typ == "single" and v.freq < MIN_FREQ_THRESHOLD

    exons = exonIntervals(msa)
    for v in variants:
        v.in_exon = isInExon(exons, v)
        v.id = ids.nextVariant()

    # per-allele lists now point at the canonical objects
    for allele_name in per_allele:
        per_allele[allele_name] = [uniq[v] for v in per_allele[allele_name]]
    return variants, per_allele


def groupVariantsByGene(variants: Iterable[Variant]) -> dict[str, list[Variant]]:
    out: dict[str, list[Variant]] = {}
    for v in variants:
        out.setdefault(v.ref, []).append(v)
    return out
