"""
KirIndex: the HBM-resident graph index.

Replaces the HISAT2 `.ht2` FM-index + ten sidecar files
(reference msa2hisat.py:197-377, hisat2.py:121-203) with dense arrays:

* ``backbone[G, Lmax]``  int8 bases (0..3, pad 4)
* ``alt_mask[G, Lmax]``  uint8 bitmask of catalogued (non-ignored) SNP alts
* ``del_ok[G, Lmax]``    bool, column lies inside a catalogued deletion
* ``exon_mask[G, Lmax]`` bool
* per-gene variant tables + variant x allele membership matrices
* a sorted k-mer seed table built from **every allele sequence** in backbone
  coordinates, so seeding stays exact for any catalogued haplotype.
"""
from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np

from ..msa.genemsa import Genemsa, readFromMSAs
from ..utils import logger
from .variants import IdAllocator, Variant, exonIntervals, msaToVariants

BASE_A, BASE_C, BASE_G, BASE_T, BASE_PAD = 0, 1, 2, 3, 4
_ENCODE = np.full(256, BASE_PAD, dtype=np.int8)
for _i, _c in enumerate("ACGT"):
    _ENCODE[ord(_c)] = _i
    _ENCODE[ord(_c.lower())] = _i

DEFAULT_KMER = 24

# k-mer hash mixing constants (shared with align/seeding.py — the device
# computes the identical uint32 arithmetic)
KMER_MIX1 = np.uint32(2654435761)
KMER_MIX2 = np.uint32(0x85EBCA6B)


def hashKmerWindows(window: np.ndarray) -> np.ndarray:
    """[n, k] base codes -> [n] uint32 hash: pack each half into 2k bits,
    multiply-mix, xor.  k must be even and <= 32."""
    k = window.shape[1]
    assert k % 2 == 0 and k <= 32
    h = k // 2
    w = window.astype(np.uint32)
    shifts_hi = (2 * np.arange(h - 1, -1, -1)).astype(np.uint32)
    hi = (w[:, :h] << shifts_hi).sum(axis=1, dtype=np.uint32)
    lo = (w[:, h:] << shifts_hi).sum(axis=1, dtype=np.uint32)
    return (hi * KMER_MIX1) ^ (lo * KMER_MIX2)


def canonHashKmerWindows(window: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """[n, k] base codes -> (keys [n] uint32, flip [n] bool): hash of the
    CANONICAL k-mer (min of forward and reverse-complement as a 2k-bit
    value); flip marks windows whose canonical form is the revcomp.

    Canonical seeding lets queries seed only the forward read strand —
    orientation is recovered per hit (query_flip ^ posting_flip), halving
    the device seed/score stream count."""
    k = window.shape[1]
    assert k % 2 == 0 and k <= 32
    h = k // 2
    w = window.astype(np.uint64)
    shifts = (2 * np.arange(k - 1, -1, -1)).astype(np.uint64)
    fwd = (w << shifts).sum(axis=1, dtype=np.uint64)
    rc_w = (3 - w)[:, ::-1]
    rc = (rc_w << shifts).sum(axis=1, dtype=np.uint64)
    flip = rc < fwd
    canon = np.where(flip, rc, fwd)
    hi = (canon >> np.uint64(k)).astype(np.uint32)
    lo = (canon & np.uint64((1 << k) - 1)).astype(np.uint32)
    return (hi * KMER_MIX1) ^ (lo * KMER_MIX2), flip


def encodeSeq(seq: str) -> np.ndarray:
    """ASCII sequence -> int8 codes (A0 C1 G2 T3, everything else 4)."""
    return _ENCODE[np.frombuffer(seq.encode(), dtype=np.uint8)]


def decodeSeq(codes: np.ndarray) -> str:
    return "".join("ACGTN"[c] for c in codes)


@dataclass
class GeneIndex:
    """Per-gene slice of the index (host-side, numpy)."""

    name: str                      # backbone name, e.g. KIR2DL1*BACKBONE
    seq: np.ndarray                # [L] int8
    exons: list[tuple[int, int]]
    alleles: list[str]             # sorted allele names (no backbone)
    variants: list[Variant]        # sorted catalog
    membership: np.ndarray         # [V, A] bool: allele carries variant
    var_pos: np.ndarray            # [V] int32
    var_is_del: np.ndarray         # [V] bool
    var_val: np.ndarray            # [V] int32 (SNP alt code / deletion len)
    var_ignore: np.ndarray         # [V] bool
    var_in_exon: np.ndarray        # [V] bool
    allele_seq_gapped: dict[str, str] = field(default_factory=dict)

    @property
    def length(self) -> int:
        return len(self.seq)

    def exonMask(self) -> np.ndarray:
        m = np.zeros(self.length, dtype=bool)
        for s, e in self.exons:
            m[s:e] = True
        return m

    def altMask(self, include_ignored: bool = False) -> np.ndarray:
        """uint8 per column: bit b set iff SNP alt base b is catalogued."""
        m = np.zeros(self.length, dtype=np.uint8)
        snp = ~self.var_is_del
        if not include_ignored:
            snp &= ~self.var_ignore
        np.bitwise_or.at(m, self.var_pos[snp], (1 << self.var_val[snp]).astype(np.uint8))
        return m

    def delOkMask(self) -> np.ndarray:
        m = np.zeros(self.length, dtype=bool)
        for p, l in zip(self.var_pos[self.var_is_del], self.var_val[self.var_is_del]):
            m[p : p + l] = True
        return m


LONG_DEL_THRESHOLD = 24  # catalogued deletions longer than this get a
#                          spliced pseudo-reference so junction-spanning
#                          reads align end-to-end (the DP band is 48)


@dataclass
class KirIndex:
    """Whole-index container: per-gene tables + padded aligner arrays.

    Rows [0, G) of the padded arrays are the true backbones; rows [G, G+P)
    are spliced pseudo-references — the backbone with one long catalogued
    deletion excised.  `pseudo_refs[p] = (true_gene_row, del_pos, del_len)`
    maps pseudo row G+p back to true coordinates (cols >= del_pos shift by
    +del_len), turning a pseudo placement into the true placement plus a
    known-deletion gap that the annotator recognises from the catalog.
    """

    genes: dict[str, GeneIndex]
    kmer: int = DEFAULT_KMER

    # padded arrays (built by finalize)
    gene_names: list[str] = field(default_factory=list)
    backbone: np.ndarray | None = None   # [G+P, Lmax] int8
    lengths: np.ndarray | None = None    # [G+P] int32
    alt_mask: np.ndarray | None = None   # [G+P, Lmax] uint8
    del_ok: np.ndarray | None = None     # [G+P, Lmax] bool
    exon_mask: np.ndarray | None = None  # [G, Lmax] bool
    pseudo_refs: list[tuple[int, int, int]] = field(default_factory=list)

    # k-mer table (32-bit hashed keys: TPU has no 64-bit integer path, so
    # the k-mer is split into two 12-base halves and mixed; rare hash
    # collisions only add spurious seed votes, which the DP pass rejects)
    kmer_keys: np.ndarray | None = None      # [U] uint32 sorted hashes
    kmer_start: np.ndarray | None = None     # [U+1] int32 posting offsets
    kmer_gene: np.ndarray | None = None      # [P] int32
    kmer_pos: np.ndarray | None = None       # [P] int32
    kmer_flip: np.ndarray | None = None      # [P] bool (canonical = revcomp)

    def finalize(self, build_kmers: bool = True) -> "KirIndex":
        self.gene_names = sorted(self.genes)
        G = len(self.gene_names)
        Lmax = max(g.length for g in self.genes.values())

        # collect long catalogued deletions -> one pseudo-reference each
        self.pseudo_refs = []
        for gi, name in enumerate(self.gene_names):
            g = self.genes[name]
            for vi in np.nonzero(g.var_is_del)[0]:
                dlen = int(g.var_val[vi])
                if dlen > LONG_DEL_THRESHOLD:
                    self.pseudo_refs.append((gi, int(g.var_pos[vi]), dlen))
        P = len(self.pseudo_refs)

        self.backbone = np.full((G + P, Lmax), BASE_PAD, dtype=np.int8)
        self.alt_mask = np.zeros((G + P, Lmax), dtype=np.uint8)
        self.del_ok = np.zeros((G + P, Lmax), dtype=bool)
        self.exon_mask = np.zeros((G, Lmax), dtype=bool)
        self.lengths = np.zeros(G + P, dtype=np.int32)
        for i, name in enumerate(self.gene_names):
            g = self.genes[name]
            L = g.length
            self.backbone[i, :L] = g.seq
            self.alt_mask[i, :L] = g.altMask()
            self.del_ok[i, :L] = g.delOkMask()
            self.exon_mask[i, :L] = g.exonMask()
            self.lengths[i] = L
        for p, (gi, pos, dlen) in enumerate(self.pseudo_refs):
            L = int(self.lengths[gi])
            row = G + p
            Lp = L - dlen
            spliced = np.concatenate(
                [self.backbone[gi, :pos], self.backbone[gi, pos + dlen : L]]
            )
            self.backbone[row, :Lp] = spliced
            self.alt_mask[row, :Lp] = np.concatenate(
                [self.alt_mask[gi, :pos], self.alt_mask[gi, pos + dlen : L]]
            )
            self.del_ok[row, :Lp] = np.concatenate(
                [self.del_ok[gi, :pos], self.del_ok[gi, pos + dlen : L]]
            )
            self.lengths[row] = Lp
        if build_kmers:
            self.buildKmerTable()
        return self

    @property
    def n_true_genes(self) -> int:
        return len(self.gene_names)

    # ------------------------------------------------------------------
    # k-mer seed table
    # ------------------------------------------------------------------
    def buildKmerTable(self) -> None:
        """Pack k-mers of every allele sequence (in backbone coordinates).

        An allele's gapped MSA row maps each of its bases to a backbone
        column; a k-mer's key position is the column of its first base, so
        a seed hit directly votes (gene, diagonal) even across catalogued
        deletions.  This replaces the graph FM-index seeding of HISAT2.
        """
        k = self.kmer
        assert k <= 31
        G = len(self.gene_names)
        pseudo_by_gene: dict[int, list[tuple[int, int, int]]] = {}
        for p, (tgi, pos, dlen) in enumerate(self.pseudo_refs):
            pseudo_by_gene.setdefault(tgi, []).append((G + p, pos, dlen))

        all_entries = []
        for gi, name in enumerate(self.gene_names):
            g = self.genes[name]
            # (codes, columns, gene_row) triples to index
            seqs: list[tuple[np.ndarray, np.ndarray, int]] = []
            cols = np.arange(g.length)
            seqs.append((g.seq.astype(np.int64), cols, gi))
            for ai, aname in enumerate(g.alleles):
                gapped = g.allele_seq_gapped.get(aname)
                if gapped is None:
                    continue
                codes = encodeSeq(gapped)
                keep = np.frombuffer(gapped.encode(), np.uint8) != ord("-")
                acodes = codes[keep].astype(np.int64)
                acols = np.nonzero(keep)[0]
                # carriers of a long deletion also index their k-mers
                # against each matching spliced pseudo-reference so
                # junction-crossing seeds vote one consistent diagonal
                # (an allele with several long deletions gets one entry
                # per junction)
                routed = False
                for prow, pos, dlen in pseudo_by_gene.get(gi, []):
                    vi = np.nonzero(
                        g.var_is_del & (g.var_pos == pos) & (g.var_val == dlen)
                    )[0]
                    if len(vi) and g.membership[vi[0], ai]:
                        pcols = np.where(acols >= pos + dlen, acols - dlen, acols)
                        seqs.append((acodes, pcols, prow))
                        routed = True
                if not routed:
                    seqs.append((acodes, acols, gi))
            for codes, columns, grow in seqs:
                n = len(codes) - k + 1
                if n <= 0:
                    continue
                window = np.lib.stride_tricks.sliding_window_view(codes, k)
                valid = ~(window >= 4).any(axis=1)
                keys, flip = canonHashKmerWindows(window)
                keys, flip = keys[valid], flip[valid]
                pos = columns[:n][valid].astype(np.int64)
                entry = np.stack(
                    [
                        keys.astype(np.int64), np.full(len(pos), grow), pos,
                        flip.astype(np.int64),
                    ],
                    axis=1,
                )
                all_entries.append(entry)
        if not all_entries:
            self.kmer_keys = np.zeros(0, dtype=np.uint32)
            self.kmer_start = np.zeros(1, dtype=np.int32)
            self.kmer_gene = np.zeros(0, dtype=np.int32)
            self.kmer_pos = np.zeros(0, dtype=np.int32)
            self.kmer_flip = np.zeros(0, dtype=bool)
            return
        entries = np.concatenate(all_entries)
        entries = np.unique(entries, axis=0)  # sorts by (key, gene, pos)
        keys = entries[:, 0]
        uniq_keys, start_idx = np.unique(keys, return_index=True)
        self.kmer_keys = uniq_keys.astype(np.uint32)
        self.kmer_start = np.concatenate(
            [start_idx, [len(keys)]]
        ).astype(np.int32)
        self.kmer_gene = entries[:, 1].astype(np.int32)
        self.kmer_pos = entries[:, 2].astype(np.int32)
        self.kmer_flip = entries[:, 3].astype(bool)
        logger.info(
            f"[Index] kmer table: {len(uniq_keys)} keys, "
            f"{len(entries)} postings (k={self.kmer})"
        )

    # ------------------------------------------------------------------
    # typing-side accessors
    # ------------------------------------------------------------------
    def variantsOfGene(self, gene: str) -> list[Variant]:
        return self.genes[gene].variants

    def allVariants(self) -> list[Variant]:
        out: list[Variant] = []
        for name in self.gene_names:
            out.extend(self.genes[name].variants)
        return out

    def exonRegions(self) -> dict[str, list[tuple[int, int]]]:
        """Equivalent of reference readExons (hisat2.py:137-156)."""
        return {name: list(g.exons) for name, g in self.genes.items()}


def buildGeneIndex(msa: Genemsa, ids: IdAllocator, keep_allele_seqs: bool = True) -> GeneIndex:
    ref_name, ref_seq = msa.get_reference()
    variants, per_allele = msaToVariants(msa, ids)
    alleles = sorted(n for n in msa.get_sequence_names() if n != ref_name)
    a_index = {n: i for i, n in enumerate(alleles)}

    V = len(variants)
    membership = np.zeros((V, len(alleles)), dtype=bool)
    v_index = {v: i for i, v in enumerate(variants)}
    for aname, vs in per_allele.items():
        for v in vs:
            membership[v_index[v], a_index[aname]] = True

    var_pos = np.array([v.pos for v in variants], dtype=np.int32)
    var_is_del = np.array([v.typ == "deletion" for v in variants], dtype=bool)
    var_val = np.array(
        [
            int(v.val) if v.typ == "deletion" else int(encodeSeq(str(v.val))[0])
            for v in variants
        ],
        dtype=np.int32,
    )
    var_ignore = np.array([bool(v.ignore) for v in variants], dtype=bool)
    var_in_exon = np.array([bool(v.in_exon) for v in variants], dtype=bool)

    return GeneIndex(
        name=ref_name,
        seq=encodeSeq(ref_seq),
        exons=exonIntervals(msa),
        alleles=alleles,
        variants=variants,
        membership=membership,
        var_pos=var_pos,
        var_is_del=var_is_del,
        var_val=var_val,
        var_ignore=var_ignore,
        var_in_exon=var_in_exon,
        allele_seq_gapped=(
            {n: msa.get(n) for n in alleles} if keep_allele_seqs else {}
        ),
    )


def buildIndexFromMsa(
    genes: dict[str, Genemsa], kmer: int = DEFAULT_KMER, build_kmers: bool = True
) -> KirIndex:
    """MSA set -> complete index. Gene order (and hv id order) is sorted-name."""
    ids = IdAllocator()
    gene_indexes: dict[str, GeneIndex] = {}
    for gene in sorted(genes):
        gi = buildGeneIndex(genes[gene], ids)
        gene_indexes[gi.name] = gi
        logger.info(
            f"[Index] {gi.name}: L={gi.length} alleles={len(gi.alleles)} "
            f"variants={len(gi.variants)}"
        )
    return KirIndex(genes=gene_indexes, kmer=kmer).finalize(build_kmers=build_kmers)


def buildIndexFromMsaPrefix(prefix: str, kmer: int = DEFAULT_KMER) -> KirIndex:
    return buildIndexFromMsa(readFromMSAs(prefix), kmer=kmer)


# ---------------------------------------------------------------------------
# serialization (npz + json)
# ---------------------------------------------------------------------------

def saveIndex(index: KirIndex, prefix: str) -> None:
    arrays: dict[str, np.ndarray] = {
        "backbone": index.backbone,
        "lengths": index.lengths,
        "alt_mask": index.alt_mask,
        "del_ok": index.del_ok,
        "exon_mask": index.exon_mask,
        "kmer_keys": index.kmer_keys,
        "kmer_start": index.kmer_start,
        "kmer_gene": index.kmer_gene,
        "kmer_pos": index.kmer_pos,
        "kmer_flip": index.kmer_flip,
    }
    meta: dict = {
        "kmer": index.kmer,
        "genes": [],
        "pseudo_refs": [list(p) for p in index.pseudo_refs],
    }
    for name in index.gene_names:
        g = index.genes[name]
        arrays[f"seq_{name}"] = g.seq
        arrays[f"membership_{name}"] = np.packbits(g.membership, axis=1)
        arrays[f"var_pos_{name}"] = g.var_pos
        arrays[f"var_is_del_{name}"] = g.var_is_del
        arrays[f"var_val_{name}"] = g.var_val
        arrays[f"var_ignore_{name}"] = g.var_ignore
        arrays[f"var_in_exon_{name}"] = g.var_in_exon
        meta["genes"].append(
            {
                "name": name,
                "exons": g.exons,
                "alleles": g.alleles,
                "n_variants": len(g.variants),
                "variants": [
                    {
                        "pos": v.pos,
                        "typ": v.typ,
                        "val": v.val,
                        "id": v.id,
                        "freq": v.freq,
                        "ignore": v.ignore,
                        "in_exon": v.in_exon,
                    }
                    for v in g.variants
                ],
            }
        )
    np.savez_compressed(prefix + ".npz", **arrays)
    with open(prefix + ".json", "w") as f:
        json.dump(meta, f)


def loadIndex(prefix: str) -> KirIndex:
    data = np.load(prefix + ".npz")
    with open(prefix + ".json") as f:
        meta = json.load(f)
    genes: dict[str, GeneIndex] = {}
    for gmeta in meta["genes"]:
        name = gmeta["name"]
        n_alleles = len(gmeta["alleles"])
        membership = np.unpackbits(
            data[f"membership_{name}"], axis=1, count=n_alleles
        ).astype(bool)
        variants = []
        for i, vd in enumerate(gmeta["variants"]):
            v = Variant(
                pos=vd["pos"],
                typ=vd["typ"],
                ref=name,
                val=vd["val"],
                id=vd["id"],
                freq=vd["freq"],
                ignore=vd["ignore"],
                in_exon=vd["in_exon"],
            )
            v.allele = [
                gmeta["alleles"][a] for a in np.nonzero(membership[i])[0]
            ]
            variants.append(v)
        genes[name] = GeneIndex(
            name=name,
            seq=data[f"seq_{name}"],
            exons=[tuple(e) for e in gmeta["exons"]],
            alleles=gmeta["alleles"],
            variants=variants,
            membership=membership,
            var_pos=data[f"var_pos_{name}"],
            var_is_del=data[f"var_is_del_{name}"],
            var_val=data[f"var_val_{name}"],
            var_ignore=data[f"var_ignore_{name}"],
            var_in_exon=data[f"var_in_exon_{name}"],
        )
    index = KirIndex(genes=genes, kmer=meta["kmer"])
    index.gene_names = sorted(genes)
    index.pseudo_refs = [tuple(p) for p in meta.get("pseudo_refs", [])]
    index.backbone = data["backbone"]
    index.lengths = data["lengths"]
    index.alt_mask = data["alt_mask"]
    index.del_ok = data["del_ok"]
    index.exon_mask = data["exon_mask"]
    index.kmer_keys = data["kmer_keys"]
    index.kmer_start = data["kmer_start"]
    index.kmer_gene = data["kmer_gene"]
    index.kmer_pos = data["kmer_pos"]
    if "kmer_flip" in data:
        index.kmer_flip = data["kmer_flip"]
    else:
        # pre-canonical save: rebuilding here would index only backbones
        # (allele_seq_gapped is not persisted), silently dropping allele
        # and pseudo-reference junction seeds — demand a real rebuild
        raise ValueError(
            f"{prefix}: index predates canonical k-mer seeding; rebuild it "
            "from the MSA (--msa-prefix or --ipd-db) instead of loading"
        )
    return index
