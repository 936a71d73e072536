"""
Synthetic KIR-like allele database generator.

The reference validates itself against simulated cohorts with known answers
(research/kg_create_data.py:147-174 samples haplotype pairs + random alleles;
art_illumina makes the reads).  With no network access to IPD-KIR, this
module manufactures a structurally KIR-like database — homologous genes,
allele families sharing variant backbones, SNPs + multi-base deletions,
exon/intron block structure — that drives every end-to-end test.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..msa.genemsa import Block, Genemsa, blockTypeFromName

BASES = "ACGT"


@dataclass
class SynthConfig:
    n_genes: int = 4
    n_alleles_per_gene: int = 12
    gene_length: int = 4000          # MSA columns per gene
    n_exons: int = 5
    gene_divergence: float = 0.04    # fraction of columns differing between genes
    n_snp_sites: int = 60            # catalogued SNP sites per gene
    n_del_sites: int = 3             # catalogued deletion sites per gene
    max_del_len: int = 12
    n_families: int = 4              # 3-digit allele families per gene
    seed: int = 0
    gene_prefix: str = "KIRS"        # used only past the named-gene list
    # real-IPD-scale knobs (all default OFF so the base RNG stream — and
    # every committed truth built on it — is unchanged):
    # per-gene MSA length drawn uniformly from this range (real KIR genes
    # span ~4-16 kb, e.g. 3DL3 vs 2DL4)
    gene_length_range: tuple[int, int] | None = None
    # kb-scale structural deletions per gene (the 2DS4/3DP1-style exon
    # dropouts); each creates a spliced pseudo-reference in the index
    n_long_del_sites: int = 0
    long_del_range: tuple[int, int] = (800, 1500)


def _randomSeq(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(0, 4, size=n, dtype=np.int8)


def _mutate(rng: np.random.Generator, seq: np.ndarray, rate: float) -> np.ndarray:
    out = seq.copy()
    idx = np.nonzero(rng.random(len(seq)) < rate)[0]
    out[idx] = (out[idx] + rng.integers(1, 4, size=len(idx))) % 4
    return out


def _blocks(cfg: SynthConfig) -> list[Block]:
    """5UTR, exon1, intron1, ..., exonN, 3UTR with plausible length split."""
    names = ["5UTR"]
    for i in range(1, cfg.n_exons):
        names += [f"exon{i}", f"intron{i}"]
    names += [f"exon{cfg.n_exons}", "3UTR"]
    n = len(names)
    # exons shorter than introns/UTRs, everything sums to gene_length
    weights = np.array([1.0 if nm.startswith("exon") else 2.5 for nm in names])
    lengths = np.floor(weights / weights.sum() * cfg.gene_length).astype(int)
    lengths[-1] += cfg.gene_length - lengths.sum()
    return [Block(nm, blockTypeFromName(nm), int(l)) for nm, l in zip(names, lengths)]


def makeSyntheticDB(cfg: SynthConfig | None = None) -> dict[str, Genemsa]:
    """Build {gene: MSA} with a BACKBONE consensus reference per gene.

    Allele naming follows IPD-KIR style 7-digit fields:
    ``{prefix}{g}*{fff}{ss}{xx}`` (family / synonymous / extra digits) so the
    3/5/7-digit resolution helpers behave like they do on real names.
    """
    import dataclasses

    cfg = cfg or SynthConfig()
    rng = np.random.Generator(np.random.Philox(cfg.seed))
    gene_lengths = None
    if cfg.gene_length_range is not None:
        lo_l, hi_l = cfg.gene_length_range
        gene_lengths = rng.integers(lo_l, hi_l + 1, size=cfg.n_genes)
        # KIR2DL5A/B (roster slots 15/16) share one MSA in real IPD —
        # their column spaces must match for the combined KIR2DL5 file
        # (ipd_checkout.writeIpdCheckout)
        if cfg.n_genes >= 17:
            gene_lengths[16] = gene_lengths[15]
        # KIR2DL1/KIR2DS1 (slots 1/7) are full-length homologs in real
        # IPD — the ab_2dl1s1 merge (reference kir_msa.py) relies on it:
        # a length mismatch leaves the merged backbone only partially
        # covered, diluting p75 depth (CN) and splitting typing evidence
        if cfg.n_genes >= 8:
            gene_lengths[7] = gene_lengths[1]
        ancestor = _randomSeq(rng, int(hi_l))
    else:
        ancestor = _randomSeq(rng, cfg.gene_length)
    blocks = _blocks(cfg)

    # KIR3DL3 first: the framework gene anchors the CN model's diploid
    # assumption exactly like the real pipeline (kir_cn.py:87-108)
    named = [
        "KIR3DL3", "KIR2DL1", "KIR2DL4", "KIR3DL2", "KIR2DS4", "KIR2DL3",
        "KIR3DL1", "KIR2DS1", "KIR2DL2", "KIR2DS2", "KIR2DP1", "KIR3DP1",
        "KIR2DS3", "KIR2DS5", "KIR3DS1",
        # positions 15/16: the 2DL5A/B pair so n_genes=17 reproduces the
        # real ab-merge roster (reference kir_msa.py merge modes)
        "KIR2DL5A", "KIR2DL5B",
    ]
    genes: dict[str, Genemsa] = {}
    for g in range(cfg.n_genes):
        if g < len(named):
            gene_name = named[g]
        else:
            gene_name = f"{cfg.gene_prefix}{g + 1}DL{g + 1}"
        if gene_lengths is not None:
            L_g = int(gene_lengths[g])
            g_blocks = _blocks(dataclasses.replace(cfg, gene_length=L_g))
            base = _mutate(rng, ancestor[:L_g], cfg.gene_divergence)
        else:
            L_g = cfg.gene_length
            g_blocks = blocks
            base = _mutate(rng, ancestor, cfg.gene_divergence)

        # catalogued variant sites for this gene
        snp_pos = rng.choice(L_g, size=cfg.n_snp_sites, replace=False)
        snp_alt = (base[snp_pos] + rng.integers(1, 4, size=cfg.n_snp_sites)) % 4
        del_pos = rng.choice(
            L_g - cfg.max_del_len - 1, size=cfg.n_del_sites, replace=False
        )
        del_len = rng.integers(2, cfg.max_del_len + 1, size=cfg.n_del_sites)

        # kb-scale structural deletions: mutually disjoint, away from the
        # gene edges, carried by a minority of families
        long_pos = np.zeros(0, dtype=np.int64)
        long_len = np.zeros(0, dtype=np.int64)
        if cfg.n_long_del_sites:
            llo, lhi = cfg.long_del_range
            lhi = max(min(lhi, L_g // 4), 32)
            llo = min(llo, lhi - 1)
            want_len = rng.integers(llo, lhi + 1, size=cfg.n_long_del_sites)
            placed: list[tuple[int, int]] = []  # (pos, len) pairs
            for d in range(cfg.n_long_del_sites):
                for _ in range(100):
                    pos = int(rng.integers(200, L_g - want_len[d] - 200))
                    if all(
                        pos + want_len[d] + 100 < q or ql + q + 100 < pos
                        for q, ql in placed
                    ):
                        placed.append((pos, int(want_len[d])))
                        break
                # all 100 attempts overlapped an existing site: place
                # FEWER deletions rather than an overlapping one (two
                # overlapping '-' runs would merge into a single longer
                # deletion no pseudo-reference matches)
            long_pos = np.array([p for p, _ in placed], dtype=np.int64)
            long_len = np.array([l for _, l in placed], dtype=np.int64)

        # allele families: each family owns a subset of sites; alleles within
        # a family toggle a couple of extra "synonymous" sites
        fam_patterns = rng.random((cfg.n_families, cfg.n_snp_sites)) < 0.35
        fam_del = rng.random((cfg.n_families, cfg.n_del_sites)) < 0.3
        fam_long = (
            rng.random((cfg.n_families, cfg.n_long_del_sites)) < 0.25
            if cfg.n_long_del_sites else None
        )

        msa = Genemsa(gene_name=gene_name, blocks=[Block(b.name, b.type, b.length) for b in g_blocks])
        seen_signatures: set[bytes] = set()
        for a in range(cfg.n_alleles_per_gene):
            fam = a % cfg.n_families
            sub = a // cfg.n_families
            # per-allele private SNPs; re-draw until the variant signature
            # is unique (IPD alleles are distinct sequences by definition)
            while True:
                snp_mask = fam_patterns[fam].copy()
                priv = rng.choice(cfg.n_snp_sites, size=2, replace=False)
                snp_mask[priv] = ~snp_mask[priv]
                sig = snp_mask.tobytes() + fam_del[fam].tobytes()
                if fam_long is not None:
                    sig += fam_long[fam].tobytes()
                if sig not in seen_signatures:
                    seen_signatures.add(sig)
                    break
            seq = base.copy()
            seq[snp_pos[snp_mask]] = snp_alt[snp_mask]
            chars = np.frombuffer(
                "".join(BASES[c] for c in seq).encode(), dtype=np.uint8
            ).copy()
            for d in range(cfg.n_del_sites):
                if fam_del[fam, d]:
                    chars[del_pos[d] : del_pos[d] + del_len[d]] = ord("-")
            if fam_long is not None:
                for d in range(len(long_pos)):
                    if fam_long[fam, d]:
                        chars[long_pos[d] : long_pos[d] + long_len[d]] = ord("-")
            name = f"{gene_name}*{fam + 1:03d}{sub + 1:02d}{rng.integers(1, 10):02d}"
            # ensure uniqueness of names
            while name in msa.alleles:
                name = name[:-2] + f"{rng.integers(10, 99):02d}"
            msa.append(name, chars.tobytes().decode())

        # a column deleted in EVERY allele has no ACGT vote and would put an
        # 'E' into the backbone — drop such columns first (real MSAs are
        # shrunk the same way before msa2hisat consumes them)
        msa = msa.shrink()
        backbone = f"{gene_name}*BACKBONE"
        msa.append(backbone, msa.get_consensus(include_gap=False))
        msa.set_reference(backbone)
        genes[gene_name] = msa
    return genes


def alleleUngappedSeq(msa: Genemsa, allele: str) -> str:
    return msa.get(allele).replace("-", "").replace("E", "")
