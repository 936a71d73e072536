"""
HISAT2-genotype sidecar-format export.

The reference compiles its index into ten HISAT2 files
(msa2hisat.py:197-306: _backbone.fa, _sequences.fa, .allele, .partial,
.locus, .snp, .index.snp, .snp.freq, .link, .haplotype).  This framework's
index is arrays, but exporting the same formats lets users diff our
variant catalog against a reference-built index, or feed hisat2-build for
cross-validation.
"""
from __future__ import annotations

from ..msa.genemsa import Genemsa
from ..utils import logger
from .variants import Variant, msaToVariants, IdAllocator


def _writeTsv(f, row) -> None:
    f.write("\t".join(map(str, row)) + "\n")


def exportHisatFormat(genes: dict[str, Genemsa], index_prefix: str) -> None:
    """Write the ten-file HISAT2-genotype layout for all gene MSAs."""
    ext = [
        ".snp", ".index.snp", ".snp.freq", ".link", "_backbone.fa",
        "_sequences.fa", ".allele", ".partial", ".locus", ".haplotype",
    ]
    for e in ext:
        open(index_prefix + e, "w").close()

    ids = IdAllocator()
    haplo_id = 0
    for gene in sorted(genes):
        msa = genes[gene]
        ref_name, ref_seq = msa.get_reference()
        variants, per_allele = msaToVariants(msa, ids)

        # sequences + allele names
        with open(index_prefix + "_backbone.fa", "a") as f:
            writeFastaInto(f, [(ref_name, ref_seq.replace("-", ""))])
        with open(index_prefix + "_sequences.fa", "a") as f:
            writeFastaInto(
                f,
                [
                    (n, s.replace("-", "").replace("E", ""))
                    for n, s in msa.items()
                    if n != ref_name
                ],
            )
        with open(index_prefix + ".allele", "a") as f:
            for n in msa.get_sequence_names():
                if n != ref_name:
                    f.write(n + "\n")

        # locus: exon intervals, 1-based (msa2hisat.py:237-246)
        with open(index_prefix + ".locus", "a") as f:
            exons = []
            for b in msa.list_blocks():
                if b.type == "exon":
                    s, e = msa.get_block_interval(b.name)
                    exons.append((s + 1, e + 1))
            exon_str = " ".join(f"{s}-{e}" for s, e in exons)
            L = msa.get_length()
            _writeTsv(f, [ref_name, ref_name, 0, L, L, exon_str, "+"])

        # variants (all in .snp, non-ignored in .index.snp)
        with open(index_prefix + ".snp", "a") as fs, open(
            index_prefix + ".index.snp", "a"
        ) as fi, open(index_prefix + ".snp.freq", "a") as ff, open(
            index_prefix + ".link", "a"
        ) as fl:
            for v in variants:
                row = [v.id, v.typ, v.ref, v.pos, v.val]
                _writeTsv(fs, row)
                if not v.ignore:
                    _writeTsv(fi, row)
                _writeTsv(ff, [v.id, f"{v.freq:.2f}"])
                _writeTsv(fl, [v.id, " ".join(v.allele)])

        # haplotypes: per-allele non-ignored variant chains
        with open(index_prefix + ".haplotype", "a") as f:
            for allele_variants in per_allele.values():
                vs = [v for v in allele_variants if not v.ignore]
                if not vs:
                    continue
                left = min(v.pos for v in vs)
                right = max(
                    v.pos + int(v.val) - 1 if v.typ == "deletion" else v.pos
                    for v in vs
                )
                _writeTsv(
                    f,
                    [
                        f"ht{haplo_id}",
                        vs[0].ref,
                        left,
                        right,
                        ",".join(str(v.id) for v in vs),
                    ],
                )
                haplo_id += 1
    logger.info(f"[Index] HISAT2-format export at {index_prefix}.*")


def writeFastaInto(f, records, width: int = 60) -> None:
    for name, seq in records:
        f.write(f">{name}\n")
        for i in range(0, len(seq), width):
            f.write(seq[i : i + width] + "\n")
