"""
Render a synthetic allele DB as an IPD-KIR repository checkout.

The reference ingests IPD-KIR via pyhlamsa (kir_msa.py:66-80 downloads the
ANHIG/IPDKIR github branch); this build is offline, so parity tests instead
render `makeSyntheticDB` output into the same on-disk layout our reader
(msa/ipd.py) — and the real checkout — uses:

  {db}/msf/{gene}_gen.msf   full-length genomic alignments (GCG MSF)
  {db}/msf/{gene}_nuc.msf   exon-only (CDS) alignments
  {db}/gff/{gene}.gff       exon/intron/UTR block annotation

Faithful quirks reproduced here:
  * KIR2DL5A/B live in ONE combined KIR2DL5 file (pre-2.12 IPD layout) —
    the `ab` merge modes rely on that.
  * exon-only alleles appear in the nuc file only; the gen file omits them
    (msa/ipd.py gives them `E` introns, cds_intron fills + `e`-suffixes).
  * MSF gaps are '.', interleaved 50-column blocks with ruler lines.
"""
from __future__ import annotations

import os

from ..msa.genemsa import Genemsa


def _msfLines(seqs: dict[str, str], width: int = 50) -> list[str]:
    """GCG MSF: header, per-name Name: lines, '//', interleaved blocks."""
    length = len(next(iter(seqs.values())))
    lines = ["PileUp", "", f"   MSF: {length}  Type: N  Check: 0  ..", ""]
    for name in seqs:
        lines.append(f" Name: {name:<30s} Len: {length}  Check: 0  Weight: 1.00")
    lines += ["", "//", ""]
    for start in range(0, length, width):
        lines.append(f"{'':>20s}{start + 1}")
        for name, seq in seqs.items():
            chunk = seq[start : start + width].replace("-", ".")
            lines.append(f"{name:<20s} {chunk}")
        lines.append("")
    return lines


def writeMsf(path: str, seqs: dict[str, str], width: int = 50) -> None:
    with open(path, "w") as f:
        f.write("\n".join(_msfLines(seqs, width)) + "\n")


def writeGff(path: str, msa: Genemsa) -> None:
    """Block table -> gff3 (1-based inclusive alignment coordinates)."""
    type_of = {
        "five_prime_UTR": "five_prime_UTR",
        "three_prime_UTR": "three_prime_UTR",
        "exon": "exon",
        "intron": "intron",
    }
    with open(path, "w") as f:
        f.write("##gff-version 3\n")
        pos = 1
        for b in msa.blocks:
            typ = type_of.get(b.type, b.type)
            f.write(
                f"{msa.gene_name}\tsynth\t{typ}\t{pos}\t{pos + b.length - 1}"
                f"\t.\t+\t.\tID={b.name}\n"
            )
            pos += b.length


def exonConcatSeq(msa: Genemsa, name: str) -> str:
    """The allele's exon columns, concatenated (a nuc-alignment row)."""
    out = []
    for b in msa.blocks:
        if b.type == "exon":
            s, e = msa.get_block_interval(b.name)
            out.append(msa.get(name)[s:e])
    return "".join(out)


def writeIpdCheckout(
    genes: dict[str, Genemsa],
    db_path: str,
    exon_only: dict[str, list[str]] | None = None,
) -> None:
    """Render {gene: MSA} into an IPD-KIR checkout at db_path.

    exon_only: per-gene allele names to WITHHOLD from the gen alignment
    (they appear in the nuc alignment only, like real nuc-only IPD
    entries).  Backbone rows are never written — real IPD has none.
    """
    exon_only = exon_only or {}
    os.makedirs(os.path.join(db_path, "msf"), exist_ok=True)
    os.makedirs(os.path.join(db_path, "gff"), exist_ok=True)

    # combined KIR2DL5 file (pre-2.12 layout)
    merged: dict[str, Genemsa] = {}
    if "KIR2DL5A" in genes and "KIR2DL5B" in genes:
        a, b = genes["KIR2DL5A"], genes["KIR2DL5B"]
        assert a.get_length() == b.get_length(), "2DL5A/B column spaces differ"
        comb = Genemsa(gene_name="KIR2DL5", blocks=list(a.blocks))
        for src in (a, b):
            for name, seq in src.alleles.items():
                if not name.endswith("*BACKBONE"):
                    comb.append(name, seq)
        merged["KIR2DL5"] = comb
        eo = exon_only.get("KIR2DL5A", []) + exon_only.get("KIR2DL5B", [])
        if eo:
            exon_only = dict(exon_only)
            exon_only["KIR2DL5"] = eo

    out_genes = {
        g: msa for g, msa in genes.items() if g not in ("KIR2DL5A", "KIR2DL5B")
    }
    out_genes.update(merged)

    for gene, msa in out_genes.items():
        hide = set(exon_only.get(gene, []))
        gen_seqs = {
            n: s
            for n, s in msa.alleles.items()
            if not n.endswith("*BACKBONE") and n not in hide
        }
        nuc_seqs = {
            n: exonConcatSeq(msa, n)
            for n in msa.alleles
            if not n.endswith("*BACKBONE")
        }
        assert gen_seqs, f"{gene}: every allele is exon-only"
        writeMsf(os.path.join(db_path, "msf", f"{gene}_gen.msf"), gen_seqs)
        writeMsf(os.path.join(db_path, "msf", f"{gene}_nuc.msf"), nuc_seqs)
        writeGff(os.path.join(db_path, "gff", f"{gene}.gff"), msa)
