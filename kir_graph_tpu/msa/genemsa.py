"""
Flat numpy-backed multiple-sequence-alignment container.

This is the in-repo replacement for the external ``pyhlamsa`` dependency the
reference leans on (see /root/reference graphkir/kir_msa.py:11,
msa2hisat.py:9).  Only the API surface actually used by the pipeline is
provided; the implementation is a char-matrix + block table, not a port.

Alphabet: ``A C G T`` bases, ``-`` gap (alignment), ``E`` unknown/incomplete
(used for the un-sequenced introns of exon-only alleles).
"""
from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field
from glob import glob
from typing import Iterable, Iterator

import numpy as np

from ..utils import logger

# Canonical KIR block layout (9 exons): matches reference kir_msa.py:24-44.
KIR_BLOCK_NAMES = [
    "5UTR",
    *[x for i in range(1, 9) for x in (f"exon{i}", f"intron{i}")],
    "exon9",
    "3UTR",
]


def blockTypeFromName(name: str) -> str:
    if name.endswith("UTR"):
        return "five_prime_UTR" if name.startswith("5") else "three_prime_UTR"
    if name.startswith("exon"):
        return "exon"
    if name.startswith("intron"):
        return "intron"
    return "gene_fragment"


@dataclass
class Block:
    """One aligned segment of the MSA (exon / intron / UTR)."""

    name: str
    type: str
    length: int


_BASE_ORDER = "ACGT-"


@dataclass
class Genemsa:
    """A gene's MSA: named gapped sequences of equal length + block table."""

    gene_name: str = ""
    blocks: list[Block] = field(default_factory=list)
    alleles: dict[str, str] = field(default_factory=dict)
    reference: str = ""  # name of reference allele (usually {gene}*BACKBONE)

    # ------------------------------------------------------------------
    # basics
    # ------------------------------------------------------------------
    def get_length(self) -> int:
        if not self.alleles:
            return sum(b.length for b in self.blocks)
        return len(next(iter(self.alleles.values())))

    def get_sequence_names(self) -> list[str]:
        return list(self.alleles.keys())

    def __contains__(self, name: str) -> bool:
        return name in self.alleles

    def __len__(self) -> int:
        return len(self.alleles)

    def get(self, name: str) -> str:
        return self.alleles[name]

    def items(self) -> Iterator[tuple[str, str]]:
        return iter(self.alleles.items())

    def copy(self, copy_allele: bool = True) -> "Genemsa":
        return Genemsa(
            gene_name=self.gene_name,
            blocks=[Block(b.name, b.type, b.length) for b in self.blocks],
            alleles=dict(self.alleles) if copy_allele else {},
            reference=self.reference,
        )

    def append(self, name: str, seq: str) -> "Genemsa":
        if self.alleles and len(seq) != self.get_length():
            raise ValueError(
                f"sequence length {len(seq)} != MSA length {self.get_length()}"
            )
        self.alleles[name] = seq
        return self

    def remove_allele(
        self, names: Iterable[str], inplace: bool = True
    ) -> "Genemsa":
        msa = self if inplace else self.copy()
        for name in list(names):
            msa.alleles.pop(name, None)
        return msa

    def remove(self, name: str) -> "Genemsa":
        return self.remove_allele([name])

    def sort_name(self) -> "Genemsa":
        self.alleles = dict(sorted(self.alleles.items()))
        return self

    def set_reference(self, name: str) -> "Genemsa":
        if name not in self.alleles:
            raise KeyError(name)
        self.reference = name
        return self

    def get_reference(self) -> tuple[str, str]:
        name = self.reference or next(iter(self.alleles))
        return name, self.alleles[name]

    # ------------------------------------------------------------------
    # selection
    # ------------------------------------------------------------------
    def select_allele(self, query: str | list[str]) -> "Genemsa":
        """Select alleles by regex (str) or by explicit name list."""
        if isinstance(query, str):
            pat = re.compile(query)
            names = [n for n in self.alleles if pat.match(n)]
        else:
            names = [n for n in query if n in self.alleles]
        msa = self.copy(copy_allele=False)
        for n in names:
            msa.alleles[n] = self.alleles[n]
        if msa.reference not in msa.alleles:
            msa.reference = names[0] if names else ""
        return msa

    def select_complete(self) -> "Genemsa":
        """Alleles with no unknown (`E`) bases (full-length sequences)."""
        return self.select_allele([n for n, s in self.alleles.items() if "E" not in s])

    def select_incomplete(self) -> "Genemsa":
        """Alleles containing unknown (`E`) bases (exon-only sequences)."""
        return self.select_allele([n for n, s in self.alleles.items() if "E" in s])

    def select_exon(self) -> "Genemsa":
        """Concatenate the exon blocks only."""
        parts = [p for p in self.split_block() if p.blocks[0].type == "exon"]
        return concatMsa(parts)

    # ------------------------------------------------------------------
    # blocks
    # ------------------------------------------------------------------
    def list_blocks(self) -> list[Block]:
        return self.blocks

    def get_block(self, index: int) -> Block:
        return self.blocks[index]

    def get_block_interval(self, block: "Block | str | int") -> tuple[int, int]:
        """Return [start, end) column interval of a block."""
        if isinstance(block, int):
            idx = block
        else:
            name = block.name if isinstance(block, Block) else block
            idx = next(i for i, b in enumerate(self.blocks) if b.name == name)
        start = sum(b.length for b in self.blocks[:idx])
        return start, start + self.blocks[idx].length

    def split_block(self) -> list["Genemsa"]:
        """One sub-MSA per block (sequence slices keep their gaps)."""
        out = []
        pos = 0
        for b in self.blocks:
            sub = Genemsa(
                gene_name=self.gene_name,
                blocks=[Block(b.name, b.type, b.length)],
                reference=self.reference,
            )
            for name, seq in self.alleles.items():
                sub.alleles[name] = seq[pos : pos + b.length]
            if sub.reference not in sub.alleles:
                sub.reference = ""
            out.append(sub)
            pos += b.length
        return out

    def assume_label(self, label_type: str = "gen") -> "Genemsa":
        """Label blocks as 5UTR, exon1, intron1 … exonN, 3UTR by position."""
        n = len(self.blocks)
        if label_type == "gen":
            n_exon = (n - 1) // 2
            names = ["5UTR"]
            for i in range(1, n_exon):
                names += [f"exon{i}", f"intron{i}"]
            names += [f"exon{n_exon}", "3UTR"]
        elif label_type == "nuc":
            names = [f"exon{i + 1}" for i in range(n)]
        else:
            raise NotImplementedError(label_type)
        assert len(names) == n, f"cannot label {n} blocks as {label_type}"
        for b, name in zip(self.blocks, names):
            b.name = name
            b.type = blockTypeFromName(name)
        return self

    # ------------------------------------------------------------------
    # matrix ops
    # ------------------------------------------------------------------
    def toMatrix(self) -> tuple[list[str], np.ndarray]:
        """Names + uint8 char matrix [n_allele, n_col] of the raw characters."""
        names = list(self.alleles.keys())
        if not names:
            return names, np.zeros((0, 0), dtype=np.uint8)
        mat = np.frombuffer(
            "".join(self.alleles[n] for n in names).encode(), dtype=np.uint8
        ).reshape(len(names), self.get_length())
        return names, mat

    def calculate_frequency(self) -> list[list[int]]:
        """Per-column counts in A,C,G,T,- order (`E` is not counted)."""
        _, mat = self.toMatrix()
        counts = []
        for ch in _BASE_ORDER:
            counts.append((mat == ord(ch)).sum(axis=0))
        return np.stack(counts, axis=1).tolist()  # [col][ACGT-]

    def get_consensus(self, include_gap: bool = False) -> str:
        """Column-wise majority base.

        include_gap=False: the most frequent base among A,C,G,T (ties break
        in ACGT order) — used for the ``*BACKBONE`` sequence which must be
        pure ACGT (reference msa2hisat.py:348-350).
        include_gap=True: gap may win the vote.
        """
        _, mat = self.toMatrix()
        order = _BASE_ORDER if include_gap else _BASE_ORDER[:4]
        counts = np.stack([(mat == ord(c)).sum(axis=0) for c in order])
        if include_gap:
            # prefer bases over gap on ties: demote gap count by epsilon rank
            best = np.argmax(counts, axis=0)
        else:
            best = np.argmax(counts, axis=0)
        cons = np.frombuffer(order.encode(), dtype=np.uint8)[best]
        # all-E columns (no votes at all) become gap/E
        no_vote = counts.sum(axis=0) == 0
        out = cons.copy()
        out[no_vote] = ord("E")
        return out.tobytes().decode()

    def shrink(self) -> "Genemsa":
        """Drop columns that are gap (or E) in every allele; fix block lengths."""
        names, mat = self.toMatrix()
        if not names:
            return self.copy()
        is_empty = np.all((mat == ord("-")) | (mat == ord("E")), axis=0)
        keep = ~is_empty
        msa = Genemsa(gene_name=self.gene_name, reference=self.reference)
        pos = 0
        for b in self.blocks:
            blen = int(keep[pos : pos + b.length].sum())
            msa.blocks.append(Block(b.name, b.type, blen))
            pos += b.length
        kept = mat[:, keep]
        for i, name in enumerate(names):
            msa.alleles[name] = kept[i].tobytes().decode()
        return msa

    def fill_incomplete(self, seq_or_char: str) -> "Genemsa":
        """Replace E by the given char (in place)."""
        ch = seq_or_char
        for n in list(self.alleles):
            self.alleles[n] = self.alleles[n].replace("E", ch)
        return self

    # ------------------------------------------------------------------
    # import / export
    # ------------------------------------------------------------------
    def to_records(self, gap: bool = True) -> list[tuple[str, str]]:
        """(name, sequence) records; gap=False strips ``-`` and ``E``."""
        recs = []
        for name, seq in self.alleles.items():
            if not gap:
                seq = seq.replace("-", "").replace("E", "")
            recs.append((name, seq))
        return recs

    def to_fasta(self, fname: str, gap: bool = True) -> None:
        writeFasta(fname, self.to_records(gap=gap))

    def to_gff(self, fname: str) -> None:
        """Block annotation of the reference as GFF3 (visualisation aid)."""
        ref = self.get_reference()[0]
        with open(fname, "w") as f:
            f.write("##gff-version 3\n")
            pos = 0
            for b in self.blocks:
                f.write(
                    f"{ref}\tkir_graph_tpu\t{b.type}\t{pos + 1}\t{pos + b.length}"
                    f"\t.\t+\t.\tID={b.name}\n"
                )
                pos += b.length

    def save_msa(self, fa_name: str, json_name: str) -> None:
        self.to_fasta(fa_name, gap=True)
        with open(json_name, "w") as f:
            json.dump(
                {
                    "gene_name": self.gene_name,
                    "reference": self.reference,
                    "blocks": [
                        {"name": b.name, "type": b.type, "length": b.length}
                        for b in self.blocks
                    ],
                },
                f,
            )

    @classmethod
    def load_msa(cls, fa_name: str, json_name: str) -> "Genemsa":
        with open(json_name) as f:
            meta = json.load(f)
        msa = cls(
            gene_name=meta.get("gene_name", ""),
            reference=meta.get("reference", ""),
            blocks=[
                Block(b["name"], b["type"], int(b["length"]))
                for b in meta.get("blocks", [])
            ],
        )
        for name, seq in readFasta(fa_name):
            msa.alleles[name] = seq
        if msa.reference and msa.reference not in msa.alleles:
            raise ValueError(f"reference {msa.reference} missing in {fa_name}")
        return msa

    @classmethod
    def from_sequences(
        cls, records: list[tuple[str, str]], gene_name: str = ""
    ) -> "Genemsa":
        """Build a single-block MSA from equal-length aligned records."""
        msa = cls(gene_name=gene_name)
        if records:
            length = len(records[0][1])
            msa.blocks = [Block("gene", "gene_fragment", length)]
        for name, seq in records:
            msa.append(name, seq)
        return msa

    # ------------------------------------------------------------------
    # pretty printing (research aid; reference format_alignment_diff)
    # ------------------------------------------------------------------
    def format_alignment_diff(self, ref_name: str = "", width: int = 100) -> str:
        ref_name = ref_name or self.get_reference()[0]
        ref_seq = self.alleles[ref_name]
        out = []
        for start in range(0, self.get_length(), width):
            out.append(f"# col {start}")
            out.append(f"{ref_name:28s} {ref_seq[start:start + width]}")
            for name, seq in self.alleles.items():
                if name == ref_name:
                    continue
                diff = "".join(
                    "-" if c == "-" else (c if c != r else ".")
                    for c, r in zip(seq[start : start + width], ref_seq[start:])
                )
                out.append(f"{name:28s} {diff}")
        return "\n".join(out)


# ---------------------------------------------------------------------------
# module helpers
# ---------------------------------------------------------------------------

def concatMsa(parts: list[Genemsa]) -> Genemsa:
    """Concatenate MSAs column-wise, union of alleles (missing -> all-gap).

    Mirrors the merge loop of reference kir_msa.py:171-211.
    """
    assert parts
    msa = parts[0].copy()
    for part in parts[1:]:
        blk = part.copy()
        for name in set(blk.alleles) - set(msa.alleles):
            msa.alleles[name] = "-" * msa.get_length()
        for name in set(msa.alleles) - set(blk.alleles):
            blk.alleles[name] = "-" * blk.get_length()
        for name in msa.alleles:
            msa.alleles[name] = msa.alleles[name] + blk.alleles[name]
        msa.blocks.extend(blk.blocks)
    return msa


def writeFasta(fname: str, records: Iterable[tuple[str, str]], width: int = 60) -> None:
    with open(fname, "w") as f:
        for name, seq in records:
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")


def readFasta(fname: str) -> list[tuple[str, str]]:
    records: list[tuple[str, str]] = []
    name = None
    chunks: list[str] = []
    import gzip

    opener = gzip.open if fname.endswith(".gz") else open
    with opener(fname, "rt") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if line.startswith(">"):
                if name is not None:
                    records.append((name, "".join(chunks)))
                name = line[1:].split()[0]
                chunks = []
            else:
                chunks.append(line)
    if name is not None:
        records.append((name, "".join(chunks)))
    return records


def saveAllMsa(genes: dict[str, Genemsa], prefix: str) -> None:
    """Per gene: shrink, append {gene}*BACKBONE consensus, save fa+json+gff.

    Mirrors reference kir_msa.py:47-63 (BAM export replaced by GFF only —
    the TPU pipeline never round-trips through BAM).
    """
    parent = os.path.dirname(prefix)
    if parent:
        os.makedirs(parent, exist_ok=True)
    for gene_name, msa in genes.items():
        logger.debug(f"[MSA] Save to {prefix}.{gene_name}")
        msa = msa.shrink()
        backbone = f"{gene_name}*BACKBONE"
        if backbone not in msa.alleles:
            msa.append(backbone, msa.get_consensus(include_gap=False))
        msa.set_reference(backbone)
        msa.to_gff(f"{prefix}.{gene_name}.gff")
        msa.save_msa(f"{prefix}.{gene_name}.fa", f"{prefix}.{gene_name}.json")


def readFromMSAs(prefix: str) -> dict[str, Genemsa]:
    """Load `{prefix}.{gene}.fa/.json` pairs (reference utils.py:182-198)."""
    genes = {}
    for filename in glob(prefix + ".*.json"):
        split_name = filename[len(prefix) + 1 :].split(".")
        if len(split_name) != 2:
            continue
        gene = split_name[0]
        genes[gene] = Genemsa.load_msa(filename[:-5] + ".fa", filename)
    return genes
