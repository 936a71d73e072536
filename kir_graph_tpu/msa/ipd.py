"""
IPD-KIR database reader (offline).

The reference pulls IPD-KIR through pyhlamsa's KIRmsa, which downloads a
github branch (kir_msa.py:66-80).  This environment has no egress, so this
reader consumes a *local checkout* of the ANHIG/IPDKIR repository:

  {db_path}/msf/KIR2DL1_gen.msf   (full-length genomic alignments)
  {db_path}/msf/KIR2DL1_nuc.msf   (exon-only alignments)
  {db_path}/KIR.dat               (EMBL flat file: per-allele exon/intron
                                   boundaries — the structure source real
                                   checkouts actually ship)
  {db_path}/gff/{gene}.gff        (optional block annotation; synthetic
                                   checkouts and some tools emit this)

MSF (GCG) is a block-interleaved alignment format; gaps are '.'/'~' in msf
and become '-' here, unknown bases ('*', and everything else outside
ACGT/N) become 'E' like pyhlamsa's unsequenced marker.  Block
(exon/intron) boundaries come, in priority order, from `gff/` (alignment
OR ungapped per-allele coordinates), from `KIR.dat`, or fall back to a
single gene_fragment block (merge modes then re-label).
"""
from __future__ import annotations

import os
import re

from ..utils import logger
from .genemsa import Block, Genemsa

KIR_GENES = [
    "KIR2DL1", "KIR2DL2", "KIR2DL3", "KIR2DL4", "KIR2DL5",
    "KIR2DP1", "KIR2DS1", "KIR2DS2", "KIR2DS3", "KIR2DS4", "KIR2DS5",
    "KIR3DL1", "KIR3DL2", "KIR3DL3", "KIR3DP1", "KIR3DS1",
]

# anything outside the alignment alphabet (bases, N, gap, E) is an
# unknown/unsequenced position -> 'E' (pyhlamsa's marker); real IPD msf
# files use '*' for unknown bases in nuc alignments
_NON_ALPHABET = re.compile(r"[^ACGTNE-]")


def parseMsf(filename: str) -> dict[str, str]:
    """GCG MSF -> {name: aligned sequence}.

    '.'/'~' -> '-'; '*' and other non-ACGTN letters -> 'E' (unknown).
    Tolerates CRLF, tabs, ruler lines above/below blocks and arbitrary
    header shapes (everything before '//' is ignored).  Raises ValueError
    on structurally broken files: a name appearing twice inside one block
    (duplicate allele row) or truncated/ragged alignments.
    """
    seqs: dict[str, list[str]] = {}
    in_body = False
    with open(filename, newline=None) as f:
        for line in f:
            if not in_body:
                if line.strip().startswith("//"):
                    in_body = True
                continue
            parts = line.split()
            if len(parts) < 2:
                continue
            name = parts[0]
            chunk = "".join(parts[1:])
            # numeric ruler lines have no sequence letters
            if re.fullmatch(r"[0-9\s]+", chunk):
                continue
            seqs.setdefault(name, []).append(chunk)
    if not in_body:
        raise ValueError(f"not an MSF file (no '//' separator): {filename}")
    if not seqs:
        raise ValueError(f"MSF body has no sequences: {filename}")
    # structural validation: every block lists every sequence exactly
    # once, so all names accumulate the same chunk count.  A duplicated
    # allele row doubles its count; a truncated tail drops some.
    counts = {name: len(chunks) for name, chunks in seqs.items()}
    if len(set(counts.values())) > 1:
        lo = min(counts.values())
        odd = sorted(n for n, c in counts.items() if c != lo)[:5]
        raise ValueError(
            f"MSF block structure broken in {filename}: uneven row counts "
            f"(duplicate or truncated entries: {odd})"
        )
    out = {}
    for name, chunks in seqs.items():
        seq = "".join(chunks).replace(".", "-").replace("~", "-").upper()
        out[name] = _NON_ALPHABET.sub("E", seq)
    lengths = {len(s) for s in out.values()}
    if len(lengths) > 1:
        by_len: dict[int, list[str]] = {}
        for n, s in out.items():
            by_len.setdefault(len(s), []).append(n)
        detail = {ln: names[:3] for ln, names in sorted(by_len.items())}
        raise ValueError(f"ragged MSF {filename}: lengths {detail}")
    return out


# ----------------------------------------------------------------------
# block structure sources
# ----------------------------------------------------------------------
def _ungappedToColumns(row: str) -> list[int]:
    """Alignment columns of the row's bases (E counts as sequence)."""
    return [i for i, c in enumerate(row) if c != "-"]


def _nameBlocks(feats: list[tuple[int, int, str]]) -> list[tuple[int, int, str, str]]:
    """(start, end, type) features -> + display name (exon1, intron2, 5UTR)."""
    out = []
    exon_i = intron_i = 0
    n_exons = sum(1 for _, _, t in feats if t == "exon")
    for k, (start, end, typ) in enumerate(feats):
        if typ == "exon":
            exon_i += 1
            name = f"exon{exon_i}"
        elif typ == "intron":
            intron_i += 1
            name = f"intron{intron_i}"
        elif typ == "five_prime_UTR":
            name = "5UTR"
        elif typ == "three_prime_UTR":
            name = "3UTR"
        else:  # bare "UTR" rows (KIR.dat): position decides the flank
            if exon_i == 0 and n_exons:
                name, typ = "5UTR", "five_prime_UTR"
            else:
                name, typ = "3UTR", "three_prime_UTR"
        out.append((start, end, typ, name))
    return out


def _featsToAlignedBlocks(
    feats: list[tuple[int, int, str]], row: str
) -> list[Block] | None:
    """Map ungapped 1-based inclusive features of `row`'s allele onto
    alignment columns -> contiguous Block list spanning the alignment,
    or None when the features don't tile the allele's sequence."""
    cols = _ungappedToColumns(row)
    if not feats or not cols:
        return None
    feats = sorted(feats)
    # features must tile [1, len(cols)] contiguously
    if feats[0][0] != 1 or feats[-1][1] != len(cols):
        return None
    for (_, e_prev, _), (s_next, _, _) in zip(feats, feats[1:]):
        if s_next != e_prev + 1:
            return None
    named = _nameBlocks(feats)
    blocks: list[Block] = []
    col_start = 0  # leading gap columns ride the first block
    for k, (start, end, typ, name) in enumerate(named):
        if k == len(named) - 1:
            col_end = len(row)  # trailing gap columns ride the last block
        else:
            # a block extends up to (not including) the next block's
            # first base column: inter-block gap runs (insertions other
            # alleles carry at the boundary) stay in the PREVIOUS block,
            # matching how alignment-coordinate gff tables draw them
            col_end = cols[named[k + 1][0] - 1]
        if col_end <= col_start:
            return None
        blocks.append(Block(name, typ, col_end - col_start))
        col_start = col_end
    return blocks


def parseGff(filename: str, gene: str) -> list[Block]:
    """IPD gff3 -> ordered block table (alignment-coordinate rows)."""
    feats = _gffFeatures(filename)[0]
    named = _nameBlocks(feats)
    return [Block(name, typ, end - start + 1) for start, end, typ, name in named]


def _gffFeatures(filename: str) -> tuple[list[tuple[int, int, str]], str]:
    """gff3 -> (sorted (start, end, type) rows, first seqid)."""
    feats = []
    seqid = ""
    with open(filename) as f:
        for line in f:
            if line.startswith("#"):
                continue
            cols = line.rstrip("\n").split("\t")
            if len(cols) < 9:
                continue
            typ = cols[2]
            if typ not in ("five_prime_UTR", "exon", "intron", "three_prime_UTR", "UTR"):
                continue
            if not seqid:
                seqid = cols[0]
            feats.append((int(cols[3]), int(cols[4]), typ))
    feats.sort()
    return feats, seqid


def parseDat(filename: str) -> dict[str, list[tuple[int, int, str]]]:
    """EMBL flat file (KIR.dat) -> {allele: [(start, end, type), ...]}.

    Real checkouts carry per-allele structure here (the reference gets it
    via pyhlamsa): `DE   KIR2DL1*0010101, ...` names the allele, `FT`
    rows carry `exon`/`intron`/`UTR` features with 1-based inclusive
    ungapped ranges.  Joined/complement ranges and malformed rows are
    skipped (the caller just tries the next allele)."""
    out: dict[str, list[tuple[int, int, str]]] = {}
    allele = ""
    feats: list[tuple[int, int, str]] = []
    rng = re.compile(r"^(\d+)\.\.(\d+)$")

    def flush():
        nonlocal feats
        if allele and feats:
            out[allele] = feats
        feats = []

    with open(filename, newline=None) as f:
        for line in f:
            key, rest = line[:2], line[5:].strip() if len(line) > 5 else ""
            if key == "//":
                flush()
                allele = ""
            elif key == "DE" and not allele:
                allele = rest.split(",")[0].split()[0] if rest else ""
            elif key == "FT":
                parts = line[2:].strip().split()
                if len(parts) == 2 and parts[0] in ("exon", "intron", "UTR"):
                    m = rng.match(parts[1])
                    if m:
                        feats.append((int(m.group(1)), int(m.group(2)), parts[0]))
    flush()
    return out


def _findDat(db_path: str) -> str | None:
    for cand in ("KIR.dat", os.path.join("dat", "KIR.dat"), "kir.dat"):
        p = os.path.join(db_path, cand)
        if os.path.exists(p):
            return p
    return None


def _blocksFromDat(
    msa: Genemsa, dat: dict[str, list[tuple[int, int, str]]]
) -> list[Block] | None:
    """Derive the gene's alignment block table from KIR.dat features.

    Real KIR.dat annotates EVERY allele in its own ungapped coordinates;
    a single allele cannot pin a boundary that falls inside its gap run,
    so aggregate: each block boundary's alignment column must lie after
    every allele's last base of the left block and at/before every
    allele's first base of the right block.  Alleles whose features
    don't tile their row, or whose block structure differs from the
    majority (real KIR has structure-variant alleles), are left out."""
    by_key: dict[tuple, list[tuple[list, list[int]]]] = {}
    for name in msa.alleles:
        if name not in dat:
            continue
        feats = sorted(dat[name])
        cols = _ungappedToColumns(msa.get(name))
        if not feats or not cols:
            continue
        if feats[0][0] != 1 or feats[-1][1] != len(cols):
            continue
        if any(
            s != e + 1 for (_, e, _), (s, _, _) in zip(feats, feats[1:])
        ):
            continue
        named = _nameBlocks(feats)
        key = tuple((t, n) for _, _, t, n in named)
        by_key.setdefault(key, []).append((named, cols))
    if not by_key:
        return None
    key, group = max(by_key.items(), key=lambda kv: len(kv[1]))
    K = len(key)
    L = msa.get_length()
    bounds = [0]
    for k in range(K - 1):
        lo = max(cols[named[k][1] - 1] + 1 for named, cols in group)
        hi = min(cols[named[k + 1][0] - 1] for named, cols in group)
        if lo > hi or hi <= bounds[-1]:
            return None  # alleles disagree: alignment/dat mismatch
        # columns in [lo, hi) are gap in every annotated allele; attach
        # them to the LEFT block (next block starts at its earliest base)
        bounds.append(hi)
    bounds.append(L)
    return [
        Block(name, typ, bounds[k + 1] - bounds[k])
        for k, (typ, name) in enumerate(key)
    ]


def _applyStructure(
    msa: Genemsa, db_path: str, gene: str,
    dat: dict[str, list[tuple[int, int, str]]] | None,
) -> None:
    """Fill msa.blocks from the best available structure source."""
    length = msa.get_length()
    gff = os.path.join(db_path, "gff", f"{gene}.gff")
    if os.path.exists(gff):
        feats, seqid = _gffFeatures(gff)
        if feats:
            named = _nameBlocks(feats)
            blocks = [
                Block(name, typ, end - start + 1)
                for start, end, typ, name in named
            ]
            if sum(b.length for b in blocks) == length:
                msa.blocks = blocks
                return
            # real gff rows use UNGAPPED per-allele coordinates: map via
            # the seqid allele's row — ONLY when that exact allele is in
            # the alignment (guessing a same-gene allele could silently
            # tile wrong exon/intron boundaries into CN and exonfirst)
            if seqid in msa.alleles:
                mapped = _featsToAlignedBlocks(feats, msa.get(seqid))
                if mapped is not None and sum(b.length for b in mapped) == length:
                    logger.info(
                        f"[MSA] {gene}: gff blocks mapped from ungapped "
                        f"{seqid} coordinates"
                    )
                    msa.blocks = mapped
                    return
            logger.warning(
                f"[MSA] {gene}: gff blocks sum != alignment length {length} "
                "and no ungapped mapping row found; trying KIR.dat"
            )
    if dat:
        blocks = _blocksFromDat(msa, dat)
        if blocks is not None:
            logger.info(f"[MSA] {gene}: block structure from KIR.dat")
            msa.blocks = blocks
            return
    logger.warning(
        f"[MSA] {gene}: no usable block annotation (gff/KIR.dat); "
        "keeping single gene_fragment block"
    )


def _genMsa(db_path: str, gene: str) -> Genemsa | None:
    msf = os.path.join(db_path, "msf", f"{gene}_gen.msf")
    if not os.path.exists(msf):
        return None
    seqs = parseMsf(msf)
    length = len(next(iter(seqs.values())))
    msa = Genemsa(
        gene_name=gene,
        blocks=[Block("gene", "gene_fragment", length)],
    )
    for name, seq in sorted(seqs.items()):
        full = name if name.startswith("KIR") else f"{gene}*{name.split('*')[-1]}"
        msa.append(full, seq)
    return msa


def _nucMsa(db_path: str, gene: str) -> Genemsa | None:
    msf = os.path.join(db_path, "msf", f"{gene}_nuc.msf")
    if not os.path.exists(msf):
        return None
    seqs = parseMsf(msf)
    length = len(next(iter(seqs.values())))
    msa = Genemsa(gene_name=gene, blocks=[Block("cds", "exon", length)])
    for name, seq in sorted(seqs.items()):
        full = name if name.startswith("KIR") else f"{gene}*{name.split('*')[-1]}"
        msa.append(full, seq)
    return msa


def _mergeGenNuc(gen: Genemsa, nuc: Genemsa) -> Genemsa:
    """Add nuc-only alleles into the gen MSA with `E` introns.

    The nuc alignment is exon-concatenated; map its columns onto the gen
    MSA's exon blocks (requires equal exon lengths — true for IPD pairs
    after trimming); alleles already present in gen are kept as-is.
    """
    exon_parts = [p for p in gen.split_block() if p.blocks[0].type == "exon"]
    exon_len = sum(p.get_length() for p in exon_parts)
    if exon_len != nuc.get_length():
        logger.warning(
            f"[MSA] {gen.gene_name}: gen exon length {exon_len} != "
            f"nuc length {nuc.get_length()}; skipping exon-only alleles"
        )
        return gen

    new_names = [n for n in nuc.alleles if n not in gen.alleles]
    for name in new_names:
        nseq = nuc.get(name)
        row = []
        pos = 0
        for b in gen.blocks:
            s, e = gen.get_block_interval(b.name)
            if b.type == "exon":
                row.append(nseq[pos : pos + b.length])
                pos += b.length
            else:
                row.append("E" * b.length)
        gen.append(name, "".join(row))
    return gen


def readIpdKirDB(
    db_path: str, full_length_only: bool = True, version: str = "2100"
) -> dict[str, Genemsa]:
    """Local IPD-KIR checkout -> {gene: MSA} (gen [+ nuc] alignments)."""
    if not db_path or not os.path.isdir(db_path):
        raise FileNotFoundError(
            f"IPD-KIR db_path {db_path!r} not found — this build is offline; "
            "clone ANHIG/IPDKIR locally and pass its path"
        )
    dat_path = _findDat(db_path)
    dat = parseDat(dat_path) if dat_path else None
    genes: dict[str, Genemsa] = {}
    for gene in KIR_GENES + ["KIR2DL5A", "KIR2DL5B"]:
        gen = _genMsa(db_path, gene)
        if gen is None:
            continue
        _applyStructure(gen, db_path, gene, dat)
        if not full_length_only:
            nuc = _nucMsa(db_path, gene)
            if nuc is not None:
                gen = _mergeGenNuc(gen, nuc)
        genes[gene] = gen
    if not genes:
        raise FileNotFoundError(f"no {os.path.join(db_path, 'msf')}/*_gen.msf found")
    logger.info(f"[MSA] IPD-KIR {version}: {sorted(genes)}")
    return genes
