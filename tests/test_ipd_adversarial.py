"""Adversarial real-IPD grammar suite.

The reference absorbs IPD-KIR's quirks through pyhlamsa
(/root/reference/graphkir/kir_msa.py:66-80: MSF gen+nuc checkouts,
unknown '*' bases, alleles present in nuc but not gen, per-allele
structure from the EMBL KIR.dat).  A real ANHIG/IPDKIR checkout has
never been seen by this offline build, so these tests feed msa/ipd.py
deliberately realistic-hostile inputs: GCG header variants, CRLF/tab
spacing, '*' unknown columns, duplicated/truncated rows, gff rows in
UNGAPPED allele coordinates, KIR.dat-only structure, and genes with no
annotation at all.
"""
import os

import pytest

from kir_graph_tpu.msa.ipd import (
    parseDat,
    parseMsf,
    readIpdKirDB,
)


def _writeMsfFancy(
    path,
    seqs,
    width=10,
    sep=" ",
    newline="\n",
    ruler="above",
    gap_char=".",
    header="gcg",
    dup_row=None,
    truncate_last_block_names=(),
):
    """A GCG MSF writer with hostile knobs."""
    length = len(next(iter(seqs.values())))
    lines = []
    if header == "gcg":
        lines += [
            "!!NA_MULTIPLE_ALIGNMENT 1.0",
            "",
            f"  {os.path.basename(path)}  MSF: {length}  Type: N"
            "  January 6, 2024 12:00  Check: 2914  ..",
            "",
        ]
        for name in seqs:
            lines.append(
                f" Name: {name:<24s} Len: {length:5d}  Check:  1234"
                "  Weight:  1.00"
            )
        lines.append("")
    lines += ["//", ""]
    for start in range(0, length, width):
        if ruler == "above":
            lines.append(f"{'':>26s}{start + 1:<6d}{min(start + width, length)}")
        for name, seq in seqs.items():
            if name in truncate_last_block_names and start + width >= length:
                continue
            chunk = seq[start : start + width].replace("-", gap_char)
            # space every 10 within a chunk like real GCG output
            lines.append(f"{name:<26s}{sep}{chunk}")
            if dup_row == name:
                lines.append(f"{name:<26s}{sep}{chunk}")
        if ruler == "below":
            lines.append(f"{'':>26s}{start + 1}")
        lines.append("")
    with open(path, "w", newline="") as f:
        f.write(newline.join(lines) + newline)


def test_msf_gcg_header_crlf_tabs_ruler_below(tmp_path):
    seqs = {
        "KIR2DL1*0010101": "ACGTACGTACGTACGTACGT",
        "KIR2DL1*0020102": "ACGTAC~TACGTACGTACG-",
    }
    fn = str(tmp_path / "x.msf")
    _writeMsfFancy(
        fn, seqs, width=7, sep="\t", newline="\r\n", ruler="below"
    )
    out = parseMsf(fn)
    assert out["KIR2DL1*0010101"] == "ACGTACGTACGTACGTACGT"
    # '~' and '-'-as-'.' both normalise to '-'
    assert out["KIR2DL1*0020102"][6] == "-"
    assert out["KIR2DL1*0020102"][19] == "-"


def test_msf_unknown_star_and_lowercase_become_E(tmp_path):
    seqs = {
        "KIR2DS4*0010101": "acgt**gtAC",
        "KIR2DS4*0020101": "ACGTACGTAC",
    }
    fn = str(tmp_path / "x.msf")
    _writeMsfFancy(fn, seqs, width=5)
    out = parseMsf(fn)
    # lowercase upcased; '*' unknown -> E; out-of-alphabet letters -> E
    assert out["KIR2DS4*0010101"] == "ACGTEEGTAC"


def test_msf_out_of_alphabet_iupac_becomes_E(tmp_path):
    seqs = {"KIR3DL3*001": "ACGRYSWACG", "KIR3DL3*002": "ACGTACGTAC"}
    fn = str(tmp_path / "x.msf")
    _writeMsfFancy(fn, seqs)
    out = parseMsf(fn)
    assert out["KIR3DL3*001"] == "ACGEEEEACG"
    # N is part of the alphabet and survives
    seqs2 = {"KIR3DL3*001": "ACGNNCGTAC"}
    fn2 = str(tmp_path / "y.msf")
    _writeMsfFancy(fn2, seqs2)
    assert parseMsf(fn2)["KIR3DL3*001"] == "ACGNNCGTAC"


def test_msf_duplicate_allele_row_raises(tmp_path):
    seqs = {"KIR2DL4*001": "ACGTACGTAC", "KIR2DL4*002": "ACGTACGTAC"}
    fn = str(tmp_path / "x.msf")
    _writeMsfFancy(fn, seqs, width=5, dup_row="KIR2DL4*002")
    with pytest.raises(ValueError, match="duplicate|uneven"):
        parseMsf(fn)


def test_msf_truncated_tail_raises(tmp_path):
    seqs = {"KIR2DL4*001": "ACGTACGTAC", "KIR2DL4*002": "ACGTACGTAC"}
    fn = str(tmp_path / "x.msf")
    _writeMsfFancy(
        fn, seqs, width=5, truncate_last_block_names=("KIR2DL4*002",)
    )
    with pytest.raises(ValueError):
        parseMsf(fn)


def test_msf_no_separator_raises(tmp_path):
    fn = str(tmp_path / "x.msf")
    with open(fn, "w") as f:
        f.write("PileUp\nKIR2DL1*001 ACGT\n")
    with pytest.raises(ValueError, match="separator"):
        parseMsf(fn)


# ----------------------------------------------------------------------
# structure sources
# ----------------------------------------------------------------------
def _mkDb(tmp_path, gen_seqs, gene="KIR2DL1", nuc_seqs=None):
    (tmp_path / "msf").mkdir(exist_ok=True)
    _writeMsfFancy(str(tmp_path / "msf" / f"{gene}_gen.msf"), gen_seqs)
    if nuc_seqs:
        _writeMsfFancy(str(tmp_path / "msf" / f"{gene}_nuc.msf"), nuc_seqs)
    return tmp_path


def test_gff_in_ungapped_allele_coordinates(tmp_path):
    # allele *001 row: 4 leading gap columns, so gff (ungapped coords of
    # *001) must be remapped onto alignment columns
    gen = {
        "KIR2DL1*0010101": "----ACGTACGTACGTACGT",
        "KIR2DL1*0020101": "CCGGACGTACGTACGTACGT",
    }
    _mkDb(tmp_path, gen)
    (tmp_path / "gff").mkdir()
    with open(tmp_path / "gff" / "KIR2DL1.gff", "w") as f:
        f.write("##gff-version 3\n")
        # ungapped coords on *001 (16 bases): UTR 1-4, exon 5-12, UTR 13-16
        f.write("KIR2DL1*0010101\tIPD\tfive_prime_UTR\t1\t4\t.\t+\t.\tID=u\n")
        f.write("KIR2DL1*0010101\tIPD\texon\t5\t12\t.\t+\t.\tID=e1\n")
        f.write("KIR2DL1*0010101\tIPD\tthree_prime_UTR\t13\t16\t.\t+\t.\tID=u2\n")
    msa = readIpdKirDB(str(tmp_path))["KIR2DL1"]
    assert [b.name for b in msa.blocks] == ["5UTR", "exon1", "3UTR"]
    # leading gaps ride the first block: 4 gaps + 4 UTR bases = 8 cols
    assert [b.length for b in msa.blocks] == [8, 8, 4]
    s, e = msa.get_block_interval("exon1")
    assert msa.get("KIR2DL1*0010101")[s:e] == "ACGTACGT"


def test_structure_from_kir_dat_only(tmp_path):
    """No gff at all (the real checkout layout): KIR.dat provides the
    per-allele exon/intron features; bare 'UTR' rows resolve by flank."""
    gen = {
        "KIR2DL1*0010101": "--ACGTACGTACGTACGTAC",
        "KIR2DL1*0020101": "GGACGTACGTACGTACGTAC",
    }
    _mkDb(tmp_path, gen)
    with open(tmp_path / "KIR.dat", "w") as f:
        f.write(
            "ID   KIR000001; SV 1; standard; DNA; HTG; 18 BP.\n"
            "DE   KIR2DL1*0010101, Human Killer-cell Ig-like receptor\n"
            "FT   source          1..18\n"
            'FT                   /organism="Homo sapiens"\n'
            "FT   UTR             1..3\n"
            "FT   exon            4..9\n"
            'FT                   /number="1"\n'
            "FT   intron          10..13\n"
            'FT                   /number="1"\n'
            "FT   exon            14..16\n"
            'FT                   /number="2"\n'
            "FT   UTR             17..18\n"
            "SQ   Sequence 18 BP;\n"
            "     acgtacgtac gtacgtac\n"
            "//\n"
        )
    msa = readIpdKirDB(str(tmp_path))["KIR2DL1"]
    names = [b.name for b in msa.blocks]
    assert names == ["5UTR", "exon1", "intron1", "exon2", "3UTR"]
    assert sum(b.length for b in msa.blocks) == msa.get_length()
    # exon1 covers ungapped bases 4..9 of *001 -> alignment cols 5..11
    s, e = msa.get_block_interval("exon1")
    assert msa.get("KIR2DL1*0010101")[s:e].replace("-", "") == "TACGTA"


def test_kir_dat_parser_grammar(tmp_path):
    fn = str(tmp_path / "KIR.dat")
    with open(fn, "w") as f:
        f.write(
            "ID   KIR000002;\n"
            "DE   KIR3DP1*0030201, something, else\n"
            "FT   exon            1..10\n"
            "FT   intron          join(11..12,14..15)\n"  # skipped: not a range
            "FT   exon            11..20\n"
            "XX\n"
            "//\n"
            "ID   KIR000003;\n"
            "DE\n"  # empty DE: entry dropped, parser survives
            "FT   exon            1..5\n"
            "//\n"
        )
    dat = parseDat(fn)
    assert dat == {
        "KIR3DP1*0030201": [(1, 10, "exon"), (11, 20, "exon")]
    }


def test_kir_dat_non_tiling_falls_back_to_single_block(tmp_path, caplog):
    gen = {"KIR2DL1*0010101": "ACGTACGTACGTACGTACGT"}
    _mkDb(tmp_path, gen)
    with open(tmp_path / "KIR.dat", "w") as f:
        # features cover 1..8 of a 20-base allele: not a tiling
        f.write(
            "ID   X;\nDE   KIR2DL1*0010101,\n"
            "FT   exon            1..8\n//\n"
        )
    msa = readIpdKirDB(str(tmp_path))["KIR2DL1"]
    assert [b.type for b in msa.blocks] == ["gene_fragment"]


def test_gene_without_any_annotation_single_block(tmp_path):
    gen = {"KIR2DS2*001": "ACGTACGTACGTACGTACGT"}
    _mkDb(tmp_path, gen, gene="KIR2DS2")
    msa = readIpdKirDB(str(tmp_path))["KIR2DS2"]
    assert [b.type for b in msa.blocks] == ["gene_fragment"]
    assert msa.get_length() == 20


def test_nuc_only_allele_with_star_unknowns_merges_as_E(tmp_path):
    """An exon-only allele whose nuc row carries '*' unknown bases: merged
    with E introns AND E at the unknown columns."""
    gen = {"KIR2DL1*0010101": "AAAAACGTACGTACGTTTTT"}
    nuc = {
        "KIR2DL1*0010101": "ACGTACGTACGT",
        "KIR2DL1*0990101": "ACG*ACG*ACGT",
    }
    _mkDb(tmp_path, gen, nuc_seqs=nuc)
    (tmp_path / "gff").mkdir()
    with open(tmp_path / "gff" / "KIR2DL1.gff", "w") as f:
        f.write("##gff-version 3\n")
        f.write("x\ti\tfive_prime_UTR\t1\t4\t.\t+\t.\tID=u\n")
        f.write("x\ti\texon\t5\t16\t.\t+\t.\tID=e1\n")
        f.write("x\ti\tthree_prime_UTR\t17\t20\t.\t+\t.\tID=u2\n")
    msa = readIpdKirDB(str(tmp_path), full_length_only=False)["KIR2DL1"]
    seq = msa.get("KIR2DL1*0990101")
    assert seq == "EEEE" + "ACGEACGEACGT" + "EEEE"


def test_nuc_length_mismatch_skips_exon_only_alleles(tmp_path, caplog):
    """Mismatched block counts (pseudogene nuc missing an exon): the gene
    still loads, exon-only alleles are skipped with a warning."""
    gen = {"KIR3DP1*0010101": "AAAAACGTACGTACGTTTTT"}
    nuc = {
        "KIR3DP1*0010101": "ACGTACGT",  # 8 != the gen exon length 12
        "KIR3DP1*0020101": "ACGTACGT",
    }
    _mkDb(tmp_path, gen, gene="KIR3DP1", nuc_seqs=nuc)
    (tmp_path / "gff").mkdir()
    with open(tmp_path / "gff" / "KIR3DP1.gff", "w") as f:
        f.write("##gff-version 3\n")
        f.write("x\ti\tfive_prime_UTR\t1\t4\t.\t+\t.\tID=u\n")
        f.write("x\ti\texon\t5\t16\t.\t+\t.\tID=e1\n")
        f.write("x\ti\tthree_prime_UTR\t17\t20\t.\t+\t.\tID=u2\n")
    msa = readIpdKirDB(str(tmp_path), full_length_only=False)["KIR3DP1"]
    assert "KIR3DP1*0020101" not in msa.alleles
    assert "KIR3DP1*0010101" in msa.alleles


def test_full_pipeline_on_dat_structured_checkout(tmp_path):
    """End-to-end leap-of-faith check: a synthetic DB rendered as a real
    checkout SHAPE (msf + KIR.dat, no gff) round-trips through
    readIpdKirDB with the same block structure the gff path yields."""
    from kir_graph_tpu.sim.ipd_checkout import writeIpdCheckout
    from kir_graph_tpu.sim.synth_db import SynthConfig, makeSyntheticDB

    genes = makeSyntheticDB(SynthConfig(seed=11))
    db = tmp_path / "ipd"
    writeIpdCheckout(genes, str(db))
    with_gff = readIpdKirDB(str(db), full_length_only=False)

    # convert the gff annotation into a KIR.dat (one entry per allele,
    # in that allele's own ungapped coordinates — the real layout) and
    # drop the gff dir
    dat_lines = []
    for gname, msa in with_gff.items():
        for allele in msa.alleles:
            row = msa.get(allele)
            if "E" in row:  # nuc-only rows have no genomic annotation
                continue
            pos = 1
            feats = []
            for b in msa.blocks:
                s, e = msa.get_block_interval(b.name)
                n = sum(1 for c in row[s:e] if c != "-")
                if n == 0:
                    feats = None  # allele missing a block: no dat entry
                    break
                typ = {"five_prime_UTR": "UTR", "three_prime_UTR": "UTR"}.get(
                    b.type, b.type
                )
                feats.append((pos, pos + n - 1, typ))
                pos += n
            if not feats:
                continue
            dat_lines.append(f"ID   {allele};\nDE   {allele}, synthetic\n")
            for s, e, t in feats:
                dat_lines.append(f"FT   {t:<15s} {s}..{e}\n")
            dat_lines.append("//\n")
    with open(db / "KIR.dat", "w") as f:
        f.writelines(dat_lines)
    import shutil

    shutil.rmtree(db / "gff")
    with_dat = readIpdKirDB(str(db), full_length_only=False)
    for gname in with_gff:
        got = [(b.name, b.type) for b in with_dat[gname].blocks]
        want = [(b.name, b.type) for b in with_gff[gname].blocks]
        assert got == want, gname
        assert with_dat[gname].alleles == with_gff[gname].alleles
        # block lengths may differ only where boundary columns are gap
        # in EVERY annotated allele; per-allele exon content — what CN's
        # exon filter and exonfirst actually consume — must be identical
        for allele in with_gff[gname].alleles:
            for b in with_gff[gname].blocks:
                if b.type != "exon":
                    continue
                s, e = with_gff[gname].get_block_interval(b.name)
                s2, e2 = with_dat[gname].get_block_interval(b.name)
                assert (
                    with_gff[gname].get(allele)[s:e].replace("-", "")
                    == with_dat[gname].get(allele)[s2:e2].replace("-", "")
                ), (gname, allele, b.name)


def test_build_kir_msa_from_dat_only_checkout(tmp_path):
    """buildKirMsa end-to-end on the REAL checkout layout (msf + KIR.dat,
    no gff): block structure flows from the dat into the merged MSAs."""
    from kir_graph_tpu.msa.builder import buildKirMsa
    from kir_graph_tpu.msa.genemsa import readFromMSAs
    from kir_graph_tpu.sim.ipd_checkout import writeIpdCheckout
    from kir_graph_tpu.sim.synth_db import SynthConfig, makeSyntheticDB

    genes = makeSyntheticDB(SynthConfig(seed=12))
    db = tmp_path / "ipd"
    writeIpdCheckout(genes, str(db))
    # convert gff -> per-allele KIR.dat rows and drop the gff dir (the
    # ANHIG/IPDKIR repo carries no gff)
    loaded = readIpdKirDB(str(db), full_length_only=False)
    with open(db / "KIR.dat", "w") as f:
        for gname, msa in loaded.items():
            for allele in msa.alleles:
                row = msa.get(allele)
                if "E" in row:
                    continue
                pos, feats, ok = 1, [], True
                for b in msa.blocks:
                    s, e = msa.get_block_interval(b.name)
                    n = sum(1 for c in row[s:e] if c != "-")
                    if n == 0:
                        ok = False
                        break
                    typ = {"five_prime_UTR": "UTR",
                           "three_prime_UTR": "UTR"}.get(b.type, b.type)
                    feats.append((pos, pos + n - 1, typ))
                    pos += n
                if not ok:
                    continue
                f.write(f"ID   {allele};\nDE   {allele}, synthetic\n")
                for s_, e_, t_ in feats:
                    f.write(f"FT   {t_:<15s} {s_}..{e_}\n")
                f.write("//\n")
    import shutil

    shutil.rmtree(db / "gff")

    out = str(tmp_path / "built")
    buildKirMsa("ab_2dl1s1", out, db_path=str(db), full_length_only=False)
    built = readFromMSAs(out)
    assert built, "no merged MSAs written"
    for gname, msa in built.items():
        names = [b.name for b in msa.blocks]
        assert any(n.startswith("exon") for n in names), (gname, names)
        assert f"{gname}*BACKBONE" in msa.alleles
