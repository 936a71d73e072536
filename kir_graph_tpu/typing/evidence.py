"""
Array-form evidence handoff: EvidenceArrays -> typing, without PairRead
objects on the hot path.

The reference pipeline materialises a python object per read pair between
extraction and typing (hisat2.py:847-866 writes ReadsAndVariants JSON;
typing_mulit_allele.py re-loops it into count matrices).  Here the
per-read variant evidence stays in CSR arrays end-to-end: the annotator
emits `EvidenceArrays`, this module splits them per gene and the typing
core scatters them straight into its count matrices.  PairRead remains
the JSON/compat boundary only (`EvidenceBundle.toReadsData`).
"""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..index.variants import IdAllocator, Variant
from .pairread import PairRead, ReadsAndVariantsData


def csrSelectRows(
    indptr: np.ndarray, idx: np.ndarray, rows: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Row-subset of a CSR (values gathered in row order)."""
    rows = np.asarray(rows, dtype=np.int64)
    cnt = (indptr[rows + 1] - indptr[rows]).astype(np.int64)
    out_indptr = np.concatenate([[0], np.cumsum(cnt)])
    total = int(out_indptr[-1])
    pos = (
        np.arange(total, dtype=np.int64)
        - np.repeat(out_indptr[:-1], cnt)
        + np.repeat(indptr[rows].astype(np.int64), cnt)
    )
    return out_indptr, idx[pos]


def csrMaskValues(
    indptr: np.ndarray, idx: np.ndarray, keep: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Drop masked-out values, keeping row structure (order preserved)."""
    rows = np.repeat(
        np.arange(len(indptr) - 1, dtype=np.int64), np.diff(indptr)
    )
    rows = rows[keep]
    counts = np.bincount(rows, minlength=len(indptr) - 1)
    return np.concatenate([[0], np.cumsum(counts)]), idx[keep]


@dataclass
class GeneEvidence:
    """One gene's typing-ready evidence (rows = that gene's selected
    pairs, in batch row order — the same order the PairRead path sees).

    CSR rows are interleaved mates (row 2r = left mate of local pair r);
    values are gene-LOCAL variant indices into the gene's variant list
    (catalog order, then that gene's novel SNVs in registration order —
    exactly `groupVariants(catalog + novel)[gene]`).
    """

    gene: str
    nh: np.ndarray            # [R] int32
    pair_index: np.ndarray    # [R] original batch pair rows
    pos_indptr: np.ndarray    # [2R+1]
    pos_idx: np.ndarray
    neg_indptr: np.ndarray
    neg_idx: np.ndarray

    @property
    def n_pairs(self) -> int:
        return len(self.nh)

    def toPairReads(self, ids_local: list[str]) -> list[PairRead]:
        """Materialise PairRead objects (exonfirst/em/JSON compat only)."""
        pos_ids = [ids_local[i] for i in self.pos_idx.tolist()]
        neg_ids = [ids_local[i] for i in self.neg_idx.tolist()]
        pp = self.pos_indptr.tolist()
        np_ = self.neg_indptr.tolist()
        nh = self.nh.tolist()
        pidx = self.pair_index.tolist()
        reads = []
        for r in range(self.n_pairs):
            a, b = 2 * r, 2 * r + 1
            reads.append(
                PairRead(
                    backbone=self.gene,
                    multiple=nh[r],
                    lpv=pos_ids[pp[a]:pp[a + 1]],
                    lnv=neg_ids[np_[a]:np_[a + 1]],
                    rpv=pos_ids[pp[b]:pp[b + 1]],
                    rnv=neg_ids[np_[b]:np_[b + 1]],
                    pair_index=pidx[r],
                )
            )
        return reads


class EvidenceBundle:
    """EvidenceArrays + the matching global variant list.

    `variants` is catalog + novel in global-index order (the order of
    `ev.ids`); `gene_names` are the true backbone names indexed by
    `ev.gene`."""

    def __init__(self, ev, variants: list[Variant], gene_names: list[str]):
        self.ev = ev
        self.variants = variants
        self.gene_names = gene_names

    # ------------------------------------------------------------------
    def selectedPairs(self, multiple: bool = False) -> np.ndarray:
        """Pairs the typing stage sees: passing, and NH==1 unless
        `multiple` (reference hisat2.py:943-948 removeMultipleMapped)."""
        sel = self.ev.pass_mask.copy()
        if not multiple:
            sel &= self.ev.nh == 1
        return np.nonzero(sel)[0].astype(np.int64)

    def splitByGene(
        self, multiple: bool = False
    ) -> tuple[dict[str, GeneEvidence], dict[str, list[Variant]]]:
        """Per-gene GeneEvidence + per-gene variant lists (the array
        analogue of groupReads + groupVariants)."""
        ev = self.ev
        gene_of = np.empty(len(self.variants), dtype=np.int64)
        local_of = np.empty(len(self.variants), dtype=np.int64)
        name_to_gi = {n: i for i, n in enumerate(self.gene_names)}
        per_gene_variants: dict[str, list[Variant]] = {}
        counters = [0] * len(self.gene_names)
        for g, v in enumerate(self.variants):
            gi = name_to_gi[v.ref]
            gene_of[g] = gi
            local_of[g] = counters[gi]
            counters[gi] += 1
            per_gene_variants.setdefault(v.ref, []).append(v)

        rows = self.selectedPairs(multiple=multiple)
        out: dict[str, GeneEvidence] = {}
        for gi, gname in enumerate(self.gene_names):
            grows = rows[ev.gene[rows] == gi]
            if not len(grows):
                continue
            mrows = np.empty(2 * len(grows), dtype=np.int64)
            mrows[0::2] = 2 * grows
            mrows[1::2] = 2 * grows + 1
            pp, pi = csrSelectRows(ev.pos_indptr, ev.pos_idx, mrows)
            np_, ni = csrSelectRows(ev.neg_indptr, ev.neg_idx, mrows)
            out[gname] = GeneEvidence(
                gene=gname,
                nh=ev.nh[grows].astype(np.int32),
                pair_index=grows,
                pos_indptr=pp,
                pos_idx=local_of[pi],
                neg_indptr=np_,
                neg_idx=local_of[ni],
            )
        return out, per_gene_variants

    # ------------------------------------------------------------------
    def toReadsData(self) -> ReadsAndVariantsData:
        """PairRead materialisation (JSON/compat boundary; passing pairs
        only, like the reference's filtered SAM parse)."""
        ev = self.ev
        pos_ids = ev.ids[ev.pos_idx].tolist()
        neg_ids = ev.ids[ev.neg_idx].tolist()
        pp = ev.pos_indptr.tolist()
        np_ = ev.neg_indptr.tolist()
        gene_l = ev.gene.tolist()
        nh_l = ev.nh.tolist()
        reads = []
        for n in np.nonzero(ev.pass_mask)[0].tolist():
            a, b = 2 * n, 2 * n + 1
            reads.append(
                PairRead(
                    backbone=self.gene_names[gene_l[n]],
                    multiple=nh_l[n],
                    lpv=pos_ids[pp[a]:pp[a + 1]],
                    lnv=neg_ids[np_[a]:np_[a + 1]],
                    rpv=pos_ids[pp[b]:pp[b + 1]],
                    rnv=neg_ids[np_[b]:np_[b + 1]],
                    pair_index=n,
                )
            )
        return {"variants": list(self.variants), "reads": reads}


# ---------------------------------------------------------------------------
# npz persistence: the product's typing-ready artifact.  Much cheaper to
# write/read than the (compat) .variant.json; the catalog itself is NOT
# stored — it is reproducible from the index, and `loadEvidence` verifies
# the size matches before trusting it.
# ---------------------------------------------------------------------------

def catalogFingerprint(catalog: list[Variant]) -> str:
    """Content digest of the variant catalog: saved evidence indices are
    only meaningful against the exact catalog they were built with (a
    same-size catalog from a different DB would silently remap them)."""
    import hashlib

    h = hashlib.sha1()
    for v in catalog:
        h.update(f"{v.id}\t{v.ref}\t{v.pos}\t{v.typ}\t{v.val}\n".encode())
    return h.hexdigest()


def saveEvidence(bundle: EvidenceBundle, path: str) -> None:
    ev = bundle.ev
    novel = np.array(
        [
            [bundle.gene_names.index(v.ref), v.pos, "ACGT".index(str(v.val))]
            for v in ev.novel_variants
        ],
        dtype=np.int64,
    ).reshape(-1, 3)
    np.savez_compressed(
        path,
        gene=ev.gene,
        nh=ev.nh,
        nm=ev.nm,
        pass_mask=ev.pass_mask,
        pos_indptr=ev.pos_indptr,
        pos_idx=ev.pos_idx,
        neg_indptr=ev.neg_indptr,
        neg_idx=ev.neg_idx,
        novel=novel,
        n_catalog=np.int64(ev.n_catalog),
        catalog_sha=np.array(
            catalogFingerprint(bundle.variants[: ev.n_catalog])
        ),
    )


def loadEvidence(
    path: str, catalog: list[Variant], gene_names: list[str]
) -> EvidenceBundle:
    """Rebuild an EvidenceBundle from npz + the index's catalog.

    Novel SNVs are reconstructed with fresh nv ids in saved order — the
    registration order, so ids match the original run's exactly."""
    from ..align.annotate import EvidenceArrays

    z = np.load(path)
    n_catalog = int(z["n_catalog"])
    if n_catalog != len(catalog):
        raise ValueError(
            f"evidence file {path} was built against a {n_catalog}-variant "
            f"catalog; current index has {len(catalog)} — rebuild or use "
            "the .variant.json path"
        )
    if "catalog_sha" in z.files:
        want = catalogFingerprint(catalog)
        have = str(z["catalog_sha"])
        if have != want:
            raise ValueError(
                f"evidence file {path} was built against a different "
                f"{n_catalog}-variant catalog (fingerprint {have[:12]} != "
                f"{want[:12]}) — rebuild or use the .variant.json path"
            )
    alloc = IdAllocator()
    novel = [
        Variant(
            pos=int(p), typ="single", ref=gene_names[int(g)],
            val="ACGT"[int(b)], id=alloc.nextNovel(),
        )
        for g, p, b in z["novel"]
    ]
    ids = np.concatenate(
        [
            np.array([str(v.id) for v in catalog], dtype=object),
            np.array([str(v.id) for v in novel], dtype=object),
        ]
    ) if len(catalog) + len(novel) else np.zeros(0, dtype=object)
    ev = EvidenceArrays(
        gene=z["gene"],
        nh=z["nh"],
        nm=z["nm"],
        pass_mask=z["pass_mask"],
        pos_indptr=z["pos_indptr"],
        pos_idx=z["pos_idx"],
        neg_indptr=z["neg_indptr"],
        neg_idx=z["neg_idx"],
        ids=ids,
        novel_variants=novel,
        n_catalog=n_catalog,
    )
    return EvidenceBundle(ev, list(catalog) + novel, gene_names)
