"""
Pipelined align+annotate over chunked batches.

The exact product path alternates device phases (seed/score/pair-select,
traceback) with pure host phases (variant annotation).  Run one-shot,
the device idles during annotation and the host idles during the
kernels.  `alignAnnotateStream` overlaps them: while chunk k is being
annotated on the host, chunk k+1's seed/score/pair-select kernels are
already executing on the device (via GraphAligner.alignPairs'
`host_work` hook, which fires after dispatch and before the first
blocking download).

Output is bit-identical to `annotator.annotate(aligner.alignPairs(...))`
on the whole batch: per-chunk EvidenceArrays are merged with the novel
SNV registry rebuilt in global first-occurrence order (the one-shot
order, since chunks are processed in row order).

The reference's analogue is hisat2's own reader/aligner thread pipeline
feeding a downstream typing process (hisat2.py:68-92 drives the
subprocess; the OS pipeline overlaps them).  Here the overlap is
explicit and in-process.

Error-correction mode falls back to one-shot: its minority-base pileup
is batch-global (annotate.py oracle), so chunk-local pileups would
change results.
"""
from __future__ import annotations

import numpy as np

from ..index.variants import IdAllocator, Variant
from .annotate import EvidenceArrays, VariantAnnotator
from .pipeline import GraphAligner, _seg


def mergeEvidence(
    annotator: VariantAnnotator, chunks: list[EvidenceArrays]
) -> EvidenceArrays:
    """Concatenate per-chunk EvidenceArrays into one batch-wide object.

    Novel SNVs are re-registered in global first-occurrence order and
    chunk-local indices [Vtot, Vtot+U_k) remapped, so the result equals
    a single annotate call over the concatenated batch.
    """
    if not chunks:
        # empty batch (e.g. an all-filtered FASTQ pair): an empty
        # evidence object shaped by the annotator's catalog
        n_cat = int(annotator.gvar_start[-1])
        zi32 = np.zeros(0, np.int32)
        return EvidenceArrays(
            gene=zi32, nh=zi32, nm=np.zeros((2, 0), np.int32),
            pass_mask=np.zeros(0, bool),
            pos_indptr=np.zeros(1, np.int64), pos_idx=np.zeros(0, np.int64),
            neg_indptr=np.zeros(1, np.int64), neg_idx=np.zeros(0, np.int64),
            ids=np.array([str(v.id) for v in annotator.catalogVariants()],
                         dtype=object),
            novel_variants=[], n_catalog=n_cat,
        )
    if len(chunks) == 1:
        return chunks[0]
    Vtot = chunks[0].n_catalog
    alloc = IdAllocator()
    rank: dict[tuple, int] = {}
    merged_novel: list[Variant] = []
    pos_parts, neg_parts = [], []
    for ev in chunks:
        remap = np.empty(len(ev.novel_variants), dtype=np.int64)
        for u, v in enumerate(ev.novel_variants):
            key = (v.ref, v.pos, v.val)
            r = rank.get(key)
            if r is None:
                r = rank[key] = len(merged_novel)
                merged_novel.append(
                    Variant(
                        pos=v.pos, typ=v.typ, ref=v.ref, val=v.val,
                        id=alloc.nextNovel(),
                    )
                )
            remap[u] = Vtot + r
        for src, parts in ((ev.pos_idx, pos_parts), (ev.neg_idx, neg_parts)):
            out = src
            if len(remap):
                novel_rows = src >= Vtot
                if novel_rows.any():
                    out = src.copy()
                    out[novel_rows] = remap[src[novel_rows] - Vtot]
            parts.append(out)

    def catIndptr(get):
        parts, base = [np.zeros(1, dtype=np.int64)], 0
        for ev in chunks:
            parts.append(get(ev)[1:].astype(np.int64) + base)
            base += int(get(ev)[-1])
        return np.concatenate(parts)

    ids_all = np.concatenate(
        [
            chunks[0].ids[:Vtot],
            np.array([str(v.id) for v in merged_novel], dtype=object),
        ]
    )
    return EvidenceArrays(
        gene=np.concatenate([ev.gene for ev in chunks]),
        nh=np.concatenate([ev.nh for ev in chunks]),
        nm=np.concatenate([ev.nm for ev in chunks], axis=1),
        pass_mask=np.concatenate([ev.pass_mask for ev in chunks]),
        pos_indptr=catIndptr(lambda e: e.pos_indptr),
        pos_idx=np.concatenate(pos_parts),
        neg_indptr=catIndptr(lambda e: e.neg_indptr),
        neg_idx=np.concatenate(neg_parts),
        ids=ids_all,
        novel_variants=merged_novel,
        n_catalog=Vtot,
    )


def alignAnnotateEvidence(
    aligner: GraphAligner,
    annotator: VariantAnnotator,
    codes1: np.ndarray,
    len1: np.ndarray,
    codes2: np.ndarray,
    len2: np.ndarray,
    chunk: int | None = None,
    exon_only: bool = False,
    error_correction: bool = False,
    chunk_hook=None,
) -> tuple[EvidenceArrays, np.ndarray, np.ndarray]:
    """Pipelined exact product path, array-form endpoint: returns
    (EvidenceArrays, depth, pileup) bit-identical to the one-shot
    `annotateEvidence(alignPairs(...))`.

    `chunk` defaults to the aligner's CHUNK_PAIRS (65536): batches that
    size or smaller run exactly one-shot, and bigger batches — which
    alignPairs would split into CHUNK_PAIRS chunks anyway — get the
    annotation overlap for free, with no extra dispatches.  Smaller
    chunks buy more overlap per boundary but add per-chunk dispatch +
    download latency; on a remote/tunneled device that latency dominates
    (measured: scripts/profile_stream.py), so only lower this on a
    locally attached chip.  Use one of the aligner's pad buckets
    (GraphAligner._bucket ladder: 256, 1024, 4096, 16384, 32768,
    65536) — other sizes just pad up to the next bucket.

    `chunk_hook(offset, result, pass_mask)`, when given, fires once per
    chunk while that chunk's AlignResult scratch views are still valid —
    use it to capture per-pair placements (`pipeline/run.py` saves the
    passing rows for novel discovery).  `offset` is the chunk's first
    pair index in the full batch.
    """
    if chunk is None:
        chunk = aligner.CHUNK_PAIRS
    N = len(codes1)
    # fused device classification (align/device_annotate.py): per-base
    # evidence never crosses the link; only packed per-mate summaries do.
    # Placements capture (chunk_hook), error correction and exon-only
    # use the host path.
    if not error_correction and not exon_only and chunk_hook is None:
        from .device_annotate import getDeviceAnnotator

        da = getDeviceAnnotator(aligner, annotator)
        if da is not None:
            out = _deviceAnnotateDriver(
                da, aligner, annotator, codes1, len1, codes2, len2,
                min(chunk, aligner.CHUNK_PAIRS),
            )
            if out is not None:
                return out
    if error_correction and N > chunk:
        # two-pass streamed EC: the minority-base pileup is batch-global
        # (reference hisat2.py:609-654 pileups the whole BAM), so pass 1
        # aligns all chunks — each previous chunk's raw pileup accumulates
        # on host inside the next chunk's device window — and pass 2
        # classifies with the corrected bases.  Bit-identical to one-shot
        # EC (tests/test_stream.py).
        return _streamWithErrorCorrection(
            aligner, annotator, codes1, len1, codes2, len2,
            min(chunk, aligner.CHUNK_PAIRS), exon_only, chunk_hook,
        )
    if error_correction or N <= chunk:
        result = aligner.alignPairs(codes1, len1, codes2, len2)
        ev, depth, pileup = annotator.annotateEvidence(
            result, exon_only=exon_only, error_correction=error_correction
        )
        if chunk_hook is not None:
            chunk_hook(0, result, ev.pass_mask)
        return ev, depth, pileup
    chunk = min(chunk, aligner.CHUNK_PAIRS)
    impl = annotator._impl()

    evs: list[EvidenceArrays] = []
    depth_sum = pileup_sum = None
    pending = None  # previous chunk's AlignResult (scratch views)

    def annotatePending():
        nonlocal pending, depth_sum, pileup_sum
        if pending is None:
            return
        offset, result = pending
        ev, depth, pileup = impl(result, exon_only=exon_only)
        if chunk_hook is not None:
            chunk_hook(offset, result, ev.pass_mask)
        pending = None
        evs.append(ev)
        depth_sum = depth if depth_sum is None else depth_sum + depth
        pileup_sum = pileup if pileup_sum is None else pileup_sum + pileup

    # annotate the previous chunk in a worker thread so it overlaps the
    # CURRENT chunk's blocking downloads too, not just its kernels: the
    # main thread releases the GIL inside the device->host copies, and
    # the annotate core is a GIL-free native call, so the two genuinely
    # run in parallel.  The thread only READS the previous chunk's
    # scratch views, which stay valid until the current chunk's finalize
    # — alignPairs' host_join hook joins exactly there.  chunk_hook
    # callers keep the in-window path (hooks may assume the caller's
    # thread); KGT_NO_THREAD_ANNOTATE=1 forces it for A/B runs.
    import os as _os
    from concurrent.futures import ThreadPoolExecutor

    use_thread = chunk_hook is None and not _os.environ.get(
        "KGT_NO_THREAD_ANNOTATE"
    )
    pool = ThreadPoolExecutor(max_workers=1) if use_thread else None
    ann: dict = {"fut": None}

    def joinAnnotate():
        fut = ann["fut"]
        if fut is not None:
            ann["fut"] = None
            with _seg("join_annotate"):
                fut.result()  # re-raises worker exceptions here

    # 1-deep pipeline: chunk k+1's UPLOAD is prefetched inside chunk
    # k's window, but its monolith dispatch waits until chunk k's
    # downloads are done.  A 2-deep variant (dispatch k+1 before
    # finishing k, via dispatchPairs/finishPairs) was measured and
    # REJECTED on the tunneled TPU: queuing program k+1 ahead of chunk
    # k's output downloads starves them on the link's serialized
    # command queue (download_winners 1237 ms vs ~550 for 4 chunks;
    # 194-250k vs 322-344k reads/s — docs/BENCH_NOTES.md round 4).
    prepared: dict[int, dict] = {}
    try:
        for s in range(0, N, chunk):
            nxt = s + chunk

            def hostWork(nxt=nxt):
                # overlap window: annotate the previous chunk AND start
                # the NEXT chunk's host->device upload (the transfer is
                # the single largest critical-path item on a tunneled
                # link — docs/BENCH_NOTES.md round 4)
                if nxt < N:
                    with _seg("window_prefetch"):
                        prepared[nxt] = aligner.prepareUpload(
                            codes1[nxt : nxt + chunk],
                            len1[nxt : nxt + chunk],
                            codes2[nxt : nxt + chunk],
                            len2[nxt : nxt + chunk],
                        )
                if use_thread:
                    ann["fut"] = pool.submit(annotatePending)
                else:
                    with _seg("window_annotate"):
                        annotatePending()

            result_next = aligner.alignPairs(
                codes1[s : s + chunk], len1[s : s + chunk],
                codes2[s : s + chunk], len2[s : s + chunk],
                host_work=hostWork,
                prepared=prepared.pop(s, None),
                host_join=joinAnnotate if use_thread else None,
            )
            pending = (s, result_next)
        with _seg("tail_annotate"):
            annotatePending()
    finally:
        if pool is not None:
            pool.shutdown(wait=True)

    with _seg("merge_evidence"):
        merged = mergeEvidence(annotator, evs)
    return merged, depth_sum, pileup_sum


def _deviceAnnotateDriver(
    da, aligner, annotator, codes1, len1, codes2, len2, chunk
):
    """Drive the fused device-annotate path chunk by chunk.

    Chunk k's evidence download + host assembly runs inside chunk k+1's
    `host_work` window (after the monolith dispatch, before its blocking
    winner download) — the same overlap the host path uses.  A chunk
    whose runtime caps overflow is re-run through the host path; if the
    FIRST chunk overflows we return None so the caller's host path
    handles everything (cheaper than re-dispatching every chunk).
    """
    N = len(codes1)
    evs: list[EvidenceArrays] = []
    sums = {"depth": None, "pileup": None}
    pending: list = []  # [finish] of the previous chunk

    def hostChunk(s):
        result = aligner.alignPairs(
            codes1[s: s + chunk], len1[s: s + chunk],
            codes2[s: s + chunk], len2[s: s + chunk],
        )
        return annotator.annotateEvidence(result)

    def finishPending():
        if not pending:
            return
        s, fin = pending.pop()
        got = fin() if fin is not None else None
        if got is None:
            got = hostChunk(s)
        ev, depth, pileup = got
        evs.append(ev)
        sums["depth"] = depth if sums["depth"] is None \
            else sums["depth"] + depth
        sums["pileup"] = pileup if sums["pileup"] is None \
            else sums["pileup"] + pileup

    first = True
    for s in range(0, N, chunk):
        fin = da.dispatchChunk(
            codes1[s: s + chunk], len1[s: s + chunk],
            codes2[s: s + chunk], len2[s: s + chunk],
            host_work=finishPending,
        )
        if fin is None and first:
            return None  # e.g. hard-job overflow on the very first chunk
        pending.append((s, fin))
        first = False
    finishPending()

    if len(evs) == 1:
        ev = evs[0]
    else:
        ev = mergeEvidence(annotator, evs)
    return ev, sums["depth"], sums["pileup"]


def _ecRawPileup(annotator: VariantAnnotator, result) -> np.ndarray:
    """Raw consumed-base pileup over ALL mapped pairs — the EC input
    (reference hisat2.py:609-654 pileups the unfiltered BAM)."""
    Gt = len(annotator.tables)
    Lmax = annotator.index.backbone.shape[1]
    mapped = result.gene >= 0
    RL = result.cols_l.shape[1]
    j = np.arange(RL, dtype=np.int32)[None, :]
    total = np.zeros(Gt * Lmax * 5, dtype=np.int64)
    for cols, bases, lens in (
        (result.cols_l, result.bases_l, result.len_l),
        (result.cols_r, result.bases_r, result.len_r),
    ):
        consumed = (cols >= 0) & (j < lens[:, None]) & mapped[:, None]
        rows, cposs = np.nonzero(consumed)
        lin = (
            result.gene[rows].astype(np.int64) * Lmax + cols[rows, cposs]
        ) * 5 + bases[rows, cposs]
        total += np.bincount(lin, minlength=Gt * Lmax * 5)
    return total.reshape(Gt, Lmax, 5)


def _applyEcBases(
    annotator: VariantAnnotator, result, ec_pileup: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Minority-base correction -> corrected (bases_l, bases_r) copies;
    the same arithmetic as annotate.py's in-batch EC (columns with depth
    >= 20 where the read's base is <= 20% get the >= 80% majority, or N)."""
    Gt = len(annotator.tables)
    Lmax = annotator.index.backbone.shape[1]
    mapped = result.gene >= 0
    safe_gene = np.clip(result.gene, 0, Gt - 1)
    RL = result.cols_l.shape[1]
    j = np.arange(RL, dtype=np.int32)[None, :]
    out = []
    for cols, bases, lens in (
        (result.cols_l, result.bases_l, result.len_l),
        (result.cols_r, result.bases_r, result.len_r),
    ):
        in_len = j < lens[:, None]
        consumed = (cols >= 0) & in_len & mapped[:, None]
        bb = annotator.seq_g[safe_gene[:, None], np.clip(cols, 0, Lmax - 1)]
        cand = consumed & (bases != bb) & (bases < 4)
        rows, cposs = np.nonzero(cand)
        b = bases.copy()
        if len(rows):
            from .annotate import minorityCorrection

            counts = ec_pileup[result.gene[rows], cols[rows, cposs], :4]
            fix, maj, ton = minorityCorrection(counts, bases[rows, cposs])
            b[rows[fix], cposs[fix]] = maj[fix]
            b[rows[ton], cposs[ton]] = 4
        out.append(b)
    return out[0], out[1]


def _rawDepthPileup(
    annotator: VariantAnnotator, result, pass_mask: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Depth/pileup from RAW bases of passing unique pairs (the EC'd
    classification decides pass; the counts stay uncorrected, like the
    reference's BAM pileup)."""
    Gt = len(annotator.tables)
    Lmax = annotator.index.backbone.shape[1]
    RL = result.cols_l.shape[1]
    j = np.arange(RL, dtype=np.int32)[None, :]
    uniq = pass_mask & (result.nh == 1) & (result.gene >= 0)
    total = np.zeros(Gt * Lmax * 5, dtype=np.int64)
    for cols, bases, lens in (
        (result.cols_l, result.bases_l, result.len_l),
        (result.cols_r, result.bases_r, result.len_r),
    ):
        consumed = (cols >= 0) & (j < lens[:, None]) & uniq[:, None]
        rows, cposs = np.nonzero(consumed)
        lin = (
            result.gene[rows].astype(np.int64) * Lmax + cols[rows, cposs]
        ) * 5 + bases[rows, cposs]
        total += np.bincount(lin, minlength=Gt * Lmax * 5)
    pileup = total.reshape(Gt, Lmax, 5).astype(np.int32)
    return pileup.sum(axis=-1, dtype=np.int32), pileup


def _streamWithErrorCorrection(
    aligner, annotator, codes1, len1, codes2, len2,
    chunk, exon_only, chunk_hook,
):
    import dataclasses

    from .pipeline import AlignResult

    N = len(codes1)
    Gt = len(annotator.tables)
    Lmax = annotator.index.backbone.shape[1]
    ec_sum = np.zeros((Gt, Lmax, 5), dtype=np.int64)
    saved: list[tuple[int, AlignResult]] = []
    pending: list = []

    def pileupPending():
        nonlocal ec_sum
        if pending:
            ec_sum += _ecRawPileup(annotator, pending.pop())

    for s in range(0, N, chunk):
        res = aligner.alignPairs(
            codes1[s:s + chunk], len1[s:s + chunk],
            codes2[s:s + chunk], len2[s:s + chunk],
            host_work=pileupPending,
        )
        # chunk results are scratch views — copy before the next dispatch
        resc = AlignResult(
            **{
                k: np.array(getattr(res, k))
                for k in AlignResult.__dataclass_fields__
            }
        )
        saved.append((s, resc))
        pending.append(resc)
    pileupPending()

    impl = annotator._impl()
    evs: list[EvidenceArrays] = []
    depth_sum = pileup_sum = None
    ecp = ec_sum.astype(np.int32)
    for s, res in saved:
        bl, br = _applyEcBases(annotator, res, ecp)
        res2 = dataclasses.replace(res, bases_l=bl, bases_r=br)
        ev, _, _ = impl(res2, exon_only=exon_only)
        depth, pileup = _rawDepthPileup(annotator, res, ev.pass_mask)
        if chunk_hook is not None:
            chunk_hook(s, res, ev.pass_mask)
        evs.append(ev)
        depth_sum = depth if depth_sum is None else depth_sum + depth
        pileup_sum = pileup if pileup_sum is None else pileup_sum + pileup

    return mergeEvidence(annotator, evs), depth_sum, pileup_sum


def alignAnnotateStream(
    aligner: GraphAligner,
    annotator: VariantAnnotator,
    codes1: np.ndarray,
    len1: np.ndarray,
    codes2: np.ndarray,
    len2: np.ndarray,
    chunk: int | None = None,
    exon_only: bool = False,
    error_correction: bool = False,
    chunk_hook=None,
) -> tuple[dict, np.ndarray, np.ndarray, np.ndarray]:
    """`alignAnnotateEvidence` + PairRead materialisation; same contract
    as `VariantAnnotator.annotate` (reads+variants dict, depth, pileup,
    pass mask), bit-identical to the one-shot path."""
    ev, depth, pileup = alignAnnotateEvidence(
        aligner, annotator, codes1, len1, codes2, len2,
        chunk=chunk, exon_only=exon_only,
        error_correction=error_correction, chunk_hook=chunk_hook,
    )
    return annotator.assembleReadsData(ev, depth, pileup)
