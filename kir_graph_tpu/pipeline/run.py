"""
Per-sample pipeline stages: FASTQ -> variants JSON -> depth TSV -> CN -> alleles.

Mirrors the reference stage graph (main.py:124-220) with the same
file-suffix checkpointing convention (".variant", ".no_multi.depth",
".p75.CNgroup", ".pv" — SURVEY §5 "FileNameFlow"): every stage checks its
output file before recomputing, so interrupted cohorts resume for free.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..align.annotate import VariantAnnotator
from ..align.encode import encodeReads
from ..align.pipeline import GraphAligner
from ..align.stream import alignAnnotateEvidence
from ..cn.predict import filterDepth, loadCN, predictSamplesCN
from ..index.build import KirIndex
from ..sim.reads import readFastq
from ..trace import TIMER
from ..typing.facade import selectKirTypingModel
from ..typing.pairread import writeReadsAndVariantsData
from ..utils import logger


class SamplePipeline:
    """Holds the device-resident index + aligner; drives per-sample stages."""

    def __init__(self, index: KirIndex, num_editdist: int = 4):
        self.index = index
        # annot_editdist must equal the annotator's num_editdist: the
        # aligner's device pairing and the (device-)annotate pass/NM
        # filters are one contract (device_annotate._buildTables refuses
        # a mismatched pair)
        self.aligner = GraphAligner(index, annot_editdist=num_editdist)
        self.annotator = VariantAnnotator(index, num_editdist=num_editdist)
        # background artifact writer: per-sample file emission (~1 s of
        # JSON/TSV/npz serialisation) overlaps the NEXT sample's align.
        # All inputs are host-owned copies (the bundle is built on the
        # main thread before the annotator can register new novel
        # variants); consumers flush before reading (flushWrites).
        import threading

        self._writer = None
        self._write_futs: dict[str, object] = {}
        self._write_lock = threading.Lock()

    def _writerPool(self):
        if self._writer is None:
            from concurrent.futures import ThreadPoolExecutor

            # two workers: the mapCohort align loop produces a sample
            # every ~0.5 s while one sample's artifact emission costs
            # ~1 s — a single writer becomes the cohort bottleneck and
            # the flush barrier pays the difference (measured on the
            # N=100 TPU run).  Samples' files are disjoint.
            self._writer = ThreadPoolExecutor(
                max_workers=2, thread_name_prefix="kgt-write"
            )
        return self._writer

    def flushWrites(self) -> None:
        """Block until every currently-queued sample's artifacts are on
        disk (re-raises writer exceptions).  Call before any stage that
        reads the mapped outputs back (CN's depth TSV, typing's
        evidence).  Concurrent-safe: flushers wait on a snapshot without
        stealing other threads' futures (real.py runs per-sample chains
        on a shared pipeline), so every caller's own queued writes are
        guaranteed durable when its flush returns."""
        with self._write_lock:
            futs = dict(self._write_futs)
        errs = []
        for fut in futs.values():
            try:
                fut.result()
            except Exception as e:  # surfaced to the first flusher
                errs.append(e)
        with self._write_lock:
            for key, fut in futs.items():
                if self._write_futs.get(key) is fut:
                    del self._write_futs[key]
        if errs:
            raise errs[0]

    # ------------------------------------------------------------------
    def mapSample(
        self, name: str, fq1: str, fq2: str, _batch=None
    ) -> str:
        """FASTQ pair -> {name}.variant.json + {name}.variant.no_multi.depth.tsv

        Fuses the reference's hisatMap + extractVariantFromBam + bam2Depth
        (main.py:139-158) into one device pass; returns the processed-name
        prefix ("{name}.variant").
        """
        out_prefix = name + ".variant"
        depth_tsv = out_prefix + ".no_multi.depth.tsv"
        with self._write_lock:
            pending = self._write_futs.pop(out_prefix, None)
        if pending is not None:  # re-mapping a sample queued for write
            pending.result()
        if os.path.exists(out_prefix + ".json") and os.path.exists(depth_tsv):
            logger.info(f"[Graph] {out_prefix} exists, skip mapping")
            return out_prefix

        logger.info(f"[Graph] Aligning {fq1} / {fq2}")
        if _batch is not None:  # mapCohort already decoded the FASTQs
            c1, l1, c2, l2 = _batch
        else:
            with TIMER.stage("io.load_fastq"):
                from ..native_io import loadFastqEncoded

                c1, l1 = loadFastqEncoded(fq1)
                c2, l2 = loadFastqEncoded(fq2)
                assert len(c1) == len(c2), "mate FASTQs must pair up"
        # pipelined align+annotate: chunk k+1's kernels execute on device
        # while chunk k is annotated on host (align/stream.py; output is
        # bit-identical to the one-shot path).  Placements for novel
        # discovery are captured per chunk while the chunk's scratch
        # views are still valid.
        placements: list[dict] = []
        map_stats = {"total": 0, "mapped": 0, "unique": 0}

        def capturePlacements(offset, result, pass_mask):
            map_stats["total"] += len(result.gene)
            map_stats["mapped"] += int((result.gene >= 0).sum())
            map_stats["unique"] += int((pass_mask & (result.nh == 1)).sum())
            rows = np.nonzero(pass_mask)[0]
            placements.append(
                dict(
                    pair_rows=(offset + rows).astype(np.int32),
                    gene=result.gene[rows].astype(np.int32),
                    cols_l=result.cols_l[rows].astype(np.int32),
                    cols_r=result.cols_r[rows].astype(np.int32),
                    bases_l=result.bases_l[rows].astype(np.int8),
                    bases_r=result.bases_r[rows].astype(np.int8),
                )
            )

        with TIMER.stage("align.stream"):
            ev, depth, pileup = alignAnnotateEvidence(
                self.aligner, self.annotator, c1, l1, c2, l2,
                chunk_hook=capturePlacements,
            )
            passed = ev.pass_mask

        self._queueOutputs(
            out_prefix, depth_tsv, ev, depth, pileup, placements, map_stats
        )
        return out_prefix

    def _queueOutputs(
        self, out_prefix, depth_tsv, ev, depth, pileup, placements,
        map_stats,
    ) -> None:
        """Snapshot a mapped sample's outputs on the main thread and
        queue the pure-IO emission on the background writer."""
        with TIMER.stage("io.prepare_outputs"):
            # host-owned snapshot for the background writer: the bundle
            # captures the variant catalog NOW (the next sample's
            # annotate may register novel variants), device depth/pileup
            # become host copies, placement rows concatenate
            bundle = self.annotator.evidenceBundle(ev)
            depth_np = np.asarray(depth)
            pileup_np = np.asarray(pileup)
            placement_arrs = {
                k: np.concatenate([p[k] for p in placements])
                for k in placements[0]
            }
            stat = {
                "total": map_stats["total"] * 2,
                "mapped": map_stats["mapped"] * 2,
                "passed": int(ev.pass_mask.sum()) * 2,
                "unique": map_stats["unique"] * 2,
            }

        def writeOutputs():
            with TIMER.stage("io.write_outputs"):
                from ..typing.evidence import saveEvidence

                # typing-ready array artifact (product path) + the
                # reference-compatible .variant.json (interop/compat)
                saveEvidence(bundle, out_prefix + ".evidence.npz")
                writeReadsAndVariantsData(
                    bundle.toReadsData(), out_prefix + ".json"
                )
                self.writeDepthTsv(depth_np, depth_tsv)
                np.save(out_prefix + ".pileup.npy", pileup_np)
                # compact per-passing-pair placements: lets novel
                # discovery pileup the assigned read group only (the
                # reference's qname-filtered no_multi BAM pileup,
                # novel_discover.py:237-264)
                np.savez_compressed(
                    out_prefix + ".placements.npz", **placement_arrs
                )
                # mapping stats (samtools-flagstat stand-in, reference
                # plot.py:44-68)
                import json

                with open(out_prefix + ".stat.json", "w") as f:
                    json.dump(stat, f)

        if os.environ.get("KGT_SYNC_WRITES"):
            writeOutputs()
        else:
            # pure-IO serialisation overlaps the next sample's align;
            # flushWrites() joins before anything reads the files back
            fut = self._writerPool().submit(writeOutputs)
            with self._write_lock:
                self._write_futs[out_prefix] = fut

    # ------------------------------------------------------------------
    def mapCohort(self, jobs: list[tuple[str, str, str]]) -> list[str]:
        """Map a cohort with CROSS-SAMPLE overlap.

        The per-sample one-shot path leaves the device idle during each
        sample's host tail (annotate, evidence bundling, output
        snapshot) and the host idle during each device phase.  Here
        sample k+1's upload is prefetched and its monolith dispatched
        while sample k's annotate + output queueing run on the host —
        the same 1-deep overlap align/stream.py uses across chunks,
        lifted to sample granularity.  Bit-identical outputs: every
        sample still runs the exact alignPairs -> annotateEvidence
        pipeline in cohort order (tests/test_e2e.py::test_map_cohort).

        Samples larger than one device chunk (or with a queued write
        pending) fall back to mapSample, which streams internally.
        """
        from ..native_io import loadFastqEncoded

        out = [name + ".variant" for name, _, _ in jobs]
        todo: list[int] = []
        for i, (name, fq1, fq2) in enumerate(jobs):
            with self._write_lock:
                pending = self._write_futs.pop(out[i], None)
            if pending is not None:
                pending.result()
            if os.path.exists(out[i] + ".json") and os.path.exists(
                out[i] + ".no_multi.depth.tsv"
            ):
                logger.info(f"[Graph] {out[i]} exists, skip mapping")
            else:
                todo.append(i)
        if not todo:
            return out

        def load(i):
            _, fq1, fq2 = jobs[i]
            with TIMER.stage("io.load_fastq"):
                c1, l1 = loadFastqEncoded(fq1)
                c2, l2 = loadFastqEncoded(fq2)
                assert len(c1) == len(c2), "mate FASTQs must pair up"
            return c1, l1, c2, l2

        def annotate(i, result):
            """Host tail of sample i, run inside sample i+1's device
            window (result's scratch views stay valid until the second
            finalize after it — alignPairs' double-buffer contract)."""
            ev, depth, pileup = self.annotator.annotateEvidence(result)
            map_stats = {
                "total": len(result.gene),
                "mapped": int((result.gene >= 0).sum()),
                "unique": int((ev.pass_mask & (result.nh == 1)).sum()),
            }
            rows = np.nonzero(ev.pass_mask)[0]
            placements = [
                dict(
                    pair_rows=rows.astype(np.int32),
                    gene=result.gene[rows].astype(np.int32),
                    cols_l=result.cols_l[rows].astype(np.int32),
                    cols_r=result.cols_r[rows].astype(np.int32),
                    bases_l=result.bases_l[rows].astype(np.int8),
                    bases_r=result.bases_r[rows].astype(np.int8),
                )
            ]
            self._queueOutputs(
                out[i], out[i] + ".no_multi.depth.tsv",
                ev, depth, pileup, placements, map_stats,
            )

        chunk = self.aligner.CHUNK_PAIRS
        with TIMER.stage("align.cohort"):
            batches: dict[int, tuple] = {todo[0]: load(todo[0])}
            prepared: dict[int, dict] = {}
            prev: tuple[int, object] | None = None  # (index, AlignResult)
            for pos, i in enumerate(todo):
                batch = batches.pop(i)
                if len(batch[0]) > chunk or os.environ.get(
                    "KGT_NO_COHORT_OVERLAP"
                ):
                    # oversized: finish the pipeline state, then stream
                    # (the already-decoded batch rides along)
                    if prev is not None:
                        annotate(*prev)
                        prev = None
                    prepared.pop(i, None)
                    self.mapSample(*jobs[i], _batch=batch)
                    if pos + 1 < len(todo):
                        batches[todo[pos + 1]] = load(todo[pos + 1])
                    continue

                def work(pos=pos, prev_snapshot=prev):
                    # runs while sample i's kernels + uploads execute
                    if pos + 1 < len(todo):
                        nxt = todo[pos + 1]
                        nb = batches[nxt] = load(nxt)
                        if len(nb[0]) <= chunk:
                            prepared[nxt] = self.aligner.prepareUpload(*nb)
                    if prev_snapshot is not None:
                        annotate(*prev_snapshot)

                result = self.aligner.alignPairs(
                    *batch,
                    prepared=prepared.pop(i, None),
                    host_work=work,
                )
                prev = (i, result)
            if prev is not None:
                annotate(*prev)
        return out

    def writeDepthTsv(self, depth: np.ndarray, filename: str) -> None:
        """[G, Lmax] depth -> samtools-depth-shaped TSV (1-based positions)."""
        rows = []
        for gi, gname in enumerate(self.index.gene_names):
            L = int(self.index.lengths[gi])
            rows.append(
                pd.DataFrame(
                    {
                        "gene": gname,
                        "pos": np.arange(1, L + 1),
                        "depth": depth[gi, :L],
                    }
                )
            )
        pd.concat(rows).to_csv(filename, sep="\t", header=False, index=False)

    # ------------------------------------------------------------------
    def depthStage(self, processed: str, exon_region_only: bool = False) -> str:
        """Optionally restrict depth to exon regions (reference --cn-exon)."""
        depth_file = processed + ".no_multi.depth"
        if exon_region_only:
            out = depth_file + ".exon"
            if not os.path.exists(out + ".tsv"):
                with TIMER.stage("depth.exon_filter"):
                    filterDepth(
                        depth_file + ".tsv", out + ".tsv",
                        self.index.exonRegions(),
                    )
            return out + ".tsv"
        return depth_file + ".tsv"

    # ------------------------------------------------------------------
    def cnSample(
        self,
        depth_file: str,
        cn_select: str = "p75",
        cn_algorithm: str = "CNgroup",
        assume_3DL3_diploid: bool = True,
        diploid_depth: str = "",
        cluster_method_kwargs: dict | None = None,
    ) -> str:
        """Per-sample CN estimation -> {depth}.{select}.{algo}.tsv"""
        suffix = f".{cn_select}.{cn_algorithm}"
        name = str(depth_file)
        if name.endswith(".tsv"):
            name = name[:-4]
        name += suffix
        if not os.path.exists(name + ".tsv"):
            with TIMER.stage("cn.fit"):
                self._cnSampleInner(
                    depth_file, name, cn_select, cn_algorithm,
                    assume_3DL3_diploid, diploid_depth, cluster_method_kwargs,
                )
        return name + ".tsv"

    def _cnSampleInner(
        self, depth_file, name, cn_select, cn_algorithm,
        assume_3DL3_diploid, diploid_depth, cluster_method_kwargs,
    ) -> None:
        predictSamplesCN(
            [depth_file],
            [name + ".tsv"],
            diploid_depth=diploid_depth,
            cluster_method=cn_algorithm,
            cluster_method_kwargs=cluster_method_kwargs or {},
            assume_3DL3_diploid=assume_3DL3_diploid,
            save_cn_model_path=name + ".json",
            select_mode=cn_select,
        )

    # ------------------------------------------------------------------
    def typeSample(
        self,
        processed: str,
        cn_file: str,
        method: str = "full",
        top_n: int = 600,
    ) -> str:
        """Allele typing -> {processed}.cn{...}.{method}.tsv"""
        cn_tag = os.path.basename(cn_file).replace("/", "_").replace(".", "_")
        suffix = f".cn_{cn_tag}.pv.{method}"
        name = processed + suffix
        if os.path.exists(name + ".tsv"):
            return name + ".tsv"

        # prefer the typing-ready array artifact; the JSON path remains
        # for artifacts produced elsewhere (or by older runs)
        evid_path = processed + ".evidence.npz"
        t = None
        if os.path.exists(evid_path):
            from ..typing.evidence import loadEvidence

            try:
                with TIMER.stage("typing.load_evidence"):
                    bundle = loadEvidence(
                        evid_path,
                        self.annotator.catalogVariants(),
                        [tb.name for tb in self.annotator.tables],
                    )
                t = selectKirTypingModel(
                    method, evidence=bundle, top_n=top_n,
                    variant_correction=True,
                )
            except Exception as e:
                # not just ValueError: a truncated/corrupt npz raises
                # BadZipFile/OSError/KeyError — every load failure should
                # reach the intact .variant.json fallback below
                logger.warning(
                    f"[Allele] evidence npz unusable ({type(e).__name__}:"
                    f" {e}); falling back to JSON"
                )
        if t is None:
            t = selectKirTypingModel(
                method, processed + ".json", top_n=top_n,
                variant_correction=True,
            )
        cn = loadCN(cn_file)
        with TIMER.stage(f"typing.{method}"):
            called_alleles, warning_genes = t.typing(cn)
        logger.info(f"[Allele] {called_alleles} ({processed})")
        pd.DataFrame(
            {
                "name": [name],
                "alleles": ["_".join(called_alleles)],
                "warnings": ["_".join(warning_genes)],
            }
        ).to_csv(name + ".tsv", sep="\t", index=False)

        possible = pd.DataFrame(t.getAllPossibleTyping())
        possible = possible.fillna("")
        possible.to_csv(name + ".possible.tsv", index=False, sep="\t")
        return name + ".tsv"
