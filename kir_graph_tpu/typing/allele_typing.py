"""
Maximum-likelihood allele-set search (the paper's proposed typing method).

Behavioural port of reference typing_mulit_allele.py:217-619, re-engineered
array-first: the read x allele likelihood matrix is one MXU matmul and the
CN-step beam extension is a chunked device reduction (see kernels.py);
candidate bookkeeping (dedup, ranking) stays on host where it is tiny.
"""
from __future__ import annotations

import io
import os
from dataclasses import dataclass, field
from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

from ..index.variants import Variant
from ..utils import logger
from .evidence import GeneEvidence, csrMaskValues, csrSelectRows
from .homo import isHomozygous, isHomozygousFromCounts
from .kernels import (
    LOG_HIT,
    LOG_MISS,
    beamExtend,
    beamExtendHost,
    fractionOfReads,
    fractionOfReadsHost,
    logProbsFromCounts,
    logProbsFromCountsHost,
)
from .pairread import PairRead


@dataclass
class TypingResult:
    """Result of one CN step of the beam search
    (fields mirror reference typing_mulit_allele.py:27-58)."""

    n: int
    value: np.ndarray               # [top_n] set log-likelihood
    value_sum_indv: np.ndarray      # [top_n, n] per-allele CN=1 likelihoods
    allele_id: np.ndarray           # [top_n, n]
    allele_name: list[list[str]]
    allele_prob: np.ndarray         # [reads, top_n] per-read best in set
    #   (may be a device array: the beam keeps it resident and only
    #   downstream numpy consumers force a download)
    fraction: np.ndarray            # [top_n, n]
    fraction_uniq: np.ndarray       # [top_n, n]
    allele_name_group: list[list[list[str]]] = field(default_factory=list)
    # commutative multiset hashes of each row's allele set (device-side
    # dedup in the next beam step); absent on terminal/merged results
    set_h1: np.ndarray | None = None
    set_h2: np.ndarray | None = None

    def isFail(self) -> bool:
        return not len(self.value)

    def selectBest(
        self, filter_fraction: bool = True, filter_minor: bool = False
    ) -> list[str]:
        """Best set subject to min-abundance >= (1/CN)/2; falls back to
        rank 0 when nothing qualifies (reference 63-103)."""
        ids: Iterable[int] = range(len(self.fraction))
        if filter_fraction:
            expect = 1 / self.n
            ids = filter(
                lambda i: all(f >= expect / 2 for f in self.fraction[i]), ids
            )
        if filter_minor:
            ids = filter(
                lambda i: np.abs(self.value_sum_indv[i]).min()
                / np.abs(self.value_sum_indv[i]).max()
                > 0.8,
                ids,
            )
        id_list = list(ids) or [0]
        best = id_list[0]
        if not self.isFail():
            assert len(self.allele_name[best]) == self.n
            return self.allele_name[best]
        logger.warning("[Allele] No candidates found. Return fail")
        return ["fail"] * self.n

    def sortByScoreAndEveness(self, preserve_topn: int = -1) -> "TypingResult":
        if preserve_topn == -1:
            preserve_topn = self.value.shape[0]
        order = rankScore(self.value, self.value_sum_indv, self.fraction)
        k = preserve_topn
        keep = np.asarray(order[:k])
        return TypingResult(
            n=self.n,
            value=self.value[keep],
            value_sum_indv=self.value_sum_indv[keep],
            allele_id=self.allele_id[keep],
            allele_name=[self.allele_name[i] for i in keep],
            # fancy-index keeps device arrays device-resident
            allele_prob=self.allele_prob[:, keep],
            fraction=self.fraction[keep],
            fraction_uniq=self.fraction_uniq[keep],
            set_h1=None if self.set_h1 is None else self.set_h1[keep],
            set_h2=None if self.set_h2 is None else self.set_h2[keep],
        )

    def topRank(self, threshold: float = 0.9) -> Iterable[int]:
        assert not self.isFail()
        yield 0
        max_value = self.value[0]
        for i, v in enumerate(self.value):
            if i and v * threshold >= max_value:
                yield i

    def selectAllPossible(self, threshold: float = 0.9) -> list[tuple[float, list[str]]]:
        if self.isFail():
            return []
        return [(float(self.value[r]), self.allele_name[r]) for r in self.topRank(threshold)]

    def setNameGroup(self, mapping: dict[str, list[str]]) -> None:
        self.allele_name_group = [
            [mapping[a] for a in names] for names in self.allele_name
        ]

    def print(self, num: int = 100, top_threshold: float = 0.9) -> None:
        out = io.StringIO()
        print("Allele_num =", self.n, file=out)
        if self.isFail():
            logger.debug(f"[Allele] fail x {self.n}")
            return
        for printed, rank in enumerate(self.topRank(top_threshold)):
            if printed > num:
                break
            print("Rank", rank, "likelihood", self.value[rank], file=out)
            for i in range(self.n):
                print(
                    f"  id {self.allele_id[rank][i]:3}"
                    f" name {self.allele_name[rank][i]:20s}"
                    f" fraction {self.fraction[rank][i]:.5f}",
                    file=out,
                )
        logger.debug(f"[Allele] {out.getvalue()}")


def rankScore(
    value: np.ndarray, value_sum_indv: np.ndarray, fraction: np.ndarray
) -> np.ndarray:
    """Stable 3-key ranking: likelihood desc, per-allele sum desc, abundance
    evenness asc (reference typing_mulit_allele.py:202-214)."""
    fraction_diff = np.abs(fraction - fraction.mean(axis=1, keepdims=True)).sum(axis=1)
    sum_indv = value_sum_indv.sum(axis=1)
    return np.lexsort((fraction_diff, -sum_indv, -value))


def rescoreF64(result: TypingResult, lp64: np.ndarray) -> TypingResult:
    """Recompute value / value_sum_indv / fraction in float64 and re-rank.

    The beam runs in float32 on device, where mathematically-tied allele
    sets (e.g. alleles whose distinguishing variants were all dropped by
    error correction) pick up ulp-level noise; that noise — not the
    reference's (sum_indv, evenness) keys — would then break final ties.
    The reference computes everything in float64 numpy
    (typing_mulit_allele.py:565-580), so ties that are exact in math stay
    exact there.  Rescoring the surviving rows in float64 with the same
    formulas restores that tie structure; chunked over rows so the
    [reads, rows, cn] intermediate stays small.
    """
    if result.isFail() or not lp64.size:
        return result
    ids = np.asarray(result.allele_id)                     # [T, n]
    T = ids.shape[0]
    col_sum = lp64.sum(axis=0)
    value = np.empty(T, dtype=np.float64)
    frac = np.empty(ids.shape, dtype=np.float64)
    R = lp64.shape[0]
    for lo in range(0, T, 64):
        sel = lp64[:, ids[lo : lo + 64]]                   # [R, t, n]
        top = sel.max(axis=2)                              # [R, t]
        value[lo : lo + 64] = top.sum(axis=0)
        belong = sel == top[:, :, None]
        belong = belong / belong.sum(axis=2, keepdims=True)
        frac[lo : lo + 64] = belong.sum(axis=0) / R
    return TypingResult(
        n=result.n,
        value=value,
        value_sum_indv=col_sum[ids],
        allele_id=ids,
        allele_name=result.allele_name,
        allele_prob=result.allele_prob,
        fraction=frac,
        fraction_uniq=result.fraction_uniq,
        set_h1=result.set_h1,
        set_h2=result.set_h2,
    ).sortByScoreAndEveness()


def typingOnDevice(R: int, A: int, top_n: int) -> bool:
    """Pick the beam's execution venue for one gene.

    The score reduction is R*A*top_n fused max+add ops — microscopic
    next to alignment.  On an attached chip the device beam is free; on
    a tunneled link each dispatch costs 100-500 ms and the host twins
    (kernels.py *Host) win by ~7x at KIR scale (docs/BENCH_NOTES.md
    round 5).  Auto rule: go to the device only when the reduction is
    big enough to amortise dispatch (>2e9 ops).  KGT_TYPING_DEVICE=1/0
    forces either path; the sharded cohort path is always on device.
    """
    env = os.environ.get("KGT_TYPING_DEVICE", "")
    if env == "1":
        return True
    if env == "0":
        return False
    return R * A * max(top_n, 1) > 2_000_000_000


class AlleleTyping:
    """Beam search over allele sets, one allele added per CN step."""

    def __init__(
        self,
        reads: list[PairRead],
        variants: list[Variant],
        force_homo: bool | None = None,
        top_n: int = 300,
        no_empty: bool = True,
        variant_correction: bool = True,
    ):
        self.top_n = top_n
        self._no_empty = no_empty
        self.force_homo = force_homo

        self.variants: dict[str, Variant] = {str(v.id): v for v in variants}
        allele_names = sorted(
            {a for v in variants for a in v.allele}
        )
        self.id_to_allele: dict[int, str] = dict(enumerate(allele_names))
        self.allele_to_id: dict[str, int] = {n: i for i, n in enumerate(allele_names)}

        if variant_correction:
            reads = self.errorCorrection(reads)
        if no_empty:
            reads = self.removeEmptyReads(reads)
        self.reads = reads
        self._isHomo = lambda cn: isHomozygous(self.reads, self.variants, cn)

        self._finishInit(self._buildLogProbs(reads), allele_names)

    def _finishInit(
        self, log_probs: np.ndarray, allele_names: list[str]
    ) -> None:
        if not hasattr(self, "_prob_counts"):
            self._prob_counts = None  # set by the constructors when R,V > 0
        self.log_probs = log_probs  # np.float32 [R, A]
        self._on_device = typingOnDevice(
            log_probs.shape[0], log_probs.shape[1], self.top_n
        )
        self._log_probs_dev = (
            jnp.asarray(self.log_probs) if self._on_device else None
        )
        self._allele_col_sum = (
            self.log_probs.sum(axis=0)
            if self.log_probs.size
            else np.zeros(len(allele_names), dtype=np.float32)
        )
        self.probs = np.power(10.0, self.log_probs) if self.log_probs.size else self.log_probs
        # per-allele random hashes: a candidate SET's hash is the wrapping
        # uint32 sum of its members' hashes (commutative, multiset-aware),
        # so the beam dedups unordered sets on device without sorting ids
        hash_rng = np.random.Generator(np.random.Philox(0xBEA7))
        n_alleles = len(allele_names)
        self._ah1 = hash_rng.integers(
            0, 1 << 32, n_alleles, dtype=np.uint32
        )
        self._ah2 = hash_rng.integers(
            0, 1 << 32, n_alleles, dtype=np.uint32
        )
        self.result: list[TypingResult] = []

    # ------------------------------------------------------------------
    @classmethod
    def fromEvidence(
        cls,
        gev: GeneEvidence,
        variants: list[Variant],
        force_homo: bool | None = None,
        top_n: int = 300,
        no_empty: bool = True,
        variant_correction: bool = True,
    ) -> "AlleleTyping":
        """Array-native constructor: builds the count matrices straight
        from the gene's evidence CSR — no PairRead objects.  Produces
        bit-identical typing to the list path (tests/test_typing_evidence
        asserts it): the count matrices, correction masks and
        homozygosity record aggregate the same instances in the same
        arithmetic."""
        self = cls.__new__(cls)
        self.top_n = top_n
        self._no_empty = no_empty
        self.force_homo = force_homo
        self.variants = {str(v.id): v for v in variants}
        allele_names = sorted({a for v in variants for a in v.allele})
        self.id_to_allele = dict(enumerate(allele_names))
        self.allele_to_id = {n: i for i, n in enumerate(allele_names)}

        V = len(variants)
        pp, pi = gev.pos_indptr, gev.pos_idx
        nn, ni = gev.neg_indptr, gev.neg_idx
        if variant_correction and V:
            # reference typing_mulit_allele.py:302-338: drop variants with
            # < 3 observations or < 20% minority evidence
            cnt_p = np.bincount(pi, minlength=V).astype(np.int64)
            cnt_n = np.bincount(ni, minlength=V).astype(np.int64)
            tot = cnt_p + cnt_n
            safe = np.maximum(tot, 1)
            excl_p = (tot < 3) | (cnt_p / safe < 0.2)
            excl_n = (tot < 3) | (cnt_n / safe < 0.2)
            pp, pi = csrMaskValues(pp, pi, ~excl_p[pi])
            nn, ni = csrMaskValues(nn, ni, ~excl_n[ni])
        R = gev.n_pairs
        if no_empty and R:
            mate_tot = np.diff(pp) + np.diff(nn)
            keep = (mate_tot[0::2] + mate_tot[1::2]) > 0
            rows = np.nonzero(keep)[0]
            mrows = np.empty(2 * len(rows), dtype=np.int64)
            mrows[0::2] = 2 * rows
            mrows[1::2] = 2 * rows + 1
            pp, pi = csrSelectRows(pp, pi, mrows)
            nn, ni = csrSelectRows(nn, ni, mrows)
            R = len(rows)
        self.reads = None  # array path: PairReads never materialised
        pos_inst = np.bincount(pi, minlength=V).astype(np.int64)
        neg_inst = np.bincount(ni, minlength=V).astype(np.int64)
        self._isHomo = lambda cn: isHomozygousFromCounts(
            pos_inst, neg_inst, variants, cn
        )

        A = len(allele_names)
        if R == 0 or V == 0:
            log_probs = np.zeros((0, A), dtype=np.float32)
        else:
            membership = self._membershipMatrix(variants, self.allele_to_id)
            count_diff = np.zeros((R, V), dtype=np.float32)
            prow_p = np.repeat(
                np.arange(2 * R, dtype=np.int64) // 2, np.diff(pp)
            )
            prow_n = np.repeat(
                np.arange(2 * R, dtype=np.int64) // 2, np.diff(nn)
            )
            np.add.at(count_diff, (prow_p, pi), 1.0)
            np.add.at(count_diff, (prow_n, ni), -1.0)
            n_pos = np.bincount(prow_p, minlength=R).astype(np.float32)
            n_neg = np.bincount(prow_n, minlength=R).astype(np.float32)
            self._prob_counts = (count_diff, n_pos, n_neg, membership)
            if typingOnDevice(R, A, top_n):
                log_probs = np.asarray(
                    logProbsFromCounts(
                        jnp.asarray(count_diff), jnp.asarray(n_pos),
                        jnp.asarray(n_neg), jnp.asarray(membership),
                    )
                )
            else:
                log_probs = logProbsFromCountsHost(
                    count_diff, n_pos, n_neg, membership
                )
        self._finishInit(log_probs, allele_names)
        return self

    # ------------------------------------------------------------------
    def logProbs64(self) -> np.ndarray:
        """float64 log10 P(read | allele), the reference's working
        precision (typing_mulit_allele.py:340-381) — computed on host
        from the exact integer count matrices, used only to rescore the
        final beam survivors (see rescoreF64)."""
        if self._prob_counts is None:
            return self.log_probs.astype(np.float64)
        count_diff, n_pos, n_neg, membership = self._prob_counts
        core = count_diff.astype(np.float64) @ membership.astype(np.float64)
        return (
            core * (LOG_HIT - LOG_MISS)
            + n_pos.astype(np.float64)[:, None] * LOG_MISS
            + n_neg.astype(np.float64)[:, None] * LOG_HIT
        )

    def getReadsNum(self) -> int:
        return len(self.log_probs)

    @staticmethod
    def removeEmptyReads(reads: list[PairRead]) -> list[PairRead]:
        return [r for r in reads if r.lpv + r.lnv + r.rpv + r.rnv]

    @staticmethod
    def errorCorrection(reads: list[PairRead]) -> list[PairRead]:
        """Drop variants with <3 supporting observations or <20% minority
        evidence (reference typing_mulit_allele.py:302-338)."""
        pos_count: dict[str, int] = {}
        neg_count: dict[str, int] = {}
        for read in reads:
            for vid in read.lpv + read.rpv:
                pos_count[vid] = pos_count.get(vid, 0) + 1
                neg_count.setdefault(vid, 0)
            for vid in read.lnv + read.rnv:
                neg_count[vid] = neg_count.get(vid, 0) + 1
                pos_count.setdefault(vid, 0)

        excl_pos, excl_neg = set(), set()
        for vid in pos_count:
            p, n = pos_count[vid], neg_count[vid]
            if p + n < 3:
                excl_pos.add(vid)
                excl_neg.add(vid)
            else:
                if p / (p + n) < 0.2:
                    excl_pos.add(vid)
                if n / (p + n) < 0.2:
                    excl_neg.add(vid)
        for read in reads:
            read.lpv = [v for v in read.lpv if v not in excl_pos]
            read.rpv = [v for v in read.rpv if v not in excl_pos]
            read.lnv = [v for v in read.lnv if v not in excl_neg]
            read.rnv = [v for v in read.rnv if v not in excl_neg]
        return reads

    @staticmethod
    def _membershipMatrix(
        variants: list[Variant], allele_to_id: dict[str, int]
    ) -> np.ndarray:
        membership = np.zeros((len(variants), len(allele_to_id)), np.float32)
        for row, v in enumerate(variants):
            for a in v.allele:
                ai = allele_to_id.get(a)
                if ai is not None:
                    membership[row, ai] = 1.0
        return membership

    def _buildLogProbs(self, reads: list[PairRead]) -> np.ndarray:
        """Assemble count matrices on host, run the matmul kernel."""
        A = len(self.allele_to_id)
        V = len(self.variants)
        R = len(reads)
        if R == 0 or V == 0:
            return np.zeros((0, A), dtype=np.float32)
        vid_index = {vid: i for i, vid in enumerate(self.variants)}
        membership = self._membershipMatrix(
            list(self.variants.values()), self.allele_to_id
        )

        count_diff = np.zeros((R, V), dtype=np.float32)
        n_pos = np.zeros(R, dtype=np.float32)
        n_neg = np.zeros(R, dtype=np.float32)
        for r, read in enumerate(reads):
            for vid in read.lpv + read.rpv:
                i = vid_index.get(vid)
                if i is not None:
                    count_diff[r, i] += 1
                    n_pos[r] += 1
            for vid in read.lnv + read.rnv:
                i = vid_index.get(vid)
                if i is not None:
                    count_diff[r, i] -= 1
                    n_neg[r] += 1
        self._prob_counts = (count_diff, n_pos, n_neg, membership)
        if not typingOnDevice(R, A, self.top_n):
            return logProbsFromCountsHost(
                count_diff, n_pos, n_neg, membership
            )
        out = logProbsFromCounts(
            jnp.asarray(count_diff), jnp.asarray(n_pos), jnp.asarray(n_neg),
            jnp.asarray(membership),
        )
        return np.asarray(out)

    # ------------------------------------------------------------------
    def typing(self, cn: int) -> TypingResult:
        if cn < 1:
            raise ValueError(f"CN should be >= 1, got {cn}")
        if self.force_homo is None:
            homo = self._isHomo(cn)
        else:
            homo = self.force_homo

        self.result = []
        if homo:
            self.addCandidate()
            if self.result[0].value.shape[0]:
                # rescore BEFORE replication so the homo result keeps the
                # reference's value semantics (cn1.value * cn, f64 order)
                self.result[0] = rescoreF64(self.result[0], self.logProbs64())
            if cn > 1:
                if self.result[0].value.shape[0]:
                    self.result.append(
                        self.createHomoResult(self.result[0], cn)
                    )
                else:
                    # all reads lost their variants (e.g. to the <3-
                    # observation correction filter): fall through to
                    # the same empty/"fail" result shape the non-homo
                    # path produces instead of crashing in np.repeat
                    self.result.append(self._emptyResult(n=cn))
        else:
            for _ in range(cn):
                self.addCandidate()
            if self.result[-1].value.shape[0]:
                self.result[-1] = rescoreF64(
                    self.result[-1], self.logProbs64()
                )
        self.result[-1].print()
        return self.result[-1]

    def mapAlleleIDs(self, list_ids: np.ndarray) -> list[list[str]]:
        return [[self.id_to_allele[int(i)] for i in ids] for ids in list_ids]

    @staticmethod
    def createHomoResult(cn1: TypingResult, cn: int) -> TypingResult:
        """Replicate the CN=1 winner cn times (reference 423-454)."""
        if cn <= 1:
            raise ValueError(f"CN should be > 1, got {cn}")
        return TypingResult(
            n=cn,
            value=cn1.value * cn,
            value_sum_indv=np.repeat(cn1.value_sum_indv, cn, axis=1),
            allele_id=np.repeat(cn1.allele_id, cn, axis=1),
            allele_name=[[names[0]] * cn for names in cn1.allele_name],
            allele_prob=cn1.allele_prob,
            fraction=np.ones((len(cn1.value), cn)) / cn,
            fraction_uniq=np.ones((len(cn1.value), cn)) / cn,
        )

    @staticmethod
    def uniqueAllele(ids: np.ndarray) -> np.ndarray:
        """Mask of first occurrences of each unordered allele set
        (reference 456-476)."""
        key = np.sort(ids, axis=1)
        _, first = np.unique(key, axis=0, return_index=True)
        mask = np.zeros(len(ids), dtype=bool)
        mask[first] = True
        return mask

    # ------------------------------------------------------------------
    # beam-step primitives — overridden by parallel.typing's sharded
    # subclass (reads data-parallel, allele axis model-parallel)
    def _beamStep(
        self, allele_index: np.ndarray, prev: TypingResult, k: int
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, "jnp.ndarray"]:
        """Score all T*|allele_index| set extensions, dedup, top-k.

        Returns (value [k], t_sel [k], a_loc [k] — index into
        allele_index —, new_prob [R, k], device- or host-resident per
        the venue choice); masked slots carry -inf.
        """
        if not self._on_device:
            value, idx, new_prob = beamExtendHost(
                self.log_probs[:, allele_index],
                np.asarray(prev.allele_prob),
                prev.set_h1, prev.set_h2,
                self._ah1[allele_index], self._ah2[allele_index],
                k,
            )
            A = len(allele_index)
            return value, idx // A, idx % A, new_prob
        value_d, idx_d, new_prob = beamExtend(
            self._log_probs_dev[:, allele_index],
            jnp.asarray(prev.allele_prob),
            jnp.asarray(prev.set_h1), jnp.asarray(prev.set_h2),
            jnp.asarray(self._ah1[allele_index]),
            jnp.asarray(self._ah2[allele_index]),
            k,
        )
        idx = np.asarray(idx_d)
        A = len(allele_index)
        return np.asarray(value_d), idx // A, idx % A, new_prob

    def _fractionStep(self, top_id: np.ndarray, top_prob) -> np.ndarray:
        """fraction [K, n] of reads whose set-max each member attains."""
        if not self._on_device:
            return fractionOfReadsHost(
                self.log_probs, top_id, np.asarray(top_prob)
            )
        return np.asarray(
            fractionOfReads(
                self._log_probs_dev, jnp.asarray(top_id), top_prob
            )
        )

    def _gatherColumns(self, ids: np.ndarray):
        """[R, len(ids)] slice of the log-prob matrix (stays resident on
        the beam's venue across steps)."""
        if not self._on_device:
            return self.log_probs[:, ids]
        return self._log_probs_dev[:, ids]

    def _emptyResult(self, n: int | None = None) -> TypingResult:
        return TypingResult(
            n=n if n is not None else len(self.result) + 1,
            value=np.array([]),
            value_sum_indv=np.array([]),
            allele_id=np.array([]),
            allele_name=[],
            allele_prob=np.array([]),
            fraction=np.array([]),
            fraction_uniq=np.array([]),
        )

    def addCandidate(
        self, candidate_allele: Optional[list[str]] = None
    ) -> TypingResult:
        """Extend every kept set by one allele, keep the best
        max(top_n, |sets|/5) (reference 478-598)."""
        if not self.log_probs.shape[0]:
            logger.warning("[Allele] Empty reads for typing. Skip")
            self.result.append(self._emptyResult())
            return self.result[-1]

        if candidate_allele is None:
            allele_index = np.arange(self.log_probs.shape[1])
        else:
            allele_index = np.array(
                [self.allele_to_id[a] for a in candidate_allele], dtype=int
            )

        if not self.result:
            # CN=1: rank single alleles by total log-likelihood
            scores = self._allele_col_sum[allele_index]
            order = np.argsort(scores)[::-1][: self.top_n]
            top_id = allele_index[order][:, None]
            self.result.append(
                TypingResult(
                    n=1,
                    value=scores[order],
                    value_sum_indv=scores[order][:, None],
                    allele_id=top_id,
                    allele_name=self.mapAlleleIDs(top_id),
                    # stays device-resident across beam steps
                    allele_prob=self._gatherColumns(top_id.ravel()),
                    fraction=np.ones(top_id.shape),
                    fraction_uniq=np.ones(top_id.shape),
                    set_h1=self._ah1[top_id.ravel()],
                    set_h2=self._ah2[top_id.ravel()],
                )
            )
            return self.result[-1]

        prev = self.result[-1]
        prev_id = prev.allele_id                # [T, n-1]
        T = prev_id.shape[0]
        A = len(allele_index)

        # device step: score all T*A extensions, dedup unordered multisets
        # (commutative two-hash), top-k — only two [k] vectors download;
        # the per-read prob matrices never leave the device
        k = int(min(max(self.top_n, (T * A) // 5), T * A))
        top_value, t_sel, a_loc, new_prob = self._beamStep(
            allele_index, prev, k
        )
        valid = np.nonzero(top_value > -1e30)[0]
        top_value = top_value[valid]
        t_sel = t_sel[valid]
        a_sel = allele_index[a_loc[valid]]
        top_id = np.hstack([prev_id[t_sel], a_sel[:, None]])
        top_prob = new_prob[:, valid]           # device [R, K]
        top_sum = self._allele_col_sum[top_id]  # [K, n]
        top_frac = self._fractionStep(top_id, top_prob)

        self.result.append(
            TypingResult(
                n=len(self.result) + 1,
                value=top_value,
                value_sum_indv=top_sum,
                allele_id=top_id,
                allele_name=self.mapAlleleIDs(top_id),
                allele_prob=top_prob,
                fraction=top_frac,
                fraction_uniq=np.ones_like(top_frac),
                set_h1=prev.set_h1[t_sel] + self._ah1[a_sel],
                set_h2=prev.set_h2[t_sel] + self._ah2[a_sel],
            ).sortByScoreAndEveness(preserve_topn=self.top_n)
        )
        return self.result[-1]
