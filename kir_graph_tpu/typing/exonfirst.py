"""
Exon-first typing: stage 1 on exon variants with identical-exon alleles
collapsed into groups; stage 2 re-types full variants restricted to each
candidate group (reference typing_mulit_allele.py:622-797).
"""
from __future__ import annotations

import copy
from itertools import chain

import numpy as np

from ..index.variants import Variant
from ..utils import logger
from .allele_typing import AlleleTyping, TypingResult, rescoreF64
from .evidence import GeneEvidence, csrMaskValues
from .pairread import PairRead


class AlleleTypingExonFirst(AlleleTyping):
    def __init__(
        self,
        reads: list[PairRead],
        variants: list[Variant],
        top_n: int = 300,
        exon_only: bool = False,
        candidate_set_threshold: float = 1.0,
        variant_correction: bool = True,
        force_homo: bool | None = None,
    ):
        exon_variants = [v for v in variants if v.in_exon]

        exon_reads = self.removeIntronVariant(reads, exon_variants)
        if variant_correction:
            exon_reads = self.errorCorrection(exon_reads)
        exon_reads = self.removeEmptyReads(exon_reads)

        # collapse alleles sharing the same exon-variant set into one group
        variantset_to_allele = self.aggrVariantsByAllele(exon_variants)
        other_allele = {a for v in variants for a in v.allele} - {
            a for v in exon_variants for a in v.allele
        }
        if other_allele:
            variantset_to_allele[tuple()] = sorted(other_allele)
        self.allele_group = {
            "|".join(alleles): alleles for alleles in variantset_to_allele.values()
        }
        # collapse alleles into groups over the FULL catalog (reference
        # typing_mulit_allele.py:656-659): alleles whose exons equal the
        # backbone carry no exon variants and stay reachable only through
        # their intron variants' allele links
        exon_variants = self.removeDuplicateAllele(
            variants, self.createInverseMapping(self.allele_group)
        )

        super().__init__(
            exon_reads, exon_variants, force_homo=force_homo, top_n=top_n
        )
        self.candidate_set_threshold = candidate_set_threshold

        if not exon_only:
            self.full_model: AlleleTyping | None = AlleleTyping(
                reads,
                variants,
                force_homo=force_homo,
                top_n=top_n // 5,
                variant_correction=variant_correction,
            )
        else:
            self.full_model = None

    # ------------------------------------------------------------------
    @classmethod
    def fromEvidence(
        cls,
        gev: GeneEvidence,
        variants: list[Variant],
        top_n: int = 300,
        exon_only: bool = False,
        candidate_set_threshold: float = 1.0,
        variant_correction: bool = True,
        force_homo: bool | None = None,
    ) -> "AlleleTypingExonFirst":
        """Array-native constructor: exon masking, correction and grouping
        on the gene's evidence CSR — no PairRead materialisation.

        Bit-identical to the list constructor (tests/test_typing_evidence):
        the stage-1 pipeline is filter-to-exon -> correction -> (empty rows
        dropped) -> the base class's second correction, the same order the
        list path applies.  Empty pairs between the two corrections carry
        no variant instances, so deferring their removal to the base
        class's `no_empty` leaves every count unchanged.
        """
        V = len(variants)
        exon_variants = [v for v in variants if v.in_exon]
        exon_mask = np.zeros(V, dtype=bool)
        for i, v in enumerate(variants):
            exon_mask[i] = v.in_exon

        # stage-1 evidence: exon variants only (removeIntronVariant)
        pp, pi = csrMaskValues(
            gev.pos_indptr, gev.pos_idx, exon_mask[gev.pos_idx]
        )
        nn, ni = csrMaskValues(
            gev.neg_indptr, gev.neg_idx, exon_mask[gev.neg_idx]
        )
        if variant_correction and V:
            # first correction pass, on exon-only evidence (the base
            # class applies the second pass, like the reference's
            # super().__init__ default)
            cnt_p = np.bincount(pi, minlength=V).astype(np.int64)
            cnt_n = np.bincount(ni, minlength=V).astype(np.int64)
            tot = cnt_p + cnt_n
            safe = np.maximum(tot, 1)
            excl_p = (tot < 3) | (cnt_p / safe < 0.2)
            excl_n = (tot < 3) | (cnt_n / safe < 0.2)
            pp, pi = csrMaskValues(pp, pi, ~excl_p[pi])
            nn, ni = csrMaskValues(nn, ni, ~excl_n[ni])
        exon_gev = GeneEvidence(
            gene=gev.gene,
            nh=gev.nh,
            pair_index=gev.pair_index,
            pos_indptr=pp,
            pos_idx=pi,
            neg_indptr=nn,
            neg_idx=ni,
        )

        # group bookkeeping over variant METADATA (tiny, host)
        variantset_to_allele = cls.aggrVariantsByAllele(exon_variants)
        other_allele = {a for v in variants for a in v.allele} - {
            a for v in exon_variants for a in v.allele
        }
        if other_allele:
            variantset_to_allele[tuple()] = sorted(other_allele)
        allele_group = {
            "|".join(alleles): alleles
            for alleles in variantset_to_allele.values()
        }
        grouped_variants = cls.removeDuplicateAllele(
            variants, cls.createInverseMapping(allele_group)
        )

        self = AlleleTyping.fromEvidence.__func__(
            cls, exon_gev, grouped_variants, force_homo=force_homo,
            top_n=top_n,
        )
        self.allele_group = allele_group
        self.candidate_set_threshold = candidate_set_threshold
        if not exon_only:
            self.full_model = AlleleTyping.fromEvidence(
                gev, variants, force_homo=force_homo, top_n=top_n // 5,
                variant_correction=variant_correction,
            )
        else:
            self.full_model = None
        return self

    # ------------------------------------------------------------------
    @staticmethod
    def aggrVariantsByAllele(
        variants: list[Variant],
    ) -> dict[tuple[str, ...], list[str]]:
        allele_variants: dict[str, list[str]] = {}
        for v in variants:
            for a in v.allele:
                allele_variants.setdefault(a, []).append(str(v.id))
        out: dict[tuple[str, ...], list[str]] = {}
        for a, vs in allele_variants.items():
            out.setdefault(tuple(sorted(set(vs))), []).append(a)
        return out

    @staticmethod
    def removeIntronVariant(
        reads: list[PairRead], exon_variants: list[Variant]
    ) -> list[PairRead]:
        keep = {v.id for v in exon_variants}
        new_reads = copy.deepcopy(reads)
        for r in new_reads:
            r.lpv = [v for v in r.lpv if v in keep]
            r.lnv = [v for v in r.lnv if v in keep]
            r.rpv = [v for v in r.rpv if v in keep]
            r.rnv = [v for v in r.rnv if v in keep]
        return new_reads

    @staticmethod
    def createInverseMapping(allele_group: dict[str, list[str]]) -> dict[str, str]:
        return {a: g for g, alleles in allele_group.items() for a in alleles}

    @staticmethod
    def removeDuplicateAllele(
        variants: list[Variant], allele_map: dict[str, str]
    ) -> list[Variant]:
        variants = copy.deepcopy(variants)
        for v in variants:
            v.allele = list(set(filter(None, (allele_map.get(a, "") for a in v.allele))))
        return variants

    def typingIntron(self, exon_candidates: list[list[str]]) -> AlleleTyping:
        assert self.full_model
        # shallow copy: addCandidate only ever APPENDS to .result; the
        # prob/count arrays are read-only, so copying them (reference
        # deepcopies, typing_mulit_allele.py:760) would just burn memory
        model = copy.copy(self.full_model)
        model.result = list(self.full_model.result)
        for cand in exon_candidates:
            model.addCandidate(cand)
        return model

    # ------------------------------------------------------------------
    def typing(self, cn: int) -> TypingResult:
        result = super().typing(cn)
        result.setNameGroup(self.allele_group)
        logger.debug("[Allele] Typing exon done")

        if self.full_model is None:
            return result
        assert cn == result.n

        if not result.value.shape[0]:
            logger.warning(
                "[Allele] Cannot type with exon-only reads; using full variants"
            )
            return self.full_model.typing(cn)

        candidate_result = []
        for i in result.topRank(threshold=self.candidate_set_threshold):
            logger.debug(f"[Allele] Exon-first: intron typing of candidate {i}")
            full = self.typingIntron(result.allele_name_group[i])
            self.result.extend(full.result)
            candidate_result.append(full.result[-1])

        merged = TypingResult(
            n=candidate_result[0].n,
            value=np.concatenate([r.value for r in candidate_result]),
            value_sum_indv=np.concatenate([r.value_sum_indv for r in candidate_result]),
            allele_id=np.concatenate([r.allele_id for r in candidate_result]),
            allele_name=list(
                chain.from_iterable(r.allele_name for r in candidate_result)
            ),
            allele_prob=np.concatenate(
                [r.allele_prob for r in candidate_result], axis=1
            ),
            fraction=np.concatenate([r.fraction for r in candidate_result]),
            # fraction (not fraction_uniq) on purpose: the reference
            # does the same with an explicit "ignore this"
            # (typing_mulit_allele.py:789)
            fraction_uniq=np.concatenate([r.fraction for r in candidate_result]),
        )
        # float64 rescore across ALL candidates' rows: the winning intron
        # completion of tied exon groups must be picked by the reference's
        # (sum_indv, evenness) keys, not float32 beam noise
        merged = rescoreF64(merged, self.full_model.logProbs64())
        merged.fraction_uniq = merged.fraction
        self.result.append(merged)
        merged.print()
        return merged
