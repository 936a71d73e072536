"""
Typing façade: dispatch full / exonfirst / em strategies over the per-gene
reads with given CN (reference kir_typing.py).
"""
from __future__ import annotations

import json
from typing import Any

from ..utils import NumpyEncoder, logger
from .allele_typing import AlleleTyping
from .em import hisat2TypingPerGene, preprocessHisatReads, printHisatTyping
from .evidence import EvidenceBundle
from .exonfirst import AlleleTypingExonFirst
from .homo import isHetrozygous
from .pairread import (
    ReadsAndVariantsData,
    groupReads,
    groupVariants,
    loadReadsAndVariantsData,
    removeMultipleMapped,
)


class Typing:
    """Abstract typing driver (reference kir_typing.py:31-74)."""

    def __init__(self) -> None:
        self._result: dict[str, Any] = {}

    def typingPerGene(self, gene: str, cn: int) -> tuple[list[str], int]:
        raise NotImplementedError

    def typing(
        self, gene_cn: dict[str, int], min_reads_num: int = 100
    ) -> tuple[list[str], list[str]]:
        """-> (called alleles across genes, genes with thin coverage)."""
        per_gene = {
            gene: self.typingPerGene(gene, cn)
            for gene, cn in gene_cn.items()
            if cn > 0
        }
        called = [a for alleles, _ in per_gene.values() for a in alleles]
        thin = [g for g, (_, n) in per_gene.items() if n < min_reads_num]
        return called, thin

    def save(self, filename: str) -> None:
        with open(filename, "w") as f:
            json.dump(self._result, f, cls=NumpyEncoder)

    def getAllPossibleTyping(self) -> list[dict[Any, Any]]:
        raise NotImplementedError


class TypingWithPosNegAllele(Typing):
    """The proposed pos/neg-variant maximum-likelihood method."""

    def __init__(
        self,
        filename_variant_json: str = "",
        reads_data: ReadsAndVariantsData | None = None,
        evidence: EvidenceBundle | None = None,
        top_n: int = 300,
        multiple: bool = False,
        exon_first: bool = False,
        exon_only: bool = False,
        exon_candidate_threshold: float = 0.9,
        variant_correction: bool = False,
    ):
        super().__init__()
        self._gene_evidence = None
        if evidence is not None:
            # array-native product path: per-gene evidence CSRs, no
            # PairRead materialisation (except inside exonfirst)
            self._gene_evidence, self._gene_variants = evidence.splitByGene(
                multiple=multiple
            )
            self._gene_reads = None
        else:
            if reads_data is None:
                reads_data = loadReadsAndVariantsData(filename_variant_json)
            if not multiple:
                reads_data = removeMultipleMapped(reads_data)
            self._gene_reads = groupReads(reads_data["reads"])
            self._gene_variants = groupVariants(reads_data["variants"])
        self._top_n = top_n
        self._exon_first = exon_first
        self._exon_only = exon_only
        self._exon_candidate_threshold = exon_candidate_threshold
        self._variant_correction = variant_correction

    def typingPerGene(self, gene: str, cn: int) -> tuple[list[str], int]:
        logger.debug(f"[Allele] {gene=} {cn=}")
        force_homo = False if isHetrozygous(gene) else None

        # CN>0 but no unique passing reads (e.g. provided-CN path): the
        # reference's defaultdicts yield empty reads+variants -> zero alleles
        # -> "fail" -> GENE* (kir_typing.py:126-131). Short-circuit that.
        gene_src = (
            self._gene_evidence
            if self._gene_evidence is not None
            else self._gene_reads
        )
        if not gene_src.get(gene) or not self._gene_variants.get(gene):
            logger.warning(f"[Allele] {gene} has no reads; returning fail")
            pure_gene = gene.split("*")[0]
            return [f"{pure_gene}*"] * cn, 0

        # one dispatch table instead of four constructor calls: the
        # evidence path (array-native CSR, no PairRead objects) and the
        # list path share kwargs per strategy
        use_ev = self._gene_evidence is not None
        src = (
            self._gene_evidence[gene] if use_ev else self._gene_reads[gene]
        )
        if self._exon_first or self._exon_only:
            build = (
                AlleleTypingExonFirst.fromEvidence
                if use_ev
                else AlleleTypingExonFirst
            )
            extra = dict(
                exon_only=self._exon_only,
                candidate_set_threshold=self._exon_candidate_threshold,
            )
        else:
            build = AlleleTyping.fromEvidence if use_ev else AlleleTyping
            extra = dict(variant_correction=self._variant_correction)
        typ = build(
            src,
            self._gene_variants[gene],
            force_homo=force_homo,
            top_n=self._top_n,
            **extra,
        )
        res = typ.typing(cn)
        self._result[gene] = typ.result
        pure_gene = gene.split("*")[0]  # KIR2DL1*BACKBONE -> KIR2DL1
        called = [
            a if a != "fail" else f"{pure_gene}*" for a in res.selectBest()
        ]
        return called, typ.getReadsNum()

    def getAllPossibleTyping(self) -> list[dict[Any, Any]]:
        possible = []
        for gene, result in self._result.items():
            for rank, (value, alleles) in enumerate(
                result[-1].selectAllPossible(0.9)
            ):
                row: dict[Any, Any] = {"gene": gene, "rank": rank, "value": value}
                for i, allele in enumerate(alleles):
                    row[str(i + 1)] = allele
                possible.append(row)
        return possible


class TypingWithReport(Typing):
    """EM abundance typing (reference kir_typing.py:153-204)."""

    def __init__(
        self,
        filename_variant_json: str = "",
        reads_data: ReadsAndVariantsData | None = None,
        evidence: EvidenceBundle | None = None,
    ):
        super().__init__()
        if reads_data is None:
            if evidence is not None:
                reads_data = evidence.toReadsData()
            else:
                reads_data = loadReadsAndVariantsData(filename_variant_json)
        reads_data = removeMultipleMapped(reads_data)
        self._gene_reads = preprocessHisatReads(reads_data)

    def typingPerGene(self, gene: str, cn: int) -> tuple[list[str], int]:
        if not self._gene_reads.get(gene):
            logger.warning(f"[Allele] {gene} has no reads; returning fail")
            pure_gene = gene.split("*")[0]
            return [f"{pure_gene}*"] * cn, 0
        report = hisat2TypingPerGene(self._gene_reads[gene])
        report = sorted(report, key=lambda i: -i.prob)

        est_prob = 1 / cn
        called = []
        for allele in report:
            pred_count = max(1, round(allele.prob / est_prob))
            for _ in range(min(cn, pred_count)):
                called.append(allele.allele)
            allele.cn = pred_count
            cn -= pred_count
            if cn <= 0:
                break
        self._result[gene] = report
        return called, len(self._gene_reads[gene])

    def save(self, filename: str) -> None:
        super().save(filename)
        name = filename[:-5] if filename.endswith(".json") else filename
        with open(name + ".txt", "w") as f:
            printHisatTyping(self._result, file=f)

    def getAllPossibleTyping(self) -> list[dict[Any, Any]]:
        return []


def selectKirTypingModel(
    method: str,
    filename_variant_json: str = "",
    **kwargs: Any,
) -> Typing:
    """full | exonfirst[_t] | em (reference kir_typing.py:207-228)."""
    if method == "full":
        return TypingWithPosNegAllele(filename_variant_json, **kwargs)
    if method.startswith("exonfirst"):
        fields = method.split("_")
        # bare "exonfirst" -> 0.0 mirrors the reference exactly
        # (kir_typing.py:217); like the reference's main.py:190, the CLI
        # rewrites bare exonfirst to exonfirst_1 before reaching here
        threshold = 0.0
        if len(fields) == 2:
            threshold = float(method[len("exonfirst_"):])
        return TypingWithPosNegAllele(
            filename_variant_json,
            exon_first=True,
            exon_candidate_threshold=threshold,
            **kwargs,
        )
    if method == "em":
        kwargs.pop("top_n", None)
        kwargs.pop("variant_correction", None)
        return TypingWithReport(filename_variant_json, **kwargs)
    raise NotImplementedError(method)
