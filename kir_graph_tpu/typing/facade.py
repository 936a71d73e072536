"""
Typing façade: dispatch full / exonfirst / em strategies over the per-gene
reads with given CN.

Behavioural parity target: reference kir_typing.py (Typing:31-74,
TypingWithPosNegAllele:77-151, TypingWithReport:153-204,
selectKirTypingModel:207-228) — the reference-code oracle pins exact
agreement, so call semantics must match even where the structure here
doesn't.  The array-native evidence route (EvidenceBundle CSRs, no
PairRead materialisation) is this build's default product path; the
JSON/PairRead route exists for `.variant.json` interoperability.
"""
from __future__ import annotations

import json
from dataclasses import dataclass
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


def _genericAllele(gene: str) -> str:
    """Backbone name -> the bare 'GENE*' fail call (kir_typing.py:126-131)."""
    return gene.split("*")[0] + "*"


@dataclass
class _GeneSources:
    """Per-gene typing inputs, whichever ingestion route produced them."""

    per_gene: dict[str, Any]  # gene -> evidence CSR | PairRead list
    variants: dict[str, Any]
    from_evidence: bool

    def usable(self, gene: str) -> bool:
        # CN>0 with no unique passing reads happens on the provided-CN
        # path; the reference's defaultdicts then type zero alleles and
        # emit GENE* — callers short-circuit to the same outcome
        return bool(self.per_gene.get(gene)) and bool(
            self.variants.get(gene)
        )


def _ingest(
    filename_variant_json: str,
    reads_data: ReadsAndVariantsData | None,
    evidence: EvidenceBundle | None,
    multiple: bool,
) -> _GeneSources:
    if evidence is not None:
        ev, variants = evidence.splitByGene(multiple=multiple)
        return _GeneSources(ev, variants, True)
    if reads_data is None:
        reads_data = loadReadsAndVariantsData(filename_variant_json)
    if not multiple:
        reads_data = removeMultipleMapped(reads_data)
    return _GeneSources(
        groupReads(reads_data["reads"]),
        groupVariants(reads_data["variants"]),
        False,
    )


class Typing:
    """Strategy base: per-gene typing + cross-gene driver."""

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
    """Pos/neg-variant maximum-likelihood typing (the paper's method)."""

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
        self._src = _ingest(
            filename_variant_json, reads_data, evidence, multiple
        )
        # strategy is fixed at construction: pick the model class and its
        # extra kwargs once, so typingPerGene stays branch-free
        self._model_opts: dict[str, Any] = dict(top_n=top_n)
        if exon_first or exon_only:
            self._model_cls: type[AlleleTyping] = AlleleTypingExonFirst
            self._model_opts.update(
                exon_only=exon_only,
                candidate_set_threshold=exon_candidate_threshold,
            )
        else:
            self._model_cls = AlleleTyping
            self._model_opts.update(variant_correction=variant_correction)

    def _fit(self, gene: str) -> AlleleTyping:
        factory = (
            self._model_cls.fromEvidence
            if self._src.from_evidence
            else self._model_cls
        )
        return factory(
            self._src.per_gene[gene],
            self._src.variants[gene],
            force_homo=False if isHetrozygous(gene) else None,
            **self._model_opts,
        )

    def typingPerGene(self, gene: str, cn: int) -> tuple[list[str], int]:
        logger.debug(f"[Allele] {gene=} {cn=}")
        if not self._src.usable(gene):
            logger.warning(f"[Allele] {gene} has no reads; returning fail")
            return [_genericAllele(gene)] * cn, 0
        model = self._fit(gene)
        best = model.typing(cn).selectBest()
        self._result[gene] = model.result
        fallback = _genericAllele(gene)
        return (
            [a if a != "fail" else fallback for a in best],
            model.getReadsNum(),
        )

    def getAllPossibleTyping(self) -> list[dict[Any, Any]]:
        rows: list[dict[Any, Any]] = []
        for gene, result in self._result.items():
            ranked = result[-1].selectAllPossible(0.9)
            for rank, (value, alleles) in enumerate(ranked):
                row: dict[Any, Any] = dict(gene=gene, rank=rank, value=value)
                row.update(
                    {str(i + 1): a for i, a in enumerate(alleles)}
                )
                rows.append(row)
        return rows


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
            reads_data = (
                evidence.toReadsData()
                if evidence is not None
                else loadReadsAndVariantsData(filename_variant_json)
            )
        self._gene_reads = preprocessHisatReads(
            removeMultipleMapped(reads_data)
        )

    def typingPerGene(self, gene: str, cn: int) -> tuple[list[str], int]:
        if not self._gene_reads.get(gene):
            logger.warning(f"[Allele] {gene} has no reads; returning fail")
            return [_genericAllele(gene)] * cn, 0
        ranked = sorted(
            hisat2TypingPerGene(self._gene_reads[gene]),
            key=lambda r: -r.prob,
        )
        # apportion the CN budget by abundance: each allele claims
        # round(prob * cn) copies (>=1), top-down until the budget runs
        # out; est_prob division kept verbatim for float-exact parity
        est_prob = 1 / cn
        called: list[str] = []
        for entry in ranked:
            claimed = max(1, round(entry.prob / est_prob))
            called.extend([entry.allele] * min(cn, claimed))
            entry.cn = claimed
            cn -= claimed
            if cn <= 0:
                break
        self._result[gene] = ranked
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
    if method == "em":
        for k in ("top_n", "variant_correction"):
            kwargs.pop(k, None)
        return TypingWithReport(filename_variant_json, **kwargs)
    if method == "full":
        return TypingWithPosNegAllele(filename_variant_json, **kwargs)
    head, _, tail = method.partition("_")
    if head == "exonfirst":
        # bare "exonfirst" AND >2 fields -> threshold 0.0, mirroring the
        # reference exactly (kir_typing.py:215-219 parses a threshold
        # only for exactly two fields; "_" in the tail must NOT reach
        # float(), whose PEP 515 parsing would read "1_5" as 15.0); the
        # CLI rewrites bare exonfirst to exonfirst_1 (its main.py:190)
        threshold = float(tail) if tail and "_" not in tail else 0.0
        return TypingWithPosNegAllele(
            filename_variant_json,
            exon_first=True,
            exon_candidate_threshold=threshold,
            **kwargs,
        )
    raise NotImplementedError(method)
