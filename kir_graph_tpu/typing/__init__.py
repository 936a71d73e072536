from .pairread import (
    PairRead,
    ReadsAndVariantsData,
    groupReads,
    groupVariants,
    loadReadsAndVariantsData,
    removeMultipleMapped,
    writeReadsAndVariantsData,
)
from .allele_typing import AlleleTyping, TypingResult, rankScore
from .exonfirst import AlleleTypingExonFirst
from .homo import isHetrozygous, isHomozygous
from .em import hisatEMnp, hisat2TypingPerGene, Hisat2AlleleResult
from .facade import (
    Typing,
    TypingWithPosNegAllele,
    TypingWithReport,
    selectKirTypingModel,
)
