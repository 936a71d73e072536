from .compare import (
    MatchResult,
    MatchType,
    compareCohort,
    compareGene,
    compareSample,
    readAnswerAllele,
    readPredictResult,
    saveCohortAllele,
    calcSummaryByResolution,
)
from .compare_cn import allele2CN, compareCN, compareCNCohort, readCNFile
from .compare_mapping import mappingAccuracy
from .hprc import evaluateHprc, readHprcTruth
from .multi import PossibleSetStat, evalPossibleSets, summarizePossibleSets
