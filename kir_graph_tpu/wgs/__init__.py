from .extract import (
    REGIONS_OF_DIPLOID,
    KIR_REGIONS,
    WgsIndex,
    buildWgsIndex,
    extractKirReads,
)
from .genome import (
    buildGenomeIndex,
    downloadHg19,
    downloadHg38,
    validateGenome,
)
