from .extract import (
    REGIONS_OF_DIPLOID,
    KIR_REGIONS,
    WgsIndex,
    buildWgsIndex,
    extractKirReads,
)
