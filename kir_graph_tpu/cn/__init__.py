from .models import CNgroup, KDEcut, Dist, loadCNModel
from .predict import (
    aggrDepths,
    depthToCN,
    filterDepth,
    loadCN,
    predictSamplesCN,
    readSamtoolsDepth,
    selectSamtoolsDepth,
)
