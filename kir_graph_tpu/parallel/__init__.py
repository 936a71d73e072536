from .mesh import makeMesh, meshShape
from .cohort import DeviceIndexArrays, buildDeviceArrays, cohortStep, makeShardedCohortStep
