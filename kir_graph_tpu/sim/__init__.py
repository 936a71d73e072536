from .synth_db import SynthConfig, makeSyntheticDB
from .reads import simulatePairedReads, writeFastq, revComp
