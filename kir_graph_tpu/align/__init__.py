from .encode import encodeReads, revCompCodes
from .seeding import SeedTable, findCandidates
from .dp import bandedScore, bandedTraceback, AlignParams
from .pipeline import GraphAligner, AlignResult
from .annotate import VariantAnnotator
