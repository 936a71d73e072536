from .variants import Variant, IdAllocator, msaToVariants, isInExon
from .build import GeneIndex, KirIndex, buildIndexFromMsa, saveIndex, loadIndex
