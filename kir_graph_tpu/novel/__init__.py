from .discover import discoverNovel, groupReadByAllele, variantConfusionInRead
