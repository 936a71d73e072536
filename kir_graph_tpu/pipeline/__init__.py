from .run import SamplePipeline
