from .mobility import MobilityPipeline  # noqa: F401
