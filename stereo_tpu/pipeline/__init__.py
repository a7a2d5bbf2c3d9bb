from .pipeline import StereoResult, build_pipeline, compute_disparity

__all__ = ["StereoResult", "build_pipeline", "compute_disparity"]
